package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin matches plain join results") {
    val fact = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val dim = (Seq("hot") ++ (1 until 50).map(i => s"k$i")).map(k => (k, s"d_$k"))
      .toDF("key", "payload")
    val plain = fact.join(dim, Seq("key")).select("key", "v", "payload")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(fact, dim, "key", buckets = 8)
      .select("key", "v", "payload").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("saltedJoin left_outer keeps unmatched fact rows") {
    val fact = Seq(("a", 1), ("b", 2)).toDF("key", "v")
    val dim = Seq(("a", "x")).toDF("key", "payload")
    val out = Skew.saltedJoin(fact, dim, "key", 4, "left_outer")
      .collect().map(r => (r.getString(0), Option(r.getString(2)))).toSet
    assert(out == Set(("a", Some("x")), ("b", None)))
  }
}
