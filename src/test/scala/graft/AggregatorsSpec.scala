package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Aggregators

class AggregatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("WeightedAvg aggregates with map-side merge") {
    val waUdaf = udaf(Aggregators.WeightedAvg)
    val df = Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0))
      .toDF("k", "v", "w")
    val got = df.groupBy($"k")
      .agg(waUdaf($"v", $"w").as("wavg"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - (10 * 1 + 20 * 3) / 4.0) < 1e-12)
    assert(math.abs(got("b") - 5.0) < 1e-12)
  }

  test("Top2 table-aggregate emits up to two rows per group via explode") {
    val top2 = udaf(Aggregators.Top2)
    val df = Seq(("a", 1.0), ("a", 9.0), ("a", 5.0), ("b", 2.0))
      .toDF("k", "v")
    val rows = df.groupBy($"k").agg(top2($"v").as("tops"))
      .select($"k", explode($"tops").as("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(rows == Set(("a", 9.0), ("a", 5.0), ("b", 2.0)))
  }

  test("approx_count_distinct tracks exact within 5% on lineitem") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val r = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey").as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }
}
