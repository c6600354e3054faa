package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("IVF ANN: contract holds and recall tracks brute force") {
    val dir = TestSpark.sfDir
    val ivf = SparkEntry.queries("v43_ivf_ann")(spark, dir).collect()
    val brute = SparkEntry.queries("v42_ann_topk")(spark, dir).collect()

    // every query gets up to 3 ranked candidates drawn from its
    // nprobe=2 probed cells
    val byQuery = ivf.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.sameElements(1 to rows.length))
      assert(rows.map(_.getInt(1)).distinct.length <= 2) // ≤ nprobe cells
    }

    // recall@3 vs brute force: cells shrink candidates ~10x, so demand
    // only a sane floor (structure-dependent), and report it.
    val bruteTop = brute.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val ivfTop = ivf.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(3)).toSet }
    val recalls = bruteTop.collect { case (q, bt) if ivfTop.contains(q) =>
      (bt intersect ivfTop(q)).size.toDouble / bt.size
    }
    val recall = recalls.sum / recalls.size
    info(s"IVF recall@3 vs brute force: $recall")
    assert(recall >= 0.2, s"recall collapsed: $recall")
  }
}
