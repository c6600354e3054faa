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

    // recall@3 vs brute force at the default (k≈√n, nprobe=2, 1 Lloyd
    // pass): the gate the reference-style IVF must clear.
    val bruteTop = brute.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val ivfTop = ivf.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(3)).toSet }
    val recalls = bruteTop.collect { case (q, bt) if ivfTop.contains(q) =>
      (bt intersect ivfTop(q)).size.toDouble / bt.size
    }
    val recall = recalls.sum / recalls.size
    info(s"IVF recall@3 vs brute force (k=sqrt(n), nprobe=2): $recall")
    assert(recall >= 0.2, s"recall collapsed: $recall")
  }

  test("IVF recall reaches 0.9 with more probes; nprobe trades cost for recall") {
    val dir = TestSpark.sfDir
    val e = graft.Tables.load(spark, dir, "embeddings")
    val brute = SparkEntry.queries("v42_ann_topk")(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    def recallAt(nprobe: Int): Double = {
      val ivf = graft.ops.Ivf.searchTopK(e, "vec_id", "embedding",
        queryPred = org.apache.spark.sql.functions.col("vec_id") % 50 === 0,
        topK = 3, nprobe = nprobe, iters = 2).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(3)).toSet }
      val rs = brute.collect { case (q, bt) if ivf.contains(q) =>
        (bt intersect ivf(q)).size.toDouble / bt.size
      }
      // queries with no ivf output (probed cells held no other vector)
      // count as zero recall — don't silently drop them
      val missing = brute.size - rs.size
      rs.sum / (rs.size + missing)
    }
    // n=500 → k≈23 cells; nprobe=16 probes ~70% of them — the point of
    // the test is that the nprobe knob moves recall monotonically up to
    // the ≥0.9 contract, not that a 30%-probe is magically exhaustive.
    val r2 = recallAt(2)
    val rHigh = recallAt(16)
    info(s"recall@3: nprobe=2 → $r2, nprobe=16 → $rHigh")
    assert(rHigh >= 0.9, s"nprobe=16 recall below contract: $rHigh")
    assert(rHigh >= r2 - 1e-9, "recall must not degrade with more probes")
  }

  test("sample-local Lloyd matches distributed Lloyd when the sample covers the corpus") {
    val dir = TestSpark.sfDir
    val e = graft.Tables.load(spark, dir, "embeddings")
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cell").cast("int"), col("centroid").cast("array<float>"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // one pass: both paths assign against the bitwise-identical seeds,
    // so means differ only by float summation order (a second pass
    // could legitimately flip a borderline vector between cells)
    val local = asMap(graft.ops.Ivf.centroids(e, "vec_id", "embedding",
      k = 8, iters = 1)) // default sampleCap ≥ corpus ⇒ sample IS the corpus
    val dist = asMap(graft.ops.Ivf.centroids(e, "vec_id", "embedding",
      k = 8, iters = 1, sampleCap = -1))
    // same surviving cells; per-dimension means agree up to float
    // summation order (the two paths fold partial sums differently)
    assert(local.keySet == dist.keySet)
    local.foreach { case (cell, cv) =>
      val dv = dist(cell)
      assert(cv.length == dv.length)
      cv.zip(dv).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-4f, s"cell $cell drifted: $a vs $b")
      }
    }
  }

  test("filtered ANN: candPred and tenant matchCols both enforced pre-join") {
    val dir = TestSpark.sfDir
    val rows = SparkEntry.queries("v52_filtered_ann")(spark, dir).collect()
    assert(rows.nonEmpty, "filtered search must return results on the fixture")
    // schema: query_id, label, cell, rk, cand_id, cos_sim
    rows.foreach { r =>
      assert(r.getLong(4) % 2 == 0,
        s"candidate ${r.getLong(4)} violates the metadata filter (vec_id % 2 = 0)")
    }
    // tenant isolation: every returned candidate shares the query's label
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    rows.foreach { r =>
      assert(e(r.getLong(4)) == r.get(1) && e(r.getLong(0)) == r.get(1),
        s"tenant leak: query ${r.getLong(0)} (${e(r.getLong(0))}) matched " +
          s"candidate ${r.getLong(4)} (${e(r.getLong(4))})")
    }
    // ranks are dense per query and capped at topK=3
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to rs.length) && rs.length <= 3)
    }
  }
}
