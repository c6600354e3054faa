package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Product-quantization coherence: codes are valid and deterministic,
  * ADC matches a direct recomputation, and quantization preserves
  * neighborhood structure (a vector's own code is far closer to it
  * than typical other codes).
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val e = Tables.load(spark, TestSpark.sfDir, "embeddings").cache()
  private lazy val cbs = ops.Pq.train(e, "vec_id", "embedding", m = 8, k = 16, iters = 1)

  test("codes valid, deterministic, and ADC matches direct recompute") {
    val codes = ops.Pq.encode(e, "vec_id", "embedding", cbs).cache()
    val n = e.count()
    assert(codes.count() == n)
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 16).count()
    assert(bad == 0)
    // determinism
    val again = ops.Pq.encode(e, "vec_id", "embedding", cbs)
    assert(codes.join(again.withColumnRenamed("codes", "codes2"), "cand_id")
      .filter(col("codes") =!= col("codes2")).count() == 0)

    // ADC for one (query, cand) pair equals a plain Scala recompute
    val q = e.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("embedding")).head()
    val qEmb = q.getSeq[Float](1).toArray
    val cand = codes.orderBy(desc("cand_id")).limit(1).head()
    val candCodes = cand.getSeq[Int](1).toArray
    var expected = 0.0
    for (s <- 0 until 8) {
      val cw = cbs(s)(candCodes(s))
      var sub = 0.0
      for (i <- 0 until 8) {
        val d = qEmb(s * 8 + i).toDouble - cw(i).toDouble
        sub += d * d
      }
      expected += sub
    }
    val got = codes.filter(col("cand_id") === cand.getLong(0))
      .select(functions.PqFns.pq_adc(
        typedLit(qEmb.toSeq), col("codes"), cbs).as("d"))
      .head().getDouble(0)
    assert(got == expected)
  }

  test("LUT-scored ADC is bit-identical to the fused kernels (r21)") {
    // the r21 search paths score through a per-query lookup table
    // (Jégou §IV.A); the contract is BIT equality with the fused
    // pq_adc / pq_adc_residual over every (query, candidate) pair
    val codes = ops.Pq.encode(e, "vec_id", "embedding", cbs)
    val q = e.limit(5).select(col("vec_id").as("query_id"),
        col("embedding").cast("array<float>").as("q_emb"))
      .withColumn("q_lut", functions.PqFns.pq_adc_lut(col("q_emb"), cbs))
    val k = cbs(0).length
    val mismatch = codes.crossJoin(q)
      .select(
        functions.PqFns.pq_adc(col("q_emb"), col("codes"), cbs).as("fused"),
        functions.PqFns.pq_adc_from_lut(col("q_lut"), col("codes"), k).as("lut"))
      .filter(col("fused") =!= col("lut")).count()
    assert(mismatch == 0, "LUT ADC must be bit-identical to fused ADC")
    // residual variant: centroid = first vector (any float lattice works)
    val cent = e.orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<float>")).head().getSeq[Float](0)
    val qr = q.withColumn("cent", typedLit(cent))
      .withColumn("r_lut", functions.PqFns.pq_adc_lut_residual(
        col("q_emb"), col("cent"), cbs))
    val mismatchR = codes.crossJoin(qr)
      .select(
        functions.PqFns.pq_adc_residual(
          col("q_emb"), col("cent"), col("codes"), cbs).as("fused"),
        functions.PqFns.pq_adc_from_lut(col("r_lut"), col("codes"), k).as("lut"))
      .filter(col("fused") =!= col("lut")).count()
    assert(mismatchR == 0, "residual LUT ADC must be bit-identical")
  }

  test("recall@3 vs exact L2 clears the floor at the v45 config") {
    import org.apache.spark.sql.expressions.Window
    val cfg = ops.Pq.train(e, "vec_id", "embedding", m = 16, k = 64, iters = 2)
    val pred = col("vec_id") % 50 === 0
    val q = e.filter(pred).select(col("vec_id").as("query_id"),
      col("embedding").cast("array<float>").as("q"))
    val c = e.select(col("vec_id").as("cand_id"),
      col("embedding").cast("array<float>").as("c"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d"), col("cand_id"))
    val exact = q.join(c, col("query_id") =!= col("cand_id"))
      .withColumn("d", aggregate(zip_with(col("q"), col("c"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => a + x))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("query_id"), col("cand_id"))
    val approx = ops.Pq.searchTopK(e.filter(pred), "vec_id", "embedding",
      ops.Pq.encode(e, "vec_id", "embedding", cfg), cfg, 3)
    val recall = exact.join(approx.select(col("query_id"), col("cand_id")),
      Seq("query_id", "cand_id")).count().toDouble / exact.count()
    // measured 0.40 at sf0.001 / 0.53 at sf0.01 on isotropic random
    // fixtures (PQ's worst case); the floor guards against encoding or
    // scoring regressions, not data-dependent quality
    assert(recall >= 0.25, s"recall@3 = $recall")
  }

  test("own code is closer than the bulk of other codes") {
    val codes = ops.Pq.encode(e, "vec_id", "embedding", cbs)
    val qs = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = codes.join(broadcast(qs))
      .withColumn("adc", functions.PqFns.pq_adc(col("q_emb"), col("codes"), cbs))
    val own = scored.filter(col("query_id") === col("cand_id"))
      .agg(avg(col("adc"))).head().getDouble(0)
    val other = scored.filter(col("query_id") =!= col("cand_id"))
      .agg(avg(col("adc"))).head().getDouble(0)
    // quantization error on the vector itself must be far below the
    // typical inter-vector distance, else the index carries no signal
    assert(own < other / 2, s"own=$own other=$other")
  }

  test("sample-local training matches distributed training when the sample covers the corpus") {
    val dist = ops.Pq.train(e, "vec_id", "embedding",
      m = 8, k = 16, iters = 1, sampleCap = -1)
    // default sampleCap ≥ corpus size ⇒ identical math modulo the order
    // the per-cluster double sums fold in
    cbs.zip(dist).zipWithIndex.foreach { case ((ls, ds), s) =>
      ls.zip(ds).zipWithIndex.foreach { case ((lc, dc), c) =>
        lc.zip(dc).foreach { case (a, b) =>
          assert(math.abs(a - b) <= 1e-4f, s"codebook[$s][$c] drifted: $a vs $b")
        }
      }
    }
  }
}
