package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PqFns

/** IVF-PQ — the full FAISS-style index shape for 10¹⁰-vector search:
  * coarse-quantize the corpus into IVF cells ([[Ivf]]), then
  * PQ-encode each vector's RESIDUAL (vector − cell centroid) with
  * [[Pq]]. Searching probes `nprobe` cells and scores candidates by
  * asymmetric distance on the residuals — candidate traffic shrinks
  * k/nprobe× (IVF) while the scanned index is 32× smaller than raw
  * vectors (PQ). Residual encoding is what makes the two compose:
  * within a cell, residuals are centered near zero, so a small shared
  * codebook quantizes them far better than it would raw positions.
  *
  * Scale shape: cell assignment and PQ encoding are map-side
  * codegen'd expressions over broadcast structures (zero shuffle);
  * the only data-scale shuffle is the probe join on the cell id.
  * Artifacts (centroids, codes, probes, codebooks) are small and
  * materialized — index once, search many.
  */
object IvfPq {

  /** Built index artifacts, all metadata-or-code scale. */
  final case class Index(cents: DataFrame,
                         codes: DataFrame,
                         codebooks: Array[Array[Array[Float]]])

  /** Build: IVF cells + residual PQ codebooks + per-vector codes.
    * `codes` = (cand_id, cell, codes array<int>).
    */
  def build(vectors: DataFrame, idCol: String, embCol: String,
            cells: Int, m: Int, k: Int, iters: Int): Index = {
    val cents = Ivf.centroids(vectors, idCol, embCol, cells, iters)
    val assigned1 = Ivf.assign(vectors, idCol, embCol, cents, nprobe = 1)
      .filter(col("cell_rank") === 1)
    // residual = vec − cell centroid (float lattice, training input)
    val withRes = assigned1
      .join(broadcast(cents), Seq("cell"))
      .withColumn("res",
        zip_with(col(embCol).cast("array<float>"),
          col("centroid").cast("array<float>"), (a, b) => a - b))
    val cbs = Pq.train(withRes, idCol, "res", m, k, iters)
    val codes = withRes.select(col(idCol).as("cand_id"), col("cell"),
      PqFns.pq_encode(col("res").cast("array<float>"), cbs).as("codes"))
    Index(cents, codes, cbs)
  }

  /** Probe + score: each query probes its `nprobe` nearest cells; the
    * candidate side is codes-only. The scoring kernel widens query,
    * centroid, and codeword to double before subtracting, so an
    * independent engine can replay every distance from the
    * materialized artifacts.
    * @return (query_id, cell, rk, cand_id, adc_dist)
    */
  def searchTopK(vectors: DataFrame, idCol: String, embCol: String,
                 index: Index, queryPred: Column, topK: Int,
                 nprobe: Int = 0): DataFrame = {
    val np = resolveNprobe(index, nprobe)
    val probes = Ivf.assign(vectors.filter(queryPred), idCol, embCol,
        index.cents, np)
      .select(col(idCol).as("query_id"), col("cell"),
        col(embCol).cast("array<float>").as("q_emb"))
    scoreProbes(probes, index, topK)
  }

  /** nprobe <= 0 → auto-scale with the index's cell count
    * ([[Ivf.defaultNprobe]]). The cents count() is centroid-table
    * scale (≈√n rows), not data scale.
    */
  def resolveNprobe(index: Index, nprobe: Int): Int =
    if (nprobe > 0) nprobe else Ivf.defaultNprobe(index.cents.count().toInt)

  /** IVF-PQ with the [[Pq.searchTopKRefined]] exact re-rank: probe
    * auto-scaled cells, shortlist topK·refine by residual ADC, then
    * exact-L2 rerank the shortlist against the raw vectors. The two
    * recall levers compose: nprobe governs whether the true
    * neighbor's CELL is scanned at all, refine recovers the ordering
    * quantization noise scrambled within the scanned cells. Scale
    * shape unchanged from searchTopK plus a query-scale rerank join.
    * @return (query_id, rk, cand_id, l2_dist)
    */
  def searchTopKRefined(vectors: DataFrame, idCol: String, embCol: String,
                        index: Index, queryPred: Column, topK: Int,
                        nprobe: Int = 0, refine: Int = 10): DataFrame = {
    require(refine >= 1)
    val shortlist = searchTopK(vectors, idCol, embCol, index, queryPred,
        topK * refine, nprobe)
      .select(col("query_id"), col("cand_id"))
    val q = vectors.filter(queryPred).select(col(idCol).as("query_id"),
      col(embCol).cast("array<float>").as("q_emb"))
    val c = vectors.select(col(idCol).as("cand_id"),
      col(embCol).cast("array<float>").as("c_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2_dist"), col("cand_id"))
    shortlist.join(c, "cand_id").join(broadcast(q), "query_id")
      .withColumn("l2_dist", Pq.l2sq(col("q_emb"), col("c_emb")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("cand_id"), col("l2_dist"))
  }

  /** Scoring phase over an explicit probe table (query_id, cell,
    * q_emb) — split out so the probes can be persisted and the search
    * replayed (by this engine or an independent verifier) from the
    * materialized artifacts alone.
    */
  def scoreProbes(probes: DataFrame, index: Index, topK: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("cand_id"))
    // r21: the centroid join moves BEFORE the codes join so the
    // residual ADC lookup table (Jégou §IV.A / FAISS precomputed
    // tables) is built once per (query, cell) PROBE row — probe-scale
    // work — and every candidate in the probed cell costs M array
    // reads + M adds instead of M·dSub subtract-square chains. Table
    // entries are adcResidual's exact per-subspace sums, summed in
    // the same order → bit-identical distances.
    val k = index.codebooks(0).length
    probes
      .join(broadcast(index.cents), Seq("cell"))
      .withColumn("q_lut", PqFns.pq_adc_lut_residual(
        col("q_emb"), col("centroid").cast("array<float>"), index.codebooks))
      .join(index.codes, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("adc_dist", PqFns.pq_adc_from_lut(col("q_lut"), col("codes"), k))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("cell"), col("rk"), col("cand_id"), col("adc_dist"))
  }
}
