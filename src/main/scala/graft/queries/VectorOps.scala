package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.functions.cosine_sim

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): per-vector stats, cosine-similar pair mining, and
  * brute-force ANN top-k.
  *
  * Numeric parity with the oracle: every dot product casts each float
  * element to double and folds left-to-right — both Spark's
  * `aggregate(zip_with(...))` and DuckDB's
  * `list_aggregate(list_transform(...), 'sum')` evaluate the 64-term
  * sum sequentially in double, so results are bit-identical.
  *
  * Scale path: the pair join blocks on `label` (in production: IVF
  * cell or LSH bucket — see graft.functions for the hashing
  * primitives), so each Spark task joins one bucket; the top-k uses
  * per-partition selection, not a global sort.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ as an expression chain — kept for the stats query where
    * the oracle checks the raw sums. */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Per-vector stats ---------------------------------------------
    "v40_vector_stats" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      e.select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        norm(col("embedding")).as("l2_norm"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("sum_elems"))
    }),

    // ---- Cosine-similar pairs within label blocks ---------------------
    "v41_cosine_pairs" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val v = e.select(col("label"), col("vec_id"), col("embedding"))
      val a = v.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      val b = v.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
      a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
        .withColumn("cos_sim", cosine_sim(col("emb_a"), col("emb_b")))
        .filter(col("cos_sim") >= 0.5)
        .select(col("label"), col("id_a"), col("id_b"), col("cos_sim"))
    }),

    // ---- IVF ANN — the scale path vs v42's brute force ----------------
    // graft.ops.Ivf: k ≈ √n cells (data-driven, not tied to the label
    // cardinality), one distributed Lloyd refinement pass, candidates
    // indexed in their nearest cell, queries probe nprobe=2 cells.
    // Candidate volume per query shrinks ~k/nprobe×; the probe join
    // shuffles on the cell id. No collect, no driver-side k-means loop.
    "v43_ivf_ann" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      graft.ops.Ivf.searchTopK(e, "vec_id", "embedding",
        queryPred = col("vec_id") % 50 === 0, topK = 3, nprobe = 2)
    }),

    // ---- Brute-force ANN top-3 per query vector -----------------------
    "v42_ann_topk" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
      val scored = q.join(c, col("query_id") =!= col("cand_id"))
        .withColumn("cos_sim", cosine_sim(col("q_emb"), col("c_emb")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("cand_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("query_id"), col("rk"), col("cand_id"), col("cos_sim"))
    })
  )

  private val dotSql =
    "list_aggregate(list_transform(generate_series(1, 64), " +
      "i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)), 'sum')"

  def oracles: Map[String, String] = Map(
    "v40_vector_stats" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        |  sqrt(list_aggregate(list_transform(generate_series(1, 64),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum')) AS l2_norm,
        |  list_aggregate(list_transform(generate_series(1, 64),
        |    i -> CAST(embedding[i] AS DOUBLE)), 'sum') AS sum_elems
        |FROM embeddings""".stripMargin,

    "v41_cosine_pairs" ->
      s"""WITH n AS (
        |  SELECT label, vec_id, embedding,
        |    sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
        |  FROM embeddings)
        |SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
        |  ${dotSql.format("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos_sim
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ${dotSql.format("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.5""".stripMargin,

    "v42_ann_topk" ->
      s"""WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    ${dotSql.format("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id)
        |SELECT query_id, rk, cand_id, cos_sim FROM (
        |  SELECT query_id, cand_id, cos_sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY cos_sim DESC, cand_id) AS rk
        |  FROM scored) WHERE rk <= 3""".stripMargin
  )
}
