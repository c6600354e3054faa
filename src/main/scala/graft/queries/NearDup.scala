package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.functions.{minhash, simhash, hamming64}

/** Near-duplicate detection at scale: MinHash+LSH and SimHash banding.
  *
  * Scale design (the reason these exist next to the exact-quadratic
  * t36): signatures are constant-size per doc and computed map-side;
  * docs only meet through LSH bucket keys. Two hard rules keep the
  * plan linear at 100 TB:
  *
  *  1. Nothing wide flows through the bucket join — band rows are
  *     (band, bucket, doc_id) only; signatures never ride along a
  *     potentially-quadratic edge.
  *  2. Pair enumeration inside a bucket is inherently |bucket|²; any
  *     degenerate bucket (boilerplate text, empty docs) would blow up
  *     the stage, so the pair operator drops buckets above
  *     `maxBucketSize` (standard LSH-dedup practice). The cluster
  *     operator needs no cap: it only takes min/count per bucket.
  */
object NearDup {

  val K = 128       // minhash permutations
  val BANDS = 16    // LSH bands → 8 rows per band
  val ROWS = K / BANDS
  val MaxBucketSize = 64

  private def tokens = array_distinct(split(col("text"), " "))

  /** (doc_id, band, bucket) — the only thing that flows into joins. */
  private def banded(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    d.select(col("doc_id"), minhash(tokens, K).as("sig"))
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, ${BANDS - 1}), " +
          s"b -> struct(b AS band, hash(slice(sig, b * $ROWS + 1, $ROWS)) AS bucket))")).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- MinHash signatures (per-doc, deterministic) ------------------
    "n50_minhash_signatures" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      d.select(col("doc_id"), minhash(tokens, K).as("sig"))
        .select(col("doc_id"), size(col("sig")).as("sig_len"),
          element_at(col("sig"), 1).as("h0"),
          element_at(col("sig"), K).as(s"h${K - 1}"))
    }),

    // ---- MinHash-LSH dedup clusters (linear in corpus size) -----------
    // Each doc's cluster representative = the smallest doc_id it shares
    // any band bucket with (one union-find hop — iterate for full
    // transitive closure if needed). Output size = corpus size
    // regardless of how degenerate the duplicate structure is.
    "n51_minhash_dedup_clusters" -> ((s, dir) => {
      val b = banded(s, dir)
      val bucketRep = b.groupBy(col("band"), col("bucket"))
        .agg(min(col("doc_id")).as("bucket_rep"), count(lit(1)).as("bucket_size"))
      b.join(bucketRep, Seq("band", "bucket"))
        .groupBy(col("doc_id"))
        .agg(min(col("bucket_rep")).as("cluster_rep"),
             max(col("bucket_size") - 1).as("max_collisions"))
        .withColumn("is_canonical", col("cluster_rep") === col("doc_id"))
    }),

    // ---- MinHash-LSH near-dup pairs (bucket-capped) -------------------
    "n53_minhash_lsh_pairs" -> ((s, dir) => {
      val b = banded(s, dir)
      val sized = b.withColumn("bucket_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket"))))
        .filter(col("bucket_size") <= MaxBucketSize)
      val a2 = sized.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
      val b2 = sized.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
      val pairs = a2.join(b2, Seq("band", "bucket"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      // est jaccard: rejoin constant-size signatures per UNIQUE pair
      val d = Tables.load(s, dir, "documents")
      val sigs = d.select(col("doc_id"), minhash(tokens, K).as("sig"))
      pairs
        .join(sigs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a"), "doc_a")
        .join(sigs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / K).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
    }),

    // ---- SimHash dedup: exact-signature groups + banded near-pairs ----
    "n52_simhash_pairs" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val toks = split(col("text"), " ")
      val sigs = d.select(col("doc_id"), simhash(toks).as("sig"))
      // 4 × 16-bit chunks: near-dups (hamming ≤ 3) share ≥1 exact chunk
      val chunks = sigs.select(col("doc_id"), col("sig"),
          explode(expr("transform(sequence(0, 3), " +
            "c -> struct(c AS chunk, shiftright(sig, c * 16) & 65535 AS ck))")).as("cc"))
        .select(col("doc_id"), col("sig"), col("cc.chunk"), col("cc.ck"))
      val sized = chunks.withColumn("bucket_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("chunk"), col("ck"))))
        .filter(col("bucket_size") <= MaxBucketSize)
      val a = sized.select(col("chunk"), col("ck"),
        col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = sized.select(col("chunk"), col("ck"),
        col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      a.join(b, Seq("chunk", "ck")).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          hamming64(col("sig_a"), col("sig_b")).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 16)
    })
  )

  /** No oracle SQL — custom hash functions aren't expressible in
    * DuckDB; the driver records rows-only checks and ScalaTest covers
    * semantics (identical docs ⇒ identical signatures; est_jaccard
    * tracks true Jaccard; hamming(x,x)=0; cluster reps are minima).
    */
  def oracles: Map[String, String] = Map.empty
}
