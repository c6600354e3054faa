package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.functions.{minhash, simhash, hamming64}

/** Near-duplicate detection at scale: MinHash+LSH and SimHash banding.
  *
  * These are the operators that make exact-quadratic dedup (t36) viable
  * at 100 TB: instead of a within-block cross join, each doc computes a
  * constant-size signature map-side, explodes into `BANDS` bucket keys,
  * and only docs colliding in a bucket are pair-joined. Shuffle volume
  * is O(docs × bands), and the pair join runs per-bucket — never a
  * global cross product. No oracle SQL (custom hash functions), so the
  * driver records rows-only checks; semantics are covered by
  * `graft.NearDupSpec`.
  */
object NearDup {

  val K = 128       // minhash permutations
  val BANDS = 16    // LSH bands → 8 rows per band
  val ROWS = K / BANDS

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- MinHash signatures (per-doc, deterministic) ------------------
    "n50_minhash_signatures" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val toks = array_distinct(split(col("text"), " "))
      d.select(col("doc_id"),
        minhash(toks, K).as("sig"))
        .select(col("doc_id"), size(col("sig")).as("sig_len"),
          element_at(col("sig"), 1).as("h0"),
          element_at(col("sig"), K).as(s"h${K - 1}"))
    }),

    // ---- MinHash LSH near-dup pairs ----------------------------------
    "n51_minhash_lsh_pairs" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val toks = array_distinct(split(col("text"), " "))
      val sigs = d.select(col("doc_id"), minhash(toks, K).as("sig"))
      // band b covers sig[b*ROWS+1 .. (b+1)*ROWS]; bucket key = hash of slice
      val banded = sigs.select(col("doc_id"), col("sig"),
          explode(expr(s"transform(sequence(0, ${BANDS - 1}), " +
            s"b -> struct(b AS band, hash(slice(sig, b * $ROWS + 1, $ROWS)) AS bucket))")).as("bb"))
        .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
      val a = banded.select(col("band"), col("bucket"),
        col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = banded.select(col("band"), col("bucket"),
        col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      a.join(b, Seq("band", "bucket")).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / K).as("est_jaccard"))
        .distinct() // same pair may collide in several bands
        .filter(col("est_jaccard") >= 0.5)
    }),

    // ---- SimHash near-dup pairs (chunk banding + Hamming) -------------
    "n52_simhash_pairs" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val toks = split(col("text"), " ")
      val sigs = d.select(col("doc_id"), simhash(toks).as("sig"))
      // 4 × 16-bit chunks: near-dups (hamming ≤ 3) share ≥1 exact chunk
      val banded = sigs.select(col("doc_id"), col("sig"),
          explode(expr("transform(sequence(0, 3), " +
            "c -> struct(c AS chunk, shiftright(sig, c * 16) & 65535 AS ck))")).as("cc"))
        .select(col("doc_id"), col("sig"), col("cc.chunk"), col("cc.ck"))
      val a = banded.select(col("chunk"), col("ck"),
        col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = banded.select(col("chunk"), col("ck"),
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
    * tracks true Jaccard; hamming(x,x)=0).
    */
  def oracles: Map[String, String] = Map.empty
}
