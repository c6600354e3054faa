package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.functions.minhash

/** Cluster semantics of the LSH dedup operator on a constructed corpus
  * with known duplicate structure.
  */
class NearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhash LSH clusters: identical docs share a representative") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),   // dup of 1
      (3L, "alpha beta gamma delta epsilon zeta"),   // dup of 1
      (4L, "one two three four five six seven"),
      (5L, "totally different words entirely here"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents")

    // replicate the n51 pipeline inline on this corpus
    val toks = array_distinct(split(col("text"), " "))
    val sigs = docs.select(col("doc_id"), minhash(toks, 128).as("sig"))
    val banded = sigs.select(col("doc_id"),
        explode(expr("transform(sequence(0, 15), " +
          "b -> struct(b AS band, hash(slice(sig, b * 8 + 1, 8)) AS bucket))")).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val bucketRep = banded.groupBy(col("band"), col("bucket"))
      .agg(min(col("doc_id")).as("bucket_rep"))
    val reps = banded.join(bucketRep, Seq("band", "bucket"))
      .groupBy(col("doc_id")).agg(min(col("bucket_rep")).as("cluster_rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(reps(1L) == 1L && reps(2L) == 1L && reps(3L) == 1L)
    assert(reps(4L) == 4L)  // unique doc is its own representative
    assert(reps(5L) == 5L)
  }
}
