package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.NearDupStreaming

case class Doc(doc_id: Long, text: String)
case class SDoc(doc_uuid: String, text: String)

/** Streaming MinHash-LSH near-dup tagging: an exact copy arriving in
  * a later trigger is flagged against the original (cross-trigger
  * bucket state); novel docs pass; same-trigger duplicates resolve to
  * one survivor.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cross-trigger and same-trigger near-dups are flagged") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Doc]
    val tags = scala.collection.mutable.Map[Long, (Boolean, Option[Long])]()
    val q = NearDupStreaming.nearDupTagStreaming(in.toDF(), "doc_id", "text")(
      b => b.collect().foreach { r =>
        tags(r.getLong(0)) = (r.getBoolean(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))
      })
    try {
      val base = "the quick brown fox jumps over the lazy dog near the river bank today"
      in.addData(Doc(1L, base), Doc(2L, "completely different words about spark and flink engines processing streams"))
      q.processAllAvailable()
      assert(tags(1L) == ((false, None)))
      assert(tags(2L) == ((false, None)))
      // trigger 2: exact copy of doc 1 + a novel doc
      in.addData(Doc(3L, base), Doc(4L, "yet another unrelated document mentioning gradients tokens and embeddings"))
      q.processAllAvailable()
      assert(tags(3L) == ((true, Some(1L))))
      assert(tags(4L) == ((false, None)))
      // trigger 3: two identical fresh docs in ONE trigger — exactly
      // one survives, the other points at the survivor
      val dupText = "same batch duplicate payload with enough tokens to band properly here"
      in.addData(Doc(5L, dupText), Doc(6L, dupText))
      q.processAllAvailable()
      val flagged = Seq(5L, 6L).filter(id => tags(id)._1)
      assert(flagged.size == 1)
      val survivor = Seq(5L, 6L).filterNot(flagged.contains).head
      assert(tags(flagged.head)._2.contains(survivor))
    } finally q.stop()
  }

  test("non-Long doc ids work end-to-end (r19 review: ids are opaque)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[SDoc]
    val tags = scala.collection.mutable.Map[String, (Boolean, Option[String])]()
    val q = NearDupStreaming.nearDupTagStreaming(in.toDF(), "doc_uuid", "text")(
      b => b.collect().foreach { r =>
        tags(r.getString(0)) = (r.getBoolean(1),
          if (r.isNullAt(2)) None else Some(r.getString(2)))
      })
    try {
      val base = "string identified documents flow through banding and bucket owner state"
      in.addData(SDoc("uuid-alpha", base))
      q.processAllAvailable()
      assert(tags("uuid-alpha") == ((false, None)))
      in.addData(SDoc("uuid-beta", base)) // exact copy, later trigger
      q.processAllAvailable()
      assert(tags("uuid-beta") == ((true, Some("uuid-alpha"))),
        s"string-id near-dup must resolve to the first owner: $tags")
    } finally q.stop()
  }
}
