package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.Encoders
import graft.functions.functions.cosine_sim
import graft.streaming.StatefulOps

case class QVec(query_id: Long, embedding: Array[Float])

/** Streaming vector retrieval — live queries against the staged IVF
  * index, composed entirely from existing operators:
  *
  *   query stream → map-side cell assignment (the same codegen'd
  *   nearest_cells projection the batch path uses — works unchanged on
  *   a streaming DataFrame because it is a stateless projection) →
  *   stream-static equi-join on the cell id against the materialized
  *   assignment table → cosine scoring → [[StatefulOps.topNStreaming]]
  *   per query.
  *
  * This is the production RAG/serving shape: the index is built once
  * (batch, v43/v52 discipline), queries arrive continuously, and each
  * emits its running top-k. The spec cross-checks the streaming top-1
  * against the batch `searchFromAssigned` result for the same queries
  * — same index, same rows, same ordering.
  */
class StreamingRetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = TestSpark.sfDir

  test("streaming queries against the staged IVF index match batch search") {
    implicit val sc = spark.sqlContext
    implicit val enc = Encoders.product[QVec]
    val e = Tables.load(spark, sfDir, "embeddings")
    val n = e.count().toDouble
    val cents = graft.ops.Ivf.centroids(e, "vec_id", "embedding",
      k = math.max(4, math.ceil(math.sqrt(n)).toInt), iters = 1)
    val assigned = graft.ops.Ivf.assign(e, "vec_id", "embedding", cents, nprobe = 2)
    // static candidate side (index cells only), cached like a serving index
    val cands = assigned.filter(col("cell_rank") === 1)
      .select(col("cell"), col("vec_id").as("cand_id"),
        col("embedding").cast("array<float>").as("c_emb"))
      .cache()
    // batch reference: same probe + rank over the same assignment
    val batchTop = graft.ops.Ivf.searchFromAssigned(
        assigned, "vec_id", "embedding",
        queryPred = col("vec_id") % 50 === 0, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(batchTop.nonEmpty)

    // the streaming side: queries arrive as a MemoryStream
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .collect().map(r => QVec(r.getLong(0), r.getSeq[Float](1).toArray))
    val in = MemoryStream[QVec]
    val qStream = graft.ops.Ivf.assign(in.toDF(), "query_id", "embedding", cents, nprobe = 2)
      .select(col("cell"), col("query_id"),
        col("embedding").cast("array<float>").as("q_emb"))
    val scored = qStream.join(cands, Seq("cell")) // stream-static equi-join
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", cosine_sim(col("q_emb"), col("c_emb")))
      .select(col("query_id"), col("cand_id"), col("cos_sim"))
    val top = StatefulOps.topNStreaming(scored, Seq("query_id"), "cos_sim",
      descending = true, n = 1)
    val q = top.writeStream.format("memory").queryName("stream_retrieval")
      .outputMode(OutputMode.Update)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sretr").toString)
      .start()
    try {
      // feed in two batches to prove incremental arrival works
      val (a, b) = queries.splitAt(queries.length / 2)
      in.addData(a.toIndexedSeq); q.processAllAvailable()
      in.addData(b.toIndexedSeq); q.processAllAvailable()
      // last update per query = its final top-1
      val rows = spark.sql(
        "SELECT query_id, cand_id, cos_sim FROM stream_retrieval").collect()
      val streamTop = rows.zipWithIndex.groupBy(_._1.getLong(0))
        .map { case (qid, rs) => qid -> rs.maxBy(_._2)._1.getLong(1) }
      assert(streamTop.keySet == batchTop.keySet,
        s"streaming must answer every query (${streamTop.size} vs ${batchTop.size})")
      streamTop.foreach { case (qid, cid) =>
        assert(cid == batchTop(qid),
          s"query $qid: streaming top-1 $cid != batch top-1 ${batchTop(qid)}")
      }
    } finally { q.stop(); cands.unpersist(); () }
  }
}
