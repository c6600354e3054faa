package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulOps
import java.nio.file.Files
import java.sql.Timestamp

/** Keyed-operator STATE survives a checkpointed restart — the analog
  * of the reference's checkpoint/savepoint recovery for keyed state
  * (flink-runtime checkpointing + StateBackend.resume; SURVEY.md §4.2).
  * FileSinkSpec proves sink exactly-once across restarts; this spec
  * proves the flatMapGroupsWithState STATE itself is restored: a key
  * seen before the restart must still deduplicate after it.
  */
class StateRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keep-first dedup state is restored from the checkpoint on restart") {
    implicit val sc = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_state_ckpt").toString
    val in = MemoryStream[Ev]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

    def start() = StatefulOps.keepFirstStreaming(in.toDF(), Seq("user"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((r.getString(r.fieldIndex("user")),
          r.getString(r.fieldIndex("tpe")))))
      }
      .start()

    val q1 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:00:01"), "u1", "a", 1.0))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.toArray.toList == List(("u1", "a")))

    // Same checkpoint → state restored. A second row for u1 must be
    // suppressed by the RESTORED state; a new key still emits.
    val q2 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:00:02"), "u1", "b", 2.0),
               Ev(Timestamp.valueOf("2024-01-01 00:00:03"), "u2", "c", 3.0))
    q2.processAllAvailable()
    q2.stop()

    val all = seen.toArray.collect { case p: (_, _) => p.asInstanceOf[(String, String)] }
      .toList.sorted
    assert(all == List(("u1", "a"), ("u2", "c")),
      "u1's second row must be deduplicated by state restored from the checkpoint")
  }
}
