package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files
import java.sql.Timestamp

/** Exactly-once file sink across query restarts — the reference
  * guarantees this via checkpoint barriers + transactional sinks
  * (SURVEY.md §4.2); Spark via checkpointed offsets + the file-sink
  * manifest. Stop the query mid-stream, restart on the same
  * checkpoint, and the output must contain every row exactly once.
  */
class FileSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parquet sink + checkpoint restart yields exactly-once output") {
    implicit val sc = spark.sqlContext
    val out = Files.createTempDirectory("graft_sink").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[Ev]

    def start() = in.toDF().writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:00:01"), "u1", "a", 1.0),
               Ev(Timestamp.valueOf("2024-01-01 00:00:02"), "u2", "b", 2.0))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start() // same checkpoint → resumes, must not re-emit
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:00:03"), "u3", "c", 3.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).select("user", "tpe").collect()
      .map(r => (r.getString(0), r.getString(1))).toList.sorted
    assert(rows == List(("u1", "a"), ("u2", "b"), ("u3", "c")))
  }
}
