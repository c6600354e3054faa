package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Windows

case class PtwEv(user: String, v: Double)

/** Processing-time windowed aggregation (`Windows.procTimeWindowAgg`)
  * — the reference's proctime group windows
  * (ProcessingTimeTrigger.java: fire on wall-clock, no watermark).
  * Wall-clock tests by nature: windows are kept short (2 s) and the
  * assertions poll with generous timeouts instead of pinning exact
  * window bounds.
  */
class ProcTimeWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pollUntil(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(250)
    }
    cond
  }

  test("proctime tumble: finals fire on wall-clock with NO further data") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[PtwEv]
    val agg = Windows.procTimeWindowAgg(
      in.toDF(), Windows.tumble(_, "2 seconds"), Seq("user"),
      Seq(count(lit(1)).as("n"), sum($"v").as("total")))
      .select($"window.start".as("ws"), $"window.end".as("we"),
        $"user", $"n", $"total")
    val q = agg.writeStream.format("memory").queryName("ptw")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(PtwEv("a", 1.0), PtwEv("a", 2.0), PtwEv("b", 5.0))
      q.processAllAvailable()
      // Do NOT add more data: the heartbeat union must advance the
      // watermark past the 2 s window end on its own (the reference's
      // ProcessingTimeTrigger.onProcessingTime). Poll for the finals.
      val fired = pollUntil(60000) {
        q.processAllAvailable()
        spark.sql("SELECT * FROM ptw").count() >= 2
      }
      assert(fired, "proctime window finals did not fire within 60s of idle input")
      val rows = spark.sql("SELECT user, n, total FROM ptw").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
      // all three rows land in SOME window; per-user totals are exact
      // even if a slow trigger split a user's rows across two windows
      assert(rows.map(_._2).sum == 3L, rows.toString)
      val byUser = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      assert(byUser == Map("a" -> 3.0, "b" -> 5.0), rows.toString)
      // window bounds are aligned 2 s tumbles
      val bounds = spark.sql("SELECT ws, we FROM ptw").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
      assert(bounds.forall { case (s, e) => e - s == 2000 && s % 2000 == 0 },
        bounds.toList.toString)
      // no heartbeat row leaked into the aggregate output as a null key
      assert(rows.forall(_._1 != null), rows.toString)
    } finally q.stop()
  }

  test("proctime hop: each row lands in size/slide windows, finals on idle input") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[PtwEv]
    val agg = Windows.procTimeWindowAgg(
      in.toDF(), Windows.hop(_, "4 seconds", "2 seconds"), Seq("user"),
      Seq(count(lit(1)).as("n")))
      .select($"window.start".as("ws"), $"window.end".as("we"), $"user", $"n")
    val q = agg.writeStream.format("memory").queryName("pthop")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(PtwEv("a", 1.0), PtwEv("a", 2.0))
      q.processAllAvailable()
      // 4s/2s hop: every row belongs to exactly 2 overlapping windows,
      // so with no further data the per-user count across all fired
      // windows must reach 2 rows x 2 windows = 4.
      val fired = pollUntil(60000) {
        q.processAllAvailable()
        val total = spark.sql("SELECT coalesce(sum(n), 0) FROM pthop").collect()(0).getLong(0)
        total >= 4L
      }
      assert(fired, "proctime hop finals did not fire within 60s of idle input")
      val rows = spark.sql("SELECT ws, we, user, n FROM pthop").collect()
      assert(rows.forall(_.getString(2) == "a"), rows.toList.toString)
      assert(rows.map(_.getLong(3)).sum == 4L, rows.toList.toString)
      // bounds: 4 s span, 2 s aligned starts
      val bounds = rows.map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
      assert(bounds.forall { case (s, e) => e - s == 4000 && s % 2000 == 0 },
        bounds.toList.toString)
    } finally q.stop()
  }

  test("proctime session: idle gap closes the session without new data") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[PtwEv]
    val agg = Windows.procTimeWindowAgg(
      in.toDF(), Windows.session(_, "2 seconds"), Seq("user"),
      Seq(count(lit(1)).as("n")))
      .select($"user", $"n")
    val q = agg.writeStream.format("memory").queryName("ptsess")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(PtwEv("a", 1.0), PtwEv("a", 1.0))
      q.processAllAvailable()
      val fired = pollUntil(60000) {
        q.processAllAvailable()
        spark.sql("SELECT * FROM ptsess").count() >= 1
      }
      assert(fired, "proctime session final did not fire within 60s of idle input")
      val rows = spark.sql("SELECT user, n FROM ptsess").collect()
        .map(r => (r.getString(0), r.getLong(1))).toList
      assert(rows.map(_._2).sum == 2L && rows.forall(_._1 == "a"), rows.toString)
    } finally q.stop()
  }
}
