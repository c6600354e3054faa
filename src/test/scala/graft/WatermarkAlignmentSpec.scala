package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp
import graft.streaming.WatermarkAlignment

case class PEv(p: String, ts: Timestamp, v: Double)

/** Per-partition watermark combination with idleness and alignment —
  * the WatermarkStrategy.withIdleness / withWatermarkAlignment analogs
  * (reference: flink-core/.../eventtime/WatermarkStrategy.java:182-210,
  * WatermarksWithIdleness.java). Scenarios mirror the reference's
  * WatermarksWithIdlenessTest / combined-watermark semantics: the
  * combined watermark is the MIN over active partitions, monotone;
  * an idle partition is excluded and rejoins on its next event; a
  * partition running ahead of the combined watermark by more than
  * maxDrift gets pause advice.
  */
class WatermarkAlignmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val HOUR = 3600 * 1000L

  /** Run the status stream into a memory sink, returning rows of
    * (partition, local_wm_ms, is_idle, combined_wm_ms, should_pause)
    * observed AFTER the given actions, keyed by sink row order.
    */
  private def statusQuery(name: String, outOfOrderMs: Long,
      idleTimeoutMs: Long, maxDriftMs: Long) = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[PEv]
    val status = WatermarkAlignment.idleAwareWatermark(
      in.toDF(), "p", "ts", outOfOrderMs, idleTimeoutMs, maxDriftMs)
    val q = status.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    (in, q)
  }

  private def latestTrigger(name: String): Map[String, (Long, Boolean, Long, Boolean)] = {
    // each trigger appends one row per known partition; the LAST
    // status per partition is the current view
    val rows = spark.sql(
      s"SELECT partition, local_wm_ms, is_idle, combined_wm_ms, should_pause FROM $name")
      .collect()
    rows.zipWithIndex
      .groupBy(_._1.getString(0))
      .map { case (p, rs) =>
        val r = rs.maxBy(_._2)._1
        p -> (r.getLong(1), r.getBoolean(2), r.getLong(3), r.getBoolean(4))
      }
  }

  test("combined watermark is the min over partitions' bounded-out-of-orderness watermarks") {
    val (in, q) = statusQuery("wm_min", outOfOrderMs = 60000L,
      idleTimeoutMs = 10 * 60 * 1000L, maxDriftMs = 24 * HOUR)
    try {
      in.addData(
        PEv("a", ts("2024-01-01 10:00:00"), 1.0),
        PEv("a", ts("2024-01-01 09:55:00"), 1.0), // out of order within a
        PEv("b", ts("2024-01-01 09:30:00"), 1.0))
      q.processAllAvailable()
      val s1 = latestTrigger("wm_min")
      val aLocal = ts("2024-01-01 10:00:00").getTime - 60000L
      val bLocal = ts("2024-01-01 09:30:00").getTime - 60000L
      assert(s1("a")._1 == aLocal && s1("b")._1 == bLocal)
      assert(s1("a")._3 == bLocal && s1("b")._3 == bLocal,
        "combined must be the min over active partitions")
      // b advances but stays the laggard → combined follows b, monotone
      in.addData(PEv("b", ts("2024-01-01 09:45:00"), 1.0))
      q.processAllAvailable()
      val s2 = latestTrigger("wm_min")
      assert(s2("b")._3 == ts("2024-01-01 09:45:00").getTime - 60000L)
      assert(s2("b")._3 > s1("b")._3, "combined watermark must advance")
    } finally q.stop()
  }

  test("partition running ahead past maxDrift gets pause advice (alignment)") {
    val (in, q) = statusQuery("wm_align", outOfOrderMs = 0L,
      idleTimeoutMs = 10 * 60 * 1000L, maxDriftMs = 5 * 60 * 1000L)
    try {
      in.addData(
        PEv("fast", ts("2024-01-01 11:00:00"), 1.0),
        PEv("slow", ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      val s = latestTrigger("wm_align")
      assert(s("fast")._4, "1h ahead of the combined min > 5min drift → pause")
      assert(!s("slow")._4, "the laggard IS the combined watermark → never paused")
      // fast holds, slow catches up to within the drift → advice clears
      in.addData(PEv("slow", ts("2024-01-01 10:58:00"), 1.0))
      q.processAllAvailable()
      val s2 = latestTrigger("wm_align")
      assert(!s2("fast")._4 && !s2("slow")._4,
        "drift back inside maxDrift must clear the pause advice")
    } finally q.stop()
  }

  test("idle partition is excluded from the combine and rejoins on resume") {
    val (in, q) = statusQuery("wm_idle", outOfOrderMs = 0L,
      idleTimeoutMs = 700L, maxDriftMs = 24 * HOUR)
    try {
      in.addData(
        PEv("a", ts("2024-01-01 10:00:00"), 1.0),
        PEv("b", ts("2024-01-01 09:00:00"), 1.0))
      q.processAllAvailable()
      assert(latestTrigger("wm_idle")("a")._3 == ts("2024-01-01 09:00:00").getTime)
      // b goes silent past the idleness timeout; only a keeps flowing
      Thread.sleep(1500L)
      in.addData(PEv("a", ts("2024-01-01 10:30:00"), 1.0))
      q.processAllAvailable()
      val s2 = latestTrigger("wm_idle")
      assert(s2("b")._2, "b must be marked idle after the timeout")
      assert(s2("a")._3 == ts("2024-01-01 10:30:00").getTime,
        "idle b must stop holding back the combined watermark")
      // b resumes BEHIND the combined watermark: it rejoins the
      // active set, but the combined watermark never regresses
      in.addData(PEv("b", ts("2024-01-01 10:10:00"), 1.0))
      q.processAllAvailable()
      val s3 = latestTrigger("wm_idle")
      assert(!s3("b")._2, "a fresh event must clear the idle flag")
      assert(s3("b")._3 == ts("2024-01-01 10:30:00").getTime,
        "combined watermark is monotone (never regresses on rejoin)")
    } finally q.stop()
  }

  test("departed partition is evicted from coordinator state after EvictMultiple idle timeouts") {
    val (in, q) = statusQuery("wm_evict", outOfOrderMs = 0L,
      idleTimeoutMs = 300L, maxDriftMs = 24 * HOUR)
    try {
      in.addData(
        PEv("keep", ts("2024-01-01 10:00:00"), 1.0),
        PEv("ephemeral", ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      assert(latestTrigger("wm_evict").keySet == Set("keep", "ephemeral"))
      // ephemeral goes silent past EvictMultiple × idleTimeout; keep flows
      Thread.sleep(WatermarkAlignment.EvictMultiple * 300L + 600L)
      in.addData(PEv("keep", ts("2024-01-01 10:01:00"), 1.0))
      q.processAllAvailable()
      val before = spark.sql("SELECT partition FROM wm_evict").count()
      val last = latestTrigger("wm_evict")
      // the evicted partition is no longer emitted on new triggers
      in.addData(PEv("keep", ts("2024-01-01 10:02:00"), 1.0))
      q.processAllAvailable()
      val newRows = spark.sql("SELECT partition FROM wm_evict").collect()
        .drop(before.toInt).map(_.getString(0)).toSet
      assert(newRows == Set("keep"),
        s"evicted partition must stop appearing in status output, got $newRows")
      // and a re-appearing partition re-registers like a new one
      in.addData(PEv("ephemeral", ts("2024-01-01 10:03:00"), 1.0))
      q.processAllAvailable()
      assert(latestTrigger("wm_evict").contains("ephemeral"))
    } finally q.stop()
  }

  test("should_pause wired end-to-end: a feeder honoring the advice keeps the fast partition's lead bounded") {
    // The reference wires alignment INTO the source (FLIP-182: the
    // coordinator pauses a split whose watermark runs ahead of the
    // combined min by more than maxDrift). Spark has no per-partition
    // pause hook, so our should_pause is advice — this scenario proves
    // the advice COMPOSES into the same behavior: a foreachBatch
    // consumer feeds the latest advice back to a rate-limited feeder
    // (the KafkaConsumer.pause role), which BUFFERS the fast
    // partition's next chunk instead of emitting it while paused.
    //
    // Bound under test: with fast advancing 2000 ms/chunk and slow
    // 500 ms/chunk, an unaligned feeder's lead grows ~1500 ms/round
    // (~60 s over the run); an aligned feeder can overshoot by at most
    // ONE chunk past maxDrift (advice arrives after the emit), so the
    // lead must stay <= maxDrift + chunkAdvance for the whole run.
    val maxDrift = 5000L
    val fastStep = 2000L
    val slowStep = 500L
    implicit val sc = spark.sqlContext
    val in = MemoryStream[PEv]
    val status = WatermarkAlignment.idleAwareWatermark(
      in.toDF(), "p", "ts", outOfOrderMs = 0L,
      idleTimeoutMs = 10 * 60 * 1000L, maxDriftMs = maxDrift)
    // (local_wm_ms, combined_wm_ms, should_pause) per partition,
    // maintained by the stream itself — the advice feedback channel
    val advice = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Boolean)]()
    val q = status.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach { r =>
          advice.put(r.getString(0), (r.getLong(1), r.getLong(3), r.getBoolean(5)))
        }
      }.start()
    try {
      val base = ts("2024-01-01 10:00:00").getTime
      var fastTs = base; var slowTs = base
      var paused = 0; var emittedFast = 0; var maxLead = Long.MinValue
      var sawResumeAfterPause = false; var wasPaused = false
      for (_ <- 1 to 40) {
        val pauseFast = Option(advice.get("fast")).exists(_._3)
        if (pauseFast) { paused += 1; wasPaused = true }
        else {
          if (wasPaused) sawResumeAfterPause = true
          fastTs += fastStep; emittedFast += 1
          in.addData(PEv("fast", new Timestamp(fastTs), 1.0))
        }
        slowTs += slowStep
        in.addData(PEv("slow", new Timestamp(slowTs), 1.0))
        q.processAllAvailable()
        val f = advice.get("fast")
        if (f != null) maxLead = math.max(maxLead, f._1 - f._2)
      }
      assert(paused >= 3, s"alignment advice must actually fire (paused $paused rounds)")
      assert(sawResumeAfterPause, "feeder must resume once drift shrinks back inside maxDrift")
      assert(emittedFast >= 10, s"fast partition must keep making progress (emitted $emittedFast chunks)")
      assert(maxLead <= maxDrift + fastStep,
        s"aligned lead must stay <= maxDrift + one chunk ($maxLead vs ${maxDrift + fastStep}); " +
          "an unaligned feeder would have reached ~60000 ms here")
    } finally q.stop()
  }
}
