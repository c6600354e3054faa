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

  test("late-fire window state (open windows + final flags) survives a restart") {
    implicit val sc = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_latefire_ckpt").toString
    val in = MemoryStream[Ev]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()

    def start() = StatefulOps.lateFireWindowAgg(
        in.toDF().withWatermark("ts", "0 seconds"),
        Seq("user"), "ts", "value", windowSec = 60L, latenessMs = 180000L)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((r.getLong(r.fieldIndex("window_start")),
          r.getLong(r.fieldIndex("cnt")), r.getString(r.fieldIndex("emit_kind")))))
      }
      .start()

    val w1000 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    // before the restart: one open window with one row, nothing fired
    val q1 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 10:00:10"), "u1", "a", 1.0))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.isEmpty, "window still open — nothing fires before restart")

    // after the restart: the RESTORED open window must absorb a second
    // row and fire its final with BOTH rows once the watermark passes
    val q2 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 10:00:20"), "u1", "a", 2.0))
    q2.processAllAvailable()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 10:02:00"), "u1", "a", 3.0))
    q2.processAllAvailable()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 10:03:00"), "u1", "a", 4.0))
    q2.processAllAvailable()
    q2.stop()
    assert(seen.toArray.map(_.asInstanceOf[(Long, Long, String)]).toList
        .contains((w1000, 2L, "final")),
      s"final must carry the pre-restart row + the post-restart row: ${seen.toArray.toList}")
  }

  test("retract group agg accumulator (cnt, sum) survives a restart") {
    implicit val sc = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_retract_ckpt").toString
    val in = MemoryStream[Chg]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Double)]()

    def start() = graft.streaming.Changelog.retractGroupAgg(in.toDF(), Seq("k"), "price")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((r.getString(r.fieldIndex("k")),
          r.getLong(r.fieldIndex("cnt")), r.getDouble(r.fieldIndex("sum_val")))))
      }
      .start()

    // before the restart: two keys accumulated
    val q1 = start()
    in.addData(Chg("+I", "a", 5.0), Chg("+I", "a", 2.0), Chg("+I", "b", 3.0))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.toArray.map(_.asInstanceOf[(String, Long, Double)]).toSet ==
      Set(("a", 2L, 7.0), ("b", 1L, 3.0)))

    // after the restart: a -U/+U pair for 'a' must net against the
    // RESTORED (2, 7.0) accumulator — exactly what an uninterrupted
    // run would produce — not against empty state
    val q2 = start()
    in.addData(Chg("-U", "a", 2.0), Chg("+U", "a", 9.0))
    q2.processAllAvailable()
    q2.stop()
    val last = seen.toArray.map(_.asInstanceOf[(String, Long, Double)]).last
    assert(last == (("a", 2L, 14.0)),
      s"post-restart retraction must net against restored state: ${seen.toArray.toList}")
  }

  test("streaming TopN state (the per-key top rows) survives a restart") {
    implicit val sc = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_topn_ckpt").toString
    val in = MemoryStream[Ev]
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Double]]()

    def start() = StatefulOps.topNStreaming(in.toDF(), Seq("tpe"), "value",
        descending = true, n = 2)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val vals = b.collect().map(r => r.getDouble(r.fieldIndex("value"))).toSeq
        if (vals.nonEmpty) batches.add(vals)
        ()
      }
      .start()

    val q1 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:00:01"), "u1", "a", 10.0),
               Ev(Timestamp.valueOf("2024-01-01 00:00:02"), "u2", "a", 20.0),
               Ev(Timestamp.valueOf("2024-01-01 00:00:03"), "u3", "a", 5.0))
    q1.processAllAvailable()
    q1.stop()
    assert(batches.toArray.last.asInstanceOf[Seq[Double]].sorted == Seq(10.0, 20.0))

    // after the restart: 15 displaces 10 only if the restored state
    // still holds [20, 10] — an empty-state run would emit [15] alone
    val q2 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:00:04"), "u4", "a", 15.0))
    q2.processAllAvailable()
    q2.stop()
    assert(batches.toArray.last.asInstanceOf[Seq[Double]].sorted == Seq(15.0, 20.0),
      s"post-restart top-2 must merge against restored rows: ${batches.toArray.toList}")
  }

  test("CEP partial-match buffer and skip cursor survive a restart") {
    implicit val sc = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_cep_ckpt").toString
    val in = MemoryStream[Ev]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    val steps = Seq(
      graft.streaming.Cep.Step.once("a", (r: org.apache.spark.sql.Row) =>
        r.getString(r.fieldIndex("tpe")) == "A"),
      graft.streaming.Cep.Step.oneOrMore("b", (r: org.apache.spark.sql.Row) =>
        r.getString(r.fieldIndex("tpe")) == "B"))

    def start() = graft.streaming.Cep.matchPatternStreaming(
        in.toDF().withWatermark("ts", "1 minute")
          .withColumn("eid", org.apache.spark.sql.functions.concat_ws(
            "-", org.apache.spark.sql.functions.col("user"),
            org.apache.spark.sql.functions.col("ts").cast("long"))),
        "user", "ts", "eid", steps, withinSec = 600L)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((r.getString(r.fieldIndex("a_first_id")),
          r.getInt(r.fieldIndex("b_count")))))
      }
      .start()

    // before the restart: A + one B buffered, anchor not yet
    // watermark-decidable — the partial match lives only in state
    val q1 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:00:00"), "u1", "A", 1.0),
               Ev(Timestamp.valueOf("2024-01-01 00:01:00"), "u1", "B", 1.0))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.isEmpty, "anchor undecided — nothing fires before restart")

    // after the restart: a second B extends the RESTORED buffer; pushing
    // the watermark past the anchor's deadline must fire ONE match with
    // b_count = 2 — an empty-state run would see only the post-restart B
    val q2 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:02:00"), "u1", "B", 1.0))
    q2.processAllAvailable()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:30:00"), "u1", "X", 0.0))
    q2.processAllAvailable()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:31:00"), "u1", "X", 0.0))
    q2.processAllAvailable()
    q2.stop()
    val id1 = s"u1-${Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000}"
    val matches = seen.toArray.map(_.asInstanceOf[(String, Int)]).toList
    assert(matches == List((id1, 2)),
      s"restored buffer must contribute the pre-restart A and B: $matches")

    // and the restored-then-consumed skip cursor stays coherent: a fresh
    // A+B after the match must produce a second, independent match
    val q3 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:40:00"), "u1", "A", 1.0),
               Ev(Timestamp.valueOf("2024-01-01 00:41:00"), "u1", "B", 1.0))
    q3.processAllAvailable()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 01:10:00"), "u1", "X", 0.0))
    q3.processAllAvailable()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 01:11:00"), "u1", "X", 0.0))
    q3.processAllAvailable()
    q3.stop()
    val id2 = s"u1-${Timestamp.valueOf("2024-01-01 00:40:00").getTime / 1000}"
    val all = seen.toArray.map(_.asInstanceOf[(String, Int)]).toList
    assert(all == List((id1, 2), (id2, 1)),
      s"cursor restored from the second checkpoint must allow the new anchor: $all")
  }

  test("near-dup bucket-owner state survives a restart") {
    implicit val sc = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_neardup_ckpt").toString
    val in = MemoryStream[Doc]
    val tags = new java.util.concurrent.ConcurrentHashMap[Long, (Boolean, Option[Long])]()

    def start() = graft.streaming.NearDupStreaming.nearDupTagStreaming(
        in.toDF(), "doc_id", "text", checkpoint = Some(ckpt))(
      b => b.collect().foreach { r =>
        tags.put(r.getLong(0), (r.getBoolean(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
      })

    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val q1 = start()
    in.addData(Doc(1L, base))
    q1.processAllAvailable()
    q1.stop()
    assert(tags.get(1L) == ((false, None)))

    // after the restart: an exact copy must be flagged against doc 1 —
    // possible only if the (band, bucket) -> owner state was restored
    val q2 = start()
    in.addData(Doc(2L, base),
      Doc(3L, "completely different words about spark and flink engines processing streams"))
    q2.processAllAvailable()
    q2.stop()
    assert(tags.get(2L) == ((true, Some(1L))),
      s"restored bucket owners must flag the post-restart copy: ${tags}")
    assert(tags.get(3L) == ((false, None)))
  }

  test("timer-driven late-fire: window state AND armed timers survive a restart") {
    // Distinct from the NoTimeout late-fire scenario above: the
    // transformWithState op keeps an EVENT-TIME TIMER armed per key, and
    // recovery must restore both the window accumulators and the timer
    // registry — the restored timer of an idle key must fire its final
    // post-restart from another key's watermark advance alone (the
    // reference restores WindowOperator state and its EventTimeTrigger
    // timers together from a checkpoint).
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("graft_lftimer_ckpt").toString
    val in = MemoryStream[Ev]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Double, String)]()

    def start() = StatefulOps.lateFireWindowAggTimers(
        in.toDF(), keys = Seq("user"), tsCol = "ts", valueCol = "value",
        windowSec = 60L, latenessMs = 180000L)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add((r.getString(r.fieldIndex("user")),
          r.getLong(r.fieldIndex("window_start")), r.getLong(r.fieldIndex("cnt")),
          r.getDouble(r.fieldIndex("sum_val")), r.getString(r.fieldIndex("emit_kind")))))
      }
      .start()

    val w1000 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    try {
      // before the restart: 'a' has one open window + one armed timer
      val q1 = start()
      in.addData(Ev(Timestamp.valueOf("2024-01-01 10:00:10"), "a", "x", 1.0))
      q1.processAllAvailable()
      q1.stop()
      assert(seen.isEmpty, "window open, timer armed — nothing fires before restart")

      // after the restart: ONLY 'b' produces data; 'a' stays idle, so its
      // final can come only from the restored timer firing on the restored
      // window state once b's rows push the watermark past 10:01.
      val q2 = start()
      in.addData(Ev(Timestamp.valueOf("2024-01-01 10:02:00"), "b", "x", 0.0))
      q2.processAllAvailable() // wm -> 10:00:10 (restored) … then 10:02
      in.addData(Ev(Timestamp.valueOf("2024-01-01 10:03:00"), "b", "x", 0.0))
      q2.processAllAvailable()
      q2.stop()
      val aRows = seen.toArray.map(_.asInstanceOf[(String, Long, Long, Double, String)])
        .filter(_._1 == "a").map(r => (r._2, r._3, r._4, r._5)).toList
      assert(aRows == List((w1000, 1L, 1.0, "final")),
        s"idle key 'a' must final-fire from its RESTORED timer + state: ${seen.toArray.toList}")
      assert(seen.toArray.map(_.asInstanceOf[(String, Long, Long, Double, String)])
          .forall(_._1 != null),
        s"sentinel rows must never surface post-restart: ${seen.toArray.toList}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("temporal sort pending buffer survives a restart") {
    // StreamExecTemporalSort's not-yet-releasable rows live in state; a
    // restart must restore the buffer so rows held back pre-restart are
    // re-emitted in event-time order (not lost) once the watermark
    // passes them.
    implicit val sc = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_tsort_ckpt").toString
    val in = MemoryStream[Ev]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    def start() = StatefulOps.temporalSortStreaming(
        in.toDF().withWatermark("ts", "0 seconds"), "ts", tieBreak = Seq("tpe"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add(r.getString(r.fieldIndex("tpe"))))
      }
      .start()

    // before the restart: three rows arrive OUT of event-time order; the
    // watermark (max ts so far = c's 00:03) releases nothing yet in this
    // batch (wm advances AFTER the batch), so all three are buffered.
    val q1 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:03:00"), "u", "c", 1.0),
               Ev(Timestamp.valueOf("2024-01-01 00:01:00"), "u", "a", 1.0),
               Ev(Timestamp.valueOf("2024-01-01 00:02:00"), "u", "b", 1.0))
    q1.processAllAvailable()
    q1.stop()

    // after the restart: a later row pushes the watermark past the
    // restored buffer; the three pre-restart rows must emerge first,
    // sorted a < b < c — impossible if the buffer died with q1.
    val q2 = start()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:04:00"), "u", "d", 1.0))
    q2.processAllAvailable()
    in.addData(Ev(Timestamp.valueOf("2024-01-01 00:05:00"), "u", "e", 1.0))
    q2.processAllAvailable()
    q2.stop()
    val got = seen.toArray.map(_.asInstanceOf[String]).toList
    assert(got.take(3) == List("a", "b", "c"),
      s"restored buffer must re-emit pre-restart rows in event-time order: $got")
  }
}
