package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-assignment helpers mirroring the reference's window TVFs
  * (SURVEY.md §2.9: SqlTumbleTableFunction / SqlHopTableFunction /
  * SqlCumulateTableFunction; slicing engine
  * flink-table/flink-table-runtime/.../window/slicing/SliceAssigners.java).
  *
  * TUMBLE/HOP/SESSION map 1:1 onto Spark's `window`/`session_window`.
  * CUMULATE (expanding windows that share a start and grow by `step`
  * until `maxSize`) has no Spark builtin: we assign it by exploding
  * each row into the (maxSize/step) windows that contain it — a
  * stateless, perfectly parallel row expansion, so the downstream
  * aggregation is an ordinary shuffle-partitioned groupBy at any scale.
  */
object Windows {

  def tumble(ts: Column, size: String): Column = window(ts, size)

  def hop(ts: Column, size: String, slide: String): Column = window(ts, size, slide)

  def session(ts: Column, gap: String): Column = session_window(ts, gap)

  /** Assign CUMULATE windows: returns the input with a `window`
    * struct column (start/end); one input row appears once per
    * covering window. Semantics per Flink's CumulativeWindowAssigner:
    * for max-size span [W, W+max) (epoch-aligned), windows are
    * [W, W+step), [W, W+2·step), … [W, W+max); a row at time t lands
    * in every window whose end is > t.
    *
    * `step` must divide `maxSize`; both are seconds-granularity here.
    */
  def cumulate(df: DataFrame, ts: Column, stepSec: Long, maxSec: Long): DataFrame = {
    require(maxSec % stepSec == 0, "cumulate: step must divide maxSize")
    val n = (maxSec / stepSec).toInt
    val epoch = ts.cast("long")
    val spanStart = (epoch - pmod(epoch, lit(maxSec))).as("span_start")
    df.withColumn("span_start", spanStart)
      .withColumn("w_end_s",
        explode(sequence(
          // first window end strictly after t: span + step*ceil((t-span+1)/step)
          col("span_start") + (floor((epoch - col("span_start")) / lit(stepSec)) + 1) * lit(stepSec),
          col("span_start") + lit(maxSec),
          lit(stepSec))))
      .withColumn("window", struct(
        timestamp_seconds(col("span_start")).as("start"),
        timestamp_seconds(col("w_end_s")).as("end")))
      .drop("span_start", "w_end_s")
  }

  /** Window rank (Top-N per window) — the reference's
    * StreamExecWindowRank (flink-table/flink-table-planner/.../exec/
    * stream/StreamExecWindowRank.java; runtime builder
    * RT/rank/window/WindowRankOperatorBuilder.java:56): rank rows
    * within (tumbling window × partition keys) and keep the top `n`.
    *
    * Adds a `window` struct column and a `rank_no` column. The rank
    * partition includes the window, so Catalyst plans a pre-shuffle
    * WindowGroupLimit: no partition ever buffers more than
    * n × |keys-per-window| rows — window state is bounded exactly like
    * Flink purges rank state at window end.
    */
  def windowRank(df: DataFrame, ts: Column, size: String,
                 keys: Seq[String], order: Seq[Column], n: Int): DataFrame = {
    // integral time columns are epoch MILLIS — the package-wide
    // convention (windowRankStreaming, keepLast, watermark alignment);
    // r19 found the streaming op reading Long as SECONDS, so the batch
    // op states the convention explicitly and q100 oracle-gates it
    val tsNorm = df.select(ts).schema.head.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType =>
        timestamp_millis(ts.cast("long"))
      case _ => ts
    }
    val withW = df.withColumn("window", window(tsNorm, size))
    val parts = col("window") +: keys.map(col)
    val w = Window.partitionBy(parts: _*).orderBy(order: _*)
    withW.withColumn("rank_no", row_number().over(w)).filter(col("rank_no") <= n)
  }

  /** Count windows (batch) — the reference's countWindow
    * (flink-streaming-java/.../datastream/KeyedStream.java:696): rows
    * of a key, ordered by `orderCols`, are chunked into consecutive
    * groups of `size`. Adds `window_seq` (0-based window index per
    * key) and `pos_in_window`. One shuffle on the keys; the rank is a
    * plain row_number, so WindowGroupLimit/one-pass ranking applies.
    */
  def countTumble(df: DataFrame, keys: Seq[String],
                  orderCols: Seq[Column], size: Int): DataFrame = {
    require(size > 0)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w) - 1)
      .withColumn("window_seq", (col("__rn") / size).cast("long"))
      .withColumn("pos_in_window", (col("__rn") % size).cast("int"))
      .drop("__rn")
  }

  /** Window deduplicate — the reference's window-dedup specialization
    * (RT/deduplicate/window/RowTimeWindowDeduplicateOperatorBuilder
    * .java:51): keep the first (or last) row per key WITHIN each
    * tumbling window, ordered by event time. Window rank with n=1 and
    * the time column as the order — kept as its own operator because
    * the reference treats it as one (better state layout there; same
    * bounded WindowGroupLimit plan here).
    */
  def windowDeduplicate(df: DataFrame, ts: Column, size: String,
                        keys: Seq[String], keepFirst: Boolean = true,
                        tieBreak: Seq[Column] = Nil): DataFrame = {
    val ord = (if (keepFirst) ts.asc else ts.desc) +: tieBreak
    windowRank(df, ts, size, keys, ord, 1).drop("rank_no")
  }

  /** PROCESSING-TIME windowed aggregation (streaming) — the
    * reference's proctime group windows (`GROUP BY TUMBLE(proctime(),
    * …)`; planner StreamExecGroupWindowAggregate over a PROCTIME
    * attribute, runtime ProcessingTimeTriggers in
    * flink-streaming-java/.../windowing/triggers/
    * ProcessingTimeTrigger.java — fire purely on wall-clock, no
    * watermark involved). This closes the README "window operators
    * here are event-time" narrowing for the windowed-agg surface.
    *
    * Spark's stateful aggregation only understands event-time
    * watermarks, so proctime windows ride them: each data row is
    * stamped with the per-record `proctime()` expression at ingestion
    * (the reference's per-record proctime, ProcTimeSpec pins the
    * distinction from per-batch current_timestamp), and the stamp
    * column carries a 0-delay watermark. Wall-clock keeps moving when
    * the data stream idles because a metadata-scale `rate`-source
    * heartbeat (a few slim rows/second, one source, never shuffled
    * wide) is unioned in ABOVE the watermark node and filtered out
    * immediately BELOW it: the heartbeat rows feed the watermark's
    * max-event-time stats but never reach the aggregation, so a
    * window's final fires within ~one trigger + one heartbeat tick of
    * its wall-clock end even with zero new data — exactly
    * ProcessingTimeTrigger.onProcessingTime. Append-mode finals, like
    * the reference's proctime windows (no retractions to emit).
    *
    * Same replay caveat as the reference: proctime is wall-clock, so
    * a recovered/re-executed micro-batch re-stamps rows at recovery
    * time — Flink's proctime windows make exactly the same
    * non-determinism trade (their docs call proctime results
    * non-reproducible by design).
    *
    * `assign` maps the proctime column to a window struct — pass
    * `Windows.tumble(_, "10 seconds")`, `Windows.hop(_, size, slide)`
    * or `Windows.session(_, gap)`; all three of the reference's
    * proctime window shapes ride the same mechanism.
    */
  def procTimeWindowAgg(
      df: DataFrame,
      assign: Column => Column,
      keys: Seq[String],
      aggs: Seq[Column],
      heartbeatRowsPerSecond: Int = 4): DataFrame =
    procTimeChannel(df, heartbeatRowsPerSecond)
      .groupBy(assign(col("__proctime")) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** The proctime channel shared by [[procTimeWindowAgg]] and the
    * proctime OVER aggregations ([[StatefulOps.procTimeBoundedRangeAgg]]
    * / [[StatefulOps.procTimeBoundedRowsAgg]]): stamps each data row
    * with the per-record `proctime()` expression in a `__proctime`
    * column carrying a 0-delay watermark, and unions in a
    * metadata-scale `rate`-source heartbeat so wall-clock keeps flowing
    * into the watermark when the data stream idles. Returns the data
    * rows only (original columns + `__proctime`); the heartbeat rows
    * feed the watermark stats and die on the filter below.
    */
  private[graft] def procTimeChannel(
      df: DataFrame, heartbeatRowsPerSecond: Int = 4): DataFrame = {
    require(!df.columns.contains("__proctime") && !df.columns.contains("__hb"),
      "procTimeChannel: input must not already carry __proctime/__hb")
    val spark = df.sparkSession
    val stamped = df
      .withColumn("__proctime", graft.functions.proctime.proctime())
      .withColumn("__hb", lit(false))
    val hb0 = spark.readStream.format("rate")
      .option("rowsPerSecond", heartbeatRowsPerSecond).load()
      .select(col("timestamp").as("__proctime"), lit(true).as("__hb"))
    val hb = df.schema.fields.foldLeft(hb0) { (acc, f) =>
      acc.withColumn(f.name, lit(null).cast(f.dataType))
    }
    stamped.unionByName(hb)
      .withWatermark("__proctime", "0 seconds")
      // Heartbeat rows advance the watermark (stats are collected at
      // the EventTimeWatermark node, which must sit BELOW this filter)
      // but contribute nothing downstream. A plain `!__hb`
      // predicate does NOT survive here: PushPredicateThroughNonJoin
      // pushes any conjunct that doesn't reference the watermark
      // column through EventTimeWatermark and the Union, where the
      // heartbeat branch constant-folds it to `Filter false` — killing
      // the heartbeats before the stats node and freezing the
      // watermark at the last data row (probed; ProcTimeWindowSpec's
      // no-further-data test pins the fix). The rule keeps predicates
      // that reference the watermark attribute, so the heartbeat test
      // rides a single disjunction with an unsatisfiable-but-runtime
      // __proctime comparison: semantically identical to `!__hb`,
      // structurally unpushable.
      .filter(!col("__hb") ||
        col("__proctime") > lit("9999-12-31 00:00:00").cast("timestamp"))
      .drop("__hb")
  }
}
