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
    val withW = df.withColumn("window", window(ts, size))
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
}
