package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
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
}
