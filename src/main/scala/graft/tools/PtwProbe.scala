package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Windows

/** One-shot probe for the proctime-window mechanism: does the `!__hb`
  * filter stay ABOVE the EventTimeWatermark node (heartbeat rows must
  * reach the watermark stats), and does the watermark actually advance
  * on heartbeat rows alone?
  */
object PtwProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val data = spark.readStream.format("rate")
      .option("rowsPerSecond", 1).option("numPartitions", 1).load()
      .filter(col("value") < 3) // 3 rows then idle
      .select(lit("a").as("user"), col("value").cast("double").as("v"))
    val agg = Windows.procTimeWindowAgg(
      data, Windows.tumble(_, "2 seconds"), Seq("user"),
      Seq(count(lit(1)).as("n")))
    println("=== analyzed logical ===")
    println(agg.queryExecution.analyzed.treeString)
    val q = agg.writeStream.format("memory").queryName("ptwprobe")
      .outputMode(OutputMode.Append).start()
    Thread.sleep(12000)
    println("=== last optimized logical ===")
    val se = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery
    println(se.lastExecution.optimizedPlan.treeString)
    println("=== optimized plan ===")
    println(q.explain())
    val p = q.lastProgress
    println(s"=== watermark: ${if (p != null) p.eventTime else "null"}")
    println(s"=== output rows: ${spark.sql("SELECT * FROM ptwprobe").count()}")
    spark.sql("SELECT * FROM ptwprobe").show(20, false)
    q.stop(); spark.stop()
  }
}
