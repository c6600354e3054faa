package graft.tools
import org.apache.spark.sql.SparkSession
object RuntimePlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println("===== FINAL ADAPTIVE PLAN " + name + " =====")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
