package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured comparison of d02's two plan shapes (r10 verdict #7):
  * the TPC-DS-q5-faithful three-channel-scan union vs a single scan
  * with a derived channel column. Results are identical (the channel
  * predicate partitions lineitem); the question is whether reading
  * the fact once is worth departing from the q5 shape at scale.
  * Prints per-shape medians plus a row-count equality check.
  * Run: sbt "runMain graft.tools.D02Probe [sfDir] [runs]"
  */
object D02Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(single: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.queries.TpcDs.d02Shape(spark, sfDir, single).noop()
      (System.nanoTime() - t0) / 1e9
    }
    // cross-check once: both shapes agree row-for-row
    val a = graft.queries.TpcDs.d02Shape(spark, sfDir, singleScan = false)
    val b = graft.queries.TpcDs.d02Shape(spark, sfDir, singleScan = true)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[d02-probe] shape-diff rows = $diff (must be 0)")
    require(diff == 0, "single-scan variant diverged from the q5 shape")
    Seq(false, true).foreach { single =>
      time(single) // warmup
      val ts = (1 to runs).map(_ => time(single)).sorted
      val med = ts(ts.length / 2)
      println(f"[d02-probe] singleScan=$single%-5s median=$med%.3f s (runs=${ts.map(t => f"$t%.3f").mkString(",")})")
    }
    spark.stop()
  }

  private implicit class NoopWriter(df: org.apache.spark.sql.DataFrame) {
    def noop(): Unit = df.write.format("noop").mode("overwrite").save()
  }
}
