package graft.tools

import org.apache.spark.sql.SparkSession

/** CTAS-over-a-FACT-table scale probe (r17 directive #6): q95's CTAS
  * shape joins dimension tables, which MakeScale holds fixed, so its
  * flat sf ratio says nothing about the axis that matters — the fact-
  * side bytes the CTAS write path moves. This probe times one CTAS
  * from lineitem (pushed shipdate filter, column pruning, projection
  * arithmetic, parquet write — the INSERT-path plan with CTAS registry
  * bookkeeping on top) at the given SF dir; run 5× fresh-JVM per SF in
  * matched quiet windows and put the medians in BASELINE.md. Prints
  * the same spark-side calibration job as graft.Bench so windows are
  * comparable.
  *
  *   sbt "runMain graft.tools.CtasProbe <sfDir>"
  */
object CtasProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timeType.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val calib = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 32)
        .selectExpr("bit_xor(xxhash64(id)) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }.sorted.apply(1)
    val env = graft.sql.SqlEnv(spark).registerTestdata(sfDir)
    val sink = java.nio.file.Files.createTempDirectory("graft_ctas_probe").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$sink/t"))
    val t0 = System.nanoTime()
    env.executeSql(
      s"""CREATE TABLE ctas_li_probe
         |WITH ('connector' = 'filesystem', 'path' = '$sink/t',
         |      'format' = 'parquet')
         |AS SELECT l_orderkey, l_partkey, l_quantity,
         |          CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
         |            AS net_cents,
         |          l_shipdate
         |   FROM lineitem WHERE l_shipdate >= DATE '1994-01-01'""".stripMargin)
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = env.executeSql("SELECT count(*) AS c FROM ctas_li_probe")
      .collect()(0).getLong(0)
    println(f"[ctas-probe] sfDir=$sfDir sec=$sec%.3f rows=$rows calib_spark32_sec=$calib%.4f")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sink))
    spark.stop()
  }
}
