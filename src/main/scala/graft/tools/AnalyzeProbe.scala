package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot probe of Spark 4.1's ANALYZE TABLE surface — run before
  * wiring FLIP-240's `ANALYZE TABLE ... COMPUTE STATISTICS [FOR
  * COLUMNS]` through the graft dialect: which target kinds (catalog
  * table, plain temp view, CACHED temp view) does the native command
  * accept, and where do the computed stats become visible (DESC
  * EXTENDED, optimizedPlan.stats)?
  */
object AnalyzeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_an_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tryS(label: String)(body: => String): Unit =
      try println(s"[anprobe] $label OK ${body}")
      catch { case e: Throwable =>
        println(s"[anprobe] $label FAIL ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.take(2).mkString(" | "))
      }
    spark.range(0, 1000).selectExpr("id", "id % 7 AS k", "cast(id AS double) AS v")
      .write.mode("overwrite").parquet("/tmp/graft_anprobe_p")

    // 1. managed catalog table
    spark.sql("DROP TABLE IF EXISTS an_cat")
    spark.sql("CREATE TABLE an_cat USING parquet AS SELECT * FROM parquet.`/tmp/graft_anprobe_p`")
    tryS("catalog_table_stats") {
      spark.sql("ANALYZE TABLE an_cat COMPUTE STATISTICS FOR COLUMNS k, v").collect()
      val desc = spark.sql("DESC EXTENDED an_cat").collect()
        .map(r => r.getString(0) + "=" + r.getString(1))
        .filter(s => s.startsWith("Statistics"))
      val col = spark.sql("DESC EXTENDED an_cat k").collect()
        .map(r => r.getString(0) + "=" + r.getString(1)).mkString(",")
      s"desc=${desc.mkString(";")} col[$col]"
    }

    // 2. plain (uncached) temp view — the graft DDL table shape
    spark.read.parquet("/tmp/graft_anprobe_p").createOrReplaceTempView("an_tv")
    tryS("temp_view_uncached") {
      spark.sql("ANALYZE TABLE an_tv COMPUTE STATISTICS").collect(); "accepted"
    }
    tryS("temp_view_uncached_cols") {
      spark.sql("ANALYZE TABLE an_tv COMPUTE STATISTICS FOR COLUMNS k").collect(); "accepted"
    }

    // 3. cached temp view
    tryS("temp_view_cached") {
      spark.catalog.cacheTable("an_tv")
      spark.sql("ANALYZE TABLE an_tv COMPUTE STATISTICS FOR COLUMNS k, v").collect()
      val st = spark.table("an_tv").queryExecution.optimizedPlan.stats
      s"rowCount=${st.rowCount} sizeInBytes=${st.sizeInBytes} " +
        s"attrStats=${st.attributeStats.map { case (a, s) =>
          a.name + "->" + s.distinctCount }.mkString(",")}"
    }

    // 4. FOR ALL COLUMNS spelling + NOSCAN
    tryS("for_all_columns") {
      spark.sql("ANALYZE TABLE an_cat COMPUTE STATISTICS FOR ALL COLUMNS").collect(); "accepted"
    }
    tryS("noscan") {
      spark.sql("ANALYZE TABLE an_cat COMPUTE STATISTICS NOSCAN").collect(); "accepted"
    }
    spark.stop()
  }
}
