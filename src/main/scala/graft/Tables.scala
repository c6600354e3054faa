package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Mirrors the reference's catalog surface (Flink `TableEnvironment`
  * registered tables, /root/reference/flink-table/flink-table-api-java/
  * src/main/java/org/apache/flink/table/api/internal/TableEnvironmentImpl.java)
  * as plain parquet reads — Catalyst handles filter/projection pushdown
  * into the scan, so every query should read only the columns/rows it
  * needs (verify via `.explain`: PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
