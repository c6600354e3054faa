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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses to
      // read as a timestamp; read the raw int64 nanos and truncate to
      // micros (the data is µs-granular, so this is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
