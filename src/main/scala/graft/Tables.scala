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
      // The driver has shipped events.ts under three parquet physical
      // types across fixture generations: TIMESTAMP(NANOS) (readable only
      // as int64 behind nanosAsLong), TIMESTAMP(MICROS, adjustedToUTC=0)
      // (reads as TIMESTAMP_NTZ), and plain TIMESTAMP. Dispatch on the
      // loaded schema so a fixture regeneration can't break every events
      // query at analysis time again.
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => // int64 nanos; µs-granular data, truncation lossless
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => // session TZ is UTC, so values match the oracle
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType => raw
        case other =>
          throw new IllegalStateException(
            s"events.ts has unexpected type $other — adapt Tables.load")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
