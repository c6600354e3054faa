package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink shims mapping the reference's connector surface
  * (SURVEY.md §2.1) onto Spark formats:
  *
  *  - filesystem (batch+streaming) → `spark.read/readStream.parquet/csv/json`
  *  - datagen → `rate` source + column expressions (reference:
  *    flink-table-api-java-bridge/.../datagen/table/DataGenTableSourceFactory.java)
  *  - print sink → `format("console")`, blackhole → `format("noop")`
  *  - kafka/jdbc → Spark's built-in `format("kafka")`/`format("jdbc")`
  *    (no brokers/DBs in this container; not wrapped further)
  */
object Sources {

  /** DataGen-style streaming source: `rowsPerSecond` synthetic rows/s,
    * one column per (name → expression over `value`/`timestamp`).
    * Deterministic in `value` (a monotonically increasing bigint), so
    * generated columns derive from it exactly like DataGen's
    * sequence/random fields derive from the generator seed.
    */
  def datagen(spark: SparkSession, rowsPerSecond: Int,
              fields: Map[String, Column]): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    fields.foldLeft(base) { case (df, (name, expr)) => df.withColumn(name, expr) }
  }

  /** Bounded batch variant of datagen (`spark.range` + exprs). */
  def datagenBatch(spark: SparkSession, rows: Long,
                   fields: Map[String, Column]): DataFrame = {
    val base = spark.range(rows).withColumnRenamed("id", "value")
    fields.foldLeft(base) { case (df, (name, expr)) => df.withColumn(name, expr) }
  }

  /** Streaming file source over a directory of parquet (the reference's
    * filesystem streaming source with partition watching).
    */
  def parquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Print sink ≡ reference Print connector. */
  def toConsole(df: DataFrame) = df.writeStream.format("console")

  /** BlackHole sink ≡ reference blackhole connector (benchmarking). */
  def toNoop(df: DataFrame) = df.writeStream.format("noop")
}
