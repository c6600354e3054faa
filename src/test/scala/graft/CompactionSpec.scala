package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Small-file compaction mechanics: file count shrinks to the
  * byte-derived target, content survives byte-for-byte, clustering
  * sorts within output files.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("compact shrinks file count and preserves content") {
    val base = Files.createTempDirectory("graft_compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    val src = Tables.load(spark, TestSpark.sfDir, "lineitem")
    src.repartition(32).write.mode("overwrite").parquet(in)
    assert(ops.Compact.partFileCount(spark, in) == 32)

    val n = ops.Compact.compact(spark, in, out, targetBytes = 8L << 20)
    assert(ops.Compact.partFileCount(spark, out) == n)
    assert(n < 32 && n >= 1)

    // content preserved: same rows, same checksum-ish aggregate
    val a = spark.read.parquet(out)
    assert(a.count() == src.count())
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(hash(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))).as("s")).collect()(0).getLong(0)
    assert(sig(a) == sig(src))
  }

  test("clusterBy sorts within each output file") {
    val base = Files.createTempDirectory("graft_compact2").toString
    val in = s"$base/in"; val out = s"$base/out"
    Tables.load(spark, TestSpark.sfDir, "orders").repartition(16)
      .write.mode("overwrite").parquet(in)
    ops.Compact.compact(spark, in, out, targetBytes = 1L << 20,
      clusterBy = Seq("o_orderdate"))
    // within every parquet file, o_orderdate must be non-decreasing
    val bad = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("o_orderdate"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev").isNotNull && col("o_orderdate") < col("prev"))
      .count()
    assert(bad == 0)
  }
}
