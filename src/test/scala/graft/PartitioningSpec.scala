package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale mechanics: partition pruning and bucketed co-located joins —
  * the physical-design levers a 100 TB deployment relies on (SURVEY.md
  * §2.1 pushdown abilities, §4.2 hash partitioning).
  */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitionBy write + partition pruning on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    val e = Tables.load(spark, TestSpark.sfDir, "events")
      .withColumn("day", to_date(col("ts")))
    e.write.partitionBy("day").mode("overwrite").parquet(dir)

    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    // pruned scan reads only the one day-partition
    val expected = e.filter(col("day") === lit("2024-01-05").cast("date")).count()
    assert(read.count() == expected)
  }

  test("bucketed tables join without a shuffle") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // bucketed-on-key join: no Exchange on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
      assert(joined.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
