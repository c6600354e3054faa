package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.proctime.proctime

/** Per-record PROCTIME — the behaviors that distinguish it from
  * Spark's per-batch `current_timestamp()`.
  */
class ProcTimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("proctime() stamps rows within the batch's processing interval") {
    val before = System.currentTimeMillis()
    val ts = (1 to 1000).toDF("i").repartition(4)
      .select(proctime().cast("long").as("pt")) // seconds
      .collect().map(_.getLong(0))
    val after = System.currentTimeMillis() / 1000 + 1
    assert(ts.forall(t => t >= before / 1000 - 1 && t <= after))
  }

  test("proctime() is nondeterministic per record, unlike current_timestamp") {
    // current_timestamp() is constant across the query; proctime() is
    // re-evaluated per row. With a busy-loop between rows the stamps
    // must ADVANCE somewhere in the partition, while current_timestamp
    // stays a single value.
    val df = (1 to 64).toDF("i").repartition(1)
      .mapPartitions { it =>
        it.map { r => Thread.sleep(1); r.getInt(0) }
      }
      .toDF("i")
      .select(proctime().cast("double").as("pt"),
        current_timestamp().cast("double").as("ct"))
    val rows = df.collect()
    assert(rows.map(_.getDouble(1)).distinct.length == 1,
      "current_timestamp must be frozen per batch")
    assert(rows.map(_.getDouble(0)).distinct.length > 1,
      "proctime must advance across rows (per-record evaluation)")
  }

  test("PROCTIME() available from SQL text via SqlEnv") {
    val env = graft.sql.SqlEnv(spark)
    val n = env.executeSql(
      "SELECT proctime() AS pt FROM range(5) WHERE proctime() IS NOT NULL")
      .count()
    assert(n == 5)
  }

  test("proctime survives whole-stage codegen and filters") {
    // must not be constant-folded: a filter on proctime() > 0 keeps all
    // rows, and the column arrives non-null typed timestamp
    val out = (1 to 10).toDF("i")
      .withColumn("pt", proctime())
      .filter(col("pt").isNotNull && col("pt").cast("long") > 0)
    assert(out.count() == 10)
    assert(out.schema("pt").dataType.typeName == "timestamp")
  }
}
