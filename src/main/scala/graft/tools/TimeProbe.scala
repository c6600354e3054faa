package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot probe of Spark 4.1's TIME type surface (SPARK-51162 family)
  * — run before deciding whether the reference's `TIME(p)` columns
  * (FlinkSQL TIME WITHOUT TIME ZONE) can ride a native Spark type
  * instead of the int-millis-of-day narrowing documented in README.
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timeType.enabled",
        sys.env.getOrElse("GRAFT_TIME_FLAG", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tryQ(label: String, sql: String): Unit =
      try {
        val df = spark.sql(sql)
        println(s"[timeprobe] $label OK schema=${df.schema.simpleString} " +
          s"rows=${df.collect().mkString("; ")}")
      } catch { case e: Throwable =>
        println(s"[timeprobe] $label FAIL ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.take(2).mkString(" | "))
      }
    tryQ("literal", "SELECT TIME'10:30:05' AS t")
    tryQ("make_time", "SELECT make_time(1, 2, 3.5) AS m")
    tryQ("cast_str", "SELECT cast('10:30:05' AS TIME) AS c")
    tryQ("extract", "SELECT hour(TIME'10:30:05') AS h, minute(TIME'10:30:05') AS mi")
    tryQ("arith", "SELECT TIME'10:30:05' + INTERVAL '1' HOUR AS p")
    tryQ("compare", "SELECT TIME'10:30:05' < TIME'11:00:00' AS lt")
    tryQ("cast_ts", "SELECT cast(TIMESTAMP'2024-01-01 10:30:05' AS TIME) AS ct")
    tryQ("groupby", "SELECT t, count(1) AS n FROM (VALUES (TIME'01:02:03'), (TIME'01:02:03')) v(t) GROUP BY t")
    tryQ("current_time", "SELECT current_time() IS NOT NULL AS ok")
    tryQ("to_time", "SELECT to_time('10:30:05') AS t")
    tryQ("time_trunc", "SELECT time_trunc('MINUTE', TIME'10:30:05.5') AS t")
    tryQ("time_diff", "SELECT TIME'11:00:00' - TIME'10:30:00' AS d")
    // r14 tail: candidate rewrites for the two remaining spec-pinned
    // deltas (README §TIME): TIMESTAMP→TIME cast, midnight-wrap arith.
    tryQ("ts_derive_fmt",
      "SELECT to_time(date_format(TIMESTAMP'2024-01-01 10:30:05.123456', 'HH:mm:ss.SSSSSS')) AS t")
    tryQ("wrap_fwd",
      "SELECT to_time(date_format(TIMESTAMP'1970-01-01 00:00:00' + (TIME'23:59:59' - TIME'00:00:00') + INTERVAL '30' MINUTE, 'HH:mm:ss.SSSSSS')) AS t")
    tryQ("wrap_back",
      "SELECT to_time(date_format(TIMESTAMP'1970-01-01 00:00:00' + (TIME'00:10:00' - TIME'00:00:00') - INTERVAL '30' MINUTE, 'HH:mm:ss.SSSSSS')) AS t")
    tryQ("ts_minus_time",
      "SELECT TIMESTAMP'2024-01-01 10:30:05' - TIME'10:30:05' AS d")
    tryQ("time_to_ts",
      "SELECT cast(TIME'10:30:05.25' AS TIMESTAMP) AS t")
    tryQ("time_to_ts_ntz",
      "SELECT cast(TIME'10:30:05.25' AS TIMESTAMP_NTZ) AS t")
    tryQ("time_to_ts_compose",
      "SELECT TIMESTAMP_NTZ'1970-01-01 00:00:00' + (TIME'10:30:05.25' - TIME'00:00:00') AS t")
    tryQ("ntz_fmt",
      "SELECT to_time(date_format(TIMESTAMP_NTZ'1970-01-01 00:00:00' + (TIME'23:59:59' - TIME'00:00:00') + INTERVAL '30' MINUTE, 'HH:mm:ss.SSSSSS')) AS t")
    tryQ("prec_cast",
      "SELECT cast(TIME'10:30:05.987654' AS TIME(0)) AS t0, cast(TIME'10:30:05.987654' AS TIME(3)) AS t3")
    tryQ("ts_ntz_fmt",
      "SELECT to_time(date_format(TIMESTAMP_NTZ'2024-01-01 10:30:05.123', 'HH:mm:ss.SSSSSS')) AS t")
    try {
      spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION probe_time_add_wrap(t TIME(6), d INTERVAL DAY TO SECOND)
          |RETURNS TIME(6) RETURN
          |to_time(date_format(TIMESTAMP_NTZ'1970-01-01 00:00:00' + (t - TIME'00:00:00') + d, 'HH:mm:ss.SSSSSS'))""".stripMargin)
      tryQ("sqlfn_wrap",
        "SELECT probe_time_add_wrap(TIME'23:59:59.5', INTERVAL '30' MINUTE) AS f, probe_time_add_wrap(TIME'00:10:00', INTERVAL '-30' MINUTE) AS b")
    } catch { case e: Throwable =>
      println(s"[timeprobe] sqlfn_wrap DDL FAIL ${e.getClass.getSimpleName}: " +
        e.getMessage.linesIterator.take(2).mkString(" | "))
    }
    // format roundtrips: which writers/readers accept TimeType (r15
    // directive #1 — TIME through CSV/JSON/Avro)
    def tryFmt(fmt: String)(write: org.apache.spark.sql.DataFrame => Unit,
                            read: () => org.apache.spark.sql.DataFrame): Unit =
      try {
        write(spark.sql("SELECT TIME'10:30:05.123456' AS t, 1 AS id"))
        val back = read()
        println(s"[timeprobe] $fmt OK schema=${back.schema.simpleString} " +
          s"rows=${back.collect().mkString("; ")}")
      } catch { case e: Throwable =>
        println(s"[timeprobe] $fmt FAIL ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.take(3).mkString(" | "))
      }
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.TimeType(6)),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType)))
    tryFmt("parquet")(
      _.write.mode("overwrite").parquet("/tmp/graft_timeprobe"),
      () => spark.read.parquet("/tmp/graft_timeprobe"))
    tryFmt("csv")(
      _.write.mode("overwrite").option("header", "true").csv("/tmp/graft_timeprobe_csv"),
      () => spark.read.option("header", "true").schema(sch).csv("/tmp/graft_timeprobe_csv"))
    tryFmt("json")(
      _.write.mode("overwrite").json("/tmp/graft_timeprobe_json"),
      () => spark.read.schema(sch).json("/tmp/graft_timeprobe_json"))
    tryFmt("orc")(
      _.write.mode("overwrite").orc("/tmp/graft_timeprobe_orc"),
      () => spark.read.schema(sch).orc("/tmp/graft_timeprobe_orc"))
    spark.stop()
  }
}
