package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.{Avro, TimeFormats}

/** TIME(p) through the format roundtrips (r15 directive #1) — the
  * reference's converters put TIME on the wire as ISO text in CSV/JSON
  * (RowDataToCsvConverters / RowDataToJsonConverters) and as the Avro
  * time-millis / time-micros logical types (AvroSchemaConverter).
  * Spark's CSV/JSON datasources reject TimeType outright, so the text
  * legs ride [[TimeFormats]]; Avro carries the logical types natively
  * in [[Avro]]. Each leg must restore the DECLARED TIME(p) schema and
  * the exact values, nulls included.
  */
class TimeFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def lt(s: String) = java.time.LocalTime.parse(s)

  private def frame() = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("t6", TimeType(6)),
      StructField("t3", TimeType(3)),
      StructField("t0", TimeType(0)),
      StructField("s", StringType)))
    spark.createDataFrame(
      java.util.List.of(
        Row(1L, lt("00:00:00"), lt("00:00:00"), lt("00:00:00"), "midnight"),
        Row(2L, lt("10:30:05.123456"), lt("10:30:05.123"), lt("10:30:05"), "mid"),
        Row(3L, lt("23:59:59.999999"), lt("23:59:59.999"), lt("23:59:59"), "edge"),
        Row(4L, null, null, null, null)),
      schema)
  }

  private def assertRoundtrip(back: org.apache.spark.sql.DataFrame,
                              p3: Int, tag: String): Unit = {
    assert(back.schema("t6").dataType == TimeType(6), s"$tag: ${back.schema.simpleString}")
    assert(back.schema("t3").dataType == TimeType(p3), s"$tag: ${back.schema.simpleString}")
    val rows = back.orderBy("id").collect()
    assert(rows.length == 4, tag)
    assert(rows(1).getAs[java.time.LocalTime]("t6") == lt("10:30:05.123456"), tag)
    assert(rows(1).getAs[java.time.LocalTime]("t3") == lt("10:30:05.123"), tag)
    assert(rows(2).getAs[java.time.LocalTime]("t6") == lt("23:59:59.999999"), tag)
    assert(rows(0).getAs[java.time.LocalTime]("t6") == lt("00:00:00"), tag)
    assert(rows(3).isNullAt(back.schema.fieldIndex("t6")) &&
      rows(3).isNullAt(back.schema.fieldIndex("t3")), s"$tag: nulls must survive")
  }

  test("CSV: TIME(p) as ISO text, declared precision restored") {
    val df = frame()
    val dir = java.nio.file.Files.createTempDirectory("graft_tf_csv").toString
    TimeFormats.writeCsv(df, dir)
    val back = TimeFormats.readCsv(spark, dir, df.schema)
    assert(back.schema("t0").dataType == TimeType(0), back.schema.simpleString)
    assertRoundtrip(back, p3 = 3, tag = "csv")
    // non-TIME frames take the identity path — the helper is a safe
    // general entry point
    assert(TimeFormats.encodeTimes(df.select("id", "s")).schema ==
      df.select("id", "s").schema)
  }

  test("JSON: TIME(p) as ISO text, declared precision restored") {
    val df = frame()
    val dir = java.nio.file.Files.createTempDirectory("graft_tf_json").toString
    TimeFormats.writeJson(df, dir)
    val back = TimeFormats.readJson(spark, dir, df.schema)
    assertRoundtrip(back, p3 = 3, tag = "json")
  }

  test("Avro: time-millis for p<=3, time-micros above, values exact") {
    val df = frame()
    // schema mapping: p<=3 -> INT time-millis, p>3 -> LONG time-micros
    val avro = Avro.toAvroSchema(df.schema)
    def fieldBase(n: String) = {
      val s = avro.getField(n).schema()
      s.getTypes.get(1) // union(null, T)
    }
    assert(fieldBase("t6").getType == org.apache.avro.Schema.Type.LONG &&
      fieldBase("t6").getLogicalType.getName == "time-micros")
    assert(fieldBase("t3").getType == org.apache.avro.Schema.Type.INT &&
      fieldBase("t3").getLogicalType.getName == "time-millis")
    val dir = java.nio.file.Files.createTempDirectory("graft_tf_avro").toString
    Avro.write(df, dir)
    val back = Avro.read(spark, dir)
    // container schema carries the logical type, not the exact Spark
    // precision: time-millis reads back TIME(3), time-micros TIME(6)
    assertRoundtrip(back, p3 = 3, tag = "avro")
    assert(back.schema("t0").dataType == TimeType(3), back.schema.simpleString)
    assert(back.orderBy("id").collect()(2)
      .getAs[java.time.LocalTime]("t0") == lt("23:59:59"), "avro t0 value")
  }
}
