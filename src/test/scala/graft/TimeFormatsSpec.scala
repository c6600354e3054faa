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

  test("from_json/to_json wire contract: CDC envelope and Kafka value carry TIME") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // from_json rejects TimeType outright (UNSUPPORTED_DATATYPE) and
    // to_json fails converting it — every schema-driven JSON envelope
    // rides TIME as ISO text and casts back (the flink-json converters'
    // contract). Debezium decode with a TIME column:
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("t", TimeType(3))))
    val env = Seq(
      """{"before":null,"after":{"k":"a","t":"10:30:05.123"},"op":"c"}""",
      """{"before":{"k":"a","t":"10:30:05.123"},"after":{"k":"a","t":"11:00:00"},"op":"u"}""",
      """{"before":{"k":"a","t":"11:00:00"},"after":null,"op":"d"}""").toDF("j")
    val out = graft.sources.CdcFormats.fromDebeziumJson(env, col("j"), schema)
    assert(out.schema("t").dataType == TimeType(3), out.schema.simpleString)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1), String.valueOf(r.get(2))))
    assert(rows.toSeq == Seq(
      ("+I", "a", "10:30:05.123"), ("-U", "a", "10:30:05.123"),
      ("+U", "a", "11:00"), ("-D", "a", "11:00")), rows.mkString("; "))

    // Kafka JSON value decode restores the declared TIME field
    val kafkaShaped = Seq(("k1", """{"id":1,"t":"10:30:05.5"}""", 0L))
      .toDF("key", "value", "offset")
      .select(col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"), col("offset"))
    val vSchema = StructType(Seq(
      StructField("id", LongType), StructField("t", TimeType(6))))
    val dec = graft.sources.Kafka.decodeJson(kafkaShaped, vSchema)
    val v = dec.select("v.id", "v.t").collect()(0)
    assert(v.getLong(0) == 1L &&
      v.getAs[java.time.LocalTime](1) == lt("10:30:05.5"), v.toString)

    // ...and the sink-side encode renders TIME as its ISO text
    val js = spark.range(1).select(
      to_json(graft.sources.TimeFormats.toWire(
        struct(expr("TIME'10:30:05.5'").as("t")),
        StructType(Seq(StructField("t", TimeType(6)))))).as("j"))
      .collect()(0).getString(0)
    assert(js.contains("\"10:30:05.5\""), js)
  }

  test("DDL JSON and CSV tables with TIME columns: INSERT + read back") {
    val env = graft.sql.SqlEnv(spark)
    for (fmt <- Seq("json", "csv")) {
      val path = java.nio.file.Files.createTempDirectory(s"graft_tf_ddl_$fmt")
      env.executeSql(
        s"""CREATE TABLE tf_ddl_$fmt (id BIGINT, t TIME(3))
           |WITH ('connector' = 'filesystem', 'path' = '$path',
           |      'format' = '$fmt')""".stripMargin)
      env.executeSql(
        s"""INSERT INTO tf_ddl_$fmt
           |SELECT * FROM VALUES (1, CAST(TIME'10:30:05.123' AS TIME(3))),
           |                     (2, CAST(NULL AS TIME(3))) AS v(id, t)""".stripMargin)
      val back = spark.table(s"tf_ddl_$fmt")
      assert(back.schema("t").dataType == TimeType(3),
        s"$fmt: ${back.schema.simpleString}")
      val rows = back.orderBy("id").collect()
      assert(rows(0).getAs[java.time.LocalTime]("t") == lt("10:30:05.123"),
        s"$fmt: ${rows.mkString("; ")}")
      assert(rows(1).isNullAt(1), s"$fmt: null TIME must survive")
    }
  }

  test("DDL json ignore-parse-errors drops records with malformed TIME text") {
    // flink-json's ignore-parse-errors skips the WHOLE record on any
    // field-level parse failure, TIME included; without it the parse
    // failure raises. decodeTimes(dropMalformed) mirrors both.
    val env = graft.sql.SqlEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_tf_bad").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      ("""{"id":1,"t":"10:30:05"}""" + "\n" +
       """{"id":2,"t":"not a time"}""" + "\n" +
       """{"id":3,"t":null}""" + "\n").getBytes)
    env.executeSql(
      s"""CREATE TABLE tf_bad_lenient (id BIGINT, t TIME(0))
         |WITH ('connector' = 'filesystem', 'path' = '$dir',
         |      'format' = 'json', 'json.ignore-parse-errors' = 'true')""".stripMargin)
    val rows = spark.table("tf_bad_lenient").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L),
      s"record with malformed TIME must be dropped: ${rows.mkString("; ")}")
    assert(rows(0).getAs[java.time.LocalTime]("t") == lt("10:30:05") &&
      rows(1).isNullAt(1), rows.mkString("; "))
    // strict mode (the default) raises instead of silently dropping
    env.executeSql(
      s"""CREATE TABLE tf_bad_strict (id BIGINT, t TIME(0))
         |WITH ('connector' = 'filesystem', 'path' = '$dir',
         |      'format' = 'json')""".stripMargin)
    intercept[Exception] { spark.table("tf_bad_strict").collect() }
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
