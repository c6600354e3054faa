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

  test("parseJson: a NOT NULL field beside TIME plans (nullability-relaxed cast, r18 review fix)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // from_json output is all-nullable and Cast refuses nullable→NOT
    // NULL struct fields — parseJson must target the relaxed type
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("t", TimeType(3))))
    val out = Seq("""{"id":7,"t":"10:30:05.123"}""").toDF("j")
      .select(graft.sources.TimeFormats.parseJson(col("j"), schema).as("v"))
      .select(col("v.id"), expr("CAST(v.t AS STRING) AS t"))
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == 7L &&
      out(0).getString(1) == "10:30:05.123")
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

  test("ORC: TIME(p) as the reference's numeric wire, declared precision restored") {
    // flink-orc writes TIME as int millis-of-day (RowDataVectorizer
    // .java:120); Spark's ORC datasource rejects TimeType, so the shim
    // applies the same numeric wire — INT millis for p<=3
    // (reference-compatible), BIGINT micros for p>3 (the Avro
    // time-micros extension).
    val df = frame()
    val dir = java.nio.file.Files.createTempDirectory("graft_tf_orc").toString
    TimeFormats.writeOrc(df, dir)
    // the on-disk wire really is numeric (reference interop): INT for
    // p<=3, BIGINT for p=6
    val wire = spark.read.orc(dir).schema
    assert(wire("t6").dataType == LongType, wire.simpleString)
    assert(wire("t3").dataType == IntegerType, wire.simpleString)
    assert(wire("t0").dataType == IntegerType, wire.simpleString)
    val wireRow = spark.read.orc(dir).orderBy("id").collect()(1)
    assert(wireRow.getLong(wire.fieldIndex("t6")) == 37805123456L,
      s"micros-of-day on the wire: $wireRow")
    assert(wireRow.getInt(wire.fieldIndex("t3")) == 37805123,
      s"millis-of-day on the wire: $wireRow")
    val back = TimeFormats.readOrc(spark, dir, df.schema)
    assert(back.schema("t0").dataType == TimeType(0), back.schema.simpleString)
    assertRoundtrip(back, p3 = 3, tag = "orc")
    assert(back.orderBy("id").collect()(2)
      .getAs[java.time.LocalTime]("t0") == lt("23:59:59"), "orc t0 value")
    // nested TIME has no reference ORC wire — clear error, not a
    // datasource failure
    val nested = spark.sql(
      "SELECT named_struct('t', TIME'10:30:05') AS s")
    val err = intercept[IllegalArgumentException] {
      TimeFormats.writeOrc(nested, dir + "_nested")
    }
    assert(err.getMessage.contains("top-level"), err.getMessage)
  }

  test("ORC numeric wire: 2000 hash-derived times-of-day roundtrip value-exact per precision") {
    // Deterministic value fuzz (xxhash64-derived, so re-runs see the
    // same 2000 rows): every row derives t3/t0 from one TIME(6) value
    // by the ENGINE's own precision cast, so the expected strings bake
    // in exactly the truncation the wire must preserve. Boundary rows
    // (midnight, 23:59:59.999999) appended explicitly.
    val df = spark.sql(
      """SELECT id, t6, CAST(t6 AS TIME(3)) AS t3, CAST(t6 AS TIME(0)) AS t0
        |FROM (
        |  SELECT id, CAST(make_time(
        |      CAST(abs(xxhash64(id)) % 24 AS INT),
        |      CAST(abs(xxhash64(id + 1)) % 60 AS INT),
        |      CAST(abs(xxhash64(id + 2)) % 60000000 AS DECIMAL(16,6)) / 1000000)
        |    AS TIME(6)) AS t6
        |  FROM range(2000)
        |  UNION ALL SELECT 100001, TIME'00:00:00'
        |  UNION ALL SELECT 100002, TIME'23:59:59.999999'
        |)""".stripMargin)
    def canon(frame: org.apache.spark.sql.DataFrame): Seq[String] =
      frame.selectExpr("id", "CAST(t6 AS STRING) AS s6",
          "CAST(t3 AS STRING) AS s3", "CAST(t0 AS STRING) AS s0")
        .orderBy("id").collect().map(_.toString).toSeq
    val before = canon(df)
    val dir = java.nio.file.Files.createTempDirectory("graft_tf_orc_fuzz").toString
    TimeFormats.writeOrc(df, dir)
    val back = TimeFormats.readOrc(spark, dir, df.schema)
    // ORC reads every column back nullable; names+types must match
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      back.schema.simpleString)
    val after = canon(back)
    assert(after == before,
      s"ORC wire must be value-exact; first diff: ${
        before.zip(after).find(p => p._1 != p._2)}")
  }

  test("DDL ORC table with TIME columns: INSERT + read back") {
    val env = graft.sql.SqlEnv(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_tf_ddl_orc")
    env.executeSql(
      s"""CREATE TABLE tf_ddl_orc (id BIGINT, t3 TIME(3), t6 TIME(6))
         |WITH ('connector' = 'filesystem', 'path' = '$path',
         |      'format' = 'orc')""".stripMargin)
    env.executeSql(
      s"""INSERT INTO tf_ddl_orc
         |SELECT * FROM VALUES
         |  (CAST(1 AS BIGINT), CAST(TIME'10:30:05.123' AS TIME(3)),
         |   TIME'10:30:05.123456'),
         |  (CAST(2 AS BIGINT), CAST(NULL AS TIME(3)), CAST(NULL AS TIME(6)))
         |  AS v(id, t3, t6)""".stripMargin)
    val back = spark.table("tf_ddl_orc")
    assert(back.schema("t3").dataType == TimeType(3) &&
      back.schema("t6").dataType == TimeType(6), back.schema.simpleString)
    val rows = back.orderBy("id").collect()
    assert(rows(0).getAs[java.time.LocalTime]("t3") == lt("10:30:05.123") &&
      rows(0).getAs[java.time.LocalTime]("t6") == lt("10:30:05.123456"),
      rows.mkString("; "))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2), "null TIME must survive")
  }

  test("nested TIME rides the text formats and the JSON envelopes (r16 advice)") {
    // ROW<t TIME(3)> through writeJson/readJson: the reference's
    // flink-json converters support nested TIME; encode/decode now
    // recurse via the same wireType the envelope path uses.
    // built via SQL: RowEncoder refuses to down-cast LocalTime to
    // sub-micro TIME precisions, which is an encoder limitation, not a
    // wire one
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(1 AS BIGINT),
        |   named_struct('t', CAST(TIME'10:30:05.123' AS TIME(3)),
        |                'x', CAST(7 AS BIGINT)),
        |   array(CAST(TIME'01:02:03' AS TIME(0)), CAST(TIME'23:59:59' AS TIME(0)))),
        |  (CAST(2 AS BIGINT),
        |   named_struct('t', CAST(NULL AS TIME(3)), 'x', CAST(8 AS BIGINT)),
        |   CAST(NULL AS ARRAY<TIME(0)>))
        |  AS v(id, r, ts)""".stripMargin)
    val schema = df.schema
    assert(schema("r").dataType.asInstanceOf[StructType]("t").dataType == TimeType(3) &&
      schema("ts").dataType.asInstanceOf[ArrayType].elementType == TimeType(0),
      schema.simpleString)
    // wire schema demotes the NESTED fields too
    val wire = TimeFormats.textSchema(schema)
    assert(wire("r").dataType.asInstanceOf[StructType]("t").dataType == StringType,
      wire.simpleString)
    assert(wire("ts").dataType.asInstanceOf[ArrayType].elementType == StringType,
      wire.simpleString)
    val dir = java.nio.file.Files.createTempDirectory("graft_tf_nested").toString
    TimeFormats.writeJson(df, dir)
    val backDf = TimeFormats.readJson(spark, dir, schema)
    assert(backDf.schema("r").dataType.asInstanceOf[StructType]("t").dataType
      == TimeType(3), backDf.schema.simpleString)
    assert(backDf.schema("ts").dataType.asInstanceOf[ArrayType].elementType
      == TimeType(0), backDf.schema.simpleString)
    // row values checked through string casts: Spark's ROW ENCODER
    // cannot collect arrays of sub-micro TIME precisions (an encoder
    // limitation, not a wire one)
    backDf.createOrReplaceTempView("tf_nested_back")
    val back = spark.sql(
      """SELECT id, CAST(r.t AS STRING) AS rt, r.x AS rx,
        |  CAST(ts[0] AS STRING) AS t0, CAST(ts[1] AS STRING) AS t1
        |FROM tf_nested_back ORDER BY id""".stripMargin).collect()
    assert(back(0).getString(1) == "10:30:05.123" && back(0).getLong(2) == 7L,
      back.mkString("; "))
    assert(back(0).getString(3) == "01:02:03" && back(0).getString(4) == "23:59:59",
      back.mkString("; "))
    assert(back(1).isNullAt(1) && back(1).isNullAt(3),
      "nested nulls must survive")
    // a DDL JSON table with a ROW<TIME> column: INSERT + read back
    val env = graft.sql.SqlEnv(spark)
    val path = java.nio.file.Files.createTempDirectory("graft_tf_nested_ddl")
    env.executeSql(
      s"""CREATE TABLE tf_nested_ddl (id BIGINT, r ROW<t TIME(3), x BIGINT>)
         |WITH ('connector' = 'filesystem', 'path' = '$path',
         |      'format' = 'json')""".stripMargin)
    env.executeSql(
      """INSERT INTO tf_nested_ddl
        |SELECT CAST(1 AS BIGINT),
        |       named_struct('t', CAST(TIME'10:30:05.123' AS TIME(3)),
        |                    'x', CAST(7 AS BIGINT))""".stripMargin)
    val ddlBack = spark.table("tf_nested_ddl").collect()(0)
    assert(ddlBack.getStruct(1).getAs[java.time.LocalTime](0) == lt("10:30:05.123"),
      ddlBack.toString)
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
