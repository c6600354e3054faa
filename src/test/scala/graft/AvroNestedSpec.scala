package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Nested-type fidelity through the Avro container format: arrays,
  * maps, nested structs, and nulls at every level (the reference's
  * AvroRowDataSerializationSchema nested branches).
  */
class AvroNestedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pre-epoch timestamp-micros roundtrip (floor semantics, r18 review fix)") {
    // truncating division landed pre-epoch values one second late once
    // the always-positive sub-second fraction was re-applied
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType)))
    val vals = Seq(
      1L -> "1969-12-31 23:59:59.9995",  // -500 µs
      2L -> "1969-12-31 23:59:58.9995",  // -1.0005 s
      3L -> "1970-01-01 00:00:00.0005",  // +500 µs
      4L -> "1969-12-31 23:59:59.0",     // exactly -1 s
      5L -> "2001-02-03 04:05:06.789012")
    val rows = vals.map { case (id, s) =>
      Row(id, java.sql.Timestamp.valueOf(s))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = Files.createTempDirectory("graft_avro_preepoch").toString + "/data"
    sources.Avro.write(df, dir)
    val back = sources.Avro.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    vals.foreach { case (id, s) =>
      assert(back(id) == java.sql.Timestamp.valueOf(s),
        s"id=$id: wrote $s, read back ${back(id)}")
    }
  }

  test("empty directory: read with a schema serves an empty frame, without one fails clearly") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val dir = Files.createTempDirectory("graft_avro_empty").toString + "/data"
    // writing an empty frame produces no container files
    sources.Avro.write(
      spark.createDataFrame(new java.util.ArrayList[Row](), schema), dir)
    val back = sources.Avro.read(spark, dir, Some(schema))
    assert(back.schema == schema && back.count() == 0)
    val e = intercept[IllegalArgumentException] { sources.Avro.read(spark, dir) }
    assert(e.getMessage.contains("no .avro container files"), e.getMessage)
  }

  test("array/map/struct roundtrip incl. nulls at every level") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = true)),
      StructField("attrs", MapType(StringType, IntegerType, valueContainsNull = true)),
      StructField("info", StructType(Seq(
        StructField("a", IntegerType),
        StructField("b", StringType)))),
      StructField("matrix", ArrayType(
        StructType(Seq(StructField("x", DoubleType))), containsNull = false))))
    val rows = Seq(
      Row(1L, Seq("p", null, "q"), Map("k1" -> 1, "k2" -> null), Row(7, "s"),
        Seq(Row(1.5), Row(-2.25))),
      Row(2L, null, null, null, Seq.empty[Row]),
      Row(3L, Seq.empty[String], Map.empty[String, Integer], Row(null, null),
        Seq(Row(0.0))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("graft_avro_nested").toString + "/data"
    sources.Avro.write(df, dir)
    val back = sources.Avro.read(spark, dir)

    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().map(r => r.getLong(0) -> r).toMap
    val exp = rows.map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (id, e) =>
      val g = got(id)
      assert(g.getSeq[String](1) == Option(e.getSeq[String](1)).orNull,
        s"tags for $id")
      assert(g.getMap[String, Integer](2) == Option(e.getMap[String, Integer](2)).orNull,
        s"attrs for $id")
      assert(g.getStruct(3) == e.getStruct(3), s"info for $id")
      assert(g.getSeq[Row](4) == e.getSeq[Row](4), s"matrix for $id")
    }
  }
}
