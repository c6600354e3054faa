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
