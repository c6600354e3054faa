package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.CdcFormats
import graft.streaming.Changelog

/** CDC envelope formats (flink-json's debezium/canal/maxwell/ogg
  * deserialization schemas) onto the explicit changelog model.
  */
class CdcFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("price", DoubleType)))

  private def df(envs: String*) = {
    import spark.implicits._
    envs.toDF("v")
  }

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getString(0), r.getLong(1),
      r.getString(2), r.getDouble(3)))

  test("debezium-json: c/r/u/d ops; unknown op dropped") {
    val out = rows(CdcFormats.fromDebeziumJson(df(
      """{"before":null,"after":{"id":1,"name":"a","price":10.0},"op":"c"}""",
      """{"before":null,"after":{"id":2,"name":"b","price":20.0},"op":"r"}""",
      """{"before":{"id":1,"name":"a","price":10.0},"after":{"id":1,"name":"a2","price":11.0},"op":"u"}""",
      """{"before":{"id":2,"name":"b","price":20.0},"after":null,"op":"d"}""",
      """{"before":null,"after":null,"op":"x"}"""), col("v"), schema))
    assert(out.toSet == Set(
      ("+I", 1L, "a", 10.0), ("+I", 2L, "b", 20.0),
      ("-U", 1L, "a", 10.0), ("+U", 1L, "a2", 11.0),
      ("-D", 2L, "b", 20.0)))
    assert(out.length == 5)
  }

  test("debezium-json: -U precedes its +U within one update envelope") {
    val out = rows(CdcFormats.fromDebeziumJson(df(
      """{"before":{"id":7,"name":"x","price":1.0},"after":{"id":7,"name":"y","price":2.0},"op":"u"}"""),
      col("v"), schema))
    assert(out.toSeq == Seq(("-U", 7L, "x", 1.0), ("+U", 7L, "y", 2.0)))
  }

  test("canal-json: multi-row data array; partial old merges over data") {
    // UPDATE's old carries ONLY the changed fields (price); name/id
    // fall back to the new row — the reference's null-fallback merge.
    val out = rows(CdcFormats.fromCanalJson(df(
      """{"data":[{"id":1,"name":"a","price":10.0},{"id":2,"name":"b","price":20.0}],"old":null,"type":"INSERT"}""",
      """{"data":[{"id":1,"name":"a","price":12.0}],"old":[{"price":10.0}],"type":"UPDATE"}""",
      """{"data":[{"id":2,"name":"b","price":20.0}],"old":null,"type":"DELETE"}"""),
      col("v"), schema))
    assert(out.toSet == Set(
      ("+I", 1L, "a", 10.0), ("+I", 2L, "b", 20.0),
      ("-U", 1L, "a", 10.0), ("+U", 1L, "a", 12.0),
      ("-D", 2L, "b", 20.0)))
  }

  test("maxwell-json: update partial old; bootstrap-insert is insert") {
    val out = rows(CdcFormats.fromMaxwellJson(df(
      """{"data":{"id":1,"name":"a","price":10.0},"old":null,"type":"insert"}""",
      """{"data":{"id":3,"name":"c","price":30.0},"old":null,"type":"bootstrap-insert"}""",
      """{"data":{"id":1,"name":"a","price":15.0},"old":{"price":10.0},"type":"update"}""",
      """{"data":{"id":3,"name":"c","price":30.0},"old":null,"type":"delete"}"""),
      col("v"), schema))
    assert(out.toSet == Set(
      ("+I", 1L, "a", 10.0), ("+I", 3L, "c", 30.0),
      ("-U", 1L, "a", 10.0), ("+U", 1L, "a", 15.0),
      ("-D", 3L, "c", 30.0)))
  }

  test("ogg-json: I/U/D op_type codes") {
    val out = rows(CdcFormats.fromOggJson(df(
      """{"before":null,"after":{"id":1,"name":"a","price":10.0},"op_type":"I"}""",
      """{"before":{"id":1,"name":"a","price":10.0},"after":{"id":1,"name":"a","price":11.0},"op_type":"U"}""",
      """{"before":{"id":1,"name":"a","price":11.0},"after":null,"op_type":"D"}"""),
      col("v"), schema))
    assert(out.toSet == Set(
      ("+I", 1L, "a", 10.0),
      ("-U", 1L, "a", 10.0), ("+U", 1L, "a", 11.0),
      ("-D", 1L, "a", 11.0)))
  }

  test("decoded changelog collapses correctly through Changelog.toUpsert") {
    val decoded = CdcFormats.fromDebeziumJson(df(
      """{"before":null,"after":{"id":1,"name":"a","price":10.0},"op":"c"}""",
      """{"before":{"id":1,"name":"a","price":10.0},"after":{"id":1,"name":"a2","price":11.0},"op":"u"}""",
      """{"before":null,"after":{"id":2,"name":"b","price":20.0},"op":"c"}""",
      """{"before":{"id":2,"name":"b","price":20.0},"after":null,"op":"d"}"""),
      col("v"), schema)
      .withColumn("seq", monotonically_increasing_id())
    val finalState = Changelog.toUpsert(decoded, Seq("id"), "seq")
      .select("id", "name", "price").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(finalState.toSet == Set((1L, "a2", 11.0)))
  }
}
