package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** First line of defense against driver fixture regeneration (the r8→r9
  * break: events.ts silently changed from int64-nanos to
  * TIMESTAMP(MICROS) and 25 queries died at analysis). Loads every
  * table at every SF and asserts the column CONTRACT the engine relies
  * on — so a future regeneration fails HERE, with the schema diff in
  * the message, instead of as 43 downstream exceptions.
  */
class FixtureSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def isDateish(t: DataType): Boolean =
    t == DateType || t == TimestampType || t == TimestampNTZType || t == StringType
  private def isIntegral(t: DataType): Boolean =
    Set[DataType](ByteType, ShortType, IntegerType, LongType).contains(t)
  private def isFractional(t: DataType): Boolean =
    t == FloatType || t == DoubleType || t.isInstanceOf[DecimalType]

  for (dir <- sfDirs; name <- Tables.names) {
    test(s"$name loads at $dir with contract columns") {
      assume(new java.io.File(s"$dir/$name.parquet").exists(), s"fixture $dir/$name absent")
      val df = Tables.load(spark, dir, name)
      val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
      def col(c: String): DataType =
        types.getOrElse(c, fail(s"$name missing column '$c'; has ${types.keys.toSeq.sorted}"))
      name match {
        case "events" =>
          assert(col("ts") == TimestampType,
            s"events.ts must normalize to TimestampType, got ${col("ts")} — adapt Tables.load")
          assert(col("user_id").isInstanceOf[NumericType] || col("user_id") == StringType)
          assert(col("props") == StringType, s"events.props should be JSON text, got ${col("props")}")
        case "lineitem" =>
          Seq("l_orderkey", "l_partkey", "l_suppkey").foreach(c =>
            assert(isIntegral(col(c)), s"$c should be integral, got ${col(c)}"))
          Seq("l_extendedprice", "l_discount", "l_tax").foreach(c =>
            assert(isFractional(col(c)), s"$c should be decimal/fractional, got ${col(c)}"))
          assert(isDateish(col("l_shipdate")), s"l_shipdate not date-usable: ${col("l_shipdate")}")
        case "orders" =>
          assert(isIntegral(col("o_orderkey")))
          assert(isDateish(col("o_orderdate")), s"o_orderdate not date-usable: ${col("o_orderdate")}")
        case "documents" =>
          assert(col("text") == StringType, s"documents.text should be string, got ${col("text")}")
        case "embeddings" =>
          assert(col("embedding") match {
            case ArrayType(e, _) => isFractional(e)
            case _ => false
          }, s"embedding should be array<float/double>, got ${col("embedding")}")
        case _ => // dims: presence + loadability is the contract
      }
      assert(df.limit(1).count() == 1, s"$name is empty at $dir")
    }
  }

  test("events.ts values are real timestamps and props parses as JSON (sf0.001)") {
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
    val row = ev.agg(
      min(year(col("ts"))).as("y0"), max(year(col("ts"))).as("y1"),
      sum(when(get_json_object(col("props"), "$").isNull, 1).otherwise(0)).as("badJson")
    ).head()
    assert(row.getInt(0) >= 1990 && row.getInt(1) <= 2100,
      s"events.ts out of sane range: ${row.getInt(0)}..${row.getInt(1)} — unit mismatch in Tables.load?")
    assert(row.getLong(2) == 0L, s"${row.getLong(2)} events.props rows fail to parse as JSON")
  }
}
