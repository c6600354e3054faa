package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._

/** Round-trip fuzz of the Flink-dialect type parser/printer pair in
  * `sql/Ddl.scala` (`flinkType` / `flinkTypeName`) — hand-rolled
  * recursive-descent code guarding every DDL the engine accepts.
  * Generates nested ARRAY/MAP/ROW trees over the full scalar alphabet
  * and checks:
  *
  *  1. PRINT→PARSE: `flinkType(flinkTypeName(t)) == t` for every
  *     generated Spark type the printer can express;
  *  2. PARSE→PRINT→PARSE: parsing a generated Flink type STRING is
  *     stable under one print/parse round (idempotent normal form —
  *     e.g. `NUMERIC(8)` normalizes to `DECIMAL(8, 0)` and stays put).
  *
  * Seed-pinned sampling, like [[RewriteFuzzSpec]].
  */
class DdlTypeFuzzSpec extends AnyFunSuite {

  // Scalars the PRINTER emits (flinkTypeName output alphabet).
  private val printableScalar: Gen[DataType] = Gen.oneOf(
    Gen.const(LongType), Gen.const(IntegerType), Gen.const(ShortType),
    Gen.const(ByteType), Gen.const(DoubleType), Gen.const(FloatType),
    Gen.const(StringType), Gen.const(BooleanType), Gen.const(BinaryType),
    Gen.const(DateType),
    Gen.choose(0, 6).map(TimeType(_)),
    for { p <- Gen.choose(1, 38); s <- Gen.choose(0, 10) }
      yield DecimalType(p, math.min(s, p)))

  private def printableType(depth: Int): Gen[DataType] =
    if (depth <= 0) printableScalar
    else Gen.frequency(
      4 -> printableScalar,
      1 -> Gen.lzy(printableType(depth - 1).map(ArrayType(_, true))),
      1 -> Gen.lzy(for {
        k <- printableScalar; v <- printableType(depth - 1)
      } yield MapType(k, v, true)),
      1 -> Gen.lzy(for {
        n <- Gen.choose(1, 3)
        fs <- Gen.listOfN(n, printableType(depth - 1))
      } yield StructType(fs.zipWithIndex.map { case (t, i) =>
        StructField(s"f$i", t)
      })))

  // Flink type STRINGS the PARSER accepts (wider than the printer:
  // VARCHAR(n), NUMERIC, INTEGER, bare TIME/TIMESTAMP variants …).
  private val parsableScalarStr: Gen[String] = Gen.oneOf(
    Gen.oneOf("STRING", "VARCHAR(255)", "CHAR(2)", "BOOLEAN", "TINYINT",
      "SMALLINT", "INT", "INTEGER", "BIGINT", "FLOAT", "DOUBLE", "DATE",
      "BYTES", "BINARY(16)", "VARBINARY(64)", "TIMESTAMP", "TIMESTAMP(3)",
      "TIMESTAMP(3) WITH LOCAL TIME ZONE", "TIME", "TIME(3)", "TIME(9)"),
    for { p <- Gen.choose(1, 38) } yield s"DECIMAL($p, ${math.min(2, p)})",
    for { p <- Gen.choose(1, 9) } yield s"NUMERIC($p)")

  private def parsableStr(depth: Int): Gen[String] =
    if (depth <= 0) parsableScalarStr
    else Gen.frequency(
      4 -> parsableScalarStr,
      1 -> Gen.lzy(parsableStr(depth - 1).map(t => s"ARRAY<$t>")),
      1 -> Gen.lzy(for {
        k <- parsableScalarStr; v <- parsableStr(depth - 1)
      } yield s"MAP<$k, $v>"),
      1 -> Gen.lzy(for {
        n <- Gen.choose(1, 3)
        fs <- Gen.listOfN(n, parsableStr(depth - 1))
      } yield "ROW<" + fs.zipWithIndex
        .map { case (t, i) => s"`c$i` $t" }.mkString(", ") + ">"))

  // GRAFT_FUZZ_SCALE multiplies every sample count for one-off deep
  // hunts (seeds stay pinned, so scale-10 strictly supersets scale-1)
  private val fuzzScale = sys.env.getOrElse("GRAFT_FUZZ_SCALE", "1").toInt
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n * fuzzScale).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xDD1L + i)))

  test("print -> parse is identity for every printable type (400 samples)") {
    samples(printableType(3), 400).zipWithIndex.foreach { case (t, i) =>
      val printed = graft.sql.Ddl.flinkTypeName(t)
      val back = graft.sql.Ddl.flinkType(printed)
      assert(back == t, s"sample #$i: $t -> '$printed' -> $back")
    }
  }

  test("parse -> print -> parse is stable for every parsable type string (400 samples)") {
    samples(parsableStr(3), 400).zipWithIndex.foreach { case (s, i) =>
      val t1 = graft.sql.Ddl.flinkType(s)
      val printed = graft.sql.Ddl.flinkTypeName(t1)
      val t2 = graft.sql.Ddl.flinkType(printed)
      assert(t2 == t1, s"sample #$i: '$s' -> $t1 -> '$printed' -> $t2")
    }
  }
}
