package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Proto
import graft.sources.Proto._

/** Protobuf wire-format codec — verified against the KNOWN-ANSWER byte
  * sequences published in the protobuf encoding specification
  * (protobuf.dev/programming-guides/encoding), so the implementation is
  * checked against an independent source, not just its own roundtrip.
  */
class ProtoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hex(s: String): Array[Byte] =
    s.split(" ").filter(_.nonEmpty).map(Integer.parseInt(_, 16).toByte)

  private def row(vs: Any*): GenericInternalRow = new GenericInternalRow(vs.toArray)

  // -- spec examples: encode side --------------------------------------

  test("spec vector: int32 field 1 = 150 encodes to 08 96 01") {
    val msg = PbMessage(Seq(PbField(1, "a", PbInt32)))
    assert(Proto.encodeInternal(row(150), msg).sameElements(hex("08 96 01")))
  }

  test("spec vector: string field 2 = \"testing\" encodes to 12 07 + utf8") {
    val msg = PbMessage(Seq(PbField(2, "b", PbString)))
    val expected = hex("12 07") ++ "testing".getBytes("UTF-8")
    assert(Proto.encodeInternal(row(UTF8String.fromString("testing")), msg)
      .sameElements(expected))
  }

  test("spec vector: nested message field 3 = {a:150} encodes to 1a 03 08 96 01") {
    val inner = PbMessage(Seq(PbField(1, "a", PbInt32)))
    val msg = PbMessage(Seq(PbField(3, "c", inner)))
    assert(Proto.encodeInternal(row(row(150)), msg)
      .sameElements(hex("1a 03 08 96 01")))
  }

  test("spec vector: packed repeated int32 field 4 = [3,270,86942] → 22 06 03 8e 02 9e a7 05") {
    val msg = PbMessage(Seq(PbField(4, "d", PbRepeated(PbInt32))))
    val arr = new GenericArrayData(Array[Any](3, 270, 86942))
    assert(Proto.encodeInternal(row(arr), msg)
      .sameElements(hex("22 06 03 8e 02 9e a7 05")))
  }

  test("spec rule: negative int32 sign-extends to a 10-byte varint") {
    val msg = PbMessage(Seq(PbField(1, "a", PbInt32)))
    assert(Proto.encodeInternal(row(-2), msg)
      .sameElements(hex("08 fe ff ff ff ff ff ff ff ff 01")))
  }

  test("spec table: zigzag mapping for sint32") {
    // 0→0, -1→1, 1→2, -2→3, 2147483647→4294967294, -2147483648→4294967295
    val msg = PbMessage(Seq(PbField(1, "s", PbSInt32)))
    def enc(n: Int): Seq[Byte] = Proto.encodeInternal(row(n), msg).toSeq.drop(1)
    assert(enc(-1) == hex("01").toSeq)
    assert(enc(1) == hex("02").toSeq)
    assert(enc(-2) == hex("03").toSeq)
    assert(enc(Int.MaxValue) == hex("fe ff ff ff 0f").toSeq)
    assert(enc(Int.MinValue) == hex("ff ff ff ff 0f").toSeq)
    // 0 is the proto3 default → omitted entirely
    assert(Proto.encodeInternal(row(0), msg).isEmpty)
  }

  // -- decode side ------------------------------------------------------

  test("decode the spec vectors back") {
    val m1 = PbMessage(Seq(PbField(1, "a", PbInt32)))
    assert(Proto.decodeInternal(hex("08 96 01"), m1).getInt(0) == 150)
    val m4 = PbMessage(Seq(PbField(4, "d", PbRepeated(PbInt32))))
    val dec = Proto.decodeInternal(hex("22 06 03 8e 02 9e a7 05"), m4)
      .getArray(0).toIntArray().toSeq
    assert(dec == Seq(3, 270, 86942))
  }

  test("decoder accepts UNPACKED repeated scalars too (spec requirement)") {
    // same [3, 270] as two tagged varints: 20 03 20 8e 02
    val m = PbMessage(Seq(PbField(4, "d", PbRepeated(PbInt32))))
    assert(Proto.decodeInternal(hex("20 03 20 8e 02"), m)
      .getArray(0).toIntArray().toSeq == Seq(3, 270))
  }

  test("unknown fields are skipped by wire type (schema evolution)") {
    // field 1 varint + field 2 string, decoded with a schema knowing only field 2
    val bytes = hex("08 96 01") ++ hex("12 02") ++ "hi".getBytes("UTF-8") ++
      hex("1d 01 00 00 00") ++ // field 3 fixed32 (unknown)
      hex("21 01 00 00 00 00 00 00 00") // field 4 fixed64 (unknown)
    val m = PbMessage(Seq(PbField(2, "b", PbString)))
    assert(Proto.decodeInternal(bytes, m).getUTF8String(0).toString == "hi")
  }

  test("absent fields take proto3 defaults; absent sub-message is null") {
    val inner = PbMessage(Seq(PbField(1, "x", PbInt32)))
    val m = PbMessage(Seq(
      PbField(1, "i", PbInt64), PbField(2, "s", PbString),
      PbField(3, "f", PbDouble), PbField(4, "b", PbBool),
      PbField(5, "sub", inner), PbField(6, "r", PbRepeated(PbString))))
    val r = Proto.decodeInternal(Array.emptyByteArray, m)
    assert(r.getLong(0) == 0L && r.getUTF8String(1).toString == "" &&
      r.getDouble(2) == 0.0 && !r.getBoolean(3) && r.isNullAt(4) &&
      r.getArray(5).numElements() == 0)
  }

  test("repeated string keeps EMPTY elements (no singular default-skip)") {
    val m = PbMessage(Seq(PbField(1, "r", PbRepeated(PbString))))
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), UTF8String.fromString(""), UTF8String.fromString("b")))
    val round = Proto.decodeInternal(Proto.encodeInternal(row(arr), m), m)
    assert(round.getArray(0).toSeq[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString) == Seq("a", "", "b"))
  }

  test("map roundtrip as repeated {1:key 2:value} entries; float/double/fixed roundtrip") {
    val m = PbMessage(Seq(
      PbField(1, "m", PbMap(PbString, PbInt64)),
      PbField(2, "f", PbFloat), PbField(3, "d", PbDouble),
      PbField(4, "x32", PbFixed32), PbField(5, "x64", PbFixed64),
      PbField(6, "s64", PbSInt64)))
    val keys = new GenericArrayData(Array[Any](
      UTF8String.fromString("k1"), UTF8String.fromString("k2")))
    val vals = new GenericArrayData(Array[Any](7L, -9L))
    val in = row(new ArrayBasedMapData(keys, vals), 1.5f, -2.25d, -7, Long.MinValue, -42L)
    val r = Proto.decodeInternal(Proto.encodeInternal(in, m), m)
    val mp = r.getMap(0)
    val ks = mp.keyArray().toSeq[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
    val vs = mp.valueArray().toLongArray().toSeq
    assert(ks.zip(vs).toMap == Map("k1" -> 7L, "k2" -> -9L))
    assert(r.getFloat(1) == 1.5f && r.getDouble(2) == -2.25d)
    assert(r.getInt(3) == -7 && r.getLong(4) == Long.MinValue && r.getLong(5) == -42L)
  }

  // -- DataFrame surface -------------------------------------------------

  test("proto_encode → proto_decode is identity over a DataFrame (nested msg + repeated)") {
    import spark.implicits._
    import graft.functions.proto._
    val inner = PbMessage(Seq(PbField(1, "tag", PbString)))
    val msg = PbMessage(Seq(
      PbField(1, "id", PbInt64), PbField(2, "name", PbString),
      PbField(3, "score", PbDouble), PbField(4, "flag", PbBool),
      PbField(5, "words", PbRepeated(PbString)), PbField(6, "meta", inner)))
    val df = Seq(
      (1L, "alpha", 1.25, true, Seq("x", "y"), "t1"),
      (2L, "", 0.0, false, Seq.empty[String], "t2"),
      (3L, "gamma", -3.5, true, Seq("z"), "t3"))
      .toDF("id", "name", "score", "flag", "words", "tag")
      .select(struct($"id", $"name", $"score", $"flag", $"words",
        struct($"tag").as("meta")).as("m"))
    val round = df.select(protoDecode(protoEncode($"m", msg), msg).as("m"))
      .select($"m.id", $"m.name", $"m.score", $"m.flag",
        $"m.words", $"m.meta.tag")
    val got = round.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3),
       r.getSeq[String](4), r.getString(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "alpha", 1.25, true, Seq("x", "y"), "t1"),
      (2L, "", 0.0, false, Seq.empty[String], "t2"),
      (3L, "gamma", -3.5, true, Seq("z"), "t3")))
  }
}
