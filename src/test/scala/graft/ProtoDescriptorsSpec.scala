package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{Proto, ProtoDescriptors}
import graft.sources.Proto._

/** FileDescriptorSet → PbMessage derivation. The fixture descriptor set
  * is ENCODED with the same wire codec from the public descriptor.proto
  * layout — i.e. byte-identical to what `protoc --descriptor_set_out`
  * emits for the same schema (the wire format has a canonical encoding
  * for a given field ordering), then parsed back via the meta-schema.
  */
class ProtoDescriptorsSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)
  private def arr(vs: Any*) = new GenericArrayData(vs.toArray)
  private def row(vs: Any*) = new GenericInternalRow(vs.toArray)

  // FieldDescriptorProto rows: (name, number, label, type, type_name)
  private def fld(name: String, no: Int, tpe: Int, label: Int = 1,
                  typeName: String = null) =
    row(u(name), no, label, tpe, if (typeName == null) null else u(typeName))

  /** descriptor set for:
    * {{{
    * package demo;
    * message Inner { string tag = 1; }
    * message Outer {
    *   int64 id = 1; string name = 2; repeated int32 nums = 3;
    *   Inner inner = 4; map<string,int64> attrs = 5; sint32 delta = 6;
    *   double score = 7; bytes raw = 8; bool ok = 9; sfixed64 big = 10;
    * }
    * }}}
    * protoc compiles the map field to nested message AttrsEntry with
    * map_entry = true and the field typed .demo.Outer.AttrsEntry.
    */
  private lazy val descriptorSetBytes: Array[Byte] = {
    // DescriptorProto layout: (name, field[], nested_type[], options)
    val inner = row(u("Inner"), arr(fld("tag", 1, 9)), arr(), null)
    val attrsEntry = row(u("AttrsEntry"),
      arr(fld("key", 1, 9), fld("value", 2, 3)),
      arr(), row(true)) // options.map_entry = true
    val outer = row(u("Outer"),
      arr(
        fld("id", 1, 3),
        fld("name", 2, 9),
        fld("nums", 3, 5, label = 3),
        fld("inner", 4, 11, typeName = ".demo.Inner"),
        fld("attrs", 5, 11, label = 3, typeName = ".demo.Outer.AttrsEntry"),
        fld("delta", 6, 17),
        fld("score", 7, 1),
        fld("raw", 8, 12),
        fld("ok", 9, 8),
        fld("big", 10, 16)),
      arr(attrsEntry), null)
    val file = row(u("demo.proto"), u("demo"), arr(inner, outer))
    Proto.encodeInternal(row(arr(file)), ProtoDescriptors.metaSchema)
  }

  test("derives the full message shape from a descriptor set") {
    val msg = ProtoDescriptors.fromDescriptorSet(descriptorSetBytes, "Outer")
    assert(msg == PbMessage(Seq(
      PbField(1, "id", PbInt64),
      PbField(2, "name", PbString),
      PbField(3, "nums", PbRepeated(PbInt32)),
      PbField(4, "inner", PbMessage(Seq(PbField(1, "tag", PbString)))),
      PbField(5, "attrs", PbMap(PbString, PbInt64)),
      PbField(6, "delta", PbSInt32),
      PbField(7, "score", PbDouble),
      PbField(8, "raw", PbBytes),
      PbField(9, "ok", PbBool),
      PbField(10, "big", PbFixed64))))
  }

  test("lookup by simple, package-qualified, and dotted name") {
    val byFq = ProtoDescriptors.fromDescriptorSet(descriptorSetBytes, ".demo.Inner")
    val bySimple = ProtoDescriptors.fromDescriptorSet(descriptorSetBytes, "Inner")
    val byPkg = ProtoDescriptors.fromDescriptorSet(descriptorSetBytes, "demo.Inner")
    assert(byFq == bySimple && bySimple == byPkg)
    assert(byFq == PbMessage(Seq(PbField(1, "tag", PbString))))
  }

  test("recursive message types fail loudly instead of recursing forever") {
    // message Tree { string name = 1; repeated Tree children = 2; } —
    // legal protobuf, unrepresentable as a finite PbMessage tree
    val tree = row(u("Tree"),
      arr(fld("name", 1, 9),
          fld("children", 2, 11, label = 3, typeName = ".demo.Tree")),
      arr(), null)
    val file = row(u("tree.proto"), u("demo"), arr(tree))
    val bytes = Proto.encodeInternal(row(arr(file)), ProtoDescriptors.metaSchema)
    val e = intercept[IllegalArgumentException] {
      ProtoDescriptors.fromDescriptorSet(bytes, "Tree")
    }
    assert(e.getMessage.contains("recursive message type"), e.getMessage)
  }

  test("a message below the supported nesting depth fails loudly, never builds empty") {
    // F sits 5 nested-type levels below the top-level message — the
    // meta-schema bottoms out there with a name-only leaf, and building
    // it as an empty message would silently drop every field
    val f5 = row(u("F")) // leaf layout: name only
    val e4 = row(u("E"), arr(), arr(f5), null)
    val d3 = row(u("D"), arr(), arr(e4), null)
    val c2 = row(u("C"), arr(), arr(d3), null)
    val b1 = row(u("B"), arr(), arr(c2), null)
    val top = row(u("A"),
      arr(fld("deep", 1, 11, typeName = ".demo.A.B.C.D.E.F")),
      arr(b1), null)
    val file = row(u("deep.proto"), u("demo"), arr(top))
    val bytes = Proto.encodeInternal(row(arr(file)), ProtoDescriptors.metaSchema)
    val e = intercept[IllegalArgumentException] {
      ProtoDescriptors.fromDescriptorSet(bytes, "A")
    }
    assert(e.getMessage.contains("nested deeper than the supported"), e.getMessage)
    // ...while a legitimately EMPTY message at a supported depth builds fine
    val emptyOk = row(u("Empty"), arr(), arr(), null)
    val file2 = row(u("empty.proto"), u("demo"), arr(emptyOk))
    val bytes2 = Proto.encodeInternal(row(arr(file2)), ProtoDescriptors.metaSchema)
    assert(ProtoDescriptors.fromDescriptorSet(bytes2, "Empty").fields.isEmpty)
  }

  test("unknown message name fails with the available names listed") {
    val e = intercept[IllegalArgumentException] {
      ProtoDescriptors.fromDescriptorSet(descriptorSetBytes, "Nope")
    }
    assert(e.getMessage.contains(".demo.Outer"))
  }

  test("descriptor-derived schema decodes data encoded under the hand-declared one") {
    val declared = PbMessage(Seq(
      PbField(1, "id", PbInt64),
      PbField(2, "name", PbString),
      PbField(3, "nums", PbRepeated(PbInt32)),
      PbField(4, "inner", PbMessage(Seq(PbField(1, "tag", PbString)))),
      PbField(5, "attrs", PbMap(PbString, PbInt64)),
      PbField(6, "delta", PbSInt32),
      PbField(7, "score", PbDouble),
      PbField(8, "raw", PbBytes),
      PbField(9, "ok", PbBool),
      PbField(10, "big", PbFixed64)))
    val derived = ProtoDescriptors.fromDescriptorSet(descriptorSetBytes, "Outer")
    val data = row(42L, u("x"), arr(1, 2, 3), row(u("t")),
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        arr(u("k")), arr(9L)),
      -5, 1.5d, Array[Byte](1, 2), true, 7L)
    val bytes = Proto.encodeInternal(data, declared)
    val back = Proto.decodeInternal(bytes, derived)
    assert(back.getLong(0) == 42L && back.getUTF8String(1).toString == "x")
    assert(back.getArray(2).toIntArray().toSeq == Seq(1, 2, 3))
    assert(back.getStruct(3, 1).getUTF8String(0).toString == "t")
    assert(back.getInt(5) == -5 && back.getDouble(6) == 1.5)
    assert(back.getBinary(7).toSeq == Seq[Byte](1, 2) && back.getBoolean(8))
    assert(back.getLong(9) == 7L)
  }
}
