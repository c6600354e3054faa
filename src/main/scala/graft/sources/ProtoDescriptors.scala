package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import Proto._

/** Derive a [[Proto.PbMessage]] from a serialized `FileDescriptorSet` —
  * the artifact `protoc --descriptor_set_out` produces — so users can
  * bring compiled `.proto` schemas instead of declaring shapes in code
  * (the reference's descriptor-driven entry point:
  * flink-formats/flink-protobuf/.../ProtoToRowConverter.java:53, which
  * receives a compiled Descriptors.Descriptor).
  *
  * Bootstrapped on the wire codec itself: `descriptor.proto` is just
  * another protobuf message, and its layout is public (field numbers
  * below are from google/protobuf/descriptor.proto) — so the descriptor
  * set is decoded with [[Proto.decodeInternal]] against a hand-declared
  * meta-schema. No protobuf runtime needed.
  *
  * Supported field types: double/float/int64/int32/fixed64/fixed32/
  * bool/string/bytes/sint32/sint64/sfixed32/sfixed64 (sfixed maps to
  * the same wire shape as fixed), nested messages (including across
  * files in the set), repeated labels, and map fields (protoc compiles
  * `map<k,v>` to a nested `*Entry` message with `map_entry = true`;
  * detected and surfaced as [[PbMap]]). Narrowed: enums decode as
  * int32 (their wire type), groups and extensions unsupported.
  */
object ProtoDescriptors {

  // google/protobuf/descriptor.proto meta-schema — only the fields the
  // walker needs; unknown fields are skipped by the decoder.
  private val fieldDescriptorProto = PbMessage(Seq(
    PbField(1, "name", PbString),
    PbField(3, "number", PbInt32),
    PbField(4, "label", PbInt32), // 3 = LABEL_REPEATED
    PbField(5, "type", PbInt32), // enum Type, values below
    PbField(6, "type_name", PbString))) // ".pkg.Msg" for message/enum fields

  private val messageOptions = PbMessage(Seq(
    PbField(7, "map_entry", PbBool)))

  // DescriptorProto: nested_type (3) is recursive. The meta-schema
  // keeps an IDENTICAL 4-field layout at every depth (so the walker's
  // positional reads are uniform) and bottoms out at depth 5 with a
  // name-only leaf — deeper message-type nesting than 5 is out of
  // scope and fails loudly in build() (the name-only leaf is detected
  // there; it must never be built as a silently-empty message).
  private def descriptorProto(depth: Int): PbMessage = {
    val nestedT: PbType =
      if (depth <= 0) PbMessage(Seq(PbField(1, "name", PbString)))
      else descriptorProto(depth - 1)
    PbMessage(Seq(
      PbField(1, "name", PbString),
      PbField(2, "field", PbRepeated(fieldDescriptorProto)),
      PbField(3, "nested_type", PbRepeated(nestedT)),
      PbField(7, "options", messageOptions)))
  }

  private val fileDescriptorProto = PbMessage(Seq(
    PbField(1, "name", PbString),
    PbField(2, "package", PbString),
    PbField(4, "message_type", PbRepeated(descriptorProto(4)))))

  private val fileDescriptorSet = PbMessage(Seq(
    PbField(1, "file", PbRepeated(fileDescriptorProto))))

  /** Exposed for spec use: encode a descriptor set with the same
    * meta-schema to test the parse against a protoc-shaped artifact. */
  private[graft] def metaSchema: PbMessage = fileDescriptorSet

  // FieldDescriptorProto.Type enum values (descriptor.proto)
  private val TYPE_DOUBLE = 1; private val TYPE_FLOAT = 2
  private val TYPE_INT64 = 3; private val TYPE_UINT64 = 4
  private val TYPE_INT32 = 5; private val TYPE_FIXED64 = 6
  private val TYPE_FIXED32 = 7; private val TYPE_BOOL = 8
  private val TYPE_STRING = 9; private val TYPE_MESSAGE = 11
  private val TYPE_BYTES = 12; private val TYPE_UINT32 = 13
  private val TYPE_ENUM = 14; private val TYPE_SFIXED32 = 15
  private val TYPE_SFIXED64 = 16; private val TYPE_SINT32 = 17
  private val TYPE_SINT64 = 18
  private val LABEL_REPEATED = 3

  private final case class RawMsg(fqName: String, row: InternalRow, mapEntry: Boolean)

  /** Parse a serialized FileDescriptorSet and return the [[PbMessage]]
    * for `messageName` (simple or fully-qualified, case-sensitive).
    */
  def fromDescriptorSet(bytes: Array[Byte], messageName: String): PbMessage = {
    val set = Proto.decodeInternal(bytes, fileDescriptorSet)
    // flatten all messages (including nested) into a fq-name index
    val index = scala.collection.mutable.LinkedHashMap.empty[String, RawMsg]
    val files = set.getArray(0)
    var fi = 0
    while (fi < files.numElements()) {
      val file = files.getStruct(fi, 3)
      val pkg = if (file.isNullAt(1)) "" else file.getUTF8String(1).toString
      val msgs = if (file.isNullAt(2)) null else file.getArray(2)
      if (msgs != null) {
        var mi = 0
        while (mi < msgs.numElements()) {
          collect(msgs.getStruct(mi, 4), if (pkg.isEmpty) "" else s".$pkg", index)
          mi += 1
        }
      }
      fi += 1
    }
    val hit = index.get(messageName)
      .orElse(index.get(s".$messageName"))
      .orElse(index.values.find(_.fqName.endsWith(s".$messageName")))
      .getOrElse(throw new IllegalArgumentException(
        s"message '$messageName' not in descriptor set; have: ${index.keys.mkString(", ")}"))
    build(hit, index)
  }

  /** Depth-first collect of (nested) messages into the fq-name index.
    * Guards on numFields so the depth-5 name-only leaf is safe. */
  private def collect(msg: InternalRow, parentFq: String,
                      index: scala.collection.mutable.LinkedHashMap[String, RawMsg]): Unit = {
    val name = msg.getUTF8String(0).toString
    val fq = s"$parentFq.$name"
    val mapEntry = msg.numFields > 3 && !msg.isNullAt(3) && {
      val opts = msg.getStruct(3, 1)
      !opts.isNullAt(0) && opts.getBoolean(0)
    }
    index.put(fq, RawMsg(fq, msg, mapEntry))
    if (msg.numFields > 2 && !msg.isNullAt(2)) {
      val nested = msg.getArray(2)
      var i = 0
      while (i < nested.numElements()) {
        collect(nested.getStruct(i, 4), fq, index)
        i += 1
      }
    }
  }

  private def scalarOf(tpe: Int, fq: String): PbType = tpe match {
    case TYPE_DOUBLE => PbDouble
    case TYPE_FLOAT => PbFloat
    case TYPE_INT64 | TYPE_UINT64 => PbInt64
    case TYPE_INT32 | TYPE_UINT32 | TYPE_ENUM => PbInt32 // enum = varint int32
    case TYPE_FIXED64 | TYPE_SFIXED64 => PbFixed64
    case TYPE_FIXED32 | TYPE_SFIXED32 => PbFixed32
    case TYPE_BOOL => PbBool
    case TYPE_STRING => PbString
    case TYPE_BYTES => PbBytes
    case TYPE_SINT32 => PbSInt32
    case TYPE_SINT64 => PbSInt64
    case other => throw new IllegalArgumentException(
      s"unsupported field type $other in $fq (groups/extensions are out of scope)")
  }

  private def build(raw: RawMsg,
                    index: scala.collection.mutable.LinkedHashMap[String, RawMsg],
                    building: Set[String] = Set.empty): PbMessage = {
    // PbMessage is a finite tree — a self-referential proto (legal in
    // protobuf) cannot be represented, so re-entering a type on the
    // current build path must fail loudly instead of recursing forever
    require(!building.contains(raw.fqName),
      s"recursive message type '${raw.fqName}' is not supported " +
        "(the schema tree cannot represent a cycle)")
    // a name-only row is the depth-5 meta-schema leaf: the message sits
    // BELOW the supported nesting, and building it as an empty message
    // would silently drop every field — fail loudly instead (an empty
    // message at a supported depth carries the full 4-field layout)
    require(raw.row.numFields > 1,
      s"message '${raw.fqName}' is nested deeper than the supported 5 " +
        "levels of message nesting — flatten the schema")
    val fieldsArr =
      if (raw.row.isNullAt(1)) null else raw.row.getArray(1)
    val fields = scala.collection.mutable.ArrayBuffer.empty[PbField]
    if (fieldsArr != null) {
      var i = 0
      while (i < fieldsArr.numElements()) {
        val f = fieldsArr.getStruct(i, 5)
        val name = f.getUTF8String(0).toString
        val number = f.getInt(1)
        val repeated = !f.isNullAt(2) && f.getInt(2) == LABEL_REPEATED
        val tpe = f.getInt(3)
        val elem: PbType =
          if (tpe == TYPE_MESSAGE) {
            val tn = f.getUTF8String(4).toString
            val sub = index.getOrElse(tn, throw new IllegalArgumentException(
              s"type '$tn' not in descriptor set (field ${raw.fqName}.$name)"))
            if (sub.mapEntry) {
              // protoc's map<k,v> compilation: Entry{1:key 2:value}
              val entry = build(sub, index, building + raw.fqName)
              PbMap(entry.fields(0).tpe, entry.fields(1).tpe)
            } else build(sub, index, building + raw.fqName)
          } else scalarOf(tpe, s"${raw.fqName}.$name")
        val finalTpe = elem match {
          case m: PbMap => m // map fields carry LABEL_REPEATED; already a map
          case t if repeated => PbRepeated(t)
          case t => t
        }
        fields += PbField(number, name, finalTpe)
        i += 1
      }
    }
    PbMessage(fields.toSeq)
  }
}
