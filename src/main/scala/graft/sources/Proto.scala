package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf format — schema-declared wire-format codec (SURVEY.md §2.1;
  * reference: flink-formats/flink-protobuf/.../deserialize/
  * ProtoToRowConverter.java:53 and serialize/RowToProtoConverter.java —
  * descriptor-driven binary⇄row conversion).
  *
  * The sandbox classpath has NO protobuf runtime (`com.google.protobuf`
  * appears only shaded inside ORC jars), so the reference's
  * descriptor-object approach is unavailable. Instead the message shape
  * is declared with [[PbType]]/[[PbMessage]] — the same information a
  * descriptor carries — and the WIRE FORMAT itself is implemented
  * directly from its public specification
  * (https://protobuf.dev/programming-guides/encoding/): base-128
  * varints, ZigZag sints, little-endian fixed32/64, length-delimited
  * strings/bytes/messages, packed repeated scalars, maps as repeated
  * `{1: key, 2: value}` entry messages.
  *
  * proto3 semantics, matching the reference's defaults:
  *  - scalar fields with default values (0 / "" / false / empty bytes)
  *    are omitted on encode and materialize as defaults on decode —
  *    encode∘decode is identity on non-null rows;
  *  - unknown fields are skipped by wire type (schema evolution);
  *  - repeated numeric scalars decode from BOTH packed and unpacked
  *    encodings (the spec requires parsers to accept both) and encode
  *    packed, the proto3 default;
  *  - a null Spark value encodes as an absent field (proto3 has no
  *    field presence for plain scalars).
  *
  * Values are produced/consumed in Catalyst's INTERNAL representation
  * (UTF8String / GenericArrayData / ArrayBasedMapData / InternalRow) so
  * the [[graft.functions.ProtoDecode]] / [[graft.functions.ProtoEncode]]
  * expressions evaluate with zero conversion overhead — the decode hot
  * path at 100 TB is one object tree per message, no reflection.
  */
object Proto {

  // ---- message shape (the descriptor equivalent) ----------------------

  sealed trait PbType
  case object PbInt32 extends PbType // varint
  case object PbInt64 extends PbType // varint
  case object PbSInt32 extends PbType // zigzag varint
  case object PbSInt64 extends PbType // zigzag varint
  case object PbBool extends PbType // varint 0/1
  case object PbFixed32 extends PbType // little-endian 4B (int)
  case object PbFixed64 extends PbType // little-endian 8B (long)
  case object PbFloat extends PbType // little-endian 4B
  case object PbDouble extends PbType // little-endian 8B
  case object PbString extends PbType // length-delimited UTF-8
  case object PbBytes extends PbType // length-delimited raw
  final case class PbRepeated(elem: PbType) extends PbType
  final case class PbMap(key: PbType, value: PbType) extends PbType
  final case class PbMessage(fields: Seq[PbField]) extends PbType
  final case class PbField(no: Int, name: String, tpe: PbType)

  /** Catalyst type of a message/field — the decode output schema. */
  def sqlType(t: PbType): DataType = t match {
    case PbInt32 | PbSInt32 | PbFixed32 => IntegerType
    case PbInt64 | PbSInt64 | PbFixed64 => LongType
    case PbBool => BooleanType
    case PbFloat => FloatType
    case PbDouble => DoubleType
    case PbString => StringType
    case PbBytes => BinaryType
    case PbRepeated(e) => ArrayType(sqlType(e), containsNull = false)
    case PbMap(k, v) => MapType(sqlType(k), sqlType(v), valueContainsNull = false)
    case PbMessage(fs) =>
      StructType(fs.map(f => StructField(f.name, sqlType(f.tpe), nullable = true)))
  }

  private def wireType(t: PbType): Int = t match {
    case PbInt32 | PbInt64 | PbSInt32 | PbSInt64 | PbBool => 0
    case PbFixed64 | PbDouble => 1
    case PbFixed32 | PbFloat => 5
    case _ => 2 // length-delimited: string/bytes/message/packed/map entry
  }

  private def isPackedScalar(t: PbType): Boolean = t match {
    case PbString | PbBytes | _: PbMessage | _: PbRepeated | _: PbMap => false
    case _ => true
  }

  /** proto3 default for an absent scalar field. */
  private def defaultOf(t: PbType): Any = t match {
    case PbInt32 | PbSInt32 | PbFixed32 => 0
    case PbInt64 | PbSInt64 | PbFixed64 => 0L
    case PbBool => false
    case PbFloat => 0.0f
    case PbDouble => 0.0d
    case PbString => UTF8String.EMPTY_UTF8
    case PbBytes => Array.emptyByteArray
    case PbRepeated(_) => new GenericArrayData(Array.empty[Any])
    case PbMap(_, _) =>
      new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]),
                            new GenericArrayData(Array.empty[Any]))
    case m: PbMessage => null // absent sub-message IS null (proto3 presence)
  }

  // ---- encoder --------------------------------------------------------

  /** Growable little-endian byte sink. Messages are encoded inside-out
    * via sub-buffers (a nested message's length prefixes its bytes).
    */
  private final class Buf(initial: Int = 64) {
    private var arr = new Array[Byte](initial)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var cap = arr.length * 2
        while (cap < len + n) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def byte(b: Int): Unit = { ensure(1); arr(len) = b.toByte; len += 1 }
    def bytes(bs: Array[Byte]): Unit = { ensure(bs.length); System.arraycopy(bs, 0, arr, len, bs.length); len += bs.length }
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { byte(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      byte((v & 0x7f).toInt)
    }
    def fixed32(v: Int): Unit = { ensure(4); var i = 0; while (i < 4) { arr(len + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }; len += 4 }
    def fixed64(v: Long): Unit = { ensure(8); var i = 0; while (i < 8) { arr(len + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }; len += 8 }
    def result(): Array[Byte] = java.util.Arrays.copyOf(arr, len)
    def size: Int = len
  }

  private def zigzag32(n: Int): Long = (((n << 1) ^ (n >> 31)).toLong) & 0xffffffffL
  private def zigzag64(n: Long): Long = (n << 1) ^ (n >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def tag(no: Int, wt: Int): Long = (no.toLong << 3) | wt

  /** Encode one scalar payload (no tag) into `b`. */
  private def putScalar(b: Buf, t: PbType, v: Any): Unit = t match {
    case PbInt32 => b.varint(v.asInstanceOf[Int].toLong) // sign-extended to 10B, per spec
    case PbInt64 => b.varint(v.asInstanceOf[Long])
    case PbSInt32 => b.varint(zigzag32(v.asInstanceOf[Int]))
    case PbSInt64 => b.varint(zigzag64(v.asInstanceOf[Long]))
    case PbBool => b.varint(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case PbFixed32 => b.fixed32(v.asInstanceOf[Int])
    case PbFixed64 => b.fixed64(v.asInstanceOf[Long])
    case PbFloat => b.fixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case PbDouble => b.fixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case _ => throw new IllegalArgumentException(s"not a scalar: $t")
  }

  private def isDefault(t: PbType, v: Any): Boolean = t match {
    case PbInt32 | PbSInt32 | PbFixed32 => v.asInstanceOf[Int] == 0
    case PbInt64 | PbSInt64 | PbFixed64 => v.asInstanceOf[Long] == 0L
    case PbBool => !v.asInstanceOf[Boolean]
    case PbFloat => v.asInstanceOf[Float] == 0.0f
    case PbDouble => v.asInstanceOf[Double] == 0.0d
    case PbString => v.asInstanceOf[UTF8String].numBytes() == 0
    case PbBytes => v.asInstanceOf[Array[Byte]].isEmpty
    case _ => false
  }

  private def putField(b: Buf, f: PbField, v: Any): Unit = {
    if (v == null) return // absent (proto3 null ≡ default / no presence)
    f.tpe match {
      case PbRepeated(elem) =>
        val a = v.asInstanceOf[ArrayData]
        val n = a.numElements()
        if (n == 0) return
        // proto3 has no element presence — a NULL inside a repeated
        // field is unrepresentable, so it fails with the field name
        // instead of an opaque NPE deep in the writer (SQL arrays are
        // containsNull by default, nothing upstream strips them)
        def nonNull(e: Any): Any = {
          require(e != null, s"protobuf field '${f.name}': repeated fields " +
            "cannot hold NULL elements (proto3 has no element presence) — " +
            "filter nulls before encoding")
          e
        }
        if (isPackedScalar(elem)) {
          val payload = new Buf()
          var i = 0
          while (i < n) {
            putScalar(payload, elem, nonNull(a.get(i, sqlType(elem)))); i += 1 }
          b.varint(tag(f.no, 2)); b.varint(payload.size.toLong); b.bytes(payload.result())
        } else {
          // Elements are emitted unconditionally — the proto3
          // default-value omission rule applies to SINGULAR fields only;
          // an empty string inside a repeated field is a real element.
          var i = 0
          while (i < n) {
            putElement(b, f.no, elem, nonNull(a.get(i, sqlType(elem))))
            i += 1
          }
        }
      case PbMap(kt, vt) =>
        val m = v.asInstanceOf[MapData]
        val ks = m.keyArray(); val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val entry = new Buf()
          putField(entry, PbField(1, "key", kt), ks.get(i, sqlType(kt)))
          putField(entry, PbField(2, "value", vt), vs.get(i, sqlType(vt)))
          b.varint(tag(f.no, 2)); b.varint(entry.size.toLong); b.bytes(entry.result())
          i += 1
        }
      case m: PbMessage =>
        val sub = encodeInternal(v.asInstanceOf[InternalRow], m)
        b.varint(tag(f.no, 2)); b.varint(sub.length.toLong); b.bytes(sub)
      case PbString =>
        if (!isDefault(PbString, v)) {
          val bs = v.asInstanceOf[UTF8String].getBytes
          b.varint(tag(f.no, 2)); b.varint(bs.length.toLong); b.bytes(bs)
        }
      case PbBytes =>
        if (!isDefault(PbBytes, v)) {
          val bs = v.asInstanceOf[Array[Byte]]
          b.varint(tag(f.no, 2)); b.varint(bs.length.toLong); b.bytes(bs)
        }
      case scalar =>
        if (!isDefault(scalar, v)) { b.varint(tag(f.no, wireType(scalar))); putScalar(b, scalar, v) }
    }
  }

  /** One repeated element (or map entry payload), tagged, no default-skip. */
  private def putElement(b: Buf, no: Int, t: PbType, v: Any): Unit = t match {
    case PbString =>
      val bs = v.asInstanceOf[UTF8String].getBytes
      b.varint(tag(no, 2)); b.varint(bs.length.toLong); b.bytes(bs)
    case PbBytes =>
      val bs = v.asInstanceOf[Array[Byte]]
      b.varint(tag(no, 2)); b.varint(bs.length.toLong); b.bytes(bs)
    case m: PbMessage =>
      val sub = encodeInternal(v.asInstanceOf[InternalRow], m)
      b.varint(tag(no, 2)); b.varint(sub.length.toLong); b.bytes(sub)
    case scalar =>
      b.varint(tag(no, wireType(scalar))); putScalar(b, scalar, v)
  }

  /** Encode an InternalRow (shaped like `sqlType(msg)`) to wire bytes. */
  def encodeInternal(row: InternalRow, msg: PbMessage): Array[Byte] = {
    val b = new Buf()
    var i = 0
    while (i < msg.fields.length) {
      val f = msg.fields(i)
      val v = if (row.isNullAt(i)) null else row.get(i, sqlType(f.tpe))
      putField(b, f, v)
      i += 1
    }
    b.result()
  }

  // ---- decoder --------------------------------------------------------

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift >= 64) throw new IllegalArgumentException("malformed varint")
      }
      v
    }
    def fixed32(): Int = {
      var v = 0; var i = 0
      while (i < 4) { v |= (bytes(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; v
    }
    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def slice(len: Int): Reader = {
      val r = new Reader(bytes, pos, pos + len)
      if (r.end > end) throw new IllegalArgumentException("truncated length-delimited field")
      pos += len; r
    }
    def rawBytes(len: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len); pos += len; out
    }
    def skip(wt: Int): Unit = wt match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => pos += varint().toInt
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  private def readScalar(r: Reader, t: PbType): Any = t match {
    case PbInt32 => r.varint().toInt
    case PbInt64 => r.varint()
    case PbSInt32 => unzigzag(r.varint()).toInt
    case PbSInt64 => unzigzag(r.varint())
    case PbBool => r.varint() != 0L
    case PbFixed32 => r.fixed32()
    case PbFixed64 => r.fixed64()
    case PbFloat => java.lang.Float.intBitsToFloat(r.fixed32())
    case PbDouble => java.lang.Double.longBitsToDouble(r.fixed64())
    case _ => throw new IllegalArgumentException(s"not a scalar: $t")
  }

  /** Decode wire bytes to an InternalRow shaped like `sqlType(msg)`.
    * Absent scalar fields take proto3 defaults; absent sub-messages are
    * null; repeated/map accumulate across appearances (and last-one-wins
    * for repeated non-repeated scalars, per the merge rules).
    */
  def decodeInternal(bytes: Array[Byte], msg: PbMessage): InternalRow =
    decodeMsg(new Reader(bytes, 0, bytes.length), msg)

  // field-number → field-index dispatch, computed ONCE per message
  // SHAPE rather than per decoded message: the expression tree holds
  // one PbMessage object graph, so identity-keyed memoization hits on
  // every row after the first (including nested message types).
  private val byNoCache =
    java.util.Collections.synchronizedMap(
      new java.util.IdentityHashMap[PbMessage, java.util.HashMap[Int, Int]]())

  private def byNoOf(msg: PbMessage): java.util.HashMap[Int, Int] = {
    val hit = byNoCache.get(msg)
    if (hit != null) hit
    else {
      val m = new java.util.HashMap[Int, Int](msg.fields.length * 2)
      msg.fields.zipWithIndex.foreach { case (f, i) => m.put(f.no, i) }
      byNoCache.put(msg, m)
      m
    }
  }

  private def decodeMsg(r: Reader, msg: PbMessage): InternalRow = {
    val n = msg.fields.length
    val byNo = byNoOf(msg)
    val acc = new Array[Any](n)
    val lists = new Array[scala.collection.mutable.ArrayBuffer[Any]](n)
    val mapsK = new Array[scala.collection.mutable.ArrayBuffer[Any]](n)
    val mapsV = new Array[scala.collection.mutable.ArrayBuffer[Any]](n)
    while (r.hasMore) {
      val t = r.varint()
      val no = (t >>> 3).toInt
      val wt = (t & 7).toInt
      val idx = if (byNo.containsKey(no)) byNo.get(no) else -1
      if (idx < 0) r.skip(wt)
      else msg.fields(idx).tpe match {
        case PbRepeated(elem) =>
          if (lists(idx) == null) lists(idx) = scala.collection.mutable.ArrayBuffer.empty[Any]
          if (wt == 2 && isPackedScalar(elem)) {
            val sub = r.slice(r.varint().toInt)
            while (sub.hasMore) lists(idx) += readScalar(sub, elem)
          } else elem match {
            case PbString => lists(idx) += UTF8String.fromBytes(r.rawBytes(r.varint().toInt))
            case PbBytes => lists(idx) += r.rawBytes(r.varint().toInt)
            case m: PbMessage => lists(idx) += decodeMsg(r.slice(r.varint().toInt), m)
            case scalar => lists(idx) += readScalar(r, scalar)
          }
        case PbMap(kt, vt) =>
          if (mapsK(idx) == null) {
            mapsK(idx) = scala.collection.mutable.ArrayBuffer.empty[Any]
            mapsV(idx) = scala.collection.mutable.ArrayBuffer.empty[Any]
          }
          val sub = r.slice(r.varint().toInt)
          var k: Any = defaultOf(kt); var v: Any = defaultOf(vt)
          while (sub.hasMore) {
            val et = sub.varint()
            ((et >>> 3).toInt, (et & 7).toInt) match {
              case (1, ewt) => k = readDelimOrScalar(sub, kt, ewt)
              case (2, ewt) => v = readDelimOrScalar(sub, vt, ewt)
              case (_, ewt) => sub.skip(ewt)
            }
          }
          mapsK(idx) += k; mapsV(idx) += v
        case m: PbMessage => acc(idx) = decodeMsg(r.slice(r.varint().toInt), m)
        case PbString => acc(idx) = UTF8String.fromBytes(r.rawBytes(r.varint().toInt))
        case PbBytes => acc(idx) = r.rawBytes(r.varint().toInt)
        case scalar => acc(idx) = readScalar(r, scalar)
      }
    }
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = msg.fields(i).tpe match {
        case _: PbRepeated =>
          if (lists(i) == null) defaultOf(msg.fields(i).tpe)
          else new GenericArrayData(lists(i).toArray)
        case _: PbMap =>
          if (mapsK(i) == null) defaultOf(msg.fields(i).tpe)
          else new ArrayBasedMapData(new GenericArrayData(mapsK(i).toArray),
                                     new GenericArrayData(mapsV(i).toArray))
        case t => if (acc(i) == null) defaultOf(t) else acc(i)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private def readDelimOrScalar(r: Reader, t: PbType, wt: Int): Any = t match {
    case PbString => UTF8String.fromBytes(r.rawBytes(r.varint().toInt))
    case PbBytes => r.rawBytes(r.varint().toInt)
    case m: PbMessage => decodeMsg(r.slice(r.varint().toInt), m)
    case scalar => readScalar(r, scalar)
  }
}
