package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.types._

import graft.sources.Proto
import graft.sources.Proto.PbMessage

/** Column-level protobuf decode/encode over the schema-declared wire
  * codec in [[graft.sources.Proto]] (reference semantic anchor:
  * flink-formats/flink-protobuf/.../ProtoToRowConverter.java:53 /
  * RowToProtoConverter.java — descriptor-driven binary⇄row).
  *
  * `proto_decode(bin, msg)` : BinaryType → StructType(msg) — the
  * `from_protobuf` shape; `proto_encode(struct, msg)` : StructType →
  * BinaryType — the `to_protobuf` shape. Both are deterministic
  * null-intolerant unary expressions operating directly on Catalyst
  * internal values (no external conversion), evaluated via
  * CodegenFallback — one virtual call per MESSAGE (not per field), so
  * they sit fine inside a WholeStageCodegen pipeline the way
  * from_json does.
  */
final case class ProtoDecode(child: Expression, msg: PbMessage)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Proto.sqlType(msg)
  override def prettyName: String = "proto_decode"
  override protected def nullSafeEval(input: Any): Any =
    Proto.decodeInternal(input.asInstanceOf[Array[Byte]], msg)
  override protected def withNewChildInternal(newChild: Expression): ProtoDecode =
    copy(child = newChild)
}

final case class ProtoEncode(child: Expression, msg: PbMessage)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "proto_encode"
  override protected def nullSafeEval(input: Any): Any =
    Proto.encodeInternal(input.asInstanceOf[InternalRow], msg)
  override protected def withNewChildInternal(newChild: Expression): ProtoEncode =
    copy(child = newChild)
}

object proto {
  def protoDecode(col: Column, msg: PbMessage): Column =
    column(ProtoDecode(expression(col), msg))
  def protoEncode(col: Column, msg: PbMessage): Column =
    column(ProtoEncode(expression(col), msg))
}
