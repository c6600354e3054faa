package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, TimestampType}

/** Per-RECORD processing time — the reference's `PROCTIME()`
  * (FlinkSqlOperatorTable PROCTIME; SURVEY.md §2.8 row 62).
  *
  * Spark's `current_timestamp()` is frozen per query/micro-batch
  * (deterministic fold), which is the documented narrowing this closes:
  * a NONDETERMINISTIC leaf expression is re-evaluated for every row,
  * so each record is stamped when the executor actually processes it —
  * Flink's per-record proctime semantics. Codegen'd (a
  * `System.currentTimeMillis()` call inlined per row), no UDF overhead;
  * by design NOT oracle-comparable (wall-clock), spec-gated instead:
  * values are non-decreasing within a partition and span the batch's
  * processing interval, and two references in one projection may
  * differ — exactly the behaviors that distinguish it from
  * `current_timestamp()`.
  */
final case class ProcTime() extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = TimestampType
  override def prettyName: String = "proctime"
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    System.currentTimeMillis() * 1000L // micros
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("proctime")
    ev.copy(
      code = code"final long $v = System.currentTimeMillis() * 1000L;",
      isNull = FalseLiteral,
      value = JavaCode.variable(v, CodeGenerator.javaClass(dataType)))
  }
}

object proctime {
  /** `PROCTIME()` as a Column. */
  def proctime(): Column = column(ProcTime())
}
