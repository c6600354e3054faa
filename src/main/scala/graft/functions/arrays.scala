package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |a ∩ b| for two SORTED, DISTINCT string arrays via a linear merge —
  * no per-row hash set like Spark's generic `array_intersect` builds.
  * Used by the exact-Jaccard pair operator where both sides come out
  * of `array_sort(array_distinct(...))`; on a pair join this is the
  * per-row hot path.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_count expects two array<string>")
  }
  // null elements are SKIPPED (treated as absent from the set) — they
  // would otherwise NPE the comparator; checked only when the static
  // array type says nulls can occur (split() output is containsNull=
  // false, so the dedup hot path pays nothing)
  @transient private lazy val mayHaveNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      if (mayHaveNulls && x.isNullAt(i)) i += 1
      else if (mayHaveNulls && y.isNullAt(j)) j += 1
      else {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val skipNulls =
        if (mayHaveNulls)
          s"""if ($a.isNullAt($i)) { $i++; continue; }
             |  if ($b.isNullAt($j)) { $j++; continue; }""".stripMargin
        else ""
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  $skipNulls
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

/** Number of DISTINCT width-`w` token shingles in one pass — no
  * intermediate shingle strings, no array materialization: shingles
  * are compared as tuples of the token UTF8Strings in a hash set.
  * Exact (not hash-sketched), so it matches a string-building oracle.
  */
case class DistinctShingleCount(child: Expression, width: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = child
  override def right: Expression = width
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if width.foldable &&
        width.dataType == IntegerType =>
      width.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
        case ww: Int if ww >= 1 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"distinct_shingle_count expects a positive constant width, got $other")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      "distinct_shingle_count expects (array<string>, foldable int)")
  }
  @transient private lazy val w: Int =
    width.eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Int]

  override def nullSafeEval(tokens: Any, wv: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) 0
    else {
      val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
      val seen = new java.util.HashSet[Seq[org.apache.spark.unsafe.types.UTF8String]]()
      i = 0
      while (i <= n - w) {
        seen.add(toks.slice(i, i + w).toSeq)
        i += 1
      }
      seen.size()
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, width = r)
  override def prettyName: String = "distinct_shingle_count"
}

/** Occurrence count of the MOST FREQUENT width-`w` token shingle, in
  * one map-side pass (the Gopher top-n-gram numerator) — paired with
  * the total shingle count this gives the top-n-gram fraction with
  * ZERO shuffles, where the explode→groupBy→groupBy formulation costs
  * two. Same tuple-of-UTF8String key discipline as
  * [[DistinctShingleCount]], so both match a string-building oracle.
  */
case class TopShingleCount(child: Expression, width: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = child
  override def right: Expression = width
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if width.foldable &&
        width.dataType == IntegerType =>
      width.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
        case ww: Int if ww >= 1 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"top_shingle_count expects a positive constant width, got $other")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      "top_shingle_count expects (array<string>, foldable int)")
  }
  @transient private lazy val w: Int =
    width.eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Int]

  override def nullSafeEval(tokens: Any, wv: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) 0
    else {
      val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
      val counts = new java.util.HashMap[Seq[org.apache.spark.unsafe.types.UTF8String], Int]()
      var best = 0
      i = 0
      while (i <= n - w) {
        val key = toks.slice(i, i + w).toSeq
        val c = counts.merge(key, 1, (a, b) => a + b)
        if (c > best) best = c
        i += 1
      }
      best
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, width = r)
  override def prettyName: String = "top_shingle_count"
}

object ArrayFns {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
  def distinct_shingle_count(tokens: Column, width: Int): Column =
    column(DistinctShingleCount(expression(tokens), Literal(width)))
  def top_shingle_count(tokens: Column, width: Int): Column =
    column(TopShingleCount(expression(tokens), Literal(width)))
}
