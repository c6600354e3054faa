package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Map-side IVF cell assignment: `nearest_cells(emb)` → array<int> of
  * the `nprobe` nearest centroid cell ids, nearest first (cosine,
  * ties broken by smaller cell id — the same ordering the previous
  * crossJoin+row_number assign produced).
  *
  * The centroid matrix rides inside the expression as a reference
  * object, so every task gets it with the serialized plan — the same
  * driver→executor shipping a broadcast join does, but with ZERO extra
  * rows: the old assign exploded n×k rows through a Window exchange
  * (reference sizing: n=10¹⁰, k=10⁵ → a 10¹⁵-row shuffle); this is a
  * per-row O(k·dim) loop inside whole-stage codegen with no shuffle at
  * all. Mirrors the build side of the reference's lookup-join pattern
  * (flink-table/…/lookup) where the small side lives with the task.
  */
object NearestCells {
  /** Static kernel shared by eval and generated code. Returns the
    * `nprobe` cell ids ordered by (cosine desc, cell asc).
    */
  def compute(vec: ArrayData, cells: Array[Int], matrix: Array[Array[Float]],
              norms: Array[Double], nprobe: Int): ArrayData = {
    val k = cells.length
    val m = math.min(nprobe, k)
    val topSim = new Array[Double](m)
    val topCell = new Array[Int](m)
    var filled = 0
    // vector norm over the full embedding (dims are uniform per table)
    var nv = 0.0
    val nd = vec.numElements()
    var d = 0
    while (d < nd) { val x = vec.getFloat(d).toDouble; nv += x * x; d += 1 }
    val vnorm = math.sqrt(nv)
    var c = 0
    while (c < k) {
      val cent = matrix(c)
      val lim = math.min(nd, cent.length)
      var dot = 0.0
      d = 0
      while (d < lim) { dot += vec.getFloat(d).toDouble * cent(d); d += 1 }
      val sim = if (vnorm == 0.0 || norms(c) == 0.0) 0.0 else dot / (vnorm * norms(c))
      val cell = cells(c)
      // insertion into the small (sim desc, cell asc)-ordered top list
      var pos = filled
      while (pos > 0 && (sim > topSim(pos - 1) ||
        (sim == topSim(pos - 1) && cell < topCell(pos - 1)))) pos -= 1
      if (pos < m) {
        val last = math.min(filled, m - 1)
        var i = last
        while (i > pos) { topSim(i) = topSim(i - 1); topCell(i) = topCell(i - 1); i -= 1 }
        topSim(pos) = sim; topCell(pos) = cell
        if (filled < m) filled += 1
      }
      c += 1
    }
    val out = new Array[Int](filled)
    System.arraycopy(topCell, 0, out, 0, filled)
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class NearestCells(child: Expression, cells: Array[Int],
                        matrix: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression {
  require(cells.length == matrix.length && nprobe >= 1)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("nearest_cells expects array<float>")
  }

  @transient private lazy val norms: Array[Double] =
    matrix.map(c => math.sqrt(c.foldLeft(0.0)((s, x) => s + x.toDouble * x)))

  override def nullSafeEval(vec: Any): Any =
    NearestCells.compute(vec.asInstanceOf[ArrayData], cells, matrix, norms, nprobe)

  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val cellsRef = ctx.addReferenceObj("ivfCells", cells, "int[]")
    val matRef = ctx.addReferenceObj("ivfMatrix", matrix, "float[][]")
    val normsRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.functions.NearestCells.compute($vec, $cellsRef, $matRef, $normsRef, $nprobe);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nearest_cells"
}

/** 64 random-hyperplane sign bits of an embedding —
  * `hyperplane_bits64(emb)` → bigint. Plane p is a deterministic
  * Rademacher (±1) vector derived per (plane, dimension) from the
  * shared mix64 hash, so the same embedding always lands on the same
  * bits without materializing a plane matrix. Two embeddings at angle
  * θ disagree on each bit with probability θ/π, so
  * `hamming64(bits_a, bits_b)/64 · π` estimates the angle — the
  * classic cosine-LSH (SimHash-for-vectors) sketch; banding the bits
  * gives near-dup candidate buckets (see NearDup for the text analog).
  */
object HyperplaneBits64 {
  /** Static kernel shared by eval and generated code. */
  def compute(vec: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = vec.numElements()
    var bits = 0L
    var p = 0
    while (p < 64) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val h = Hashing.mix64((p.toLong << 32) | (d.toLong & 0xFFFFFFFFL))
        val s = if ((h & 1L) == 1L) 1.0 else -1.0
        dot += vec.getFloat(d).toDouble * s
        d += 1
      }
      if (dot >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }
}

case class HyperplaneBits64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("hyperplane_bits64 expects array<float>")
  }
  override def nullSafeEval(vec: Any): Any =
    HyperplaneBits64.compute(vec.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.functions.HyperplaneBits64.compute($vec);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "hyperplane_bits64"
}

object VectorFns {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def nearest_cells(emb: Column, cells: Array[Int],
                    matrix: Array[Array[Float]], nprobe: Int): Column =
    column(NearestCells(Cast(expression(emb), ArrayType(FloatType)),
      cells, matrix, nprobe))
  def hyperplane_bits64(emb: Column): Column =
    column(HyperplaneBits64(Cast(expression(emb), ArrayType(FloatType))))
}
