package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the compression path
  * for similarity search at 100 TB: a D-dim float vector (256 B at
  * D=64) becomes M sub-codes (M ints ≤ 1 B each), so a 10¹⁰-vector
  * corpus's index fits in cluster memory. Both kernels are map-side
  * codegen'd Expressions over broadcast codebooks — encoding and
  * scoring add zero shuffles.
  */
object PqKernels {
  /** argmin-L2 code per subspace. codebooks: [M][K][dSub]. */
  def encode(vec: ArrayData, codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val dSub = cb(0).length
      val off = s * dSub
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < cb.length) {
        var d = 0.0
        var i = 0
        while (i < dSub) {
          val diff = vec.getFloat(off + i).toDouble - cb(k)(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Asymmetric distance (ADC): Σ_m ||q_sub(m) − cb[m][codes[m]]||².
    * Accumulation order: per-subspace inner sum (i ascending), then
    * outer sum (m ascending) — mirrored exactly by the oracle's nested
    * left-to-right list folds, so results are bit-identical.
    */
  def adc(q: ArrayData, codes: ArrayData, codebooks: Array[Array[Array[Float]]]): Double = {
    val m = codebooks.length
    var total = 0.0
    var s = 0
    while (s < m) {
      val cw = codebooks(s)(codes.getInt(s))
      val dSub = cw.length
      val off = s * dSub
      var sub = 0.0
      var i = 0
      while (i < dSub) {
        val diff = q.getFloat(off + i).toDouble - cw(i).toDouble
        sub += diff * diff
        i += 1
      }
      total += sub
      s += 1
    }
    total
  }

  /** Per-query ADC lookup table — the standard PQ search trick (Jégou
    * et al. §IV.A, FAISS's precomputed tables): lut[s·K + c] =
    * ||q_sub(s) − cb[s][c]||², computed ONCE per query (M·K·dSub work),
    * after which every candidate costs M array reads + M adds instead
    * of M·dSub multiply-adds. Each entry is the exact inner sum of
    * [[adc]] (i ascending), so summing entries in s-ascending order
    * reproduces adc's accumulation sequence bit-for-bit.
    */
  def adcLut(q: ArrayData, codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    val k = codebooks(0).length
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val dSub = cb(0).length
      val off = s * dSub
      var c = 0
      while (c < k) {
        val cw = cb(c)
        var sub = 0.0
        var i = 0
        while (i < dSub) {
          val diff = q.getFloat(off + i).toDouble - cw(i).toDouble
          sub += diff * diff
          i += 1
        }
        out(s * k + c) = sub
        c += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Residual-ADC lookup table (IVF-PQ): lut[s·K + c] =
    * ||q_sub − cent_sub − cb[s][c]||², the exact inner sum of
    * [[PqResidualKernels.adcResidual]]. One table per (query, cell)
    * probe row.
    */
  def adcLutResidual(q: ArrayData, cent: ArrayData,
                     codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    val k = codebooks(0).length
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val dSub = cb(0).length
      val off = s * dSub
      var c = 0
      while (c < k) {
        val cw = cb(c)
        var sub = 0.0
        var i = 0
        while (i < dSub) {
          val d = q.getFloat(off + i).toDouble -
            cent.getFloat(off + i).toDouble - cw(i).toDouble
          sub += d * d
          i += 1
        }
        out(s * k + c) = sub
        c += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Candidate scoring from a precomputed table: Σ_s lut[s·K +
    * codes[s]], s ascending — the same outer `total += sub` sequence
    * as [[adc]]/[[PqResidualKernels.adcResidual]] over identical
    * per-subspace values → bit-identical totals.
    */
  def adcFromLut(lut: ArrayData, codes: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var total = 0.0
    var s = 0
    while (s < m) {
      total += lut.getDouble(s * k + codes.getInt(s))
      s += 1
    }
    total
  }
}

object PqResidualKernels {
  /** ADC against RESIDUAL codebooks (IVF-PQ): the candidate was
    * encoded as `vec − cellCentroid`, so the query side subtracts the
    * same centroid: Σ_m ||q_sub − cent_sub − cb[m][codes[m]]||².
    * All three terms are widened to double BEFORE any subtraction, so
    * the oracle can replicate the arithmetic exactly (a float-typed
    * intermediate residual would make cross-engine parity depend on
    * each engine's float-promotion rules).
    */
  def adcResidual(q: ArrayData, cent: ArrayData, codes: ArrayData,
                  codebooks: Array[Array[Array[Float]]]): Double = {
    val m = codebooks.length
    var total = 0.0
    var s = 0
    while (s < m) {
      val cw = codebooks(s)(codes.getInt(s))
      val dSub = cw.length
      val off = s * dSub
      var sub = 0.0
      var i = 0
      while (i < dSub) {
        val d = q.getFloat(off + i).toDouble -
          cent.getFloat(off + i).toDouble - cw(i).toDouble
        sub += d * d
        i += 1
      }
      total += sub
      s += 1
    }
    total
  }
}

case class PqAdcResidual(first: Expression, second: Expression, third: Expression,
                         codebooks: Array[Array[Array[Float]]])
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_adc_residual expects (array<float> q, array<float> centroid, array<int> codes)")
    }
  override def nullSafeEval(q: Any, cent: Any, codes: Any): Any =
    PqResidualKernels.adcResidual(q.asInstanceOf[ArrayData],
      cent.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (q, c, cd) =>
      s"${ev.value} = graft.functions.PqResidualKernels.adcResidual($q, $c, $cd, $cbRef);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "pq_adc_residual"
}

case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("pq_encode expects array<float>")
  }
  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.encode($c, $cbRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_encode"
}

case class PqAdc(left: Expression, right: Expression,
                 codebooks: Array[Array[Array[Float]]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "pq_adc expects (array<float> query, array<int> codes)")
  }
  override def nullSafeEval(q: Any, codes: Any): Any =
    PqKernels.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.PqKernels.adc($q, $c, $cbRef);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

case class PqAdcLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("pq_adc_lut expects array<float>")
  }
  override def nullSafeEval(q: Any): Any =
    PqKernels.adcLut(q.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, q =>
      s"${ev.value} = graft.functions.PqKernels.adcLut($q, $cbRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_adc_lut"
}

case class PqAdcLutResidual(left: Expression, right: Expression,
                            codebooks: Array[Array[Array[Float]]])
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "pq_adc_lut_residual expects (array<float> q, array<float> centroid)")
  }
  override def nullSafeEval(q: Any, cent: Any): Any =
    PqKernels.adcLutResidual(q.asInstanceOf[ArrayData], cent.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.PqKernels.adcLutResidual($q, $c, $cbRef);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_lut_residual"
}

case class PqAdcFromLut(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k > 0)
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "pq_adc_from_lut expects (array<double> lut, array<int> codes)")
  }
  override def nullSafeEval(lut: Any, codes: Any): Any =
    PqKernels.adcFromLut(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: codegen.CodegenContext,
      ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) =>
      s"${ev.value} = graft.functions.PqKernels.adcFromLut($lut, $codes, $k);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_from_lut"
}

object PqFns {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    column(PqEncode(expression(vec), codebooks))
  def pq_adc(q: Column, codes: Column, codebooks: Array[Array[Array[Float]]]): Column =
    column(PqAdc(expression(q), expression(codes), codebooks))
  def pq_adc_residual(q: Column, cent: Column, codes: Column,
                      codebooks: Array[Array[Array[Float]]]): Column =
    column(PqAdcResidual(expression(q), expression(cent), expression(codes), codebooks))
  def pq_adc_lut(q: Column, codebooks: Array[Array[Array[Float]]]): Column =
    column(PqAdcLut(expression(q), codebooks))
  def pq_adc_lut_residual(q: Column, cent: Column,
                          codebooks: Array[Array[Array[Float]]]): Column =
    column(PqAdcLutResidual(expression(q), expression(cent), codebooks))
  def pq_adc_from_lut(lut: Column, codes: Column, k: Int): Column =
    column(PqAdcFromLut(expression(lut), expression(codes), k))
}
