package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels shared by the interpreted and
  * generated code paths. Accumulation is index-order double over
  * float-widened elements — the same order as the unrolled
  * element_at composition they replace and as the DuckDB oracle's
  * list_sum comprehension, so codes and LUT distances are
  * bit-identical (PqSpec pins native == composed).
  *
  * Why kernels and not composed expressions: the unrolled subspace-L2
  * tree is k·m·(dim/m) = k·dim terms — at k=16, dim=64 that is 1024
  * arithmetic nodes, which blows the generated `processNext()` past
  * janino's method limits; codegen fails and the whole stage falls
  * back to the interpreter. A reference-object kernel call is one
  * expression node regardless of k and dim. */
object PqKernels {

  /** codes[j] = argmin over codewords of subspace-j squared L2.
    * Strict `<` keeps the SMALLEST codeword index on ties — the
    * row_number(d asc, c asc) order of the oracle. Null elements
    * (never present in real embeddings) encode as code 0. */
  def encodeF(a: ArrayData, cb: Array[Array[Float]], m: Int): ArrayData = {
    val dim = cb(0).length
    val sub = dim / m
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var acc = 0.0
        var i = j * sub
        val end = i + sub
        while (i < end) {
          val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
          val d = x - w(i).toDouble
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** lut[j][c] = subspace-j squared L2 to codeword c — the per-query
    * ADC lookup table. Same accumulation order as [[encodeF]]. */
  def lutF(a: ArrayData, cb: Array[Array[Float]], m: Int): ArrayData = {
    val dim = cb(0).length
    val sub = dim / m
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val row = new Array[Any](cb.length)
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var acc = 0.0
        var i = j * sub
        val end = i + sub
        while (i < end) {
          val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
          val d = x - w(i).toDouble
          acc += d * d
          i += 1
        }
        row(c) = acc
        c += 1
      }
      out(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(out)
  }
}

private[graft] trait PqExprBase extends UnaryExpression {
  def codebook: Array[Array[Float]]
  def m: Int
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.catalogString}")
  }
}

/** m subspace codes for a float vector — one kernel call per row,
  * whole-stage-codegen friendly at any k·dim. */
case class PqEncodeExpr(child: Expression, codebook: Array[Array[Float]],
                        m: Int) extends PqExprBase {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encodeF(input.asInstanceOf[ArrayData], codebook, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.encodeF($c, $cbRef, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** The m×k ADC lookup table for a float query vector. */
case class PqLutExpr(child: Expression, codebook: Array[Array[Float]],
                     m: Int) extends PqExprBase {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.lutF(input.asInstanceOf[ArrayData], codebook, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.lutF($c, $cbRef, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}
