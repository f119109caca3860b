package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused loop kernel for cosine similarity, shared by the interpreted
  * and generated code paths. Accumulation is index-order double — the
  * same order as the `aggregate(zip_with(...))` composition it
  * replaces, so results are bit-identical (and the DuckDB oracle
  * unaffected). Returns null (boxed) when lengths differ or any
  * element is null, mirroring zip_with's null propagation. */
object VectorKernels {

  def cosineF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def cosineD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Plain-array cosine for partition-local (non-Catalyst) callers —
    * same index-order double accumulation as [[cosineF]], so scores
    * are bit-identical to the expression path. NaN on zero vectors,
    * like the expression. */
  def cosineArr(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Argmax-cosine centroid id for a float vector: one fused pass,
    * no per-row allocation beyond a dim-sized scratch copy. Ties
    * break to the LOWER id (strict `>`); a centroid whose length
    * differs from the vector, or whose cosine is NaN, never wins;
    * a vector with a null element (or no winnable centroid) lands in
    * list 0 — mirroring the former crossJoin+window assignment's
    * `orderBy(cos desc, list_id asc)` with null cosines losing. */
  def nearestF(a: ArrayData, cs: Array[Array[Double]],
               norms: Array[Double]): Long = {
    val n = a.numElements()
    val v = new Array[Double](n)
    var na = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L
      val x = a.getFloat(i).toDouble
      v(i) = x; na += x * x
      i += 1
    }
    nearestPrepared(v, math.sqrt(na), cs, norms)
  }

  /** Double-vector variant of [[nearestF]]. */
  def nearestD(a: ArrayData, cs: Array[Array[Double]],
               norms: Array[Double]): Long = {
    val n = a.numElements()
    val v = new Array[Double](n)
    var na = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L
      val x = a.getDouble(i)
      v(i) = x; na += x * x
      i += 1
    }
    nearestPrepared(v, math.sqrt(na), cs, norms)
  }

  private def nearestPrepared(v: Array[Double], sna: Double,
                              cs: Array[Array[Double]],
                              norms: Array[Double]): Long = {
    val n = v.length
    var best = -1
    var bestD = Double.NegativeInfinity
    var j = 0
    while (j < cs.length) {
      val c = cs(j)
      if (c.length == n) {
        var dot = 0.0
        var k = 0
        while (k < n) { dot += v(k) * c(k); k += 1 }
        val d = dot / (sna * norms(j))
        if (d > bestD) { bestD = d; best = j }
      }
      j += 1
    }
    if (best < 0) 0L else best.toLong
  }
}

/** Native Catalyst expression for cosine similarity of two
  * equal-element-type float/double array columns.
  *
  * The `aggregate(zip_with(...))` composition it replaces is built
  * from higher-order functions, which are CodegenFallback — every row
  * pays interpreted lambda dispatch and an intermediate product
  * array. This expression stays inside whole-stage codegen (the
  * generated code is one static call into the fused kernel) and
  * allocates nothing per row — the hot-loop shape brute-force
  * similarity needs at corpus scale. */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<float> or two array<double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private def kernel: String =
    if (elemType(left).contains(FloatType)) "cosineF" else "cosineD"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r =
      if (elemType(left).contains(FloatType))
        VectorKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      else
        VectorKernels.cosineD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cos")
      s"""
         |java.lang.Double $r = graft.functions.VectorKernels.$kernel($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
