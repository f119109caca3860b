package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as a single per-row expression: the
  * argmax-cosine list id over a small driver-side centroid matrix
  * (k × dim — IVF coarse-quantizer metadata, broadcast into the
  * generated code as a reference object).
  *
  * This replaces IvfIndex's former crossJoin + `row_number() over
  * (partition by row-id)` argmin — a window partitioned by a per-row
  * unique id, i.e. a full hash shuffle of k×|corpus| rows per call.
  * As a pure projection the assignment shuffles NOTHING: the corpus is
  * mapped in place, stays in whole-stage codegen, and at 100 TB the
  * Lloyd loop touches each row exactly once per iteration with no
  * exchange at all. Centroid norms are precomputed once per plan, not
  * per row.
  *
  * Tie/NaN semantics mirror the old window's
  * `orderBy(cos desc, list_id asc)` (see [[VectorKernels.nearestF]]).
  */
case class NearestCentroid(child: Expression,
                           centroids: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires an array<float> or array<double> argument, " +
        s"got ${other.catalogString}")
  }

  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  private def isFloat: Boolean =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  override protected def nullSafeEval(input: Any): Any =
    if (isFloat)
      VectorKernels.nearestF(input.asInstanceOf[ArrayData], centroids, norms)
    else
      VectorKernels.nearestD(input.asInstanceOf[ArrayData], centroids, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    val kernel = if (isFloat) "nearestF" else "nearestD"
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.$kernel($c, $cRef, $nRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
