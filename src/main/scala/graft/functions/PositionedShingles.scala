package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (UDTF) for positioned token n-grams —
  * the third leg of the §2.10 extension triple next to the codegen
  * scalar expressions (blake2b, shingles…) and the
  * [[HllRegistersAgg]] aggregate: one input row fans out to
  * (pos, ngram) rows STREAMED through the `Generate` operator, never
  * materializing the per-document shingle array the
  * `explode(shingles(...))` composition allocates first — on a
  * 100 TB corpus of long documents that intermediate array is pure
  * memory pressure with no consumer. Tokenization delegates to
  * [[ShingleKernel]]'s trim/split so the rows are byte-identical to
  * the composed form (q313 pins it against the family oracle).
  */
case class PositionedShingles(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"positioned_shingles requires a string argument, got " +
        child.dataType.catalogString)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val arr = ShingleKernel
        .shingles(v.asInstanceOf[UTF8String], n)
      (0 until arr.numElements()).iterator.map { i =>
        InternalRow(i, arr.get(i, StringType))
      }
    }
  }

  override def prettyName: String = "positioned_shingles"
  override protected def withNewChildInternal(
      newChild: Expression): PositionedShingles = copy(child = newChild)
}

object PositionedShingles {
  /** Column wrapper; use with `.as(Seq("pos", "ngram"))`. */
  def positionedShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(PositionedShingles(
      org.apache.spark.sql.GraftSqlBridge.expression(text), n))
}
