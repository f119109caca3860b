package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst AGGREGATE function for HyperLogLog register
  * tables — the extension-point class the scalar expressions
  * (blake2b, shingles, cosine…) don't exercise: a
  * `TypedImperativeAggregate` with a mutable m-byte buffer, real
  * partial aggregation (map-side `update`, shuffle `serialize`/
  * `deserialize`, reduce-side `merge` by register-wise max) and an
  * `eval` that publishes the registers.
  *
  * Arithmetic is EXACTLY [[graft.operators.Sketches.hllRegisters]]'
  * (and the q264 DuckDB oracle's): the child is a 48-bit hash;
  * register = top `p` bits, rank = `48−p+1 − bitlength(remainder)`
  * capped at `cap` (remainder 0 ⇒ cap). The buffer is one byte per
  * register — the whole aggregation state for a 100 TB stream is
  * 2^p bytes per group, merged associatively and idempotently (max),
  * so replays and re-partitioning are invisible by construction.
  *
  * Output: array<long> of length 2^p (0 = register never hit) —
  * exactly the dense register table the estimator folds over.
  */
case class HllRegistersAgg(
    child: Expression, p: Int, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 14, s"p out of range: $p")
  require(cap >= 1 && cap <= 127, s"cap out of range: $cap")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("hll_registers_agg requires a BIGINT hash " +
        s"column, got ${child.dataType.catalogString} (CAST conv(...) " +
        "results — conv returns STRING)")
  private val m = 1 << p
  private val wBits = 48 - p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = (h >>> wBits).toInt
      val w = h & ((1L << wBits) - 1)
      val r =
        if (w == 0L) cap
        else math.min(
          wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w)), cap)
      if (r > buf(reg)) buf(reg) = r.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "hll_registers_agg"
}

object HllAgg {
  /** Column wrapper: `hllRegistersAgg(hash48Col, p, cap)`. */
  def hllRegistersAgg(hash: Column, p: Int, cap: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HllRegistersAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(hash), p, cap)
        .toAggregateExpression())
}
