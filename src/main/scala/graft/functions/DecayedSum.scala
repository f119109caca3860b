package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Add, AggregateWindowFunction, AttributeReference, Expression, Greatest, IntegralDivide, Literal, Multiply}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst WINDOW function — the one extension-point class
  * the engine had not yet exercised (scalar `Expression`s, a
  * `Generator`, and a `TypedImperativeAggregate` already exist; this
  * completes the quartet). [[DecayedSumFixed]] is an
  * `AggregateWindowFunction`: a DeclarativeAggregate evaluated by the
  * Window operator once per row over a running frame, with the state
  * recurrence expressed as Catalyst expression TREES — so the whole
  * update compiles into the window operator's generated code, no
  * closure, no UDF.
  *
  * Semantics: exponentially decayed running sum in integer fixed
  * point — `st₀ = v₀; stᵢ = (stᵢ₋₁ · num) div den + vᵢ` over the
  * window's ROW order. Integer `div` (truncation) makes the result
  * bit-exact and engine-portable where a float `pow`-based decay
  * would drift. The non-negative-input contract is ENFORCED, not
  * assumed: each input is clamped to `greatest(v, 0)` inside the
  * update, so the state is provably ≥ 0 and truncation == floor
  * across engines (DuckDB's `//` floors; on the nonneg domain the
  * two semantics coincide — the repo-wide `div` rule). Overflow
  * bound: the state converges below `max_v · den / (den − num)`
  * (geometric series), so with den = 10, num = 9 a Long overflows
  * only past max_v ≈ 9.2 · 10¹⁷ — unreachable for ×100 fixed-point
  * inputs.
  *
  * Why a native window function and not a built-in composition: the
  * recurrence has no closed form under integer truncation — a
  * `sum(v·βⁿ⁻ⁱ)` reformulation rounds ONCE at the end, this rounds at
  * every step like a real online decay counter would. Scale shape:
  * identical to any running window agg — one shuffle on the
  * partition key, one ordered pass per partition, O(1) state.
  *
  * The frame is pinned to ROWS UNBOUNDED PRECEDING..CURRENT ROW (the
  * running frame every rank-like window function declares); leaving
  * the caller's frame unspecified lets the analyzer adopt it.
  */
case class DecayedSumFixed(child: Expression, num: Long, den: Long)
  extends AggregateWindowFunction {
  require(num >= 0 && den >= 1 && num < den,
    s"decay num/den must satisfy 0 <= num < den, got $num/$den")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "decayed_sum_fixed"

  private val st = AttributeReference("st", LongType, nullable = false)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(st)
  override val initialValues: Seq[Expression] = Seq(Literal(0L))
  // greatest(child, 0) enforces the nonneg contract in the update
  // itself: st stays >= 0, so IntegralDivide (trunc) == floor and
  // st*num cannot approach Long overflow for fixed-point inputs
  override val updateExpressions: Seq[Expression] = Seq(
    Add(IntegralDivide(Multiply(st, Literal(num)), Literal(den)),
      Greatest(Seq(child, Literal(0L)))))
  override val evaluateExpression: Expression = st

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object DecayedSum {
  import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder, UnspecifiedFrame, WindowExpression, WindowSpecDefinition}

  /** Column wrapper. `Column.over` refuses expressions it does not
    * recognize as window functions (the analyzer then reports
    * WINDOW_FUNCTION_WITHOUT_OVER_CLAUSE), so the `WindowExpression`
    * is built directly; the frame is left Unspecified and the
    * analyzer adopts the function's pinned running-rows frame. */
  def decayedSumFixedOver(value: Column, num: Long, den: Long,
                          partition: Seq[Column],
                          orderAsc: Seq[Column]): Column =
    GraftSqlBridge.column(WindowExpression(
      DecayedSumFixed(GraftSqlBridge.expression(value), num, den),
      WindowSpecDefinition(
        partition.map(GraftSqlBridge.expression),
        orderAsc.map(c => SortOrder(GraftSqlBridge.expression(c), Ascending)),
        UnspecifiedFrame)))
}
