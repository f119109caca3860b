package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the latest right row with the same
  * key and rightTime <= leftTime (backward, inclusive — the
  * generalization of the reference's 1-D alignment, SURVEY.md §2.5 J1,
  * bruker_ftir_parser.py:74-84).
  *
  * Spark has no built-in as-of join; the naive formulations either
  * blow up (range join → BroadcastNestedLoop) or shuffle twice
  * (groupBy max then re-join). This implementation unions both sides
  * tagged, then runs ONE window over (key, time): a single hash
  * shuffle on the key, linear scan per partition, no pair explosion —
  * the shape that survives 100 TB (events and probes co-partitioned
  * by key; skewed keys can be salted upstream).
  */
object AsOfJoin {

  /** @param rightVals right columns carried to the matched left row
    *                   (null when no right row precedes the left row;
    *                   must be orderable types — they join the sort key).
    * Time columns must be numeric (e.g. epoch nanos); ties at the
    * exact same (key, time) place right rows before left rows
    * (inclusive semantics). Among multiple right rows at the same
    * (key, time) the winner is deterministic: the greatest
    * `rightVals` struct (field-wise comparison) — window order alone
    * would pick an arbitrary partition-order-dependent row.
    */
  def asOf(left: DataFrame, leftKey: String, leftTime: String,
           right: DataFrame, rightKey: String, rightTime: String,
           rightVals: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val r0 = right.select(
      col(rightKey).as("__k"), col(rightTime).cast("long").as("__t"),
      lit(0).as("__side"),
      struct(rightVals.map(col): _*).as("__v"))
    val vType = r0.schema("__v").dataType
    val l0 = left.select(
      col(leftKey).as("__k"), col(leftTime).cast("long").as("__t"),
      lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__lrow"))
      .withColumn("__v", lit(null).cast(vType))
    val lType = l0.schema("__lrow").dataType
    val u = l0.unionByName(r0.withColumn("__lrow", lit(null).cast(lType)))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(c => col(s"__lrow.$c").as(c)) ++
        rightVals.map(c => col(s"__m.$c").as(c)): _*)
  }
}
