package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 1-D linear interpolation of sampled values onto a grid of query
  * points, per key — the distributed generalization of the
  * reference's np.interp re-sampling (SURVEY.md §2.5 J1,
  * bruker_ftir_parser.py:74-84), with np.interp's edge semantics
  * (clamped to the nearest sample outside the sampled range).
  *
  * Same scale shape as [[AsOfJoin]]: union both sides, one window
  * pass over (key, t) — prev sample via a backward last-ignore-nulls,
  * next via a forward first-ignore-nulls. One shuffle, linear scan.
  *
  * Time stays integral (epoch nanos) until the final ratio — a month
  * of nanos (~2.6e15) is exactly representable in double, the raw
  * epoch (~1.7e18) is not.
  */
object Interpolate {

  /** Returns grid rows + `<valCol>_interp` (null when the key has no
    * samples at all). Time columns must be numeric. */
  def linear(grid: DataFrame, gridKey: String, gridTime: String,
             samples: DataFrame, sampleKey: String, sampleTime: String,
             valCol: String): DataFrame = {
    val gCols = grid.columns.toSeq
    val g0 = grid.select(
      col(gridKey).as("__k"), col(gridTime).cast("long").as("__t"),
      lit(1).as("__side"),
      struct(gCols.map(col): _*).as("__g"),
      lit(null).cast("double").as("__v"))
    val gType = g0.schema("__g").dataType
    val s0 = samples.select(
      col(sampleKey).as("__k"), col(sampleTime).cast("long").as("__t"),
      lit(0).as("__side"),
      lit(null).cast(gType).as("__g"),
      col(valCol).cast("double").as("__v"))
    val u = g0.unionByName(s0)
    // __v in the sort key: multiple samples at the identical (key, t)
    // would otherwise resolve by partition order (cf. AsOfJoin's
    // deterministic tie-break) — backward pass picks the greatest
    // value, forward pass the least; both deterministic.
    val ord = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__v").asc_nulls_first)
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val st = when(col("__side") === 0, col("__t"))
    u.withColumn("__v0", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__t0", last(st, ignoreNulls = true).over(back))
      .withColumn("__v1", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__t1", first(st, ignoreNulls = true).over(fwd))
      .filter(col("__side") === 1)
      .withColumn(s"${valCol}_interp",
        when(col("__v0").isNotNull && col("__v1").isNotNull,
          col("__v0") + (col("__v1") - col("__v0")) *
            ((col("__t") - col("__t0")) / (col("__t1") - col("__t0"))))
          .when(col("__v0").isNotNull, col("__v0"))
          .otherwise(col("__v1")))
      .select(gCols.map(c => col(s"__g.$c").as(c)) :+ col(s"${valCol}_interp"): _*)
  }
}
