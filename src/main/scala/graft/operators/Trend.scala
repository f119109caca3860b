package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key linear-trend estimation ("is this series drifting?") in
  * EXACT arithmetic.
  *
  * `regr_slope` exists in both Spark and DuckDB, but each engine
  * accumulates its moments differently (two-pass vs Welford-style
  * running updates), and with raw epoch-scale x values the
  * `n·Σx² − (Σx)²` denominator cancels catastrophically — the result
  * is engine- and partition-order-dependent noise. This operator
  * instead centers x on ITS KEY's minimum first, which keeps every
  * moment an exact integer sum (bucket indices and counts are small),
  * so the closed-form slope is one exact integer expression divided
  * by another — bit-reproducible across engines, partitionings, and
  * reruns.
  *
  * Scale shape: one key-sized min table joined back AQE-broadcast,
  * then one exchange (the per-key moment agg, map-side combined).
  * Nothing is ever collected; keys are independent.
  */
object Trend {

  /** Least-squares slope of `yCol` over `xCol` within each key.
    * `xCol`/`yCol` must be integral (the exactness contract — callers
    * bucket continuous time first, which is also what makes the slope
    * a RATE trend rather than point noise). Output: (keyCol, n,
    * slope rounded 4); keys with a degenerate x range (all x equal)
    * drop, since the slope is undefined there. */
  def slopePerKey(df: DataFrame, keyCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val x0 = df.groupBy(col(keyCol)).agg(min(col(xCol)).as("__x0"))
    df.join(x0, Seq(keyCol))
      .select(col(keyCol), (col(xCol) - col("__x0")).as("__x"),
        col(yCol).as("__y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .filter(col("n") * col("__sxx") - col("__sx") * col("__sx") =!= 0L)
      .select(col(keyCol), col("n"),
        // + 0.0 canonicalizes IEEE -0.0 (a tiny negative slope
        // rounding to zero)
        (round((col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
          (col("n") * col("__sxx") - col("__sx") * col("__sx")).cast("double"),
          4) + lit(0.0)).as("slope"))
  }
}
