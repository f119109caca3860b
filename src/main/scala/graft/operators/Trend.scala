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

  /** Population Stability Index between two ingest waves, per key —
    * the classic distribution-drift monitor: PSI = Σ_bins
    * (p_a − p_b)·ln(p_a/p_b) with add-one smoothing (so empty bins
    * contribute finitely). Input: one row per item with (keyCol,
    * `wave` ∈ {0,1}, `bin` ∈ [0, nBins)). Every PSI term is
    * nonnegative (both factors share sign) and is fixed-pointed at
    * 1e-4 BEFORE the per-key sum — the [[Surprisal]] rule: floats
    * never cross an aggregation, so the estimate hash-matches the
    * oracle, not just approximates it.
    *
    * Scale shape: two key×bin-grained aggs (map-side combined), a
    * key-sized totals table joined back AQE-broadcast, and a
    * key×nBins dense grid built by exploding a bounded literal range
    * — no corpus-sized join anywhere. Output: (key, n0, n1, psi_fp).
    */
  /** The (key, wave, bin) count table — [[psiDrift]]'s only state.
    * LINEAR (the CMS class): batches fold by summed counts, deletes
    * by subtraction; [[psiFromCounts]] is a pure function of it. */
  def binCounts(df: DataFrame, keyCol: String = "source"): DataFrame =
    df.groupBy(col(keyCol), col("wave"), col("bin"))
      .agg(count(lit(1)).as("__c"))

  def psiDrift(df: DataFrame, nBins: Int,
               keyCol: String = "source"): DataFrame =
    psiFromCounts(binCounts(df, keyCol), nBins, keyCol)

  /** PSI from a standing [[binCounts]] table (rows may carry merged
    * counts — only the sums matter). */
  def psiFromCounts(counts: DataFrame, nBins: Int,
                    keyCol: String = "source"): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val c = counts.groupBy(col(keyCol), col("wave"), col("bin"))
      .agg(sum(col("__c")).as("__c"))
    val n = c.groupBy(col(keyCol), col("wave"))
      .agg(sum(col("__c")).cast("long").as("__n"))
    val grid = c.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(lit((0L until nBins.toLong).toArray)).as("bin"))
    val side = (w: Int, cn: String, nn: String) => grid
      .join(c.filter(col("wave") === w).drop("wave"),
        Seq(keyCol, "bin"), "left")
      .join(n.filter(col("wave") === w).drop("wave"), Seq(keyCol))
      .select(col(keyCol), col("bin"),
        ((coalesce(col("__c"), lit(0L)) + lit(1.0)) /
          (col("__n") + lit(nBins.toDouble))).as(cn),
        col("__n").as(nn))
    side(0, "__pa", "n0").join(side(1, "__pb", "n1"),
        Seq(keyCol, "bin"))
      .select(col(keyCol), col("n0"), col("n1"),
        round((col("__pa") - col("__pb")) *
          log(col("__pa") / col("__pb")) * 10000).cast("long")
          .as("__term"))
      .groupBy(col(keyCol), col("n0"), col("n1"))
      .agg(sum(col("__term")).cast("long").as("psi_fp"))
  }
}
