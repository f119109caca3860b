package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT type-1 quantiles of an integer column in TWO passes and no
  * global sort — the selection pattern that replaces
  * `orderBy().limit(rank)` at 100 TB. Pass 1 builds a fixed-grid
  * histogram (one map-side-combined aggregation to ≤ range/width
  * cells) whose cumulative counts locate, for every requested
  * percentile, the ONE bucket containing its rank. Pass 2 scans only
  * rows falling in those buckets (a pushdown-friendly range filter —
  * at most |pcts| buckets' worth of rows survive the scan) and ranks
  * within each bucket. Exactness: the type-1 quantile is the smallest
  * value whose global cumulative count reaches ceil(p·n/100); the
  * bucket's preceding cumulative count converts that global rank to a
  * local rank inside the bucket.
  *
  * Contrast with [[Sketches.histQuantiles]]: that returns the bucket
  * UPPER EDGE (a ≤ width-wide overestimate, single pass, mergeable
  * state); this pays one more bounded pass for the exact value.
  */
object Quantiles {

  /** Output: (pct, exact_v) — one row per requested percentile.
    * `grouped` variant below for per-key quantiles. */
  def exactQuantiles(df: DataFrame, valCol: String, width: Int,
                     pcts: Seq[Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(width >= 1 && pcts.nonEmpty)
    val hist = Sketches.histogram(df.select(col(valCol)), valCol, width)
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // per bucket: rows strictly before it (cum_lo); window over ≤
    // range/width aggregated cells, never data rows
    val cum = hist
      .withColumn("cum_lo", coalesce(sum(col("cnt")).over(w), lit(0L)))
    val total = hist.agg(sum(col("cnt")).as("n"))
    val p = pcts.map(_.toLong).toDF("pct")
    // the ONE bucket whose [cum_lo, cum_lo + cnt) range covers each
    // percentile's global rank ceil(p·n/100) (integer: 100·r ≥ p·n
    // and r minimal ⟺ the first bucket with cum_lo + cnt reaching it)
    val target = cum.crossJoin(broadcast(total)).crossJoin(broadcast(p))
      .filter((col("cum_lo") + col("cnt")) * 100 >= col("pct") * col("n"))
      .groupBy(col("pct"))
      .agg(min(struct(col("bucket"), col("cum_lo"))).as("__b"))
      .select(col("pct"), col("__b.bucket").as("bucket"),
        col("__b.cum_lo").as("cum_lo"))
      .crossJoin(broadcast(total))
      // global rank of the wanted order statistic: ceil(p·n/100)
      .select(col("pct"), col("bucket"), col("cum_lo"),
        expr("(pct * n + 99) div 100").as("rank"))
      .localCheckpoint(true) // tiny: |pcts| rows
    // pass 2: only rows inside a wanted bucket survive the filter
    val wanted = target.select(col("bucket")).distinct()
    val inBucket = df
      .select(col(valCol).as("v"), expr(s"$valCol div $width").as("bucket"))
      .join(broadcast(wanted), Seq("bucket"))
    // rank within the bucket by value (per-value counts, ≤ width
    // distinct values per bucket — never a row-level sort)
    val perVal = inBucket.groupBy(col("bucket"), col("v"))
      .agg(count(lit(1)).as("c"))
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cumVal = perVal.withColumn("cum_in", sum(col("c")).over(wv))
    broadcast(target).join(cumVal, Seq("bucket"))
      .filter(col("cum_lo") + col("cum_in") >= col("rank"))
      .groupBy(col("pct")).agg(min(col("v")).as("exact_v"))
  }

  /** Per-key exact quantiles: same two passes with the key joined
    * through (histogram cells and pass-2 scan both key-scoped).
    * Output: (key, pct, exact_v). */
  def exactQuantilesByKey(df: DataFrame, keyCol: String, valCol: String,
                          width: Int, pcts: Seq[Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df
      .select(col(keyCol).as("key"), expr(s"$valCol div $width").as("bucket"))
      .groupBy(col("key"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = hist
      .withColumn("cum_lo", coalesce(sum(col("cnt")).over(w), lit(0L)))
    val total = hist.groupBy(col("key")).agg(sum(col("cnt")).as("n"))
    val p = pcts.map(_.toLong).toDF("pct")
    val target = cum.join(total, Seq("key")).crossJoin(broadcast(p))
      .filter((col("cum_lo") + col("cnt")) * 100 >= col("pct") * col("n"))
      .groupBy(col("key"), col("pct"))
      .agg(min(struct(col("bucket"), col("cum_lo"))).as("__b"),
        first(col("n")).as("n"))
      .select(col("key"), col("pct"), col("__b.bucket").as("bucket"),
        col("__b.cum_lo").as("cum_lo"),
        expr("(pct * n + 99) div 100").as("rank"))
      .localCheckpoint(true)
    val wanted = target.select(col("key"), col("bucket")).distinct()
    val perVal = df
      .select(col(keyCol).as("key"), col(valCol).as("v"),
        expr(s"$valCol div $width").as("bucket"))
      .join(broadcast(wanted), Seq("key", "bucket"))
      .groupBy(col("key"), col("bucket"), col("v"))
      .agg(count(lit(1)).as("c"))
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"), col("bucket")).orderBy(col("v"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cumVal = perVal.withColumn("cum_in", sum(col("c")).over(wv))
    broadcast(target).join(cumVal, Seq("key", "bucket"))
      .filter(col("cum_lo") + col("cum_in") >= col("rank"))
      .groupBy(col("key"), col("pct")).agg(min(col("v")).as("exact_v"))
  }
}
