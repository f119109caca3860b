package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: co-locate rows that are close
  * in TWO dimensions so per-file min/max statistics prune a
  * two-dimensional box predicate — the lakehouse `OPTIMIZE ZORDER BY`
  * technique. A single-column sort gives perfect pruning on that
  * column and none on any other; interleaving the columns' quantized
  * bits gives useful pruning on both (q237 measures the win on the
  * same box: 4 vs 10 of 64 files at sf0.01).
  *
  * Scale shape: quantization is a pure projection against a broadcast
  * 1-row (max_x, max_y, n) aggregate; the z-value is a STATIC fold of
  * shift/mask terms (whole-stage codegen, no HOF, no UDF); and the
  * global rank that assigns file ids is [[Packing.stableIds]]'s
  * two-phase prefix sum — never a single-partition sort. The z-key ×
  * 2^32 + row-key composite is exactly the sparse-key shape
  * stableIds' sampled range fallback exists for.
  */
object ZOrder {

  /** Morton code: interleave the low `bits` bits of `qx` (even
    * positions) and `qy` (odd positions). Static term fold — the
    * whole expression inlines into one codegen'd projection. */
  def interleaveBits(qx: Column, qy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Assign every row a z-value and a target file id: rows are ranked
    * by (z-value, `keyCol`) and cut into `targetFiles` equal runs.
    * `xCol`/`yCol` must be non-negative longs; `keyCol` must be a
    * unique orderable long below 2^32 (it shares the rank composite
    * with the z-value; re-id with stableIds first if wider). Output:
    * input columns + (zval, file_id). */
  def assignFiles(df: DataFrame, xCol: String, yCol: String,
                  keyCol: String, bits: Int = 10,
                  targetFiles: Int = 64): DataFrame =
    assignFilesWith(df, quantStats(df, xCol, yCol), xCol, yCol, keyCol,
      bits, targetFiles)

  /** The quantization grid: 1-row (__mx, __my) = (max_x+1, max_y+1).
    * Compute it ONCE over the standing corpus and pass it to
    * [[assignFilesWith]] for every subsequent batch — appended rows
    * must land on the SAME grid or their z-values aren't comparable
    * with the standing layout's (q244 exercises this contract). */
  def quantStats(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.agg((max(col(xCol)) + 1).cast("long").as("__mx"),
      (max(col(yCol)) + 1).cast("long").as("__my"))

  /** [[assignFiles]] against an explicit quantization grid. */
  def assignFilesWith(df: DataFrame, stats: DataFrame, xCol: String,
                      yCol: String, keyCol: String, bits: Int = 10,
                      targetFiles: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 15, s"bits out of range: $bits")
    val scale = 1L << bits
    val z = df.crossJoin(broadcast(stats))
      .withColumn("__qx", expr(s"$xCol * ${scale}L div __mx"))
      .withColumn("__qy", expr(s"$yCol * ${scale}L div __my"))
      .withColumn("zval", interleaveBits(col("__qx"), col("__qy"), bits))
      .drop("__qx", "__qy", "__mx", "__my")
    assignFilesByRank(z, shiftleft(col("zval"), 32) + col(keyCol),
      targetFiles)
  }

  /** File assignment for ANY total order: rank rows by `rankKey`
    * (must be unique) via the two-phase prefix sum and cut into
    * `targetFiles` equal runs — the layout-agnostic core shared by
    * the z-order path and the single-column baseline q237 compares
    * it against. Output: input columns + file_id. */
  def assignFilesByRank(df: DataFrame, rankKey: Column,
                        targetFiles: Int): DataFrame = {
    require(targetFiles >= 1)
    val withCk = df.withColumn("__ck", rankKey)
    val m = df.agg(count(lit(1)).as("__n"))
    // rank attached in place (same row_id per key as the old
    // rank-then-join-back): drops two exchanges per call
    Packing.withStableIds(withCk, "__ck")
      .crossJoin(broadcast(m))
      .withColumn("file_id",
        expr(s"row_id div ((__n + ${targetFiles - 1}) div $targetFiles)"))
      .drop("__ck", "__n", "row_id")
  }

  /** Per-file min/max statistics over both layout dimensions — the
    * manifest a scan planner prunes against (the parquet footer
    * stats, materialized as a table). Output:
    * (file_id, cnt, min_x, max_x, min_y, max_y). */
  def manifest(assigned: DataFrame, xCol: String, yCol: String): DataFrame =
    assigned.groupBy(col("file_id"))
      .agg(count(lit(1)).as("cnt"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))

  /** The pruning predicate for a two-dimensional box query against a
    * [[manifest]] row: a file needs scanning unless its stats range
    * is disjoint from the box on EITHER dimension. */
  def scanNeeded(x1: Column, x2: Column, y1: Column, y2: Column): Column =
    !(col("max_x") < x1 || col("min_x") > x2 ||
      col("max_y") < y1 || col("min_y") > y2)
}
