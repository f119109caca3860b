package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Uncertainty for corpus metrics at scale: the POISSON bootstrap.
  * The classic bootstrap resamples n rows with replacement — an
  * index-lookup join per replica, untenable when n is 10^12. The
  * Poisson approximation (each row appears Pois(1) times per replica,
  * independently) needs NO index: every row computes its own weight
  * from a hash, replicas explode map-side, and one map-side-combined
  * aggregation per metric finishes the job — the form large-scale
  * experiment pipelines actually use.
  */
object Bootstrap {

  /** Pois(1) CDF at k = 0..3, scaled to the 48-bit hash space. A
    * uniform 48-bit hash h maps to weight = #{thresholds ≤ h} ∈ 0..4
    * (the &gt;4 tail, p ≈ 0.0037, truncates to 4 — documented bias far
    * below bootstrap noise). Integer literals so both engines compare
    * exactly; derivation: cum_k(e^{-1}/0!..k!) · 2^48. */
  val PoisCdf48: Seq[Long] = Seq(
    103548857136060L, 207097714272121L, 258872142840152L, 276130285696162L)

  /** SQL fragment computing the Poisson weight of hash expression
    * `h48` — mirrored by the Column form inside [[poissonCi]]. */
  def weightSql(h48: String): String =
    PoisCdf48.map(t => s"(CASE WHEN $h48 >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** Bootstrap percentile interval for the MEAN of `valCol`, from
    * `replicas` Poisson resamples keyed on (`idCol`, replica, salt).
    * Means are fixed-pointed at 1e4 (integer division — cross-engine
    * exact); the interval is the type-1 p10/p90 of the replica means,
    * and the point estimate is the plain corpus mean. Output: one row
    * (point_mean_fp, ci_lo_fp, ci_hi_fp).
    *
    * Scale shape: the replica explode is narrow (no shuffle); the one
    * exchange is the per-replica aggregation, map-side combined to
    * `replicas` rows; the percentile step runs over those `replicas`
    * rows only. */
  /** [[poissonCi]] per group: one (point, interval) row per value of
    * `groupCol` — the per-source dashboard with error bars. Same
    * resampling; the percentile window partitions by group over
    * `replicas` rows each. Output: (groupCol, point_mean_fp,
    * ci_lo_fp, ci_hi_fp). */
  def poissonCiByGroup(df: DataFrame, groupCol: String, idCol: String,
                       valCol: String, replicas: Int = 40,
                       salt: String = "bs"): DataFrame = {
    require(replicas >= 10, "too few replicas for a percentile interval")
    val h = Sketches.hash48(concat(col(idCol).cast("string"),
      lit(s"|$salt|"), col("__b").cast("string")))
    val w = PoisCdf48.map(t => when(h >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val means = df
      .withColumn("__b", explode(array((0 until replicas).map(lit): _*)))
      .withColumn("__w", w)
      .groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__w") * col(valCol)).as("__s"),
        sum(col("__w")).as("__n"))
      // a replica that resampled a tiny group to emptiness carries no
      // mean — dropped on both engines (p ≈ 0.37^|group| per replica,
      // negligible for groups of ≥ ~10 rows)
      .filter(col("__n") > 0L)
      .select(col(groupCol), col("__b"),
        expr("__s * 10000L div __n").as("__m"))
    val kLo = math.max(1, math.ceil(0.10 * replicas).toInt)
    val kHi = math.ceil(0.90 * replicas).toInt
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__m"), col("__b"))
    val ranked = means.withColumn("__rk", row_number().over(wOrd))
    val lo = ranked.filter(col("__rk") === kLo)
      .select(col(groupCol), col("__m").as("ci_lo_fp"))
    val hi = ranked.filter(col("__rk") === kHi)
      .select(col(groupCol), col("__m").as("ci_hi_fp"))
    df.groupBy(col(groupCol))
      .agg(expr(s"sum($valCol) * 10000L div count(*)").as("point_mean_fp"))
      .join(lo, Seq(groupCol)).join(hi, Seq(groupCol))
  }

  def poissonCi(df: DataFrame, idCol: String, valCol: String,
                replicas: Int = 40, salt: String = "bs"): DataFrame = {
    require(replicas >= 10, "too few replicas for a percentile interval")
    val h = Sketches.hash48(concat(col(idCol).cast("string"),
      lit(s"|$salt|"), col("__b").cast("string")))
    val w = PoisCdf48.map(t => when(h >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val means = df
      .withColumn("__b", explode(array((0 until replicas).map(lit): _*)))
      .withColumn("__w", w)
      .groupBy(col("__b"))
      .agg(sum(col("__w") * col(valCol)).as("__s"),
        sum(col("__w")).as("__n"))
      .select(col("__b"), expr("__s * 10000L div __n").as("__m"))
    val kLo = math.max(1, math.ceil(0.10 * replicas).toInt)
    val kHi = math.ceil(0.90 * replicas).toInt
    val wOrd = org.apache.spark.sql.expressions.Window
      .orderBy(col("__m"), col("__b"))
    val ranked = means.withColumn("__rk", row_number().over(wOrd))
    val lo = ranked.filter(col("__rk") === kLo)
      .select(col("__m").as("ci_lo_fp"))
    val hi = ranked.filter(col("__rk") === kHi)
      .select(col("__m").as("ci_hi_fp"))
    val point = df.agg(
      expr(s"sum($valCol) * 10000L div count(*)").as("point_mean_fp"))
    point.crossJoin(lo).crossJoin(hi)
  }
}
