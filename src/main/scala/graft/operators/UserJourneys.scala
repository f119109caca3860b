package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Behavioral analytics over an event stream keyed by actor and
  * timestamp: ordered funnels, cohort retention, and change-capture
  * (SCD Type 2) effective ranges. All three reduce to per-user
  * aggregations or user-partitioned windows — the natural Spark shape
  * where every shuffle key is the user id, so a 100 TB event log
  * processes as independent per-user slices with no global ordering
  * anywhere.
  */
object UserJourneys {

  /** Ordered conversion funnel: step 1 is each user's FIRST qualifying
    * event; step k+1 is the first event matching the next predicate
    * within `windowNs` AFTER (inclusive) the user's step-k time.
    * Output: (step, step_name, users) — one row per step, users
    * monotonically non-increasing by construction.
    *
    * Each stage is one user-keyed join against the (shrinking)
    * qualified-user set followed by a min-aggregation; with K steps
    * that is K joins whose right side only ever shrinks — no windows,
    * no per-user event sorting. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             steps: Seq[(String, Column)], windowNs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.filter(steps.head._2)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    def row(i: Int, name: String, qualified: DataFrame) =
      qualified.agg(count(lit(1)).as("users"))
        .select(lit(i.toLong).as("step"), lit(name).as("step_name"),
          col("users"))
    var out = row(1, steps.head._1, cur)
    steps.tail.zipWithIndex.foreach { case ((name, pred), i) =>
      cur = events.filter(pred)
        .join(cur, Seq(userCol))
        .filter(col(tsCol) >= col("__t") &&
          col(tsCol) <= col("__t") + windowNs)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      out = out.unionByName(row(i + 2, name, cur))
    }
    out
  }

  /** Cohort retention: users grouped by their first-active day, with
    * the count still active k days later (k ≤ `maxK`). `dayNs` is the
    * cohort bucket width in timestamp units. Output:
    * (cohort_day, k, users); k=0 is the cohort size. Two aggregations
    * over the distinct (user, day) grid — no windows. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      dayNs: Long, maxK: Int): DataFrame = {
    val days = events
      .select(col(userCol).as("__u"), expr(s"$tsCol div ${dayNs}L").as("__d"))
      .distinct()
    val cohort = days.groupBy(col("__u")).agg(min(col("__d")).as("cohort_day"))
    days.join(cohort, Seq("__u"))
      .withColumn("k", col("__d") - col("cohort_day"))
      .filter(col("k") <= maxK)
      .groupBy(col("cohort_day"), col("k"))
      .agg(countDistinct(col("__u")).as("users"))
  }

  /** Change capture → SCD Type 2: collapse each user's event stream
    * to the rows where `stateCol` CHANGES, each with its effective
    * range [valid_from, valid_to) — valid_to null for the current
    * state. `tieCol` breaks equal-timestamp ties deterministically.
    * Output: (userCol, stateCol, valid_from, valid_to). The windows
    * are user-partitioned — per-user state histories are independent
    * slices at any scale. */
  def scd2States(events: DataFrame, userCol: String, tsCol: String,
                 stateCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val changed = events
      .select(col(userCol), col(tsCol), col(stateCol), col(tieCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(stateCol))
    // ranges chain across the CHANGE rows only (the filter above), so
    // re-rank the survivors: next change's ts closes this range
    val w2 = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    changed
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .select(col(userCol), col(stateCol),
        col(tsCol).as("valid_from"), col("valid_to"))
  }
}
