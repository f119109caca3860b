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
             steps: Seq[(String, Column)], windowNs: Long): DataFrame =
    funnelCounts(funnelStates(events, userCol, tsCol, steps, windowNs),
      userCol, steps.map(_._1))

  /** The funnel's per-user STATE: one row per user who completed step
    * 1, with each step's qualifying time `t1..tK` (null = not
    * reached). This is the bounded standing state an incremental
    * funnel keeps — K timestamps per user, independent of how much
    * history produced them ([[funnelFold]]). */
  def funnelStates(events: DataFrame, userCol: String, tsCol: String,
                   steps: Seq[(String, Column)],
                   windowNs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var state = events.filter(steps.head._2)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.tail.zipWithIndex.foreach { case ((_, pred), i) =>
      val prevT = s"t${i + 1}"
      val thisT = s"t${i + 2}"
      val nxt = events.filter(pred)
        .select(col(userCol), col(tsCol))
        .join(state.select(col(userCol), col(prevT)), Seq(userCol))
        .filter(col(tsCol) >= col(prevT) &&
          col(tsCol) <= col(prevT) + windowNs)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(thisT))
      state = state.join(nxt, Seq(userCol), "left")
    }
    state
  }

  /** Step-count report over a funnel state table. */
  def funnelCounts(state: DataFrame, userCol: String,
                   stepNames: Seq[String]): DataFrame =
    stepNames.zipWithIndex.map { case (name, i) =>
      state.agg(sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
          .as("users"))
        .select(lit(i + 1L).as("step"), lit(name).as("step_name"),
          col("users"))
    }.reduce(_ unionByName _)

  /** Incremental funnel: fold a batch of events (all later than the
    * standing horizon) into the per-user state. Sound because batch
    * timestamps exceed every standing one, so a standing step time
    * can never be beaten (coalesce keeps it) and a standing event can
    * never qualify inside a window that OPENS in the batch — each
    * step's gap fills from the batch alone, checked against the
    * (possibly just-updated) previous step's time. Work ∝ batch +
    * touched users' K timestamps. q253 pins fold == from-scratch via
    * q238's oracle verbatim. */
  def funnelFold(state: DataFrame, batch: DataFrame, userCol: String,
                 tsCol: String, steps: Seq[(String, Column)],
                 windowNs: Long): DataFrame = {
    val b1 = batch.filter(steps.head._2)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__b"))
    var f = state.join(b1, Seq(userCol), "full_outer")
      .withColumn("t1", coalesce(col("t1"), col("__b"))).drop("__b")
    steps.tail.zipWithIndex.foreach { case ((_, pred), i) =>
      val prevT = s"t${i + 1}"
      val thisT = s"t${i + 2}"
      val bi = batch.filter(pred)
        .select(col(userCol), col(tsCol))
        .join(f.select(col(userCol), col(prevT)), Seq(userCol))
        .filter(col(tsCol) >= col(prevT) &&
          col(tsCol) <= col(prevT) + windowNs)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__b"))
      f = f.join(bi, Seq(userCol), "left")
        .withColumn(thisT, coalesce(col(thisT), col("__b"))).drop("__b")
    }
    f
  }

  /** Cohort retention: users grouped by their first-active day, with
    * the count still active k days later (k ≤ `maxK`). `dayNs` is the
    * cohort bucket width in timestamp units. Output:
    * (cohort_day, k, users); k=0 is the cohort size. Two aggregations
    * over the distinct (user, day) grid — no windows. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      dayNs: Long, maxK: Int): DataFrame =
    cohortCounts(cohortGrid(events, userCol, tsCol, dayNs, maxK))

  /** The retention GRID: one row per (user, cohort_day, k) a user was
    * active at — at most maxK+1 rows per user ever, the bounded
    * standing state of an incremental retention dashboard
    * ([[cohortFold]]). k=0 is membership itself. */
  def cohortGrid(events: DataFrame, userCol: String, tsCol: String,
                 dayNs: Long, maxK: Int): DataFrame = {
    val days = events
      .select(col(userCol), expr(s"$tsCol div ${dayNs}L").as("__d"))
      .distinct()
    val cohort = days.groupBy(col(userCol))
      .agg(min(col("__d")).as("cohort_day"))
    days.join(cohort, Seq(userCol))
      .withColumn("k", col("__d") - col("cohort_day"))
      .filter(col("k") <= maxK)
      .select(col(userCol), col("cohort_day"), col("k"))
  }

  /** Counts report over a retention grid — grid rows are unique per
    * (user, k), so the count needs no distinct. */
  def cohortCounts(grid: DataFrame): DataFrame =
    grid.groupBy(col("cohort_day"), col("k"))
      .agg(count(lit(1)).as("users"))

  /** Incremental retention: fold a batch (all later than the standing
    * horizon) into the grid. New users open their own cohorts at
    * their first batch day; existing users' new active days add the
    * (cohort_day, k) cells not already present (an anti-join per
    * batch — re-seen days and replays are no-ops). Cohort days can
    * never move because batch days are later. Work ∝ batch + touched
    * users' ≤ maxK+1 rows. q252 pins fold == from-scratch via q239's
    * oracle verbatim. */
  def cohortFold(grid: DataFrame, batch: DataFrame, userCol: String,
                 tsCol: String, dayNs: Long, maxK: Int): DataFrame = {
    val bd = batch
      .select(col(userCol), expr(s"$tsCol div ${dayNs}L").as("__d"))
      .distinct()
    val standingUsers = grid.select(col(userCol)).distinct()
    val newUsers = bd.join(standingUsers, Seq(userCol), "left_anti")
      .groupBy(col(userCol)).agg(min(col("__d")).as("cohort_day"))
    val newUserRows = bd.join(newUsers, Seq(userCol))
      .withColumn("k", col("__d") - col("cohort_day"))
      .filter(col("k") <= maxK)
      .select(col(userCol), col("cohort_day"), col("k"))
    val cohorts = grid.select(col(userCol), col("cohort_day")).distinct()
    val existRows = bd.join(cohorts, Seq(userCol))
      .withColumn("k", col("__d") - col("cohort_day"))
      .filter(col("k") >= 1 && col("k") <= maxK)
      .select(col(userCol), col("cohort_day"), col("k"))
      .join(grid, Seq(userCol, "cohort_day", "k"), "left_anti")
    grid.unionByName(newUserRows).unionByName(existRows)
  }

  /** Incremental [[scd2States]]: fold a batch of NEW events (all
    * later than the standing table's horizon) into a standing SCD2
    * table — work ∝ batch + the touched users' standing ROWS, never a
    * history rescan. Untouched users' ranges pass through verbatim;
    * each touched user's change rows ARE a compressed replay of their
    * stream (state + valid_from + original tie id), so re-running the
    * change-capture over (change rows ∪ batch events) reproduces the
    * from-scratch table exactly — scd2(scd2(X) ∪ Y) = scd2(X ∪ Y)
    * whenever max ts(X) ≤ min ts(Y) per user, because collapsing
    * consecutive duplicates is prefix-stable. q251 pins the fold
    * against q240's oracle verbatim. */
  def scd2Fold(standing: DataFrame, batch: DataFrame, userCol: String,
               tsCol: String, stateCol: String,
               tieCol: String): DataFrame = {
    val touched = batch.select(col(userCol)).distinct()
    val untouched = standing.join(touched, Seq(userCol), "left_anti")
    val replay = standing.join(touched, Seq(userCol))
      .select(col(userCol), col("valid_from").as(tsCol), col(stateCol),
        col(tieCol))
      .unionByName(batch.select(col(userCol), col(tsCol), col(stateCol),
        col(tieCol)))
    untouched.unionByName(
      scd2States(replay, userCol, tsCol, stateCol, tieCol))
  }

  /** Change capture → SCD Type 2: collapse each user's event stream
    * to the rows where `stateCol` CHANGES, each with its effective
    * range [valid_from, valid_to) — valid_to null for the current
    * state. `tieCol` breaks equal-timestamp ties deterministically
    * and is carried through as the opening event's provenance — which
    * also makes the output a replayable compressed stream, the
    * property [[scd2Fold]] builds on. Output: (userCol, stateCol,
    * valid_from, valid_to, tieCol). The windows are user-partitioned —
    * per-user state histories are independent slices at any scale. */
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
        col(tsCol).as("valid_from"), col("valid_to"), col(tieCol))
  }
}
