package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running (prefix) z-score anomaly detection: each point is judged
  * against the statistics of everything BEFORE it in its key's series
  * — the ONLINE form of `Curation.zScoreGatePerKey`, whose gate needs
  * the whole corpus before it can score anything. The prefix is
  * EXCLUSIVE: a point never dilutes its own baseline, which is also
  * what makes the batch and streaming forms the same fold (score
  * with prior state, then absorb).
  *
  * [[batch]] is the oracle-checkable window form; [[scored]] is the
  * same fold as streaming per-key state (n, Σx, Σx²) — one small
  * record per key, O(keys) state independent of event volume. Both
  * round z to 4 decimals (−0.0 canonicalized) and flag on the
  * ROUNDED value, the q96 idiom that keeps the gate reproducible.
  *
  * Scale shape (batch): the window partitions on the key — per-key
  * work, one exchange, no global sort. Streaming: state is three
  * doubles per key; within a micro-batch events fold in `ord` order,
  * across batches ordering is by arrival (documented — feed ordered
  * or accept at-arrival semantics, the standard online-monitoring
  * contract).
  */
object RunningAnomaly {

  case class Point(key: String, ord: Long, value: Double)
  case class Scored(key: String, ord: Long, value: Double, n: Long,
                    z: Option[Double], flag: Boolean)
  case class RAState(n: Long, s: Double, ss: Double)

  /** Batch/window twin. Output: (keyCol, ordCol, valueCol,
    * n = prior count, z, flag); warmup rows (prior n < minPrior) and
    * zero-variance prefixes emit z = null, flag = false. */
  def batch(df: DataFrame, keyCol: String, ordCol: String,
            valueCol: String, maxAbsZ: Double = 3.0,
            minPrior: Long = 5L): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val v = col(valueCol)
    df.withColumn("n", coalesce(count(v).over(w), lit(0L)))
      .withColumn("__s", sum(v).over(w))
      .withColumn("__ss", sum(v * v).over(w))
      .withColumn("__var",
        // n >= 2 guards BOTH divisions (ANSI mode errors on /0 even
        // under rows the z-guard would later reject)
        when(col("n") >= 2,
          (col("__ss") - col("__s") * col("__s") / col("n")) / (col("n") - 1)))
      .withColumn("z",
        when(col("n") >= minPrior && col("__var") > 0,
          round((v - col("__s") / col("n")) / sqrt(col("__var")), 4) + lit(0.0)))
      .withColumn("flag", coalesce(abs(col("z")) > maxAbsZ, lit(false)))
      .select(col(keyCol), col(ordCol), v, col("n"), col("z"), col("flag"))
  }

  /** The identical fold with explicit state — works on both streaming
    * and batch grouped Datasets (unified semantics, like Sessionize).
    * Within each invocation events fold in `ord` order. */
  def scored(ds: Dataset[Point], maxAbsZ: Double = 3.0,
             minPrior: Long = 5L): Dataset[Scored] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Point], state: GroupState[RAState]) => {
          val sorted = it.toSeq.sortBy(_.ord)
          var st = state.getOption.getOrElse(RAState(0L, 0.0, 0.0))
          val out = sorted.map { p =>
            val zOpt =
              if (st.n >= minPrior) {
                val variance = (st.ss - st.s * st.s / st.n) / (st.n - 1)
                if (variance > 0) {
                  val raw = (p.value - st.s / st.n) / math.sqrt(variance)
                  // Spark round() semantics: HALF_UP at 4 decimals,
                  // then -0.0 canonicalized — bit-matching batch()
                  Some(BigDecimal(raw)
                    .setScale(4, BigDecimal.RoundingMode.HALF_UP)
                    .toDouble + 0.0)
                } else None
              } else None
            val r = Scored(key, p.ord, p.value, st.n, zOpt,
              zOpt.exists(z => math.abs(z) > maxAbsZ))
            st = RAState(st.n + 1, st.s + p.value, st.ss + p.value * p.value)
            r
          }
          state.update(st)
          out.iterator
        })
  }
}
