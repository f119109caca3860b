package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running per-key rate-trend monitoring: the streaming twin of
  * [[graft.operators.Trend.slopePerKey]], completing the anomaly
  * family's batch/stream symmetry the way [[RunningAnomaly]] twins
  * `zScoreGatePerKey`. After every micro-batch each touched key emits
  * its current least-squares slope over EVERYTHING seen so far.
  *
  * State is five integers per key — (n, Σx, Σy, Σxy, Σxx) with x
  * centered on the key's FIRST-SEEN x — O(keys), independent of
  * event volume. Centering on first-seen rather than the batch
  * form's min(x) is safe because the closed-form slope is EXACTLY
  * shift-invariant in integer arithmetic
  * (n·Σx'y − Σx'·Σy = n·Σxy − Σx·Σy for x' = x − c, term by term),
  * so the streamed slope is bit-identical to the batch slope over
  * the same prefix — the spec pins it after every micro-batch. Fold
  * order within a batch is immaterial: the sums commute exactly.
  */
object RunningTrend {

  case class TPoint(key: String, x: Long, y: Long)
  case class TrendOut(key: String, n: Long, slope: Option[Double])
  case class TState(x0: Long, n: Long, sx: Long, sy: Long,
                    sxy: Long, sxx: Long)

  /** One [[TrendOut]] snapshot per touched key per micro-batch; keys
    * with a still-degenerate x range (all x equal) emit slope = None,
    * mirroring the batch form's dropped rows. Rounding matches Spark
    * `round(_, 4)` (HALF_UP, −0.0 canonicalized) — the RunningAnomaly
    * idiom. Works identically on batch Datasets (unified semantics). */
  def slopes(ds: Dataset[TPoint]): Dataset[TrendOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[TPoint], state: GroupState[TState]) => {
          var st = state.getOption.orNull
          it.foreach { p =>
            if (st == null) st = TState(p.x, 1L, 0L, p.y, 0L, 0L)
            else {
              val dx = p.x - st.x0
              st = TState(st.x0, st.n + 1, st.sx + dx, st.sy + p.y,
                st.sxy + dx * p.y, st.sxx + dx * dx)
            }
          }
          state.update(st)
          val den = st.n * st.sxx - st.sx * st.sx
          val slope =
            if (den == 0L) None
            else Some(BigDecimal(
                (st.n * st.sxy - st.sx * st.sy).toDouble / den.toDouble)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
          Iterator.single(TrendOut(key, st.n, slope))
        })
  }
}
