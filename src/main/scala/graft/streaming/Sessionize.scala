package graft.streaming

import org.apache.spark.sql.{Dataset, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §2.9 extension):
  * per-user event sessions closed when the gap between consecutive
  * events exceeds `gapNs`. Custom per-key state via
  * flatMapGroupsWithState — the Structured Streaming primitive for
  * semantics that windowed aggregation can't express.
  *
  * State is one small record per active user key, partitioned by the
  * grouping key across executors — at scale state size is O(active
  * users), independent of event volume.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Long, value: Double)
  case class TsEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, start: Long, end: Long, n_events: Long,
                     total_value: Double)

  /** Works on both streaming and batch grouped Datasets. Events
    * within a batch are processed in ts order; a gap > gapNs closes
    * the open session and emits it. (Open sessions remain in state —
    * in production pair with event-time timeout for eviction.) */
  def sessions(grouped: KeyValueGroupedDataset[Long, Event], gapNs: Long)
              (implicit enc1: org.apache.spark.sql.Encoder[SessionState],
               enc2: org.apache.spark.sql.Encoder[Session]): Dataset[Session] =
    grouped.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (userId: Long, events: Iterator[Event], state: GroupState[SessionState]) => {
        val sorted = events.toSeq.sortBy(_.ts)
        val out = Seq.newBuilder[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          cur match {
            case Some(s) if e.ts - s.last <= gapNs =>
              cur = Some(SessionState(s.start, e.ts, s.n + 1, s.total + e.value))
            case Some(s) =>
              out += Session(userId, s.start, s.last, s.n, s.total)
              cur = Some(SessionState(e.ts, e.ts, 1, e.value))
            case None =>
              cur = Some(SessionState(e.ts, e.ts, 1, e.value))
          }
        }
        cur.foreach(state.update)
        out.result().iterator
      })

  /** Production variant with event-time timeout: idle sessions are
    * emitted AND EVICTED once the watermark passes last-event + gap,
    * so state stays bounded by genuinely-active keys. Input needs an
    * event-time `ts` with a watermark (set here). */
  def sessionsWithTimeout(events: org.apache.spark.sql.Dataset[TsEvent],
                          gapMs: Long, watermark: String)
                         (implicit enc1: org.apache.spark.sql.Encoder[SessionState],
                          enc2: org.apache.spark.sql.Encoder[Session]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[TsEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.n, s.total))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val out = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  out += Session(userId, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // A timeout at or below the current watermark throws —
              // possible when this key's state is stale relative to
              // other keys' event-time progress. Clamp just above.
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, s.last + gapMs))
            }
            out.result().iterator
          }
        })
  }
}
