package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A timestamped event on the stream (the SSE record after JSON decode). */
case class StreamEvent(user_id: Long, event_type: String, value: Double, ts: Timestamp)

/** Closed session emitted by the stateful sessionizer. */
case class Session(user_id: Long, n_events: Long, sum_value: Double,
    session_start: Timestamp, session_end: Timestamp)

private case class SessionState(n: Long, sum: Double, start: Long, last: Long)

/** Structured Streaming transforms over the SSE event stream — the
  * streaming-native form of the batch operators in graft.operators.Events.
  * The reference connector only forwards events; these are the stateful
  * upgrades Spark provides on top: watermarked windows, session state,
  * exactly-once dedup.
  *
  * All state is keyed and watermark-bounded, so state-store size is
  * O(active keys), not O(stream length) — the property that keeps these
  * runnable forever on an unbounded 100 TB/day stream.
  */
object StreamOps {

  /** Tumbling-window counts per event type with a watermark: late events
    * beyond `lateness` are dropped and window state is reclaimed. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when `gapSec` passes with no event (event-time, watermark-driven).
    * Emits closed sessions (append mode). */
  def sessionize(events: Dataset[StreamEvent], gapSec: Long = 1800L,
      lateness: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[StreamEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.n, s.sum, new Timestamp(s.start), new Timestamp(s.last)))
          } else {
            val events = it.toSeq.sortBy(e => (e.ts.getTime, e.user_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            events.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSec * 1000 =>
                  cur = Some(SessionState(s.n + 1, s.sum + e.value, s.start, math.max(s.last, t)))
                case Some(s) => // gap exceeded: close previous, open new
                  closed ::= Session(userId, s.n, s.sum, new Timestamp(s.start), new Timestamp(s.last))
                  cur = Some(SessionState(1L, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1L, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSec * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** Exactly-once dedup by event id within the watermark horizon — the
    * streaming form of log-compaction/upsert. */
  def dedupById(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicates("event_id", "ts")
}
