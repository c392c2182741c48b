package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{functions => F}

/** Event-time streaming extensions — the north-star upgrades the reference
  * lacks (SURVEY §2.9: no windows, no watermarks, state kept externally in
  * Postgres/Delta high-water-marks):
  *
  *   - tumbling/sliding event-time windows with watermark-bounded state;
  *   - session windows via `session_window` (gap-based);
  *   - custom stateful sessionization via `flatMapGroupsWithState` — the
  *     principled replacement for the reference's Postgres checkpoint
  *     table (`producer_checkpoint`, `init_postgres.sql:107-119`).
  *
  * All operators work identically on batch frames (Spark unifies the
  * plans), which is how the specs pin their semantics.
  */
object WindowedAggs {

  /** Tumbling/sliding window aggregation with a watermark: counts + value
    * sums per (window, event_type). Late rows beyond the watermark are
    * dropped instead of recomputing history — the streaming answer to the
    * reference's 5-minute full-rescan DAG.
    */
  def slidingCounts(
      events: DataFrame,
      windowLen: String = "10 minutes",
      slide: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(F.window(F.col("ts"), windowLen, slide), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"), F.round(F.sum("value"), 2).as("total_value"))
      .select(
        F.col("window.start").as("window_start"),
        F.col("window.end").as("window_end"),
        F.col("event_type"), F.col("n"), F.col("total_value"))

  /** Gap-based session windows (built-in session_window). */
  def sessionValue(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(F.session_window(F.col("ts"), gap), F.col("user_id"))
      .agg(F.count(F.lit(1)).as("n_events"), F.round(F.sum("value"), 2).as("session_value"))
      .select(
        F.col("session_window.start").as("session_start"),
        F.col("session_window.end").as("session_end"),
        F.col("user_id"), F.col("n_events"), F.col("session_value"))

  // ---- custom state: flatMapGroupsWithState sessionization ----

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastSeen: Long, n: Int, total: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Emit a session row when a user goes quiet for `gapMs` (or the state
    * times out). State per key is O(1) — start/last/count/sum — so the
    * operator's memory is bounded by live users, not by history.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastSeen > gapMs =>
            out ::= SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t), n = s.n + 1, total = s.total + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur match {
        case Some(s) if state.hasTimedOut =>
          state.remove()
          out ::= SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.n, s.total)
        case Some(s) =>
          state.update(s)
          if (state.getOption.isDefined && !state.hasTimedOut) {
            // keep state alive; in a live stream a processing-time timeout
            // would flush idle sessions
            try state.setTimeoutDuration(gapMs) catch { case _: Throwable => () }
          }
        case None => ()
      }
      out.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(update)
  }
}
