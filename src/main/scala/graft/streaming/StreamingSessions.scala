package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open session fragments for one user: inclusive [startMs, endMs]
  * spans with their event counts, disjoint and more than the gap apart
  * from each other by construction (anything closer has been merged). */
private case class SessionState(frags: List[(Long, Long, Long)])

/** One closed session. */
case class Session(
    user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

/** Stream-time face of the batch gap sessionizer
  * ([[graft.operators.Relational]] `ev_sessionize`): events accumulate
  * into per-user session FRAGMENTS — inclusive spans merged whenever
  * two sit within the gap — and a fragment is emitted as a session once
  * the event-time watermark passes its end + gap, the moment no
  * surviving event can extend it (anything later than the watermark
  * starts a new session by definition; anything earlier is dropped by
  * the watermark before reaching the state function). Out-of-order
  * arrivals inside the horizon are handled structurally: an event
  * landing BETWEEN two fragments bridges them into one.
  *
  * The C-family pattern shared with [[StreamingAnomaly.bursts]]:
  * sessions must close WITHOUT new data from their user, and a stateful
  * function only runs for keys present in the batch — so closure rides
  * an event-time TIMEOUT armed at the earliest open fragment's end +
  * gap. State per user is O(open fragments inside the watermark
  * horizon) — bounded by the allowed delay, never by the stream; the
  * dead-producer contract (idle TTL) drops a silent user's empty state
  * wholesale. */
object StreamingSessions {

  /** Closed gap-sessions for an event stream carrying event-time `ts`
    * and `user_id`. `gap` and `delay` are duration strings fed to the
    * watermark/boundary math; `gapMs` must match `gap`. */
  def sessions(
      events: DataFrame,
      delay: String = "2 hours",
      gapMs: Long = 1800L * 1000L,
      idleTtlMs: Long = 0L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", delay)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, it: Iterator[(Long, Timestamp)], state: GroupState[SessionState]) => {
          var frags = state.getOption.map(_.frags).getOrElse(Nil)
          if (state.hasTimedOut && frags.isEmpty) {
            // idle-TTL firing: the user went silent after every session
            // closed — drop the (empty) state wholesale
            state.remove()
            Iterator.empty
          } else {
            // insert each event as a point fragment, then merge every
            // pair within the gap (sort once; merging is associative)
            val pts = it.map { case (_, ts) => (ts.getTime, ts.getTime, 1L) }.toList
            val merged = (frags ++ pts).sortBy(_._1)
              .foldLeft(List.empty[(Long, Long, Long)]) {
                case ((s, e, n) :: tail, (s2, e2, n2)) if s2 - e <= gapMs =>
                  (s, math.max(e, e2), n + n2) :: tail
                case (acc, f) => f :: acc
              }.reverse
            // the watermark here was computed at the end of the PREVIOUS
            // batch — sessions close one trigger late, which only delays
            // emission, never changes the session's extent
            val wm = state.getCurrentWatermarkMs()
            // STRICT inequality: an event at exactly ts = wm survives the
            // late-data filter and ts - e == gap still extends a session,
            // so a fragment is immortal only once end + gap < wm (the
            // timeout below fires when wm ADVANCES PAST end + gap, which
            // lands exactly here)
            val (closed, open) = merged.partition { case (_, e, _) => e + gapMs < wm }
            frags = open
            state.update(SessionState(frags))
            if (frags.nonEmpty)
              state.setTimeoutTimestamp(frags.map(_._2).min + gapMs)
            else if (idleTtlMs > 0)
              state.setTimeoutTimestamp(math.max(wm, 0L) + idleTtlMs)
            else state.remove()
            closed.sortBy(_._1).iterator.map { case (s, e, n) =>
              Session(user, new Timestamp(s), new Timestamp(e), n)
            }
          }
        })
  }
}
