package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user nearest-as-of state: purchase event-times (µs) still able
  * to serve, and errors (event_id, ts µs) awaiting their future
  * horizon. */
private case class AsofNState(purchases: List[Long], pending: List[(Long, Long)])

/** One served nearest lookup — the stream twin of `ev_asof_nearest`'s
  * row: the latest purchase at-or-before, the earliest at-or-after
  * (within the horizon), and the nearest of the two. */
case class NearestMatch(
    event_id: Long, user_id: Long, ts: Timestamp,
    last_purchase_ts: Option[Timestamp],
    next_purchase_ts: Option[Timestamp],
    nearest_purchase_ts: Option[Timestamp])

/** Stream-time face of the FORWARD/NEAREST as-of
  * ([[graft.operators.Relational]] `ev_asof_nearest`, VERDICT r18 #5 —
  * [[StreamingAsof]] ships backward+tolerance; this adds the other
  * direction): "closest context in either direction, bounded future
  * wait".
  *
  * The interesting watermark design is the FUTURE buffer: a backward
  * as-of error is servable the moment the watermark passes its own
  * timestamp, but a forward candidate can arrive any time later — an
  * unbounded wait in general. The stream face therefore declares a
  * future HORIZON `horizonUs`: an error emits once the event-time
  * watermark strictly passes `ts + horizonUs` (every purchase
  * at-or-before that bound has arrived — late data carries
  * ts ≥ watermark), matching the batch window EXACTLY whenever the
  * true next purchase lies within the horizon, and falling back to
  * the backward match (the declared bounded-wait semantics) when it
  * does not. Ties (purchase ts == error ts) count in BOTH directions,
  * like the batch face's windows — and the nearest rule
  * (backward wins at equal distance) then picks the tied purchase
  * either way.
  *
  * Scale contract (the [[StreamingAsof]] posture): per-user state =
  * one collapsed purchase at-or-below the prune bound + the purchases
  * and pending errors inside max(allowed delay, horizon) — bounded by
  * the two declared windows, never the stream; emission rides an
  * event-time timeout armed at the earliest pending error's horizon
  * ceiling (armed AT the ceiling, not past it — the r18 ADVICE
  * boundary rule); the idle TTL drops a silent user's state
  * wholesale. */
object StreamingAsofNearest {

  /** Default future horizon: 24 h. */
  val HorizonUs: Long = 24L * 3600L * 1000000L

  def matches(
      events: DataFrame,
      delay: String = "1 hour",
      horizonUs: Long = HorizonUs,
      idleTtlMs: Long = 0L): Dataset[NearestMatch] = {
    import events.sparkSession.implicits._
    events
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("ts"),
        (col("event_type") === "purchase").as("isp"), col("event_id"))
      .withWatermark("ts", delay)
      .as[(Long, Timestamp, Boolean, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, it: Iterator[(Long, Timestamp, Boolean, Long)],
            state: GroupState[AsofNState]) => {
          def us(t: Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
          def tsOf(u: Long): Timestamp = {
            val t = new Timestamp(u / 1000L)
            t.setNanos(((u % 1000000L) * 1000L).toInt)
            t
          }
          var st = state.getOption.getOrElse(AsofNState(Nil, Nil))
          val rows = it.toList
          if (state.hasTimedOut && rows.isEmpty && st.pending.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            val newP = rows.filter(_._3).map(r => us(r._2))
            val newE = rows.filterNot(_._3).map(r => (r._4, us(r._2)))
            var purchases = (st.purchases ++ newP).sorted
            var pending = (st.pending ++ newE).sortBy(_._2)
            val wmMs = state.getCurrentWatermarkMs()
            // servable once the watermark STRICTLY passes the ms ceiling
            // of the error's future horizon: no purchase at-or-before
            // te + horizon can still arrive
            def servable(teUs: Long): Boolean =
              wmMs > (teUs + horizonUs + 999L) / 1000L
            val (ready, waiting) = pending.partition(e => servable(e._2))
            val out = ready.map { case (eid, te) =>
              val lastP = purchases.takeWhile(_ <= te).lastOption
              val nextP = purchases.dropWhile(_ < te).headOption
                .filter(_ <= te + horizonUs)
              val nearest = (lastP, nextP) match {
                case (None, n) => n
                case (l, None) => l
                case (Some(l), Some(n)) =>
                  if (te - l <= n - te) Some(l) else Some(n)
              }
              NearestMatch(eid, user, tsOf(te),
                lastP.map(tsOf), nextP.map(tsOf), nearest.map(tsOf))
            }
            // prune: the latest purchase at-or-below BOTH the watermark
            // safety bound (future errors can carry ts as low as
            // wmMs·1000 − 999, the StreamingAsof boundary rule) and one
            // µs under the earliest STILL-PENDING error (it needs every
            // purchase at-or-after its own ts individually — ties count
            // forward too)
            val wmSafe = wmMs * 1000L - 1000L
            val pruneUs = waiting.headOption
              .map(e => math.min(wmSafe, e._2 - 1L)).getOrElse(wmSafe)
            val (below, above) = purchases.partition(_ <= pruneUs)
            purchases = below.lastOption.toList ++ above
            pending = waiting
            st = AsofNState(purchases, pending)
            state.update(st)
            // wake at the earliest pending error's horizon ceiling
            // (AT the ceiling: timeouts fire when wm strictly exceeds
            // the armed ms — r18 ADVICE rule); keep it legal above the
            // current watermark in the boundary batch
            pending.headOption match {
              case Some((_, te)) =>
                state.setTimeoutTimestamp(
                  math.max(wmMs + 1L, (te + horizonUs + 999L) / 1000L))
              case None if idleTtlMs > 0L =>
                state.setTimeoutTimestamp(wmMs + idleTtlMs)
              case None => ()
            }
            out.iterator
          }
        })
  }
}
