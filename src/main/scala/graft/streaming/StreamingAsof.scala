package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user as-of state: purchase event-times (µs) still able to serve
  * a future error, and errors (event_id, ts µs) awaiting their
  * no-earlier-purchase-can-arrive guarantee. */
private case class AsofState(purchases: List[Long], pending: List[(Long, Long)])

/** One served as-of lookup — the stream twin of `ev_asof_tol`'s row:
  * the latest purchase at-or-before the error, NULLed past the
  * staleness tolerance. */
case class AsofMatch(
    event_id: Long, user_id: Long, ts: Timestamp,
    last_purchase_ts: Option[Timestamp], staleness_us: Option[Long])

/** Stream-time face of the batch as-of family
  * ([[graft.operators.Relational]] `ev_asof_join`/`ev_asof_tol`,
  * VERDICT r17 #6): feature serving — "latest context at-or-before
  * each request, bounded staleness" — as watermarked per-user state.
  *
  * Correctness contract: an error emits only once the event-time
  * watermark passes its timestamp, the moment Spark's late-data filter
  * guarantees no purchase at-or-before it can still arrive (arrivals
  * carry ts ≥ watermark) — so out-of-order purchases INSIDE the horizon
  * are seen before any error they should serve, and the emitted match
  * equals the batch window's answer on the same data
  * (prefix-equality spec, the StreamingGram discipline). Ties (purchase
  * ts == error ts) match, like the batch backward window's
  * purchases-sort-first rule.
  *
  * Scale contract (the [[StreamingSessions]] C-family posture): state
  * per user = ONE purchase timestamp at-or-below the watermark (an
  * older one can never beat it for any future error, and a fresh error
  * below the watermark can never arrive) + the purchases and pending
  * errors inside the horizon — bounded by the allowed delay, never the
  * stream; emission rides an event-time TIMEOUT armed at the earliest
  * pending error (a stateful function only runs for keys present in the
  * batch); the dead-producer contract (idle TTL) drops a silent user's
  * state wholesale. */
object StreamingAsof {

  /** Served as-of lookups for an event stream carrying `ts`,
    * `user_id`, `event_type` ("purchase" serves, "error" asks) and
    * `event_id`. `tolUs` is the staleness bound in microseconds
    * (batch default [[graft.operators.Relational.AsofTolUs]]). */
  def matches(
      events: DataFrame,
      delay: String = "1 hour",
      tolUs: Long = graft.operators.Relational.AsofTolUs,
      idleTtlMs: Long = 0L): Dataset[AsofMatch] = {
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
            state: GroupState[AsofState]) => {
          def us(t: Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
          def tsOf(u: Long): Timestamp = {
            val t = new Timestamp(u / 1000L)
            t.setNanos(((u % 1000000L) * 1000L).toInt)
            t
          }
          var st = state.getOption.getOrElse(AsofState(Nil, Nil))
          val rows = it.toList
          if (state.hasTimedOut && rows.isEmpty && st.pending.isEmpty) {
            // idle-TTL firing on a drained user: drop the state wholesale
            state.remove()
            Iterator.empty
          } else {
            val newP = rows.filter(_._3).map(r => us(r._2))
            val newE = rows.filterNot(_._3).map(r => (r._4, us(r._2)))
            var purchases = (st.purchases ++ newP).sorted
            var pending = (st.pending ++ newE).sortBy(_._2)
            val wmMs = state.getCurrentWatermarkMs()
            // an error is servable once the watermark STRICTLY passes its
            // millisecond ceiling: any later arrival has ts >= wm > error
            // ts, so its backward candidate set is complete (ties ts ==
            // error ts are already in state — they arrived while >= wm)
            def servable(teUs: Long): Boolean = wmMs > (teUs + 999L) / 1000L
            val (ready, waiting) = pending.partition(e => servable(e._2))
            val out = ready.map { case (eid, te) =>
              val lp = purchases.takeWhile(_ <= te).lastOption
              val stale = lp.map(te - _)
              AsofMatch(eid, user, tsOf(te),
                lp.filter(_ => stale.exists(_ <= tolUs)).map(tsOf),
                stale)
            }
            // prune: only the LATEST purchase at-or-below the SAFE bound
            // can ever serve again. The bound is one full millisecond
            // under the ms watermark, not the watermark itself: a still-
            // PENDING error can carry ts as low as wmMs·1000 − 999 µs
            // (servable only once wm strictly passes its ms ceiling), so
            // purchases inside that boundary millisecond must stay
            // individually addressable or a later purchase in the same
            // window would wrongly shadow an earlier one for that error.
            val pruneUs = wmMs * 1000L - 1000L
            val (below, above) = purchases.partition(_ <= pruneUs)
            purchases = below.lastOption.toList ++ above
            pending = waiting
            st = AsofState(purchases, pending)
            state.update(st)
            // wake when the earliest pending error becomes servable;
            // otherwise idle-TTL (or let the state carry the one purchase).
            // Arm AT the error's ms ceiling, not past it: Spark fires an
            // event-time timeout only when the watermark STRICTLY exceeds
            // the armed timestamp, and servability needs wm >= ceil+1 —
            // arming at ceil+1 left a gap where a stream that advances the
            // watermark to exactly ceil+1 and then idles never re-invokes
            // the function, freezing a servable error (ADVICE r18). The
            // max() keeps the arm legal (must stay above the current wm)
            // in the wm == ceil boundary batch, costing one extra ms only
            // there.
            pending.headOption match {
              case Some((_, te)) =>
                state.setTimeoutTimestamp(math.max(wmMs + 1L, (te + 999L) / 1000L))
              case None if idleTtlMs > 0L =>
                state.setTimeoutTimestamp(wmMs + idleTtlMs)
              case None => ()
            }
            out.iterator
          }
        })
  }
}
