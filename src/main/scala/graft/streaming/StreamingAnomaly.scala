package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user hour-bucket counts still open to arrivals, plus exact
  * integer moments over the hours already closed by the watermark. */
private case class BurstState(
    open: Map[Long, Long], nHours: Long, sum: Long, sumSq: Long)

/** One flagged hour: the user's count sat more than `zCut` population
  * std-devs above their own mean rate over previously CLOSED hours. */
case class Burst(user_id: Long, hour_start: Timestamp, n_events: Long, z: Double)

/** Stream-time face of the batch burst detector
  * ([[graft.operators.Relational]] `ev_anomaly`): per-user hourly event
  * counts accumulate in state until the event-time watermark closes the
  * hour; each closed hour is z-scored against the user's moments over
  * the hours closed BEFORE it (prequential — the batch pass scores
  * against the full history, the live pass can only know the past) and
  * emitted when it exceeds `zCut`. State per user is one count per open
  * hour inside the watermark horizon plus three integers — bounded by
  * the delay, never by the stream; the moments are exact integers, like
  * the batch operator's.
  *
  * Hours close WITHOUT new data from their user: a stateful function
  * only runs for keys present in the batch, so closure rides an
  * event-time TIMEOUT armed at the earliest open hour's end — when the
  * global watermark passes it, the group wakes, scores every closed
  * hour and re-arms on the next one. Dead-producer contract (the
  * [[WindowedArrays]] idle-TTL posture): once a user has no open hours,
  * `idleTtlMs` > 0 re-arms the timeout at watermark + TTL and the next
  * firing drops the user's state wholesale. */
object StreamingAnomaly {

  private val HourMs = 3600L * 1000L

  /** Flagged (user, hour) bursts for an event stream carrying
    * event-time `ts` and `user_id`. Hours close when the watermark
    * (event time minus `delay`) passes their end; a user needs
    * `minHours` already-closed hours before scoring starts (a first
    * hour has no baseline). */
  def bursts(
      events: DataFrame,
      delay: String = "2 hours",
      zCut: Double = 2.0,
      minHours: Int = 3,
      idleTtlMs: Long = 0L): Dataset[Burst] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", delay)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, it: Iterator[(Long, Timestamp)], state: GroupState[BurstState]) => {
          var st = state.getOption.getOrElse(BurstState(Map.empty, 0L, 0L, 0L))
          if (state.hasTimedOut && st.open.isEmpty) {
            // idle-TTL firing: the user went silent after every hour
            // closed — drop the moments wholesale
            state.remove()
            Iterator.empty
          } else {
            it.foreach { case (_, ts) =>
              val h = ts.getTime / HourMs
              st = st.copy(open = st.open + (h -> (st.open.getOrElse(h, 0L) + 1L)))
            }
            // the watermark visible here is the one computed at the end
            // of the PREVIOUS batch — hours close one trigger late,
            // which only delays emission, never mis-scores it
            val wm = state.getCurrentWatermarkMs()
            val (closed, stillOpen) =
              st.open.partition { case (h, _) => (h + 1) * HourMs <= wm }
            val out = scala.collection.mutable.ArrayBuffer.empty[Burst]
            // close in hour order so each hour scores against moments
            // that exclude it and everything after it
            closed.toSeq.sortBy(_._1).foreach { case (h, c) =>
              if (st.nHours >= minHours) {
                val n = st.nHours.toDouble
                val mean = st.sum.toDouble / n
                val sd = math.sqrt(
                  (st.sumSq.toDouble - st.sum.toDouble * st.sum.toDouble / n) / n)
                if (sd > 0.0) {
                  val z = (c.toDouble - mean) / sd
                  if (z > zCut) out += Burst(user, new Timestamp(h * HourMs), c, z)
                }
              }
              st = st.copy(nHours = st.nHours + 1L, sum = st.sum + c,
                sumSq = st.sumSq + c * c)
            }
            st = st.copy(open = stillOpen)
            state.update(st)
            // closure rides the timeout: arm at the earliest open hour's
            // end (always > wm — everything <= wm just closed); with no
            // open hours, arm the idle expiry if requested
            if (st.open.nonEmpty)
              state.setTimeoutTimestamp((st.open.keys.min + 1) * HourMs)
            else if (idleTtlMs > 0)
              state.setTimeoutTimestamp(math.max(wm, 0L) + idleTtlMs)
            out.iterator
          }
        })
  }
}
