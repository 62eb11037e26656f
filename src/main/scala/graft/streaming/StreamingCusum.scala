package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Live CUSUM change-point scan over a value stream — the streaming
  * twin of the batch `ev_cusum` face (the ops dashboard that flags "the
  * daily level shifted around the 14th" while the month is still
  * running).
  *
  * The batch statistic needs the FULL-series mean, so the live face
  * keeps the exact per-day decimal totals as state — bounded by the
  * observation WINDOW (days), never the stream — and re-derives the
  * n-scaled exact statistic n·P_d − d·S over the days seen so far after
  * every micro-batch. Per micro-batch ONE distributed (day, decimal
  * sum) aggregate crosses to the driver (O(days-in-batch) rows); the
  * fold is exact decimal addition, commutative and associative, so the
  * running series is prefix-EXACT to the batch face under ANY arrival
  * order or micro-batch split (spec-gated). Addition is NOT idempotent:
  * under foreachBatch's at-least-once replay a redelivered batch
  * double-counts (the StreamingValueSketch count caveat) — dedup by
  * batchId upstream if the sink's checkpoint can replay.
  *
  * Driver state: one BigDecimal per day. */
object StreamingCusum {

  /** Driver-side running per-day exact totals + the CUSUM read. */
  final class RunningCusum {
    private val totals =
      scala.collection.mutable.TreeMap.empty[String, BigDecimal]

    def observe(day: String, x: BigDecimal): Unit = synchronized {
      totals.update(day, totals.getOrElse(day, BigDecimal(0)) + x)
    }

    def nDays: Int = synchronized { totals.size }

    /** The batch rule over the days seen so far: per day (ascending)
      * the exact n-scaled statistic n·P_d − d·S and its /n read. */
    def cusum(): Seq[(String, Double, Double)] = synchronized {
      val days = totals.toSeq
      val n = days.size
      val stot = days.map(_._2).sum
      var p = BigDecimal(0)
      days.zipWithIndex.map { case ((day, x), i) =>
        p += x
        val scaled = BigDecimal(n) * p - BigDecimal(i + 1) * stot
        (day, scaled.toDouble, scaled.toDouble / n.toDouble)
      }
    }

    /** The current change-point estimate: the day of peak |cusum|
      * (ties to the earliest day — the first time the level left). */
    def peakDay(): Option[String] = synchronized {
      val cs = cusum()
      if (cs.length < 2) None
      else {
        val mx = cs.map(c => math.abs(c._2)).max
        Some(cs.filter(c => math.abs(c._2) == mx).map(_._1).min)
      }
    }
  }

  /** Wire a [[RunningCusum]] into a live `(ts, value)` stream: one
    * distributed exact-decimal day aggregate per micro-batch, one
    * bounded collect of O(days-in-batch) rows. */
  def run(spark: SparkSession, events: DataFrame, sink: RunningCusum,
      queryName: String = "graft_streaming_cusum"): StreamingQuery =
    events.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          // the corpus carries NULL value rows (ev_value_hist filters
          // them); an all-NULL day would SUM to NULL and NPE the sink
          // fold, killing the query — drop them before the aggregate,
          // matching the batch face's NULL-ignoring decimal sum
          .filter(col("value").isNotNull)
          .groupBy(to_date(col("ts")).cast("string").as("day"))
          .agg(sum(col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("x"))
          .collect()
          .foreach(r => sink.observe(r.getString(0), BigDecimal(r.getDecimal(1))))
      }
      .start()
}
