package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.{KllDouble, SketchExpressions}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Live rank quantiles at O(k·log n) state — the streaming face of the
  * [[org.apache.spark.sql.graftexpr.KllDouble]] compactor (VERDICT r18
  * #6), beside [[StreamingValueSketch]]'s bottom-k sample: per
  * micro-batch the SAME mergeable compactor folds distributed (one
  * ≤ k·levels item buffer per group per partition, map-side shrunk)
  * and the driver folds each batch's eval()'d (value, weight) pairs
  * into running per-group Bufs with the IDENTICAL compaction rules
  * ([[KllDouble.mergePairs]] — the aggregate's own merge, applied
  * across batches). After every batch the running quantiles answer at
  * log-state where the flat sample needs k items for 1/√k error — the
  * 100 TB group-cardinality argument, live.
  *
  * Caveats, both declared: the result depends on the batch/partition
  * layout (any compaction scheme's does — the bottom-k face stays the
  * prefix-EXACT, oracle-replayable one; THIS face is bound-gated,
  * StreamingKllSpec), and total weight shares [[StreamingValueSketch]]
  * `run`'s foreachBatch at-least-once caveat under replay. */
object StreamingKll {

  /** Driver-side running compactors, one Buf per group. */
  final class RunningKll(val k: Int) {
    private val bufs = scala.collection.mutable.Map.empty[String, KllDouble.Buf]

    def observe(group: String, pairs: Seq[(Double, Long)]): Unit = synchronized {
      val buf = bufs.getOrElseUpdate(group, new KllDouble.Buf)
      KllDouble.mergePairs(buf, k, pairs.iterator)
    }

    /** Total observed weight (== rows, absent replays). */
    def n(group: String): Long = synchronized {
      bufs.get(group).map(_.n).getOrElse(0L)
    }

    /** Items currently retained — the state the log-factor bounds. */
    def retained(group: String): Int = synchronized {
      bufs.get(group).map(_.levels.map(_.length).sum).getOrElse(0)
    }

    def quantile(group: String, q: Double): Option[Double] = synchronized {
      bufs.get(group).filter(_.n > 0)
        .map(b => KllDouble.quantile(KllDouble.pairsOf(b), q))
    }
  }

  /** Wire a [[RunningKll]] into a live event stream carrying
    * `event_type` and `value`. */
  def run(
      events: DataFrame,
      state: RunningKll,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    events
      .select(col("event_type"), col("value").cast("double").as("v"))
      .writeStream
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.groupBy("event_type")
          .agg(SketchExpressions.kllDouble(col("v"), state.k).as("sk"))
          .collect()
          .foreach { r =>
            state.observe(r.getString(0),
              r.getSeq[Row](1).map(p => (p.getDouble(0), p.getLong(1))))
          }
      }
      .start()
}
