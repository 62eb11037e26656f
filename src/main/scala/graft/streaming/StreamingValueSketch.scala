package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming quantile sketch over a live value stream — the
  * [[StreamingEmbGram]] twin at the sketch face (batch face:
  * `ev_value_sketch`): per micro-batch the SAME bounded
  * bottom-k-by-hash sample folds distributed
  * ([[org.apache.spark.sql.graftexpr.KSmallestByHash]] in its
  * mergeable pairs form — one ≤ 16·k-byte buffer per group per
  * partition) and only the per-group samples cross to the driver,
  * which keeps the k smallest (hash, value) pairs per group.
  *
  * Because sample membership is the k smallest elements of a MULTISET
  * — a commutative semilattice — after ANY prefix of rows, under ANY
  * arrival order or micro-batch split, the running sample is EXACTLY
  * the batch sample over the same rows (spec-gated in
  * StreamingValueSketchSpec), so live p50/p90/p99 dashboards can never
  * disagree with the nightly batch sketch on the same data — the
  * StreamingEmbGram prefix-equality discipline with set-merge in place
  * of integer addition.
  *
  * Scale posture: driver state is ≤ k pairs + one count per GROUP (a
  * model artifact, never data); per micro-batch the distributed fold
  * ships one bounded buffer per (group, partition) and one bounded
  * collect of |groups| rows. */
object StreamingValueSketch {

  /** Driver-side running bottom-k sample per group + exact row count. */
  final class RunningSketch(val k: Int) {
    require(k >= 2, s"k must be >= 2, got $k")
    // natural (h, v) order; scala's PriorityQueue keeps the MAX at the
    // head, which is exactly the eviction candidate
    private val ord: Ordering[(Long, Double)] =
      Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)
    private val heaps =
      scala.collection.mutable.Map.empty[String, scala.collection.mutable.PriorityQueue[(Long, Double)]]
    private val counts = scala.collection.mutable.Map.empty[String, Long]

    /** Fold one micro-batch's per-group aggregate in. */
    def observe(group: String, n: Long, pairs: Seq[(Long, Double)]): Unit =
      synchronized {
        counts.update(group, counts.getOrElse(group, 0L) + n)
        val h = heaps.getOrElseUpdate(group,
          scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord))
        pairs.foreach { p =>
          if (h.size < k) h.enqueue(p)
          else if (ord.lt(p, h.head)) { h.dequeue(): Unit; h.enqueue(p) }
        }
      }

    def nRows(group: String): Long = synchronized { counts.getOrElse(group, 0L) }

    /** The running sample's values, ascending (the quantile read). */
    def values(group: String): Seq[Double] = synchronized {
      heaps.get(group).map(_.toSeq.map(_._2).sorted).getOrElse(Nil)
    }

    /** Rank-indexed quantile estimate at integer permille p of 100 —
      * the exact batch rule: index floor(((m−1)·p)/100), 0-based. */
    def quantile(group: String, p: Int): Option[Double] = synchronized {
      val vs = values(group)
      if (vs.isEmpty) None else Some(vs(((vs.length - 1) * p) / 100))
    }

    /** Snapshot in the batch `ev_value_sketch` schema for a direct
      * compare. A group counted but never sampled (all-NULL values in
      * its batches) snapshots with NULL estimates — same guard as
      * [[quantile]], instead of indexing an empty sample (ADVICE
      * r18). */
    def snapshot(spark: SparkSession): DataFrame = {
      import spark.implicits._
      synchronized {
        counts.keys.toSeq.sorted.map { g =>
          val vs = values(g)
          def q(p: Int): Option[Double] =
            if (vs.isEmpty) None else Some(vs(((vs.length - 1) * p) / 100))
          (g, counts(g), vs.length.toLong, q(50), q(90), q(99))
        }
      }.toDF("event_type", "n_rows", "m", "est_p50", "est_p90", "est_p99")
    }
  }

  /** Wire a [[RunningSketch]] into a live event stream carrying
    * `event_type`, `value` and a unique `event_id` — the same 62-bit
    * permutation row hash as the batch face, so stream and batch
    * samples are the SAME set.
    *
    * Delivery caveat (ADVICE r18): foreachBatch is AT-LEAST-ONCE — a
    * replayed batch after a failure re-observes its rows. The SAMPLE
    * is idempotent under replay (bottom-k over a set: re-inserting an
    * already-held (h, v) pair changes nothing), but `n_rows` is a
    * plain sum and double-counts the replayed batch, so after a
    * failure the running count can exceed the nightly batch count
    * until rebuilt. A deployment needing exactly-once counts should
    * record the max seen `batchId` in [[RunningSketch]] and skip
    * already-observed ids (the standard foreachBatch idempotence
    * recipe); the quantile estimates need no such guard. */
  def run(
      events: DataFrame,
      state: RunningSketch,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    events
      .select(col("event_type"),
        graft.operators.Relational.permHash62(col("event_id")).as("h"),
        col("value").cast("double").as("v"))
      .writeStream
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            org.apache.spark.sql.graftexpr.SketchExpressions
              .kSmallestPairsByHash(col("h"), col("v"), state.k).as("ps"))
          .collect()
          .foreach { r =>
            state.observe(r.getString(0), r.getLong(1),
              r.getSeq[Row](2).map(p => (p.getLong(0), p.getDouble(1))))
          }
      }
      .start()
}
