package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Dedup

/** Live per-source Bloom membership filters over a document stream —
  * the streaming twin of the batch `dd_bloom` face (the shard-level
  * membership index a 100 TB ingest keeps warm: "has source X already
  * contributed this vocabulary" answered without touching storage).
  *
  * Per micro-batch the SAME bit-contribution relation folds distributed
  * ([[Dedup.bloomContrib]] + the eight bit_or word aggregates — one
  * 64-byte row per source per partition on the wire) and only the
  * per-source word rows cross to the driver, which ORs them into the
  * running filters.
  *
  * The filter is a commutative-IDEMPOTENT semilattice (bit_or), so the
  * running state after any prefix of batches equals the batch filter
  * over the same rows under ANY arrival order, ANY micro-batch split,
  * and — stronger than the counting sketches — ANY foreachBatch REPLAY
  * (at-least-once redelivery re-ORs the same bits; spec-gated). The
  * batch face's exact `n_grams` distinct count is deliberately NOT
  * tracked live: it would need O(vocabulary) state, which is exactly
  * what the filter exists to avoid — the live object IS the bits.
  *
  * Driver state: 8 longs per source, never data. */
object StreamingBloom {

  /** Driver-side running filters: 8 bit_or words per source. */
  final class RunningBloom {
    private val words =
      scala.collection.mutable.Map.empty[String, Array[Long]]

    def observe(source: String, ws: Seq[Long]): Unit = synchronized {
      require(ws.length == Dedup.BloomWords, s"expected ${Dedup.BloomWords} words")
      val cur = words.getOrElseUpdate(source, new Array[Long](Dedup.BloomWords))
      var k = 0
      while (k < cur.length) { cur(k) |= ws(k); k += 1 }
    }

    def filter(source: String): Option[Vector[Long]] = synchronized {
      words.get(source).map(_.toVector)
    }

    def bitsSet(source: String): Long = synchronized {
      words.get(source).map(_.map(java.lang.Long.bitCount(_).toLong).sum)
        .getOrElse(0L)
    }

    /** Snapshot in the batch `dd_bloom` word/popcount shape (without
      * the batch-only exact n_grams column). */
    def snapshot(spark: SparkSession): DataFrame = {
      import spark.implicits._
      synchronized {
        words.keys.toSeq.sorted.map { src =>
          val ws = words(src).toVector
          (src, ws, ws.map(java.lang.Long.bitCount(_).toLong).sum)
        }
      }.toDF("source", "words", "bits_set")
    }
  }

  /** Wire a [[RunningBloom]] into a live `(source, text)` document
    * stream: per micro-batch ONE distributed contribution+bit_or pass,
    * one bounded collect of |sources| 64-byte rows.
    *
    * `trigger` defaults to the continuous micro-batch trigger (like
    * [[StreamingCusum]]), so a genuinely continuous ingest keeps the
    * filter warm forever; pass `Some(Trigger.AvailableNow())` for a
    * drain-and-stop cycle (the spec's posture — it re-invokes run()
    * per drain).
    *
    * BREAKING (ADVICE r19 #3): before r20 the no-args default was
    * `Trigger.AvailableNow()` — a caller relying on
    * `run(...).awaitTermination()` returning after the source drains
    * must now pass `Some(Trigger.AvailableNow())` explicitly; the old
    * default silently stopped a continuous caller's filter instead. */
  def run(spark: SparkSession, docs: DataFrame, sink: RunningBloom,
      queryName: String = "graft_streaming_bloom",
      trigger: Option[Trigger] = None): StreamingQuery = {
    val base = docs.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Update())
    trigger.fold(base)(base.trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val agged = Dedup.bloomContrib(batch)
          .groupBy("source")
          .agg(Dedup.bloomWordAggs.head, Dedup.bloomWordAggs.tail: _*)
          .collect()
        agged.foreach { r =>
          sink.observe(r.getString(0),
            (1 to Dedup.BloomWords).map(r.getLong(_)))
        }
      }
      .start()
  }
}
