package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the stream-time face of
  * [[graft.operators.Dedup.ddExact]]: drop every re-occurrence of a
  * content hash as documents arrive.
  *
  * State design for the 100 TB posture: an unbounded `dropDuplicates`
  * would retain one state row per distinct document forever, so the
  * dedup window is bounded by the event-time watermark
  * (`dropDuplicatesWithinWatermark`): two copies of a document arriving
  * within `delay` of each other dedupe; a copy arriving later than the
  * watermark is treated as new. That is the honest streaming contract —
  * exact global dedup over an infinite stream requires infinite state;
  * bounded-window dedup composes with a periodic batch `dd_exact` /
  * `dd_cluster` pass over the landed corpus for the long tail (the
  * standard lambda split for dedup pipelines). State is hash-partitioned
  * by fingerprint, one ~48-byte row per distinct doc in the window.
  */
object StreamingDedup {

  /** Keep the first arrival of each `text` fingerprint within the
    * watermark window. Input needs an event-time `ts` column; the
    * output keeps the input columns plus the `fp` fingerprint. */
  def dropDupDocs(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    docs.withColumn("fp", md5(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")
}
