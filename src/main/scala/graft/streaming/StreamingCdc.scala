package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming content-defined-chunk ingest — the stream-time face of
  * the batch CDC dedup family ([[graft.operators.Dedup]]
  * `dd_cdc_chunks` / `dd_cdc_coverage`): as documents arrive, split
  * them with the SAME codegen'd rolling-hash kernel the batch faces
  * use and admit only chunks whose hash has not been seen inside the
  * watermark — the live chunk store an incremental ingest maintains so
  * a re-crawled page (or a lightly-edited copy, which shares every
  * interior chunk of its unchanged spans) adds only its genuinely new
  * bytes.
  *
  * State design for the 100 TB posture (the [[StreamingDedup]]
  * contract): the chunk store is bounded by the event-time watermark
  * (`dropDuplicatesWithinWatermark` on the chunk hash — one ~48-byte
  * state row per distinct chunk in the window, hash-partitioned), and
  * composes with the periodic batch `dd_cdc_chunks` pass over the
  * landed corpus for the long tail. Chunking itself is stateless
  * narrow kernel work, and only (hash, length) rows reach the state
  * store — chunk text is dropped before the shuffle. */
object StreamingCdc {

  /** Explode each arriving document into its content-defined chunks:
    * (input columns minus text) + chunk hash `ch` + codepoint length
    * `clen`. Stateless; the chunk text never leaves the projection. */
  def chunkStream(docs: DataFrame): DataFrame = {
    val chunks = docs
      .withColumn("chunk", explode_outer(
        org.apache.spark.sql.graftexpr.TextExpressions.cdcChunks(col("text"))))
      .filter(col("chunk").isNotNull)
    chunks
      .withColumn("ch", md5(col("chunk")))
      .withColumn("clen", length(col("chunk")).cast("bigint"))
      .drop("chunk", "text")
  }

  /** First arrival of each chunk hash within the watermark — the live
    * chunk-store admission stream. */
  def newChunks(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    chunkStream(docs)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("ch")

  /** Windowed ingest monitor over the admitted chunks: per window, how
    * many new chunks and how much new codepoint mass the stream added
    * to the store (the live "unique bytes per hour" counter a
    * dedup-aware ingest reports). Two stateful operators chained in
    * append mode (the [[StreamingClean]] shape): watermark-bounded
    * chunk dedup, then the windowed aggregate. */
  def ingestCounts(
      docs: DataFrame,
      delay: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    newChunks(docs, delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_new_chunks"),
        sum(col("clen")).as("new_cps"))
      .select(col("window.start").as("win_start"),
        col("n_new_chunks"), col("new_cps"))
}
