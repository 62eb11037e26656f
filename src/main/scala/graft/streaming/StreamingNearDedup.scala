package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming NEAR-duplicate detection — the stream-time face of the
  * batch SimHash pass ([[graft.operators.Dedup.ddSimhash]]): flag each
  * arriving document that sits within hamming distance
  * [[Dedup.SimhashMaxHamming]] of an EARLIER document in the watermark
  * horizon.
  *
  * Mechanism: the same 60-bit SimHash + Manku banding as the batch
  * face (identical native expressions, so a document signs identically
  * on both paths; recall inside a band is guaranteed by pigeonhole at
  * hamming <= bands - 1), then a WATERMARKED INTERVAL SELF-JOIN of the
  * banded stream with itself: candidates pair only where a band value
  * agrees AND the earlier side lies within `delay` of the newer side,
  * so the join state holds one banded-signature row set per horizon —
  * bounded by the delay, never the stream — and the engine evicts it
  * from the time-range condition alone. Hamming is verified exactly on
  * the paired signatures (a band agreement is only a candidate), and a
  * final watermark-bounded per-doc dedup collapses multi-band evidence
  * to one flag per document. Same honest contract as
  * [[StreamingDedup]]: horizon-bounded near-dedup composes with the
  * periodic batch dd_simhash/dd_cluster pass over the landed corpus.
  */
object StreamingNearDedup {

  /** One append-mode row per detected near-duplicate: `(ts, doc_id,
    * dup_of, hamming)` — the first surviving evidence for that doc.
    * Input needs event-time `ts`, `doc_id`, `text` columns. Earlier =
    * strictly smaller `ts`, ties to the smaller doc id (so exactly one
    * of a pair is ever flagged). */
  def nearDupFlags(docs: DataFrame, delay: String = "1 hour"): DataFrame = {
    val mask = (1L << Dedup.SimhashBandBits) - 1
    def banded(tsName: String, idName: String, sigName: String,
        bandName: String, bvName: String): DataFrame =
      docs
        .filter(length(trim(col("text"))) > 0)
        .select(col("ts"), col("doc_id"),
          org.apache.spark.sql.graftexpr.SketchExpressions.simhash(
            org.apache.spark.sql.graftexpr.TextExpressions
              .hashWordNgrams(col("text"), 1),
            Dedup.SimhashBits).as("sig"))
        .select(col("ts"), col("doc_id"), col("sig"),
          explode(array((0 until Dedup.SimhashBands).map(b =>
            struct(lit(b).as("band"),
              expr(s"(sig >> ${Dedup.SimhashBandBits * b}) & $mask")
                .as("bv"))): _*)).as("e"))
        .select(col("ts").as(tsName), col("doc_id").as(idName),
          col("sig").as(sigName),
          col("e.band").as(bandName), col("e.bv").as(bvName))
        .withWatermark(tsName, delay)
    val cur = banded("ts", "doc_id", "sig", "band", "bv")
    val prior = banded("p_ts", "p_id", "p_sig", "p_band", "p_bv")
    cur.join(prior,
        col("band") === col("p_band") && col("bv") === col("p_bv") &&
          // the time range bounds the join state; the strict order (ties
          // to the smaller id) makes exactly one side of a pair flag
          col("p_ts") >= col("ts") - expr(s"INTERVAL $delay") &&
          (col("p_ts") < col("ts") ||
            (col("p_ts") === col("ts") && col("p_id") < col("doc_id"))) &&
          expr(s"CAST(bit_count(sig ^ p_sig) AS INT) <= ${Dedup.SimhashMaxHamming}"))
      .select(col("ts"), col("doc_id"), col("p_id").as("dup_of"),
        expr("CAST(bit_count(sig ^ p_sig) AS BIGINT)").as("hamming"))
      // multi-band (or multi-partner) evidence collapses to the first
      // flag per doc, state again bounded by the watermark
      .dropDuplicatesWithinWatermark("doc_id")
  }
}
