package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-time face of the batch corpus-cleaning pass
  * ([[graft.operators.Pipeline]] `pipe_clean`): quality-gate each
  * arriving document, drop duplicate content within the watermark, and
  * report surviving volume per (window, source) — the live yield
  * counter a training-data ingest runs next to the landed-corpus batch
  * pipeline.
  *
  * Two stateful operators chain in one query (watermark-bounded dedup,
  * then a windowed aggregate) — Spark executes both in append mode with
  * each state store hash-partitioned on its own key. The gate itself is
  * stateless and uses the same native one-pass tokenizer as the batch
  * metrics, so a document is judged identically on both paths. At
  * 100 TB/day the only state held is one fingerprint row per distinct
  * doc inside the watermark and one running aggregate per open
  * (window, source) — both bounded by the delay, not the corpus.
  */
object StreamingClean {

  /** Gate + dedup + per-(window, source) survivor counts. Input needs
    * event-time `ts`, `doc_id`, `text`, `source` columns. Documents
    * with fewer than `minTokens` whitespace tokens are dropped before
    * dedup (no state spent on rejects). */
  def cleanCounts(
      docs: DataFrame,
      delay: String = "1 hour",
      window: String = "1 hour",
      minTokens: Int = 3): DataFrame = {
    val tk = org.apache.spark.sql.graftexpr.TextExpressions.wordNgrams(col("text"), 1)
    val gated = docs
      .withColumn("n_tokens", size(tk).cast("bigint"))
      .filter(col("n_tokens") >= minTokens)
    // the watermark set inside dropDupDocs carries through to the
    // windowed aggregate (redefining it mid-stream is disallowed)
    StreamingDedup.dropDupDocs(gated, delay)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"))
      .select(col("window.start").as("win_start"), col("source"),
        col("n_kept"), col("kept_tokens"))
  }
}
