package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Stream-time face of the TRAINED quality gates (batch
  * `txt_classifier_score` + `txt_lm_score`): score each arriving
  * document with the literal model artifacts and report surviving
  * volume per (window, source) — the live quality monitor a
  * training-data ingest runs next to the landed-corpus batch pipeline.
  *
  * The models are trained OFFLINE on the landed corpus (the batch
  * faces' fit) and handed here as literals — the production serving
  * shape: training never runs on the stream, and a document is scored
  * by the IDENTICAL expressions on both paths ([[TextAnalysis
  * .clfMarginCol]] / [[TextAnalysis.lmQsumCol]], spec-gated
  * bit-equality). Scoring is stateless narrow map work; the only state
  * is one running aggregate per open (window, source), bounded by the
  * watermark delay, not the corpus — at 100 TB/day this face holds
  * kilobytes. */
object StreamingQuality {

  /** Per-document scores from the literal trained models: classifier
    * margin, LM token count + quantized log-prob sum, and the joint
    * keep decision (classifier margin > 0 AND LM mean above the
    * threshold — both gates exactly as their batch faces decide).
    * Input needs a `text` column; all input columns pass through. */
  def scoreDocs(
      docs: DataFrame,
      clf: (IndexedSeq[Long], Long),
      lm: TextAnalysis.LmModel): DataFrame =
    docs
      .withColumn("tk",
        org.apache.spark.sql.graftexpr.TextExpressions.wordNgrams(col("text"), 1))
      .withColumn("margin", TextAnalysis.clfMarginCol(clf._1, clf._2, col("tk")))
      .withColumn("n_tokens", size(col("tk")).cast("bigint"))
      .withColumn("qlog_sum", TextAnalysis.lmQsumCol(lm, col("tk")))
      .withColumn("keep",
        col("margin") > 0L && col("n_tokens") > 0L &&
          col("qlog_sum") >= col("n_tokens") * lit(TextAnalysis.LmKeepThrQ))
      .drop("tk")

  /** Windowed yield counter over the jointly-gated stream: per
    * (window, source) arrivals, survivors, and surviving token volume.
    * Append-mode windowed aggregate behind the event-time watermark. */
  def qualityCounts(
      docs: DataFrame,
      clf: (IndexedSeq[Long], Long),
      lm: TextAnalysis.LmModel,
      delay: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    scoreDocs(docs, clf, lm)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .select(col("window.start").as("win_start"), col("source"),
        col("n_docs"), col("n_kept"), col("kept_tokens"))
}
