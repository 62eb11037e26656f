package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-time face of the batch vocabulary-coverage gate
  * ([[graft.operators.Pipeline]] `txt_vocab_coverage`): per
  * (window, source) OOV-rate of the arriving corpus against a FIXED
  * reference vocabulary — the drift monitor a training-data ingest
  * runs next to the batch pipeline (a rising OOV fraction means the
  * live corpus has drifted from the vocabulary the tokenizer/filters
  * were built on).
  *
  * The vocabulary is the batch side's bounded top-K relation handed
  * off as values (the trained-model posture: only trained VALUES cross
  * the boundary, like the k-means centroids and BPE merge tables), so
  * membership rides the plan as a literal IN set — stateless, no join
  * state. Above `spark.sql.optimizer.inSetConversionThreshold` (10) the
  * optimizer rewrites the In to an `InSet` hash probe, so a
  * tens-of-thousands-token vocabulary costs O(1) per token and stays
  * inside codegen rather than unrolling a giant predicate chain
  * (spec-asserted on a 20k vocab). The only stateful operator is the
  * windowed aggregate:
  * state per open (window, source) is four counters, bounded by the
  * watermark delay, never the stream. Tokenization uses the same native
  * one-pass tokenizer as the batch gate, so a document scores
  * identically on both paths.
  */
object StreamingVocab {

  /** Windowed OOV drift against `vocab`. Input needs event-time `ts`,
    * `text`, `source` columns; emits one append-mode row per closed
    * (window, source): token volume, OOV volume and the OOV fraction
    * (batch `txt_vocab_coverage` semantics — `explode_outer` keeps
    * zero-token documents contributing zero tokens). */
  def oovDrift(
      docs: DataFrame,
      vocab: Seq[String],
      delay: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame = {
    val tk = org.apache.spark.sql.graftexpr.TextExpressions.wordNgrams(col("text"), 1)
    val toks = docs
      .withWatermark("ts", delay)
      .select(col("ts"), col("source"), explode_outer(tk).as("w"))
    // null w (empty doc) fails the IN and the count alike: contributes 0
    val inVocab = when(col("w").isin(vocab: _*), 1L).otherwise(0L)
    toks
      .groupBy(window(col("ts"), windowLen), col("source"))
      .agg(count(col("w")).as("n_tokens"), sum(inVocab).as("n_in_vocab"))
      .select(col("window.start").as("win_start"), col("source"),
        col("n_tokens"),
        (col("n_tokens") - col("n_in_vocab")).as("n_oov"),
        when(col("n_tokens") > 0,
          lit(1.0) - col("n_in_vocab").cast("double") / col("n_tokens").cast("double"))
          .otherwise(0.0).as("oov_frac"))
  }
}
