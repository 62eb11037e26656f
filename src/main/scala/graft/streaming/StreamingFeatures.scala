package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-time faces of the batch featurization/activity queries:
  * windowed feature-hashing TF ([[graft.operators.TextAnalysis]]
  * `txt_hash_tf`) and sliding-window distinct actives
  * (`ev_wau`). Both keep the batch posture — the feature space /
  * expansion factor is bounded BEFORE any stateful operator, so state
  * is O(buckets) / O(active keys in the horizon), never the stream. */
object StreamingFeatures {

  /** Windowed hashing-trick term frequencies: per (window, bucket)
    * token volume over the arriving corpus — the live twin of the
    * batch `txt_hash_tf` featurizer (same tokenizer expression, same
    * integer hash), the input a streaming quality/topic monitor feeds
    * on. Tokens collapse to one of `buckets` hash buckets at map time,
    * so the only stateful operator is the windowed aggregate: state per
    * open window is `buckets` counters, bounded by the watermark delay
    * regardless of vocabulary or stream size. Append-mode rows per
    * closed (window, bucket). */
  def hashTf(
      docs: DataFrame,
      buckets: Int = 64,
      delay: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame = {
    val tk = org.apache.spark.sql.graftexpr.TextExpressions.wordNgrams(col("text"), 1)
    val tok = col("tok")
    // the batch face's hash verbatim: murmur3 (Spark's native hash())
    // over the token's UTF-8 bytes, positive-mod into the bucket space
    val bucket = pmod(hash(tok), lit(buckets))
    docs
      .withWatermark("ts", delay)
      .select(col("ts"), explode(tk).as("tok"))
      .select(col("ts"), bucket.cast("bigint").as("bucket"))
      .groupBy(window(col("ts"), windowLen), col("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
      .select(col("window.start").as("win_start"), col("bucket"), col("n_tokens"))
  }

  /** Sliding-window distinct actives — the stream-time `ev_wau`: for
    * every `windowLen` window sliding by `slide`, the number of
    * DISTINCT users seen in it. Same shape as the batch face: the
    * (window, user) pair relation is deduplicated BEFORE the count
    * (`dropDuplicatesWithinWatermark` — state one key per distinct
    * (window, user) inside the watermark horizon, exactly the
    * expansion-then-distinct posture), then the windowed aggregate
    * counts survivors. The expansion factor windowLen/slide is fixed
    * and small, like the batch ×7. Append-mode rows per closed
    * window. */
  def slidingActives(
      events: DataFrame,
      delay: String = "1 hour",
      windowLen: String = "7 days",
      slide: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", delay)
      .select(window(col("ts"), windowLen, slide).as("win"), col("user_id"))
      .dropDuplicatesWithinWatermark("win", "user_id")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("active_users"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("active_users"))
}
