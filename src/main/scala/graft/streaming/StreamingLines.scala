package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact LINE dedup — the stream-time face of the batch
  * line-dedup family ([[graft.operators.Dedup]] `dd_line_dedup` /
  * `dd_line_map`, the C4/RefinedWeb recipe): as documents arrive, split
  * them into normalized lines with the SAME normalization the batch
  * faces use (newline split, trim, drop blanks — shared semantics, the
  * StreamingCdc twin contract) and admit only lines whose hash has not
  * been seen inside the watermark: the live keep-first pass — a
  * re-crawled page contributes only the boilerplate-free lines it
  * genuinely adds.
  *
  * State design for the 100 TB posture (the [[StreamingDedup]]
  * contract): state is ONE ~48-byte row per DISTINCT normalized line
  * inside the watermark horizon (`dropDuplicatesWithinWatermark` on
  * the line hash, hash-partitioned), never per occurrence — a hot
  * boilerplate line costs one state row however often it arrives; the
  * periodic batch `dd_line_dedup` pass over the landed corpus covers
  * the long tail beyond the horizon. Splitting is stateless narrow
  * work and the md5 identity is computed BEFORE any exchange — line
  * text never reaches the state store. */
object StreamingLines {

  /** Explode each arriving document into its normalized lines:
    * (input columns minus text) + line hash `lh` + codepoint length
    * `llen` + raw line index `line_no`. Stateless; the line text never
    * leaves the projection. */
  def lineStream(docs: DataFrame): DataFrame =
    docs
      .select(col("*"),
        posexplode_outer(split(col("text"), "\n")).as(Seq("line_no", "line")))
      .withColumn("ln", trim(col("line")))
      .filter(length(col("ln")) > 0)
      .withColumn("lh", md5(col("ln")))
      .withColumn("llen", length(col("ln")).cast("bigint"))
      .withColumn("line_no", col("line_no").cast("bigint"))
      .drop("line", "ln", "text")

  /** First arrival of each normalized line within the watermark — the
    * live keep-first stream (every later duplicate drops). */
  def newLines(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    lineStream(docs)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("lh")

  /** Windowed dedup monitor over the admitted lines: per window, how
    * many distinct-new lines and how much new codepoint mass arrived
    * (the live "unique text per hour" counter next to StreamingCdc's
    * chunk-level one). Two stateful operators chained in append mode
    * (the [[StreamingClean]] shape). */
  def ingestCounts(
      docs: DataFrame,
      delay: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    newLines(docs, delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_new_lines"),
        sum(col("llen")).as("new_cps"))
      .select(col("window.start").as("win_start"),
        col("n_new_lines"), col("new_cps"))
}
