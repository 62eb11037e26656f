package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{hitCount, tokens}
import graft.sources.Tables

/** SURVEY §2.F/§2.D composite — the end-to-end training-data cleaning
  * pass every LLM corpus pipeline runs before tokenization: per-document
  * quality metrics -> quality gate -> exact dedup (keep the lowest
  * doc_id per content hash) -> per-source yield report. The reference
  * has no single analog; this is the composition its operators exist
  * for, expressed as one declarative plan.
  *
  * Scale posture: metrics are a narrow scan (one pass, no UDFs); the
  * gate is a filter; dedup is a groupBy on the 128-bit content hash
  * plus a co-partitioned join back on that hash (the q_min_joinback
  * shape) — no corpus broadcast, no window over row data; the summary
  * is a partial-agg rollup. Everything shuffles O(n) rows at most
  * twice, keyed by hash then by source.
  */
object Pipeline {

  private val STOP_EN = Seq("the", "a", "and", "of", "to", "in", "is")

  def pipeClean(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(col("tk")).cast("double")
    val stop = hitCount(col("tk"), STOP_EN).cast("double")
    val charSum = aggregate(transform(col("tk"), t => length(t)), lit(0), (a, x) => a + x)
    val m = Tables.load(s, dir, "documents")
      .withColumn("tk", tokens(col("text")))
      .select(
        col("doc_id"), col("source"),
        size(col("tk")).cast("bigint").as("n_tokens"),
        (stop / nTok).as("stop_ratio"),
        (charSum.cast("double") / nTok).as("mean_tok_len"),
        md5(col("text")).as("fp"))
    // n_tokens < 5 is checked first so empty documents are low-quality
    // regardless of their NULL ratios (three-valued OR: true wins)
    val flagged = m.withColumn("lowq",
      col("n_tokens") < 5 || col("stop_ratio") > 0.5 || col("mean_tok_len") > 12.0)
    val keepers = flagged.filter(!col("lowq"))
    val canon = keepers.groupBy("fp").agg(min("doc_id").as("keep_id"))
    val marked = keepers.join(canon, "fp")
      .withColumn("dup", col("doc_id") =!= col("keep_id"))
    val stats = flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("lowq"), 1L).otherwise(0L)).as("n_lowq"))
    val kept = marked.groupBy("source").agg(
      sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup"),
      sum(when(!col("dup"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(!col("dup"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
    stats.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_lowq"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  private val TOKENS = "list_filter(string_split(text, ' '), x -> len(x) > 0)"
  private val STOP_IN = STOP_EN.map(w => s"'$w'").mkString("(", ",", ")")

  val oracles: Map[String, String] = Map(
    "pipe_clean" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, text, $TOKENS AS tk FROM documents),
         |m AS (
         |  SELECT doc_id, source, md5(text) AS fp,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(tk, x -> x IN $STOP_IN)) AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE) AS stop_ratio,
         |    CAST(list_reduce(list_prepend(0, list_transform(tk, x -> len(x))),
         |      (a, b) -> a + b) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS mean_tok_len
         |  FROM t),
         |f AS (
         |  SELECT *, (n_tokens < 5 OR stop_ratio > 0.5 OR mean_tok_len > 12.0) AS lowq
         |  FROM m),
         |k AS (SELECT * FROM f WHERE NOT lowq),
         |c AS (SELECT fp, MIN(doc_id) AS keep_id FROM k GROUP BY 1),
         |mk AS (SELECT k.*, k.doc_id != c.keep_id AS dup FROM k JOIN c ON k.fp = c.fp),
         |s1 AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(CASE WHEN lowq THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq
         |  FROM f GROUP BY 1),
         |s2 AS (
         |  SELECT source,
         |    CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |    CAST(SUM(CASE WHEN NOT dup THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    CAST(SUM(CASE WHEN NOT dup THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
         |  FROM mk GROUP BY 1)
         |SELECT s1.source AS source, n_docs, n_lowq,
         |  COALESCE(n_dup, 0) AS n_dup, COALESCE(n_kept, 0) AS n_kept,
         |  COALESCE(kept_tokens, 0) AS kept_tokens
         |FROM s1 LEFT JOIN s2 ON s1.source = s2.source
         |ORDER BY 1""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_clean" -> (pipeClean _),
  )
}
