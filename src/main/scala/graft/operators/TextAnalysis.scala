package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{hash60, hitCount, shingles, tokens}
import graft.sources.Tables

/** SURVEY §2.F — text analysis over `documents`: token counting, quality
  * scoring, heuristic language ID, fingerprinting. All per-document map
  * work (narrow, no shuffle beyond the final presentation sort); at
  * 100 TB this is a pure scan pipeline.
  */
object TextAnalysis {

  private val STOP_EN = Seq("the", "a", "and", "of", "to", "in", "is")
  private val STOP_ES = Seq("el", "la", "de", "y", "que", "los")
  private val STOP_DE = Seq("der", "die", "das", "und", "ist", "ein")
  private val STOP_FR = Seq("le", "la", "de", "et", "les", "un")

  private def withTokens(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").withColumn("tk",
      org.apache.spark.sql.graftexpr.TextExpressions.wordNgrams(col("text"), 1))

  /** Token counting: whitespace tokens + regex alpha-run terms. */
  def txtTokens(s: SparkSession, dir: String): DataFrame =
    withTokens(s, dir).select(
      col("doc_id"),
      size(col("tk")).cast("bigint").as("n_tokens"),
      regexp_count(col("text"), lit("[a-z]+")).cast("bigint").as("n_alpha_runs"),
      length(col("text")).cast("bigint").as("n_chars_txt"))
      .orderBy("doc_id")

  /** Quality scoring: stopword ratio, mean token length, composite score. */
  def txtQuality(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(col("tk")).cast("double")
    val stop = hitCount(col("tk"), STOP_EN).cast("double")
    val charSum = aggregate(transform(col("tk"), t => length(t)), lit(0), (a, x) => a + x)
    withTokens(s, dir).select(
      col("doc_id"),
      size(col("tk")).cast("bigint").as("n_tokens"),
      (stop / nTok).as("stop_ratio"),
      (charSum.cast("double") / nTok).as("mean_tok_len"),
      ((stop / nTok) * 0.3 + least(charSum.cast("double") / nTok / 10.0, lit(1.0)) * 0.7).as("score"))
      .orderBy("doc_id")
  }

  /** Heuristic language ID from stopword profiles, checked vs the label. */
  def txtLangid(s: SparkSession, dir: String): DataFrame = {
    val hEn = hitCount(col("tk"), STOP_EN)
    val hEs = hitCount(col("tk"), STOP_ES)
    val hDe = hitCount(col("tk"), STOP_DE)
    val hFr = hitCount(col("tk"), STOP_FR)
    val pred = when(hEn >= greatest(hEs, hDe, hFr) && hEn > 0, "en")
      .when(hEs >= greatest(hDe, hFr) && hEs > 0, "es")
      .when(hDe >= hFr && hDe > 0, "de")
      .when(hFr > 0, "fr")
      .otherwise("und")
    withTokens(s, dir)
      .select(col("doc_id"), pred.as("pred_lang"), col("lang"),
        (pred === col("lang")).as("is_match"))
      .orderBy("doc_id")
  }

  /** Fingerprints: full-content md5 + min-shingle rolling fingerprint. */
  def txtFingerprint(s: SparkSession, dir: String): DataFrame =
    withTokens(s, dir).select(
      col("doc_id"),
      md5(col("text")).as("fp_full"),
      // min over the distinct-gram hash set == min over all gram hashes
      array_min(org.apache.spark.sql.graftexpr.TextExpressions
        .hashWordNgrams(col("text"), 3)).as("fp_min_shingle"))
      .orderBy("doc_id")

  /** PII scrubbing: multi-pattern regex redaction with per-pattern match
    * counts and a checksum of the scrubbed text — all narrow codegen'd
    * scan work (regexp_count + chained global regexp_replace), so at
    * 100 TB it is a pure map pipeline like the rest of §2.F.
    *
    * The synthetic corpus carries no PII, so the query first seeds each
    * document with a DETERMINISTIC synthetic email (2 of every 3 docs)
    * and phone — integer-derived, so both engines compose byte-identical
    * text — and the checksum then proves the scrub excised exactly those
    * spans. Swap the patterns for production email/phone/ssn regexes;
    * the plumbing is unchanged. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "555-[0-9]{4}"

  def txtPii(s: SparkSession, dir: String): DataFrame = {
    val seeded = Tables.load(s, dir, "documents").select(
      col("doc_id"),
      concat(
        col("text"),
        when(col("doc_id") % 3 === 0, lit(""))
          .otherwise(concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))),
        lit(" tel 555-"),
        lpad((col("doc_id") * 7927 % 10000).cast("string"), 4, "0")).as("txt"))
    seeded.select(
      col("doc_id"),
      regexp_count(col("txt"), lit(EmailRe)).cast("bigint").as("n_emails"),
      regexp_count(col("txt"), lit(PhoneRe)).cast("bigint").as("n_phones"),
      md5(regexp_replace(regexp_replace(col("txt"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>")).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  /** Corpus-level phrase statistics: the global top-20 word bigrams by
    * frequency (ties to the byte-order-smaller n-gram) — the vocabulary/
    * phrase-table pass a tokenizer-training pipeline runs over the raw
    * corpus. The explode is narrow; map-side partial aggregation
    * collapses each partition to its distinct bigrams before the
    * O(distinct)-row shuffle, and the global top-k is a
    * TakeOrderedAndProject (k rows per partition cross to the driver,
    * never a full sort shuffle) — at 100 TB the wire carries distinct
    * phrases and a 20-row head, not token occurrences. */
  def txtNgramTop(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(org.apache.spark.sql.graftexpr.TextExpressions
        .wordNgrams(col("text"), 2)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(20)

  /** Document-frequency table: the top-50 tokens by the NUMBER OF
    * DOCUMENTS containing them (ties to the byte-order-smaller token) —
    * the IR statistic behind IDF weighting and data-driven stopword
    * detection, distinct from occurrence counts ([[txtNgramTop]] /
    * vocab): a token spammed in one document counts once here. Each
    * document's tokens dedupe locally (bounded by doc length); map-side
    * partial aggregation collapses partitions to distinct tokens before
    * the O(distinct) shuffle; the head is a TakeOrderedAndProject. */
  def txtDocfreq(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(array_distinct(
        org.apache.spark.sql.graftexpr.TextExpressions.wordNgrams(col("text"), 1)))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token"))
      .limit(50)

  val oracles: Map[String, String] = Map(
    "txt_docfreq" ->
      """WITH t AS (
        |  SELECT list_distinct(list_filter(string_split(text, ' '),
        |                                   x -> len(x) > 0)) AS tk
        |  FROM documents),
        |e AS (SELECT unnest(tk) AS token FROM t)
        |SELECT token, COUNT(*) AS df FROM e
        |GROUP BY token ORDER BY df DESC, token LIMIT 50""".stripMargin,
    "txt_ngram_top" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |g AS (SELECT list_transform(range(1, len(tk)),
        |               i -> tk[i] || ' ' || tk[i + 1]) AS ngs
        |      FROM t WHERE len(tk) >= 2),
        |e AS (SELECT unnest(ngs) AS ngram FROM g)
        |SELECT ngram, COUNT(*) AS n FROM e
        |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""".stripMargin,
    "txt_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_runs,
        |  CAST(length(text) AS BIGINT) AS n_chars_txt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_quality" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n_tok,
        |    CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE) AS stop,
        |    CAST(list_reduce(list_prepend(0, list_transform(tk, x -> len(x))), (a, b) -> a + b) AS DOUBLE) AS char_sum
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
        |  stop / n_tok AS stop_ratio,
        |  char_sum / n_tok AS mean_tok_len,
        |  (stop / n_tok) * 0.3 + least(char_sum / n_tok / 10.0, 1.0) * 0.7 AS score
        |FROM m ORDER BY doc_id""".stripMargin,
    "txt_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(tk, x -> x IN ('the','a','and','of','to','in','is'))) AS h_en,
        |    len(list_filter(tk, x -> x IN ('el','la','de','y','que','los'))) AS h_es,
        |    len(list_filter(tk, x -> x IN ('der','die','das','und','ist','ein'))) AS h_de,
        |    len(list_filter(tk, x -> x IN ('le','la','de','et','les','un'))) AS h_fr
        |  FROM t),
        |p AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN h_en >= greatest(h_es, h_de, h_fr) AND h_en > 0 THEN 'en'
        |         WHEN h_es >= greatest(h_de, h_fr) AND h_es > 0 THEN 'es'
        |         WHEN h_de >= h_fr AND h_de > 0 THEN 'de'
        |         WHEN h_fr > 0 THEN 'fr'
        |         ELSE 'und' END AS pred_lang
        |  FROM h)
        |SELECT doc_id, pred_lang, lang, pred_lang = lang AS is_match
        |FROM p ORDER BY doc_id""".stripMargin,
    "txt_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text,
        |    CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1),
        |             i -> concat(tk[i], ' ', tk[i + 1], ' ', tk[i + 2]))
        |      ELSE CAST([] AS VARCHAR[]) END AS sh
        |  FROM t)
        |SELECT doc_id, md5(text) AS fp_full,
        |  list_min(list_transform(sh,
        |    x -> CAST('0x' || substring(md5(x), 1, 15) AS BIGINT))) AS fp_min_shingle
        |FROM s ORDER BY doc_id""".stripMargin,
    "txt_pii" ->
      s"""WITH seeded AS (
         |  SELECT doc_id,
         |    concat(text,
         |      CASE WHEN doc_id % 3 = 0 THEN ''
         |           ELSE concat(' contact user', CAST(doc_id AS VARCHAR),
         |                       '@example.com') END,
         |      ' tel 555-',
         |      lpad(CAST(doc_id * 7927 % 10000 AS VARCHAR), 4, '0')) AS txt
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(txt, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(txt, '$PhoneRe')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(txt, '$EmailRe', '<EMAIL>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g')) AS scrubbed_md5
         |FROM seeded ORDER BY doc_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_tokens" -> (txtTokens _),
    "txt_quality" -> (txtQuality _),
    "txt_langid" -> (txtLangid _),
    "txt_fingerprint" -> (txtFingerprint _),
    "txt_pii" -> (txtPii _),
    "txt_ngram_top" -> (txtNgramTop _),
    "txt_docfreq" -> (txtDocfreq _),
  )
}
