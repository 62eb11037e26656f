package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{cosine, hash60, hash60Seeded, shingles, tokens}
import graft.sources.Tables

/** SURVEY §2.D — deduplication for training-data pipelines.
  *
  * Scale design: nothing here is O(n²) over the corpus. MinHash/SimHash
  * signatures are linear map+partial-agg work; candidate pairs are only
  * generated inside LSH band / hamming-prefix buckets (salt a hot bucket
  * before the self-join if a degenerate corpus produces one); the exact
  * verify step (Jaccard / cosine) runs on candidates only.
  */
object Dedup {

  /** Exact dedup by content hash: one summary row (corpus, distinct, dupes). */
  def ddExact(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes"))

  private def docShingles(s: SparkSession, dir: String, n: Int): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        array_distinct(shingles(tokens(col("text")), n)).as("ss"))

  /** MinHash (16 md5-derived permutations) -> 4x4 LSH bands -> candidate
    * pairs -> exact Jaccard verification. */
  def ddMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = docShingles(s, dir, 3)
    val sh = docs.select(col("doc_id"), explode(col("ss")).as("sh"))
    val perms = s.range(16).toDF("j")
    val mh = sh.crossJoin(broadcast(perms))
      .select(col("doc_id"), col("j"), hash60Seeded(col("j"), col("sh")).as("h"))
      .groupBy("doc_id", "j").agg(min(col("h")).as("mh"))
    val bands = mh
      .withColumn("band", expr("CAST(j div 4 AS INT)"))
      .groupBy("doc_id", "band")
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("j"), col("mh")))),
          x => x.getField("mh").cast("string")), ",")).as("bh"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("ss").as("ssa")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("ss").as("ssb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ssa"), col("ssb"))).cast("double") /
          size(array_union(col("ssa"), col("ssb"))).cast("double")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash over distinct tokens; pair histogram by hamming
    * distance within top-byte buckets. */
  def ddSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("tk"))
    val tok = docs.select(col("doc_id"), explode(col("tk")).as("t"))
      .select(col("doc_id"), hash60(col("t")).as("h"))
    val bits = s.range(32).toDF("b")
    val sig = tok.crossJoin(broadcast(bits))
      .groupBy("doc_id", "b")
      .agg(sum(when(expr("(shiftright(h, CAST(b AS INT)) & 1) = 1"), 1).otherwise(-1)).as("sbit"))
      .select(col("doc_id"),
        expr("CASE WHEN sbit > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END").as("contrib"))
      .groupBy("doc_id").agg(sum(col("contrib")).as("sig"))
      .select(col("doc_id"), col("sig"), expr("shiftright(sig, 24)").as("bucket"))
    sig.as("a").join(sig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(expr("CAST(bit_count(a.sig ^ b.sig) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= 6)
      .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
      .orderBy("hamming")
  }

  /** Exact word-2-gram Jaccard on pairs bucketed by `source`, summarized
    * per bucket (the bucket join is the scale path; per-pair set math
    * runs only within buckets). */
  def ddNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = docShingles(s, dir, 2)
    val pairs = docs.as("a").join(docs.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.source").as("source"),
        (size(array_intersect(col("a.ss"), col("b.ss"))).cast("double") /
          size(array_union(col("a.ss"), col("b.ss"))).cast("double")).as("jac"))
    pairs.groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("jac") >= 0.5, 1L).otherwise(0L)).as("n_close"),
        max(col("jac")).as("max_jac"))
      .orderBy("source")
  }

  /** Embedding-cosine near-duplicate pairs within label buckets. */
  def ddEmbedNear(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") > 0.3)
      .orderBy("label", "vec_a", "vec_b")
  }

  // DuckDB twins of the Spark column constructs (see graft.functions).
  private val TOKENS = "list_filter(string_split(text, ' '), x -> len(x) > 0)"
  private def shSql(n: Int): String = {
    val parts = (0 until n).map(k => s"tk[i + $k]").mkString(", ' ', ")
    s"CASE WHEN len(tk) >= $n THEN list_distinct(list_transform(range(1, len(tk) - ${n - 2}), i -> concat($parts))) ELSE CAST([] AS VARCHAR[]) END"
  }
  private val H60 = "CAST('0x' || substring(md5(%s), 1, 15) AS BIGINT)"

  /** dot/cosine with the exact fold order of graft.functions.cosine. */
  private[operators] def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"
  private[operators] def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}))"

  val oracles: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_distinct,
        |  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
        |FROM documents""".stripMargin,
    "dd_minhash_lsh" ->
      s"""WITH t AS (SELECT doc_id, $TOKENS AS tk FROM documents),
         |d AS (SELECT doc_id, ${shSql(3)} AS ss FROM t),
         |e AS (SELECT doc_id, unnest(ss) AS sh FROM d),
         |mh AS (
         |  SELECT doc_id, j, MIN(${H60.format("concat(CAST(j AS VARCHAR), ':', sh)")}) AS mh
         |  FROM e CROSS JOIN (SELECT unnest(range(16)) AS j) p GROUP BY 1, 2),
         |bands AS (
         |  SELECT doc_id, j // 4 AS band,
         |    md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j)) AS bh
         |  FROM mh GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE) /
         |  CAST(len(list_distinct(list_concat(sa.ss, sb.ss))) AS DOUBLE) AS jaccard
         |FROM cand
         |JOIN d sa ON sa.doc_id = doc_a
         |JOIN d sb ON sb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_simhash" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($TOKENS) AS tk FROM documents),
         |e AS (SELECT doc_id, unnest(tk) AS tok FROM t),
         |hh AS (SELECT doc_id, ${H60.format("tok")} AS h FROM e),
         |sb AS (
         |  SELECT doc_id, b,
         |    SUM(CASE WHEN ((h >> CAST(b AS INT)) & 1) = 1 THEN 1 ELSE -1 END) AS sbit
         |  FROM hh CROSS JOIN (SELECT unnest(range(32)) AS b) bb GROUP BY 1, 2),
         |sg AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN sbit > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INT)
         |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
         |  FROM sb GROUP BY 1),
         |sg2 AS (SELECT doc_id, sig, sig >> 24 AS bucket FROM sg),
         |p AS (
         |  SELECT CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |  FROM sg2 a JOIN sg2 b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |SELECT hamming, COUNT(*) AS n_pairs FROM p
         |WHERE hamming <= 6 GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, source, $TOKENS AS tk FROM documents),
         |d AS (SELECT doc_id, source, ${shSql(2)} AS ss FROM t),
         |p AS (
         |  SELECT a.source AS source,
         |    CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE) /
         |    CAST(len(list_distinct(list_concat(a.ss, b.ss))) AS DOUBLE) AS jac
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
         |SELECT source, COUNT(*) AS n_pairs,
         |  CAST(SUM(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
         |  MAX(jac) AS max_jac
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd_embed_near" ->
      s"""SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${cosSql("a.embedding", "b.embedding")} AS cos
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} > 0.3
         |ORDER BY label, vec_a, vec_b""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> (ddExact _),
    "dd_minhash_lsh" -> (ddMinhashLsh _),
    "dd_simhash" -> (ddSimhash _),
    "dd_ngram_jaccard" -> (ddNgramJaccard _),
    "dd_embed_near" -> (ddEmbedNear _),
  )
}
