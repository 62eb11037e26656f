package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Codegen-friendly column helpers shared by the text / dedup /
  * similarity operators. Everything here is built from
  * `org.apache.spark.sql.functions` (no UDFs), and every construct has an
  * exact DuckDB twin so oracle SQL can replay the math bit-for-bit
  * (SURVEY §5).
  */
package object functions {

  /** Non-empty whitespace tokens. DuckDB twin:
    * `list_filter(string_split(text, ' '), t -> len(t) > 0)`. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Word n-gram shingles from a token array (empty when too short). */
  def shingles(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(0), size(tk) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(tk, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** 60-bit cross-engine hash: first 15 hex digits of md5, as bigint.
    * DuckDB twin: `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Seeded variant, used to derive MinHash permutations. */
  def hash60Seeded(seed: Column, c: Column): Column =
    hash60(concat(seed.cast("string"), lit(":"), c))

  /** Count of tokens belonging to a fixed word set — native codegen'd
    * hash probe per token ([[org.apache.spark.sql.graftexpr.TokenHitCount]]),
    * value-identical to the `size(filter(tk, isin(words)))` HOF it
    * replaced (FunctionsSpec equivalence gate). */
  def hitCount(tk: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graftexpr.TextExpressions.tokenHitCount(tk, words)

  /** Local md5-based hash for literal generation (e.g. LSH hyperplanes):
    * the SAME values are embedded as literals into both the Spark plan and
    * the oracle SQL, so no cross-engine hashing is involved. */
  def localHash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Left-fold sum of an array of doubles, zero-initialized. DuckDB twin:
    * `list_reduce(list, (x, y) -> x + y)` (same left-to-right order). */
  def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Elementwise product of two float/double arrays, in double. */
  def products(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") * y.cast("double"))

  /** Dot product: a native codegen'd loop ([[graft.expressions.DotProduct]])
    * with the same left-to-right, zero-initialized order as the HOF fold
    * `foldSum(products(a, b))` — bit-identical results, ~10x faster. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.VectorExpressions.dotNative(
      a.cast("array<double>"), b.cast("array<double>"))

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity, written as dot / sqrt(na * nb) — the oracle uses
    * the identical operation sequence so doubles match bit-for-bit. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Cosine from precomputed squared norms (compute `norm2` once per
    * side before a pairwise join; the value is identical to [[cosine]]). */
  def cosineWithNorms(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / sqrt(n2a * n2b)
}
