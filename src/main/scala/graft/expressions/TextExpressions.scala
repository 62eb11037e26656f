// Lives under org.apache.spark.sql for the same private[sql] bridge
// reasons as VectorExpressions.scala.
package org.apache.spark.sql.graftexpr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row gram machinery for [[WordNgrams]] / [[HashWordNgrams]].
  *
  * The HOF spelling of the gram chain —
  * `transform(sequence(...), i -> concat_ws(" ", element_at(tk, i)...))`
  * over `filter(split(text, " "), ...)` — pays an interpreted closure
  * call PER ELEMENT at every step and profiled as the dominant cost of
  * every text/dedup query (~6 s per corpus pass at sf0.1 just to explode
  * trigrams). These helpers do the whole tokenize→gram(→md5) loop in one
  * JVM pass per ROW and are called from generated code, so the
  * projection stays inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the HOF chain (and to the DuckDB oracle
  * twins in SURVEY §5): tokens are the non-empty pieces of a
  * literal-single-space split, grams join n consecutive tokens with one
  * space, fewer than n tokens yield an EMPTY array, and the 60-bit hash
  * is the first 15 hex digits of md5 (here: the top 60 bits of the first
  * 8 digest bytes — the same value without the hex-string round-trip).
  */
object TextExpressions {

  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def tokenize(text: UTF8String): Array[String] = {
    val parts = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out.add(parts(i))
      i += 1
    }
    out.toArray(new Array[String](out.size))
  }

  private def gram(tk: Array[String], i: Int, n: Int): String =
    if (n == 1) tk(i)
    else {
      val sb = new java.lang.StringBuilder(tk(i))
      var k = 1
      while (k < n) { sb.append(' ').append(tk(i + k)); k += 1 }
      sb.toString
    }

  /** Top 60 bits of md5(s-as-UTF-8) == conv(substring(md5, 1, 15), 16, 10). */
  def hash60(s: String): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** All n-grams, in order, duplicates kept. */
  def ngramsEval(text: UTF8String, n: Int): ArrayData = {
    val tk = tokenize(text)
    val m = tk.length - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m)
    var i = 0
    while (i < m) { out(i) = UTF8String.fromString(gram(tk, i, n)); i += 1 }
    new GenericArrayData(out)
  }

  /** `[n_words, h(g_0), …, h(g_{m-1})]`: the token count followed by
    * the 60-bit hashes of ALL word n-grams IN ORDER, duplicates kept —
    * the positional gram relation ExactSubstr span removal needs
    * ([[hashNgramsEval]] dedups and drops positions). One tokenize pass
    * serves both the count and the grams; index i+1 holds the gram
    * starting at word position i. */
  def hashNgramsSeqEval(text: UTF8String, n: Int): ArrayData = {
    val tk = tokenize(text)
    val m = tk.length - n + 1
    val out = new Array[Long](if (m > 0) m + 1 else 1)
    out(0) = tk.length.toLong
    var i = 0
    while (i < m) { out(i + 1) = hash60(gram(tk, i, n)); i += 1 }
    new GenericArrayData(out)
  }

  /** 60-bit hashes of the DISTINCT n-grams, first-occurrence order. */
  def hashNgramsEval(text: UTF8String, n: Int): ArrayData = {
    val tk = tokenize(text)
    val m = tk.length - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Long](0))
    val seen = new java.util.HashSet[String](m * 2)
    val out = new java.util.ArrayList[java.lang.Long](m)
    var i = 0
    while (i < m) {
      val g = gram(tk, i, n)
      if (seen.add(g)) out.add(hash60(g))
      i += 1
    }
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  // ── content-defined chunking (LBFS posture) ──────────────────────

  /** Rolling window width in CODEPOINTS. */
  val CdcW = 8
  /** Polynomial base. */
  val CdcB = 257L
  /** Modulus: a prime below 2^30, so `codepoint * power` products stay
    * inside exact BIGINT range in both engines. */
  val CdcM = 1000000007L
  /** Boundary divisor — expected chunk length ~[[CdcD]] codepoints. */
  val CdcD = 64L
  /** `CdcB^t mod CdcM` for t = 0..w-1. */
  val CdcPw: Array[Long] = {
    val a = new Array[Long](CdcW)
    a(0) = 1L
    var i = 1
    while (i < CdcW) { a(i) = (a(i - 1) * CdcB) % CdcM; i += 1 }
    a
  }

  /** Content-defined chunks of the text — LBFS-style chunking
    * (Muthitacharoen et al., SOSP '01; the rsync/CDC family): the
    * polynomial rolling hash `h_i = Σ_t cp[i-t]·B^t mod M` over the
    * last [[CdcW]] codepoints picks boundaries (`h mod D == D-1`
    * splits AFTER position i), so a boundary depends only on LOCAL
    * content — an edit re-chunks its own neighborhood and nothing
    * downstream, which is what lets chunk-level dedup catch partially
    * overlapping documents that whole-document hashing misses.
    * CODEPOINT (not UTF-16) indexing, matching SQL character
    * semantics; all arithmetic is exact BIGINT mod a prime. Texts
    * shorter than the window emit one chunk; empty text emits none;
    * a boundary on the last position emits no empty tail. */
  def cdcChunksEval(text: UTF8String): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val out = new java.util.ArrayList[Any]()
    var start = 0
    var i = CdcW - 1
    while (i < n) {
      var h = 0L
      var t = 0
      while (t < CdcW) {
        h = (h + (cps(i - t).toLong * CdcPw(t)) % CdcM) % CdcM
        t += 1
      }
      if (h % CdcD == CdcD - 1L) {
        out.add(UTF8String.fromString(new String(cps, start, i + 1 - start)))
        start = i + 1
      }
      i += 1
    }
    if (start < n) out.add(UTF8String.fromString(new String(cps, start, n - start)))
    new GenericArrayData(out.toArray)
  }

  /** Max multiplicity of any whitespace token — one hash-count pass. */
  def maxTokenCountEval(text: UTF8String): Long = {
    val tk = tokenize(text)
    if (tk.isEmpty) return 0L
    val counts = new java.util.HashMap[String, Long](tk.length * 2)
    var best = 0L
    var i = 0
    while (i < tk.length) {
      val c = counts.merge(tk(i), 1L, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** `[n_tok, max_token_count, n_3grams, n_distinct_3grams]` in ONE
    * tokenize pass — the Gopher repetition statistics fused
    * ([[MaxTokenCount]] + the 3-gram size/distinct pair each tokenized
    * the text again; this kernel is the single-pass spelling with
    * identical values). Distinctness is by gram STRING (token triples
    * joined by one space), exactly `array_distinct` over
    * [[ngramsEval]]'s output — whitespace tokens can't contain the
    * joiner, so triple equality == string equality. */
  def repetitionStatsEval(text: UTF8String): ArrayData = {
    val tk = tokenize(text)
    val n = tk.length
    var best = 0L
    if (n > 0) {
      val counts = new java.util.HashMap[String, Long](n * 2)
      var i = 0
      while (i < n) {
        val c = counts.merge(tk(i), 1L, (a, b) => a + b)
        if (c > best) best = c
        i += 1
      }
    }
    val m = n - 2
    var d3 = 0L
    if (m > 0) {
      val seen = new java.util.HashSet[String](m * 2)
      var i = 0
      while (i < m) {
        if (seen.add(gram(tk, i, 3))) d3 += 1
        i += 1
      }
    }
    new GenericArrayData(Array[Long](n.toLong, best, math.max(0, m).toLong, d3))
  }

  /** Total character count across tokens — the quality-score numerator.
    * Replicates `aggregate(transform(tk, length), 0, +)`: a null token
    * poisons the sum to null (never produced by the tokenizer, kept for
    * parity). */
  def tokenCharSumEval(tk: ArrayData): Any = {
    val n = tk.numElements()
    var s = 0
    var i = 0
    while (i < n) {
      if (tk.isNullAt(i)) return null
      s += tk.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  /** Count of tokens in `set` — `size(filter(tk, isin(words)))`: null
    * tokens fail the predicate and are dropped, not poisoning. */
  def tokenHitCountEval(tk: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = tk.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tk.isNullAt(i) && set.contains(tk.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Column wrapper for [[TokenCharSum]]. */
  def tokenCharSum(tk: Column): Column =
    ExpressionUtils.column(TokenCharSum(ExpressionUtils.expression(tk)))

  /** Column wrapper for [[TokenHitCount]]. */
  def tokenHitCount(tk: Column, words: Seq[String]): Column =
    ExpressionUtils.column(TokenHitCount(ExpressionUtils.expression(tk), words))

  /** Column wrapper for [[WordNgrams]]. */
  def wordNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(WordNgrams(ExpressionUtils.expression(text), n))

  /** Column wrapper for [[RepetitionStats]]. */
  def repetitionStats(text: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(text)))

  /** Column wrapper for [[CdcChunks]]. */
  def cdcChunks(text: Column): Column =
    ExpressionUtils.column(CdcChunks(ExpressionUtils.expression(text)))

  /** Column wrapper for [[MaxTokenCount]]. */
  def maxTokenCount(text: Column): Column =
    ExpressionUtils.column(MaxTokenCount(ExpressionUtils.expression(text)))

  /** Column wrapper for [[HashWordNgrams]]. */
  def hashWordNgrams(text: Column, n: Int): Column =
    ExpressionUtils.column(HashWordNgrams(ExpressionUtils.expression(text), n))

  /** Column wrapper for [[HashWordNgramsSeq]]. */
  def hashWordNgramsSeq(text: Column, n: Int): Column =
    ExpressionUtils.column(HashWordNgramsSeq(ExpressionUtils.expression(text), n))

  /** Column wrapper for [[UnigramStats]]. */
  def unigramStats(text: Column, pieces: Seq[(String, Long)],
      maxLen: Int, unkQ: Long): Column =
    ExpressionUtils.column(
      UnigramStats(ExpressionUtils.expression(text), pieces, maxLen, unkQ))

  /** Column wrapper for [[UnigramPieces]]. */
  def unigramPieces(word: Column, pieces: Seq[(String, Long)],
      maxLen: Int, unkQ: Long): Column =
    ExpressionUtils.column(
      UnigramPieces(ExpressionUtils.expression(word), pieces, maxLen, unkQ))

  /** SentencePiece-unigram Viterbi segmentation of ONE word over a
    * quantized (micro-nat BIGINT) piece-score table: returns
    * [pieceCount, qscoreSum]. The DP runs on CODEPOINTS (the BPE
    * codepoint discipline — a UTF-16 split would tear supplementary
    * characters into lone surrogates); unknown single codepoints score
    * `unkQ`, so every word segments. Tie rule, fully specified so the
    * driver reference and the kernel agree bit-for-bit: higher total
    * score, then FEWER pieces, then the LONGER last piece. */
  def spSegment(word: String, model: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, unkQ: Long): Array[Long] = {
    val cps = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array(0L, 0L)
    val negI = java.lang.Long.MIN_VALUE / 4
    val best = new Array[Long](n + 1)
    val cnt = new Array[Int](n + 1)
    val lastLen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, negI)
    best(0) = 0
    var i = 1
    while (i <= n) {
      var len = 1
      val top = if (maxLen < i) maxLen else i
      while (len <= top) {
        val j = i - len
        if (best(j) > negI) {
          val piece = new String(cps, j, len)
          var q = model.get(piece)
          if (q == null && len == 1) q = java.lang.Long.valueOf(unkQ)
          if (q != null) {
            val cand = best(j) + q.longValue()
            val cc = cnt(j) + 1
            val better = cand > best(i) ||
              (cand == best(i) && (cc < cnt(i) ||
                (cc == cnt(i) && len > lastLen(i))))
            if (better) { best(i) = cand; cnt(i) = cc; lastLen(i) = len }
          }
        }
        len += 1
      }
      i += 1
    }
    Array(cnt(n).toLong, best(n))
  }

  /** The Viterbi PIECES of one word under the same DP and tie rule as
    * [[spSegment]] (backpointer trace; `spSegment(w).{count,score}` ==
    * `(spPieces(w).length, Σ score(piece))` by construction —
    * spec-asserted). Unknown single codepoints come back as their own
    * pieces. */
  def spPiecesEval(word: UTF8String, model: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, unkQ: Long): ArrayData = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val negI = java.lang.Long.MIN_VALUE / 4
    val best = new Array[Long](n + 1)
    val cnt = new Array[Int](n + 1)
    val lastLen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, negI)
    best(0) = 0
    var i = 1
    while (i <= n) {
      var len = 1
      val top = if (maxLen < i) maxLen else i
      while (len <= top) {
        val j = i - len
        if (best(j) > negI) {
          val piece = new String(cps, j, len)
          var q = model.get(piece)
          if (q == null && len == 1) q = java.lang.Long.valueOf(unkQ)
          if (q != null) {
            val cand = best(j) + q.longValue()
            val cc = cnt(j) + 1
            val better = cand > best(i) ||
              (cand == best(i) && (cc < cnt(i) ||
                (cc == cnt(i) && len > lastLen(i))))
            if (better) { best(i) = cand; cnt(i) = cc; lastLen(i) = len }
          }
        }
        len += 1
      }
      i += 1
    }
    val out = new Array[Any](cnt(n))
    var pos = n
    var k = cnt(n) - 1
    while (pos > 0) {
      val len = lastLen(pos)
      out(k) = UTF8String.fromString(new String(cps, pos - len, len))
      pos -= len
      k -= 1
    }
    new GenericArrayData(out)
  }

  /** Per-document unigram-tokenizer stats in ONE pass: tokenize exactly
    * like [[ngramsEval]](n=1) (non-empty single-space pieces — the SQL
    * twin's split), Viterbi-segment each word via [[spSegment]], return
    * `[n_words, n_wcps, n_pieces, qsum]`. */
  def spStatsEval(text: UTF8String, model: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, unkQ: Long): ArrayData = {
    val tk = tokenize(text)
    var nw = 0L; var ncp = 0L; var np = 0L; var qs = 0L
    var i = 0
    while (i < tk.length) {
      val w = tk(i)
      val r = spSegment(w, model, maxLen, unkQ)
      nw += 1
      ncp += w.codePointCount(0, w.length)
      np += r(0); qs += r(1)
      i += 1
    }
    new GenericArrayData(Array(nw, ncp, np, qs))
  }
}

/** `array<string>` of the text's word n-grams (see [[TextExpressions]]). */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextExpressions.ngramsEval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExpressions.ngramsEval($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunks of the text (`array<string>`) — see
  * [[TextExpressions.cdcChunksEval]]. */
case class CdcChunks(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    TextExpressions.cdcChunksEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExpressions.cdcChunksEval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<bigint>` of 60-bit md5 hashes of the text's DISTINCT word
  * n-grams (see [[TextExpressions]]). */
case class HashWordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash_word_ngrams"

  override def nullSafeEval(input: Any): Any =
    TextExpressions.hashNgramsEval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExpressions.hashNgramsEval($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `[n_words, h(g_0), …]` — token count + POSITIONAL word-n-gram
  * hashes, duplicates kept (see [[TextExpressions.hashNgramsSeqEval]]):
  * [[HashWordNgrams]]'s order-preserving sibling for span-granular
  * dedup (ExactSubstr removal needs where each duplicated gram STARTS,
  * not just that it occurs). */
case class HashWordNgramsSeq(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash_word_ngrams_seq"

  override def nullSafeEval(input: Any): Any =
    TextExpressions.hashNgramsSeqEval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExpressions.hashNgramsSeqEval($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `[n_words, n_wcps, n_pieces, qsum]` of the SentencePiece-unigram
  * Viterbi encode over a LITERAL trained piece table (see
  * [[TextExpressions.spStatsEval]]): the production tokenizer-serving
  * shape — the bounded model rides the plan as expression state (the
  * [[TokenHitCount]] posture), every document folds in one narrow
  * codegen'd pass, and word types are never enumerated (a word→count
  * lookup map would be unbounded at 100 TB; the PIECE table is the
  * bounded artifact). Integer micro-nat scores keep the DP exact and
  * cross-engine replayable. */
case class UnigramStats(child: Expression, pieces: Seq[(String, Long)],
    maxLen: Int, unkQ: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sp_stats"

  @transient private lazy val model: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.foreach { case (p, q) => m.put(p, java.lang.Long.valueOf(q)): Unit }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.spStatsEval(input.asInstanceOf[UTF8String], model, maxLen, unkQ)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("spModel", model, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExpressions.spStatsEval($c, $mRef, $maxLen, ${unkQ}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string>` of ONE WORD's Viterbi pieces under a literal trained
  * unigram table (see [[TextExpressions.spPiecesEval]]) — the
  * token-sequence face behind txt_sp_freq: called on word TYPES so the
  * per-word DP runs O(vocabulary) times, never per occurrence. */
case class UnigramPieces(child: Expression, pieces: Seq[(String, Long)],
    maxLen: Int, unkQ: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_sp_pieces"

  @transient private lazy val model: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.foreach { case (p, q) => m.put(p, java.lang.Long.valueOf(q)): Unit }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.spPiecesEval(input.asInstanceOf[UTF8String], model, maxLen, unkQ)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("spModel", model, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExpressions.spPiecesEval($c, $mRef, $maxLen, ${unkQ}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Total characters across an `array<string>` of tokens (`int`) — one
  * codegen'd pass replacing the DOUBLE interpreted HOF
  * `aggregate(transform(tk, length), 0, +)` (two closure dispatches per
  * token) in the txt_quality / pipe_clean per-document hot path. Null
  * token poisons to null, matching the fold. */
case class TokenCharSum(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_char_sum"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextExpressions.tokenCharSumEval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Object ${ev.value}_r = org.apache.spark.sql.graftexpr.TextExpressions.tokenCharSumEval($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) ${ev.value}_r).intValue(); }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of tokens belonging to a fixed word set (`int`) — one hash
  * probe per token replacing the interpreted `filter(tk, isin(...))`
  * HOF; null tokens are dropped like the failed predicate. */
case class TokenHitCount(child: Expression, words: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_hit_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)): Unit)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.tokenHitCountEval(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("hitSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExpressions.tokenHitCountEval($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<bigint>` of `[n_tok, max_token_count, n_3grams,
  * n_distinct_3grams]` in ONE tokenize pass
  * ([[TextExpressions.repetitionStatsEval]]) — the fused Gopher
  * repetition-statistics kernel: the three-expression spelling
  * (WordNgrams(1) + WordNgrams(3)/array_distinct + MaxTokenCount)
  * tokenized every document three times. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(input: Any): Any =
    TextExpressions.repetitionStatsEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExpressions.repetitionStatsEval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Max multiplicity of any whitespace token of the text (`bigint`) —
  * the Gopher top-token-mass numerator, counted in ONE hash pass per
  * row instead of the interpreted sort + run-length `aggregate` HOF
  * (see [[TextExpressions]] for why HOFs are the slow path). Value is
  * identical to `max over distinct tokens of count(token)`. */
case class MaxTokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_max_token_count"

  override def nullSafeEval(input: Any): Any =
    TextExpressions.maxTokenCountEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.TextExpressions.maxTokenCountEval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
