package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import org.apache.spark.sql.graftexpr.TextExpressions

/** The SentencePiece-unigram trainer and serving kernel against
  * independent references: the E-step's forward-backward expected
  * counts against BRUTE-FORCE segmentation enumeration, the Viterbi
  * kernel against enumeration of all segmentations, kernel-vs-driver
  * word-for-word equality over the real corpus, and the trainer's
  * structural invariants (singles never pruned, target reached,
  * determinism, quantization law). */
class SpUnigramSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def cpSyms(w: String): Vector[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toVector

  /** All segmentations of `w` into vocab pieces (<= maxLen cps), with
    * their joint log-probabilities — exponential, for short fixtures. */
  private def allSegs(w: String, logp: Map[String, Double],
      maxLen: Int): Seq[(List[String], Double)] = {
    val cps = cpSyms(w)
    def rec(i: Int): Seq[(List[String], Double)] =
      if (i == cps.length) Seq((Nil, 0.0))
      else (1 to math.min(maxLen, cps.length - i)).flatMap { len =>
        val piece = cps.slice(i, i + len).mkString
        logp.get(piece).toSeq.flatMap { lp =>
          rec(i + len).map { case (rest, s) => (piece :: rest, lp + s) }
        }
      }
    rec(0)
  }

  test("E-step expected counts equal brute-force enumeration over all segmentations") {
    val types = Seq(("abab", 3L), ("aab", 2L), ("bb", 5L), ("a", 7L))
    val vocab = Vector("a", "b", "ab", "ba", "bb", "aba")
    // a deliberately non-uniform model
    val probs = Map("a" -> 0.3, "b" -> 0.2, "ab" -> 0.25, "ba" -> 0.1,
      "bb" -> 0.1, "aba" -> 0.05)
    val words = types.map { case (w, c) => (w.codePoints().toArray, c) }
    val got = TextAnalysis.spEStep(words, vocab, probs)
    val logp = probs.map { case (k, v) => k -> math.log(v) }
    // reference: per word, P(seg) ∝ Π p(piece); expected count of piece
    // = Σ_w c_w · Σ_segs P(seg|w)·multiplicity(piece in seg)
    val want = scala.collection.mutable.HashMap.empty[String, Double]
    for ((w, c) <- types) {
      val segs = allSegs(w, logp, TextAnalysis.SpMaxPieceLen)
      val z = segs.map { case (_, lp) => math.exp(lp) }.sum
      for ((seg, lp) <- segs; piece <- seg)
        want.update(piece, want.getOrElse(piece, 0.0) + c * math.exp(lp) / z)
    }
    assert(got.keySet.subsetOf(vocab.toSet), "counts only for vocab pieces")
    for (p <- vocab) {
      val g = got.getOrElse(p, 0.0)
      val r = want.getOrElse(p, 0.0)
      assert(math.abs(g - r) < 1e-9, s"piece '$p': got $g want $r")
    }
  }

  test("Viterbi kernel is optimal: max total score, then fewest pieces (enumeration)") {
    // integer micro-nat scores, ties engineered: "ab"+"ab" vs "a"+"bab" etc.
    val pieces = Seq("a" -> -2000000L, "b" -> -2200000L, "ab" -> -3000000L,
      "ba" -> -3100000L, "bab" -> -4200000L, "abab" -> -8400000L)
    val model = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (p, q) => model.put(p, java.lang.Long.valueOf(q)): Unit }
    val qmap = pieces.toMap
    for (w <- Seq("abab", "aabba", "babab", "bbbb", "a", "ababab")) {
      val r = TextExpressions.spSegment(w, model, 6, TextAnalysis.SpUnkQ)
      // enumerate with the same integer scores
      val cps = cpSyms(w)
      def rec(i: Int): Seq[(Int, Long)] =
        if (i == cps.length) Seq((0, 0L))
        else (1 to math.min(6, cps.length - i)).flatMap { len =>
          val piece = cps.slice(i, i + len).mkString
          val q = qmap.get(piece).orElse(
            if (len == 1) Some(TextAnalysis.SpUnkQ) else None)
          q.toSeq.flatMap(qq => rec(i + len).map { case (np, qs) => (np + 1, qq + qs) })
        }
      val segs = rec(0)
      val bestScore = segs.map(_._2).max
      val bestCount = segs.filter(_._2 == bestScore).map(_._1).min
      assert(r(1) == bestScore, s"'$w' qsum ${r(1)} != $bestScore")
      assert(r(0) == bestCount.toLong, s"'$w' pieces ${r(0)} != $bestCount")
    }
  }

  test("spSegment handles OOV codepoints and supplementary characters") {
    val model = new java.util.HashMap[String, java.lang.Long]()
    model.put("ab", java.lang.Long.valueOf(-100000L)): Unit
    // 'x' and the emoji are OOV singles: unk score each, no dead end
    val r = TextExpressions.spSegment("xab😀", model, 6, -30000000L)
    assert(r(0) == 3L) // x + ab + 😀
    assert(r(1) == -30000000L + -100000L + -30000000L)
    val empty = TextExpressions.spSegment("", model, 6, -30000000L)
    assert(empty(0) == 0L && empty(1) == 0L)
  }

  // deterministic pseudo-word corpus (the BpeSpec generator)
  private def syntheticTypes(n: Int): Seq[(String, Long)] = {
    var state = 98765L
    def nxt(): Int = { state = (state * 6364136223846793005L + 1442695040888963407L); ((state >>> 33) & 0x7fffffff).toInt }
    (0 until n).map { _ =>
      val len = 3 + nxt() % 7
      ((0 until len).map(_ => ('a' + nxt() % 12).toChar).mkString, (1 + nxt() % 50).toLong)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(t => (-t._2, t._1))
  }

  test("trainer invariants: singles survive, target reached, quantization law, determinism") {
    val types = syntheticTypes(400)
    val m1 = TextAnalysis.trainUnigram(types, targetMulti = 40)
    val m2 = TextAnalysis.trainUnigram(types, targetMulti = 40)
    assert(m1 == m2, "training must be deterministic for a fixed type table")
    def isSingle(p: String) = p.codePointCount(0, p.length) == 1
    val singles = m1.filter(p => isSingle(p.piece)).map(_.piece).toSet
    val corpusChars = types.flatMap(_._1.toCharArray.map(_.toString)).toSet
    assert(corpusChars.subsetOf(singles), "every corpus codepoint survives pruning")
    assert(m1.count(p => !isSingle(p.piece)) <= 40, "multi vocab fits the target")
    assert(m1.exists(p => !isSingle(p.piece)), "some multi pieces survive")
    // probabilities normalize; scores obey the quantization law
    assert(math.abs(m1.map(_.p).sum - 1.0) < 1e-9)
    m1.foreach(p => assert(p.q == math.floor(1e6 * math.log(p.p)).toLong))
    // pieces are sorted (the emitted table's total order)
    assert(m1.map(_.piece) == m1.map(_.piece).sorted)
  }

  val sf = "/root/testdata/sf0.001"

  test("serving kernel equals the driver segmentation word-for-word on the real corpus") {
    val model = TextAnalysis.trainedSp(spark, sf)
    val h = new java.util.HashMap[String, java.lang.Long]()
    model.foreach(p => h.put(p.piece, java.lang.Long.valueOf(p.q)): Unit)
    val got = TextAnalysis.txtSpEncode(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, nw, ncp, np, qs) <- got) {
      val words = docs(id).split(" ", -1).filter(_.nonEmpty)
      val segs = words.map(w => TextExpressions.spSegment(w, h,
        TextAnalysis.SpMaxPieceLen, TextAnalysis.SpUnkQ))
      assert(nw == words.length.toLong, s"doc $id words")
      assert(ncp == words.map(w => w.codePointCount(0, w.length).toLong).sum, s"doc $id cps")
      assert(np == segs.map(_(0)).sum, s"doc $id pieces")
      assert(qs == segs.map(_(1)).sum, s"doc $id qsum")
      assert(np > 0 || nw == 0L, s"doc $id segments")
    }
  }

  test("UnigramPieces backpointer trace agrees with the stats DP and reassembles the word") {
    val pieces = Seq("a" -> -2000000L, "b" -> -2200000L, "ab" -> -3000000L,
      "ba" -> -3100000L, "bab" -> -4200000L)
    val model = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (p, q) => model.put(p, java.lang.Long.valueOf(q)): Unit }
    val qmap = pieces.toMap
    for (w <- Seq("abab", "aabba", "babab", "bbbb", "a", "ababab", "xay", "")) {
      val st = TextExpressions.spSegment(w, model, 6, TextAnalysis.SpUnkQ)
      val ps = TextExpressions.spPiecesEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), model, 6,
        TextAnalysis.SpUnkQ)
      val trace = (0 until ps.numElements()).map(i => ps.getUTF8String(i).toString)
      assert(trace.mkString == w, s"'$w': pieces must concatenate back")
      assert(trace.length.toLong == st(0), s"'$w': piece count")
      val score = trace.map(p => qmap.getOrElse(p, TextAnalysis.SpUnkQ)).sum
      assert(score == st(1), s"'$w': trace score")
    }
  }

  test("txt_sp_freq matches a driver recomputation over the corpus word types") {
    val model = TextAnalysis.trainedSp(spark, sf)
    val h = new java.util.HashMap[String, java.lang.Long]()
    model.foreach(p => h.put(p.piece, java.lang.Long.valueOf(p.q)): Unit)
    val got = TextAnalysis.txtSpFreq(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got.nonEmpty && got.size <= 30)
    val words = graft.sources.Tables.load(spark, sf, "documents")
      .select("text").as[String].collect()
      .flatMap(_.split(" ", -1).filter(_.nonEmpty))
    val want = words
      .flatMap { w =>
        val ps = TextExpressions.spPiecesEval(
          org.apache.spark.unsafe.types.UTF8String.fromString(w), h,
          TextAnalysis.SpMaxPieceLen, TextAnalysis.SpUnkQ)
        (0 until ps.numElements()).map(i => ps.getUTF8String(i).toString)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(30)
    assert(got == want)
  }

  test("compression sanity: the trained tokenizer beats characters on its own corpus") {
    val enc = TextAnalysis.txtSpEncode(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val totalCps = enc.map(_._3).sum.toDouble
    val totalPieces = enc.map(_._4).sum.toDouble
    assert(totalPieces < totalCps,
      s"unigram pieces ($totalPieces) must compress below characters ($totalCps)")
  }
}
