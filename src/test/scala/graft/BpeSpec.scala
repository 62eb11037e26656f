package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** The BPE merge loop against an exact driver-side reference trainer:
  * same word-frequency weighting, same (count desc, pair asc) total
  * order, same greedy left-to-right non-overlapping merge. The engine's
  * string-replace encoding must reproduce the reference's k-round merge
  * trajectory exactly — this is the in-JVM twin of the DuckDB replay
  * oracle (which proves the same thing cross-engine). */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** Split into CODEPOINT symbols (the engine's `(.)` regex granularity
    * — a UTF-16 char split would hand supplementary characters to the
    * trainer as lone surrogates, ADVICE r16). */
  private def cpSyms(w: String): Vector[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toVector

  /** Reference BPE: words as symbol vectors, greedy scan merge. */
  private def referenceBpe(texts: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, c) => cpSyms(w) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sy, c) <- words; i <- 0 until sy.length - 1)
        counts((sy(i), sy(i + 1))) = counts.getOrElse((sy(i), sy(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((s1, s2), n) = counts.toSeq.minBy { case ((a, b), m) => (-m, a, b) }
        out += ((r.toLong, s1, s2, n))
        words = words.groupMapReduce { case (sy, _) =>
          // greedy left-to-right non-overlapping scan
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == s1 && sy(i + 1) == s2) {
              b += s1 + s2; i += 2
            } else { b += sy(i); i += 1 }
          }
          b.result()
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def writeDocs(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "unit", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("merge trajectory matches the reference trainer, overlap runs included") {
    // "aaaa bab abab": 'aaaa' exercises the overlapping-run rule
    // (greedy non-overlapping: [aa][aa], not three overlapping 'aa'),
    // and repeated merges must cascade (a+b -> ab, then a+ab etc.)
    val texts = Seq(
      "aaaa bab abab abab",
      "aaaa aaaa bab low lower lowest",
      "low low lower newest newest widest")
    val dir = writeDocs(texts)
    val got = TextAnalysis.txtBpeVocab(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    val want = referenceBpe(texts, TextAnalysis.BpeRounds)
    assert(got == want)
  }

  test("degenerate corpus of 1-char words exhausts merges early, no crash") {
    val texts = Seq("a b a b c", "c a b")
    val dir = writeDocs(texts)
    val got = TextAnalysis.txtBpeVocab(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got.isEmpty) // no adjacent pairs exist within 1-char words
  }

  /** Greedy left-to-right encode of one word with a trained merge table,
    * merges applied in rank order — the reference twin of the engine's
    * replace chain. */
  private def referenceEncode(w: String, merges: Seq[(Long, String, String, Long)]): Vector[String] =
    merges.foldLeft(cpSyms(w)) { case (sy, (_, s1, s2, _)) =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < sy.length) {
        if (i + 1 < sy.length && sy(i) == s1 && sy(i + 1) == s2) { b += s1 + s2; i += 2 }
        else { b += sy(i); i += 1 }
      }
      b.result()
    }

  test("encode pass matches reference token counts; freq matches reference distribution") {
    val texts = Seq(
      "aaaa bab abab abab lower",
      "aaaa aaaa bab low lower lowest",
      "low low lower newest newest widest")
    val dir = writeDocs(texts)
    val merges = referenceBpe(texts, TextAnalysis.BpeRounds)
    val wantCounts = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.split(" ").filter(_.nonEmpty).toSeq
      (i.toLong, ws.size.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => referenceEncode(w, merges).size.toLong).sum)
    }
    val got = TextAnalysis.txtBpeEncode(spark, dir)
      .select("doc_id", "n_words", "n_chars", "n_bpe")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == wantCounts)

    val wantFreq = texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .flatMap(w => referenceEncode(w, merges))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (tok, n) => (-n, tok) }.take(30)
    val gotFreq = TextAnalysis.txtBpeFreq(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(gotFreq == wantFreq)
  }

  test("tokens containing the '|' delimiter are excluded from training and encoding") {
    // 'a|b' would decode as empty symbols under the |-wrapped encoding;
    // the declared precondition filters it in BOTH the trainer and the
    // encode/freq faces (and the oracle replays the same filter)
    val texts = Seq("a|b aaaa aaaa", "aaaa bab bab")
    val dir = writeDocs(texts)
    val vocab = TextAnalysis.txtBpeVocab(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(vocab.nonEmpty && vocab.forall { case (_, l, r, _) =>
      !l.contains("|") && !r.contains("|") })
    // with 'a|b' excluded, training must equal training on the corpus
    // that never contained it
    val want = referenceBpe(Seq("aaaa aaaa", "aaaa bab bab"), TextAnalysis.BpeRounds)
    assert(vocab == want)
    val enc = TextAnalysis.txtBpeEncode(spark, dir)
      .select("doc_id", "n_words").as[(Long, Long)].collect().toMap
    assert(enc(0L) == 2L) // a|b dropped
    assert(enc(1L) == 3L)
  }

  test("saveMerges/loadMerges round-trips the trained model") {
    val texts = Seq("low lower lowest", "low low newest")
    val dir = writeDocs(texts)
    val trained = TextAnalysis.txtBpeVocab(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    val path = java.nio.file.Files.createTempDirectory("graft_bpe_model").toString + "/merges"
    TextAnalysis.saveMerges(spark, trained, path)
    assert(TextAnalysis.loadMerges(spark, path) == trained)
  }

  // deterministic pseudo-word corpus with enough symbol diversity for a
  // long merge run (LCG — no RNG nondeterminism across runs)
  private def syntheticCorpus(nDocs: Int, wordsPerDoc: Int): Seq[String] = {
    var state = 12345L
    def nxt(): Int = { state = (state * 6364136223846793005L + 1442695040888963407L); ((state >>> 33) & 0x7fffffff).toInt }
    (0 until nDocs).map { _ =>
      (0 until wordsPerDoc).map { _ =>
        val len = 3 + nxt() % 6
        (0 until len).map(_ => ('a' + nxt() % 26).toChar).mkString
      }.mkString(" ")
    }
  }

  test("k-batched training reproduces the k=1 trajectory (VERDICT r15 #1)") {
    val dir = writeDocs(syntheticCorpus(40, 30))
    val (seq1, r1) = TextAnalysis.trainBpeLoop(spark, dir, 48, 1)
    val (seqK, rK) = TextAnalysis.trainBpeLoop(spark, dir, 48, TextAnalysis.BpeBatchK)
    assert(seqK == seq1, "batched merge table must equal the sequential trajectory")
    assert(r1 == 48 && rK < r1, s"batching must cut rounds: $rK vs $r1")
  }

  test("driver trainer == distributed loop == reference, overlaps included") {
    // the overlap fixture (aaaa) plus cascading merges — the hardest
    // trajectory case; all three trainers must agree row-for-row
    val texts = Seq(
      "aaaa bab abab abab lower",
      "aaaa aaaa bab low lower lowest",
      "low low lower newest newest widest")
    val dir = writeDocs(texts)
    val want = referenceBpe(texts, TextAnalysis.BpeRounds)
    val fast = TextAnalysis.trainBpeDriver(spark, dir, TextAnalysis.BpeRounds)
    val loop = TextAnalysis.trainBpeLoop(spark, dir, TextAnalysis.BpeRounds, 1)._1
    assert(fast == want, "incremental in-memory trainer drifted from the reference")
    assert(loop == want, "distributed loop drifted from the reference")
  }

  test("supplementary characters train/encode at codepoint granularity (ADVICE r16)") {
    // 😀 is a surrogate pair in UTF-16; a char-level split would give
    // the driver trainer lone-surrogate symbols, drifting it from both
    // the distributed loop and the serving encoder. All three trainers
    // must agree on the codepoint trajectory, and the emitted merge
    // symbols must be well-formed strings (no unpaired surrogates).
    val texts = Seq(
      "a😀b a😀b a😀b 😀😀 😀😀",
      "a😀b 😀😀 aaaa aaaa bab")
    val dir = writeDocs(texts)
    val want = referenceBpe(texts, TextAnalysis.BpeRounds)
    val fast = TextAnalysis.trainBpeDriver(spark, dir, TextAnalysis.BpeRounds)
    val loop = TextAnalysis.trainBpeLoop(spark, dir, TextAnalysis.BpeRounds, 1)._1
    assert(fast == want, "driver trainer drifted on supplementary chars")
    assert(loop == want, "distributed loop drifted on supplementary chars")
    // a lone surrogate shows up as a length-1 symbol whose char is a
    // surrogate; whole codepoints never do
    def wellFormed(sym: String): Boolean =
      !(sym.length == 1 && Character.isSurrogate(sym.charAt(0)))
    assert(want.nonEmpty && want.forall { case (_, l, r, _) =>
      wellFormed(l) && wellFormed(r)
    }, "merge symbols must be whole codepoints")
    val enc = TextAnalysis.txtBpeEncode(spark, dir)
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    val merges = want
    val wantBpe = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split(" ").filter(_.nonEmpty)
        .map(w => referenceEncode(w, merges).size.toLong).sum
    }.toMap
    assert(enc == wantBpe, "serving encoder disagrees with the codepoint reference")
  }

  test("a 1024-merge vocabulary trains in ONE distributed pass (scale path)") {
    // VERDICT r15 #1: vocab-scale training must not be a driver loop of
    // sequential Spark jobs. trainBpeDriver = one word-type aggregate +
    // the in-memory incremental trainer; 1024 merges here, 32k by the
    // same machinery (cost is driver CPU over the bounded type table).
    val dir = writeDocs(syntheticCorpus(60, 40))
    val t0 = System.nanoTime()
    val merges = TextAnalysis.trainBpeDriver(spark, dir, 1024)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 1024, s"got ${merges.size} merges")
    assert(merges.map(_._1) == (1L to 1024L), "ranks are dense and ordered")
    // cross-validate a prefix against the exact distributed loop
    val (loop64, rounds64) = TextAnalysis.trainBpeLoop(spark, dir, 64, TextAnalysis.BpeBatchK)
    assert(merges.take(64) == loop64,
      "driver-trained prefix must equal the distributed-loop trajectory")
    assert(rounds64 <= 64, "the batched loop never exceeds one round per merge")
    assert(secs < 60.0, s"1024 merges took ${secs}s driver-side")
  }
}
