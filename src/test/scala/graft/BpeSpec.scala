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

  /** Reference BPE: words as symbol vectors, greedy scan merge. */
  private def referenceBpe(texts: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, c) => w.map(_.toString).toVector -> c }
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
    merges.foldLeft(w.map(_.toString).toVector) { case (sy, (_, s1, s2, _)) =>
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
}
