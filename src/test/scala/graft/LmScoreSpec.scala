package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** txt_lm_score — the stupid-backoff bigram LM quality signal (Brants
  * et al. 2007): trained as bounded literal count-ratio tables,
  * quantized to micro-nat integers driver-side, served as one narrow
  * per-document integer fold. */
class LmScoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def writeDocs(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "unit", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // fluent docs reuse a small vocabulary (high LM score); noise docs are
  // singleton junk tokens (low relative frequency)
  private lazy val corpus: Seq[String] =
    (0 until 20).map(_ => "the cat sat on the mat and the dog sat too") ++
      (0 until 4).map(i => s"zzq$i xkcd$i qwerty$i")

  /** Driver-side reference scorer: the same stupid-backoff fold the
    * engine runs, written independently over plain Scala collections. */
  private def refScore(m: TextAnalysis.LmModel, text: String): (Long, Long) = {
    val tk = text.split(" ", -1).filter(_.nonEmpty)
    val uni = m.uniQ.toMap
    val bi = m.biQ.map { case (p, c, q) => (p, c) -> q }.toMap
    def uq(t: String): Long = uni.getOrElse(t, m.unkQ)
    if (tk.isEmpty) (0L, 0L)
    else {
      val first = uq(tk.head)
      val pairs = tk.sliding(2).collect { case Array(p, c) =>
        bi.getOrElse((p, c), m.backQ + uq(c))
      }.sum
      (tk.length.toLong, first + pairs)
    }
  }

  test("training is deterministic: identical content, identical tables") {
    val m1 = TextAnalysis.trainedLm(spark, writeDocs(corpus))
    val m2 = TextAnalysis.trainedLm(spark, writeDocs(corpus))
    assert(m1 == m2)
  }

  test("trained probabilities are exact count ratios over the training sample") {
    val dir = writeDocs(corpus)
    val m = TextAnalysis.trainedLm(spark, dir)
    // training sees only doc_id % LmSampleMod == 0 (the CCNet posture:
    // the reference LM never trains on the full target corpus)
    val sampled = corpus.zipWithIndex
      .collect { case (t, i) if i % TextAnalysis.LmSampleMod == 0 => t }
    val toks = sampled.flatMap(_.split(" ").filter(_.nonEmpty))
    val n = toks.size.toLong
    val cThe = toks.count(_ == "the").toLong
    val nFluent = sampled.count(_.startsWith("the cat")).toLong
    val uni = m.uniQ.toMap
    assert(uni("the") == math.floor(1e6 * math.log(cThe.toDouble / n)).toLong)
    // bigram "the cat" occurs once per sampled fluent doc
    val bi = m.biQ.map { case (p, c, q) => (p, c) -> q }.toMap
    assert(bi(("the", "cat")) ==
      math.floor(1e6 * math.log(nFluent.toDouble / cThe.toDouble)).toLong)
    assert(m.unkQ == math.floor(1e6 * math.log(1.0 / (2.0 * n))).toLong)
    assert(m.backQ == math.floor(1e6 * math.log(0.4)).toLong)
  }

  test("served scores equal the independent reference fold") {
    val dir = writeDocs(corpus)
    val m = TextAnalysis.trainedLm(spark, dir)
    val got = TextAnalysis.txtLmScore(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = corpus.zipWithIndex
      .map { case (t, i) => i.toLong -> refScore(m, t) }.toMap
    assert(got == want)
  }

  test("out-of-table pairs take the backoff path, in-table pairs don't") {
    // overflow both top-96 tables WITHIN the doc_id % 7 training
    // sample: ~129 sampled count-1 filler bigrams (~258 count-1
    // unigrams) that all sort BEFORE the zzz probe tokens, so the
    // tie-break (count desc, text asc) provably excludes the probe;
    // the probe doc itself sits at a sampled id (910 = 7*130), so its
    // exclusion is the tie-break, not mere absence from the sample
    val filler = (0 until 900).map(i => f"aa$i%03d ab$i%03d")
    val fluent = (0 until 10).map(_ => "the cat sat")
    val probe = "zzz1 zzz2 zzz3"
    val dir = writeDocs(fluent ++ filler :+ probe)
    val m = TextAnalysis.trainedLm(spark, dir)
    assert(m.uniQ.size == TextAnalysis.LmUniV &&
      m.biQ.size == TextAnalysis.LmBiB)
    assert(!m.uniQ.exists(_._1.startsWith("zzz")))
    assert(!m.biQ.exists(_._1.startsWith("zzz")))
    val scores = TextAnalysis.txtLmScore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the probe doc is fully out-of-table: unk + 2 x (backoff + unk)
    val probeId = (fluent.size + filler.size).toLong
    assert(scores(probeId) == m.unkQ + 2L * (m.backQ + m.unkQ))
    // a fluent doc: both its bigrams are in the table -> no backoff term
    val bi = m.biQ.map { case (p, c, q) => (p, c) -> q }.toMap
    val pure = m.uniQ.toMap.apply("the") + bi(("the", "cat")) + bi(("cat", "sat"))
    assert(scores(0L) == pure)
  }

  test("fluent text outscores junk and the keep gate tracks the mean") {
    val dir = writeDocs(corpus)
    val rows = TextAnalysis.txtLmScore(spark, dir).collect()
    val avg = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(avg(0L) > avg(20L), s"fluent ${avg(0L)} !> junk ${avg(20L)}")
    rows.foreach { r =>
      val expect =
        if (r.getLong(1) > 0L &&
          r.getLong(2) >= r.getLong(1) * TextAnalysis.LmKeepThrQ) 1L
        else 0L
      assert(r.getLong(4) == expect, s"keep mismatch at doc ${r.getLong(0)}")
    }
  }

  test("randomized: served scores equal the reference fold on 20 corpora") {
    // seeded Random (the ArrayModelSpec discipline): zipf-ish repeated
    // vocab + singleton junk + empty/whitespace/single-token edges, so
    // table tie-breaks, backoff and unk paths are all hit in
    // combinations no hand fixture covers; every comparison is ==
    val rnd = new scala.util.Random(20260815L)
    val pool = (0 until 150).map(i => s"w$i")
    for (trial <- 0 until 20) {
      val nDocs = 5 + rnd.nextInt(30)
      val corpus = (0 until nDocs).map { _ =>
        rnd.nextInt(10) match {
          case 0 => ""
          case 1 => "   "
          case 2 => pool(rnd.nextInt(pool.size))
          case _ =>
            val n = 1 + rnd.nextInt(25)
            (0 until n).map { _ =>
              // zipf-ish: low indices dominate, plus fresh junk tokens
              if (rnd.nextInt(5) == 0) s"junk${rnd.nextInt(100000)}"
              else pool(math.min(rnd.nextInt(8) * rnd.nextInt(8), pool.size - 1))
            }.mkString(" ")
        }
      }
      val dir = writeDocs(corpus)
      val m = TextAnalysis.trainedLm(spark, dir)
      val got = TextAnalysis.txtLmScore(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = corpus.zipWithIndex
        .map { case (t, i) => i.toLong -> refScore(m, t) }.toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("zero-token and single-token documents") {
    val dir = writeDocs(Seq("", "   ", "hello", "the cat"))
    val m = TextAnalysis.trainedLm(spark, dir)
    val rows = TextAnalysis.txtLmScore(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), r.getLong(4)))).toMap
    assert(rows(0L) == ((0L, 0L, None, 0L)))
    assert(rows(1L) == ((0L, 0L, None, 0L)))
    val (n2, q2, a2, _) = rows(2L)
    assert(n2 == 1L && a2.isDefined)
    assert(q2 == m.uniQ.toMap.getOrElse("hello", m.unkQ))
    val (n3, _, _, _) = rows(3L)
    assert(n3 == 2L)
  }
}
