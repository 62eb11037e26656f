package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftexpr.TextExpressions

/** dd_cdc_chunks — content-defined chunking (LBFS, Muthitacharoen et
  * al. SOSP '01): rolling-hash boundaries, chunk-level cross-document
  * dedup. */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def chunksOf(texts: String*): Seq[Seq[String]] =
    texts.toDF("text")
      .select(TextExpressions.cdcChunks(col("text")).as("cs"))
      .collect().toSeq.map(_.getSeq[String](0))

  /** Independent reference chunker: boundary positions recomputed with
    * BigInt arithmetic and a different split mechanism. */
  private def refChunks(text: String): Seq[String] = {
    import TextExpressions.{CdcB, CdcD, CdcM, CdcW}
    val cps = text.codePoints().toArray
    if (cps.isEmpty) return Seq.empty
    val pw = (0 until CdcW).map(t => BigInt(CdcB).pow(t) % BigInt(CdcM))
    val bounds = (CdcW - 1 until cps.length).filter { i =>
      val h = (0 until CdcW).map(t => BigInt(cps(i - t)) * pw(t) % CdcM)
        .sum % CdcM
      h % CdcD == CdcD - 1
    }
    val cuts = (-1 +: bounds :+ (cps.length - 1)).distinct
    cuts.sliding(2).map { case Seq(a, b) =>
      new String(cps, a + 1, b - a)
    }.filter(_.nonEmpty).toSeq
  }

  // deterministic pseudo-random text: LCG over a small alphabet with
  // spaces, long enough to contain many boundaries
  private def synth(seed: Long, n: Int): String = {
    val sb = new StringBuilder
    var x = seed
    for (_ <- 0 until n) {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      val r = ((x >>> 33) % 27).toInt
      sb.append(if (r == 26) ' ' else ('a' + r).toChar)
    }
    sb.toString
  }

  test("chunks concatenate back to the original text") {
    val texts = Seq(synth(1, 2000), synth(2, 700), "short", "", "x",
      synth(3, 63), synth(4, 64), "ab " * 100)
    for ((t, cs) <- texts.zip(chunksOf(texts: _*))) {
      assert(cs.mkString("") == t, s"reconstruction for len ${t.length}")
      assert(cs.forall(_.nonEmpty), "no empty chunks")
    }
  }

  test("kernel matches the independent BigInt reference chunker") {
    val texts = Seq(synth(10, 3000), synth(11, 500), synth(12, 8),
      synth(13, 7), "", "exactly8")
    for ((t, cs) <- texts.zip(chunksOf(texts: _*)))
      assert(cs == refChunks(t), s"chunking of len ${t.length}")
  }

  test("randomized incl. non-ASCII: kernel == reference, chunks partition") {
    // seeded Random over a mixed-alphabet pool including 2-byte (é),
    // 3-byte (中) and supplementary (emoji, a surrogate PAIR in UTF-16)
    // codepoints — the chunker must index by CODEPOINT, exactly like
    // the oracle's substring/unicode
    val rnd = new scala.util.Random(8161016L)
    val alphabet: IndexedSeq[String] =
      ('a' to 'z').map(_.toString) ++ Seq(" ", "é", "ß", "中", "文", "😀")
    for (trial <- 0 until 25) {
      val n = rnd.nextInt(1200)
      val t = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
      val Seq(cs) = chunksOf(t)
      assert(cs == refChunks(t), s"trial $trial (len $n)")
      assert(cs.mkString("") == t, s"trial $trial reconstruction")
    }
  }

  test("boundaries are local: a prefix edit leaves the shared tail's chunks") {
    val shared = synth(20, 2500)
    val a = synth(21, 300) + shared
    val b = synth(22, 137) + shared
    val Seq(ca, cb) = chunksOf(a, b)
    // every chunk fully inside the shared tail (i.e. after the first
    // boundary past the junction) must appear in both chunkings
    val common = ca.toSet.intersect(cb.toSet)
    // the shared region is ~39x the expected chunk length, so the vast
    // majority of its chunks must coincide
    assert(common.size >= 15,
      s"only ${common.size} common chunks between overlapping docs")
    // and the tails beyond the first re-sync point are IDENTICAL
    val sa = ca.indexWhere(common.contains)
    val sb2 = cb.indexWhere(common.contains)
    assert(ca.drop(sa + 1).takeRight(5) == cb.drop(sb2 + 1).takeRight(5))
  }

  test("dd_cdc_chunks surfaces cross-document shared spans only") {
    val span = synth(30, 1500)
    val docs = Seq(
      (0L, synth(31, 400) + span, "en", "a", 0L),
      (1L, span + synth(32, 250), "en", "b", 0L), // same span, other offset
      (2L, synth(33, 1200), "en", "c", 0L)) // unrelated
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Dedup.ddCdcChunks(spark, dir).collect()
    assert(rows.nonEmpty, "shared interior chunks must surface")
    rows.foreach { r =>
      assert(r.getLong(2) == 2L, "every shared chunk is in docs 0 and 1")
      assert(r.getLong(4) == 0L, "representative = min doc_id")
    }
    // the shared chunks reconstruct a large part of the shared span
    val sharedLen = rows.map(_.getLong(1)).sum
    assert(sharedLen >= 1000, s"shared chunk mass $sharedLen of 1500-cp span")
  }

  test("dd_cdc_coverage: per-doc shared mass, offset-robust, empty-doc edge") {
    val span = synth(40, 1500)
    val docs = Seq(
      (0L, synth(41, 400) + span, "en", "a", 0L),
      (1L, span + synth(42, 250), "en", "b", 0L),
      (2L, synth(43, 1200), "en", "c", 0L), // unrelated
      (3L, "", "en", "d", 0L)) // chunkless
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdcc").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Dedup.ddCdcCoverage(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    assert(rows.size == 4)
    // total codepoint mass equals the text length (chunks partition it)
    assert(rows(0L)._2 == 1900L && rows(1L)._2 == 1750L && rows(2L)._2 == 1200L)
    // the overlapping pair shares most of its mass despite offsets
    assert(rows(0L)._4 > 0.5 && rows(1L)._4 > 0.5,
      s"coverage ${rows(0L)._4} / ${rows(1L)._4}")
    // the unrelated doc shares nothing; the empty doc reports NULL frac
    assert(rows(2L)._3 == 0L && rows(2L)._4 == 0.0)
    assert(rows(3L)._1 == 0L && rows(3L)._4.isNaN)
    rows.values.foreach { case (_, n, sh, _) => assert(sh <= n) }
  }

  test("output is bounded by DISTINCT chunks under 100x duplication") {
    // 100 verbatim copies of one document + 1 unique: the shared-chunk
    // map must be exactly the copied doc's distinct chunks — decoupled
    // from the duplication factor (the O(distinct) scale claim,
    // asserted on row counts like the dedup/ANN stress fixtures)
    val copied = synth(50, 2000)
    val docs = ((0 until 100).map(i => (i.toLong, copied, "en", "a", 0L)) :+
      ((100L, synth(51, 900), "en", "b", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdcs").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val map = graft.operators.Dedup.ddCdcChunks(spark, dir).collect()
    val distinctChunks = refChunks(copied).distinct.size
    assert(map.length == distinctChunks,
      s"${map.length} output rows vs $distinctChunks distinct chunks")
    map.foreach { r =>
      assert(r.getLong(2) == 100L, "n_docs = the duplication factor")
      assert(r.getLong(4) == 0L, "representative = min doc_id")
    }
    // and the per-doc coverage of every copy is total
    val cov = graft.operators.Dedup.ddCdcCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
      .toMap
    (0 until 100).foreach(i => assert(cov(i.toLong) == 1.0, s"copy $i"))
    assert(cov(100L) == 0.0, "the unique doc shares nothing")
    // and the cluster face resolves the copies into ONE cluster
    val cl = graft.operators.Dedup.ddCdcCluster(spark, dir).collect()
    assert(cl.length == 1 && cl.head.getLong(1) == 100L,
      s"expected one 100-member cluster, got ${cl.toSeq}")
  }

  test("dd_cdc_cluster: the qualifying gate keeps boilerplate from merging") {
    // two heavy near-dups (share a 1500-cp span = most of their mass)
    // plus two mostly-unique docs that share only a short common
    // boilerplate tail: the near-dups cluster, the others stay out
    val span = synth(60, 1500)
    val boiler = synth(61, 200)
    val docs = Seq(
      (0L, synth(62, 300) + span, "en", "a", 0L),
      (1L, span + synth(63, 200), "en", "b", 0L),
      (2L, synth(64, 2000) + boiler, "en", "c", 0L),
      (3L, synth(65, 2200) + boiler, "en", "d", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdccl").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // sanity: the boilerplate docs really are mostly unique
    val cov = graft.operators.Dedup.ddCdcCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(cov(0L) > 0.5 && cov(1L) > 0.5)
    assert(cov(2L) < 0.5 && cov(3L) < 0.5,
      s"boilerplate coverage ${cov(2L)} / ${cov(3L)}")
    val cl = graft.operators.Dedup.ddCdcCluster(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(0L -> 2L), s"got $cl")
    // keep-one: doc 1 (the non-representative near-dup) is dropped,
    // the boilerplate docs survive untouched
    val kept = graft.operators.Dedup.ddCdcKeepOne(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("a" -> 1L, "c" -> 1L, "d" -> 1L), s"got $kept")
  }
}
