package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.streaming.StreamingQuality

/** StreamingQuality — the stream twin of the trained quality gates:
  * documents are scored by the identical literal-model expressions as
  * the batch txt_classifier_score / txt_lm_score faces. */
class StreamingQualitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def writeDocs(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sq").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "unit", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // the ClassifierSpec fixture shape: separable classes, both present
  // in the doc_id % 7 training sample
  private lazy val corpus: Seq[String] = (0 until 70).map { i =>
    if (i % 2 == 0)
      s"the quick fox ${i / 2} and the lazy dog of in the park is a fine day"
    else s"buy gold now ${i / 2}"
  }

  test("stream scores are bit-equal to the batch trained faces") {
    val dir = writeDocs(corpus)
    val clf = TextAnalysis.trainedClassifier(spark, dir)
    val lm = TextAnalysis.trainedLm(spark, dir)

    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text", "source")
    val q = StreamingQuality.scoreDocs(docs, clf, lm).writeStream
      .format("memory").queryName("sq_scores")
      .outputMode(OutputMode.Append()).start()
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    in.addData(corpus.zipWithIndex.map { case (t, i) =>
      (t0, i.toLong, t, "unit")
    })
    q.processAllAvailable()
    val got = spark.table("sq_scores")
      .select("doc_id", "margin", "n_tokens", "qlog_sum", "keep")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    q.stop()

    val batchClf = TextAnalysis.txtClassifierScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchLm = TextAnalysis.txtLmScore(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got.size == corpus.size)
    got.foreach { case (id, (margin, n, qs, keep)) =>
      assert(margin == batchClf(id), s"margin doc $id")
      val (bn, bqs, blmKeep) = batchLm(id)
      assert(n == bn && qs == bqs, s"lm doc $id")
      assert(keep == (margin > 0L && blmKeep == 1L), s"keep doc $id")
    }
  }

  test("windowed yield counts per (window, source)") {
    val dir = writeDocs(corpus)
    val clf = TextAnalysis.trainedClassifier(spark, dir)
    val lm = TextAnalysis.trainedLm(spark, dir)

    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text", "source")
    val q = StreamingQuality.qualityCounts(docs, clf, lm,
      delay = "10 minutes", windowLen = "1 hour").writeStream
      .format("memory").queryName("sq_counts")
      .outputMode(OutputMode.Append()).start()
    // window 1: one good + one junk doc; window 2: two good docs
    val w1 = Timestamp.valueOf("2026-01-01 00:10:00")
    val w2 = Timestamp.valueOf("2026-01-01 01:10:00")
    in.addData(Seq(
      (w1, 0L, corpus(0), "a"), (w1, 1L, corpus(1), "a"),
      (w2, 2L, corpus(2), "a"), (w2, 3L, corpus(4), "a")))
    q.processAllAvailable()
    // advance the watermark far enough to close both windows
    in.addData(Seq((Timestamp.valueOf("2026-01-01 05:00:00"), 9L, "x", "b")))
    q.processAllAvailable()
    val got = spark.table("sq_counts")
      .select("win_start", "source", "n_docs", "n_kept")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    q.stop()
    // good docs pass both gates, junk fails the classifier (spec'd in
    // ClassifierSpec); window 1 keeps 1 of 2, window 2 keeps 2 of 2
    assert(got((Timestamp.valueOf("2026-01-01 00:00:00"), "a")) == ((2L, 1L)))
    assert(got((Timestamp.valueOf("2026-01-01 01:00:00"), "a")) == ((2L, 2L)))
  }
}
