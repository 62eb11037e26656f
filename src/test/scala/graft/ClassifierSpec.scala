package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pipeline, TextAnalysis}

/** txt_classifier_score — the trained model-based quality gate
  * (VERDICT r15 next-round item 2): integer perceptron over murmur3
  * hash-TF, distilled from the pipe_clean heuristic, served as one
  * narrow fold. */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  // deterministic corpus: ids 0..n-1 so the doc_id % 7 training sample
  // sees both classes; "good" docs are stopword-rich normal English,
  // "bad" docs are token-starved (n_tokens < 5 trips the heuristic)
  private val good = (0 until 35).map(i =>
    s"the quick fox $i and the lazy dog of in the park is a fine day to run")
  // token-starved (n_tokens < 5) with SHARED vocabulary so the model can
  // generalize past the sampled ids
  private val bad = (0 until 35).map(i => s"buy gold now $i")
  private def writeDocs(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_clf").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "unit", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
  // alternate by parity: the doc_id % 7 training sample (ids 0, 7, 14,
  // ...) then contains both classes
  private lazy val corpus: Seq[String] =
    (0 until 70).map(i => if (i % 2 == 0) good(i / 2) else bad(i / 2))

  test("training is deterministic: identical content, identical weights") {
    val d1 = writeDocs(corpus)
    val d2 = writeDocs(corpus)
    val (w1, b1) = TextAnalysis.trainedClassifier(spark, d1)
    val (w2, b2) = TextAnalysis.trainedClassifier(spark, d2)
    assert(w1 == w2 && b1 == b2)
  }

  test("served margins equal an independent explode+join spelling") {
    val dir = writeDocs(corpus)
    val (w, b) = TextAnalysis.trainedClassifier(spark, dir)
    val got = TextAnalysis.txtClassifierScore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wdf = w.zipWithIndex.map { case (wt, k) => (k.toLong, wt) }.toDF("bucket", "wgt")
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), pmod(hash(col("tok")), lit(TextAnalysis.HashTfBuckets))
        .cast("bigint").as("bucket"))
      .join(wdf, "bucket")
      .groupBy("doc_id").agg(sum("wgt").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) + b)).toMap
    // every doc here has tokens, so the two spellings must agree exactly
    assert(got == want)
  }

  test("the distilled model reproduces the heuristic gate on separable data") {
    val dir = writeDocs(corpus)
    val scored = TextAnalysis.txtClassifierScore(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2) == 1L)).toMap
    // heuristic truth: bad docs have 4 tokens -> lowq
    val truth = corpus.zipWithIndex.map { case (t, i) =>
      i.toLong -> (t.split(" ").count(_.nonEmpty) >= 5)
    }.toMap
    val agree = scored.count { case (id, k) => truth(id) == k }
    assert(agree >= (scored.size * 9) / 10,
      s"model agrees on $agree/${scored.size}")
  }

  test("pipe_clean classifier gate composes: lowq = heuristic OR margin <= 0") {
    val dir = writeDocs(corpus)
    def kept(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n_kept")).collect().head.getLong(0)
    val ungated = kept(Pipeline.pipeClean(spark, dir))
    val gated = kept(Pipeline.pipeClean(spark, dir, classifierGate = true))
    assert(gated <= ungated, s"gated $gated > ungated $ungated")
    // independent composition: kept-by-gate == kept-by-heuristic AND margin>0,
    // dedup applied on the surviving set (fixture has no duplicate text)
    val marginKeep = TextAnalysis.txtClassifierScore(spark, dir)
      .filter(col("keep") === 1L).count()
    val heurKeep = ungated
    val expectGated = Pipeline.pipeClean(spark, dir, classifierGate = true)
      .agg(sum("n_docs") - sum("n_lowq")).collect().head.getLong(0)
    assert(gated == expectGated) // no dups in fixture: kept == !lowq
    assert(expectGated <= math.min(marginKeep, heurKeep))
  }
}
