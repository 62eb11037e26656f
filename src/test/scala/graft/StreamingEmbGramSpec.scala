package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingEmbGram

/** StreamingEmbGram — the live embedding moments: at every prefix,
  * under arbitrary micro-batch splits, the running (gram, sums, n) is
  * EXACTLY equal to the batch GramLong aggregate over the same
  * vectors (integer adds are associative/commutative — the
  * StreamingGram prefix-equality contract at the embedding face). */
class StreamingEmbGramSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val dim = 4
  private val scale = 1e3

  // deterministic pseudo-embeddings (LCG)
  private def vecs(n: Int, seed: Long): Seq[Seq[Float]] = {
    var x = seed
    def nxt(): Double = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33).toDouble / (1L << 31).toDouble) - 0.5
    }
    Seq.fill(n)(Seq.fill(dim)(nxt().toFloat))
  }

  private def batchMoments(rows: Seq[Seq[Float]]): Seq[Long] =
    rows.toDF("embedding")
      .select(transform(col("embedding").cast("array<double>"),
        v => floor(v * lit(scale)).cast("long")).as("q"))
      .agg(org.apache.spark.sql.graftexpr.SketchExpressions
        .gramLong(col("q"), dim).as("gb"))
      .collect().head.getSeq[Long](0)

  test("running moments are prefix-exact vs the batch aggregate at every batch") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Seq[Float]]
    val docs = in.toDF().toDF("embedding")
    val state = new StreamingEmbGram.RunningMoments(dim)
    val q = StreamingEmbGram.run(docs, state, scale)
    val all = vecs(23, 7L)
    // uneven micro-batch splits, including a 1-vector batch
    val splits = Seq(all.slice(0, 5), all.slice(5, 6), all.slice(6, 17), all.slice(17, 23))
    var seen = Seq.empty[Seq[Float]]
    for (b <- splits) {
      in.addData(b)
      q.processAllAvailable()
      seen = seen ++ b
      val want = batchMoments(seen)
      val len = dim * dim + dim + 1
      // Gram cells via both accessors
      val snap = state.snapshot(spark).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      for (i <- 0 until dim; j <- 0 until dim) {
        assert(snap((i.toLong, j.toLong)) == want(i * dim + j),
          s"gram ($i,$j) after ${seen.length} vecs")
        assert(state.gram(i, j) == want(i * dim + j))
      }
      assert(state.n == want(len - 1), s"n after ${seen.length}")
      // centered matrix equals the batch-side centering exactly
      val cov = state.cov()
      for (i <- 0 until dim; j <- 0 until dim) {
        val wantCov = (want(len - 1) * want(i * dim + j) -
          want(dim * dim + i) * want(dim * dim + j)).toDouble
        assert(cov(i)(j) == wantCov, s"cov ($i,$j)")
      }
    }
    q.stop()
  }
}
