package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming second moments of a live EMBEDDING stream — the
  * [[StreamingGram]] twin at the embedding face (batch faces:
  * `emb_gram` / `emb_pca_var` / `emb_pca_project`): as vectors arrive
  * (a live ingest embedding documents as they land), each micro-batch
  * folds DISTRIBUTED through the same native one-pass
  * [[org.apache.spark.sql.graftexpr.GramLong]] aggregate the batch
  * faces use, and only the one (Dim²+Dim+1)-long integer buffer
  * crosses to the driver, which accumulates in exact Long arithmetic.
  *
  * Because every cell is an EXACT integer and integer addition is
  * associative and commutative, after ANY prefix of vectors — under
  * ANY arrival order or micro-batch split — the running moments are
  * EXACTLY equal to the batch aggregate over the same vectors
  * (spec-gated in StreamingEmbGramSpec), so a live PCA basis
  * ([[graft.arrays.Eigen]] on [[RunningMoments.cov]]) can never
  * disagree with the nightly batch fit on the same data.
  *
  * Scale posture: driver state is one ~33 KB integer buffer (a model
  * artifact, never data); per micro-batch the distributed fold ships
  * ONE buffer per partition and one bounded collect. */
object StreamingEmbGram {

  /** Driver-side running (gram, sums, n) accumulator — exact Long adds. */
  final class RunningMoments(val dim: Int) {
    private val len = dim * dim + dim + 1
    private val acc = new Array[Long](len)

    /** Fold one micro-batch's aggregate buffer in — overflow-CHECKED
      * like the distributed GramLong fold itself: a stream long enough
      * to wrap the Long moments fails loudly instead of silently
      * corrupting every later micro-batch's running PCA. */
    def observe(buf: Seq[Long]): Unit = synchronized {
      require(buf.length == len, s"expected $len cells, got ${buf.length}")
      var i = 0
      while (i < len) { acc(i) = Math.addExact(acc(i), buf(i)); i += 1 }
    }

    def n: Long = synchronized { acc(len - 1) }

    /** The running Gram cell. */
    def gram(i: Int, j: Int): Long = synchronized { acc(i * dim + j) }

    /** The running CENTERED second-moment matrix n·G − S·Sᵀ as doubles
      * (the [[graft.arrays.Eigen]] input; exact Long operands). */
    def cov(): Array[Array[Double]] = synchronized {
      val nn = acc(len - 1)
      Array.tabulate(dim, dim)((i, j) =>
        (nn * acc(i * dim + j) -
          acc(dim * dim + i) * acc(dim * dim + j)).toDouble)
    }

    /** Snapshot in the batch `emb_gram` schema for a direct compare. */
    def snapshot(spark: SparkSession): DataFrame = {
      import spark.implicits._
      synchronized {
        (for (i <- 0 until dim; j <- 0 until dim)
          yield (i.toLong, j.toLong, acc(i * dim + j)))
      }.toDF("i", "j", "g")
    }
  }

  /** Wire a [[RunningMoments]] into a live `embedding` stream: per
    * micro-batch the distributed GramLong fold runs (same quantization
    * as the batch faces — floor(scale·x) on the double-cast values)
    * and its buffer folds into `state`. */
  def run(
      embeddings: DataFrame,
      state: RunningMoments,
      scale: Double,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    embeddings
      .select(transform(col("embedding").cast("array<double>"),
        v => floor(v * lit(scale)).cast("long")).as("q"))
      .writeStream
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val row = batch
          .agg(org.apache.spark.sql.graftexpr.SketchExpressions
            .gramLong(col("q"), state.dim).as("gb"))
          .collect().head
        state.observe(row.getSeq[Long](0))
      }
      .start()
}
