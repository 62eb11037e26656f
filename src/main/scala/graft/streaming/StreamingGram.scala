package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.arrays.{ArrayGeometry, ChunkedArray}

/** Streaming sufficient statistics for in-situ PCA/SVD — the running
  * cross-timestep Gram of the simulation field as timesteps ARRIVE
  * (the reference's whole point is per-iteration analytics on live
  * data, ref doreisa/window_api.py:38-119; `arr_gram` / `arr_svd_vals`
  * / `arr_pca_project` are the batch faces of the same math).
  *
  * Per micro-batch of COMPLETE timesteps
  * ([[Simulation.assembleChunks]]' release contract), the batch's
  * exact-decimal Gram block computes DISTRIBUTED — the `arr_gram`
  * SUMMA pass scoped to the arrived timesteps
  * ([[graft.arrays.ChunkedArray.gramRowsExact]]) — and only the k × k
  * decimal artifact crosses to the driver, which accumulates in exact
  * [[BigDecimal]] arithmetic. Because the decimal sums are associative
  * and exact, after ANY prefix of timesteps — under ANY chunk arrival
  * order or micro-batch split — the running Gram is BIT-EQUAL to batch
  * `gramRows` over the same timesteps (one final double rounding
  * either way); spec-gated in StreamingSpec.
  *
  * Scale posture: driver state is k² decimals (a model artifact, never
  * data); each micro-batch adds one bounded k²-row collect on top of
  * the distributed pass. Feeding [[graft.arrays.Eigen]] with
  * [[RunningGram.gram]] closes the loop: a live, incrementally updated
  * singular spectrum / PCA basis of everything the simulation has
  * produced so far.
  */
object StreamingGram {

  /** Driver-side running Gram accumulator (exact decimal adds). */
  final class RunningGram {
    private val acc =
      scala.collection.mutable.Map.empty[(Long, Long), BigDecimal]

    /** Fold one micro-batch's exact partial Gram in
      * (the `(i, j, value decimal)` relation of `gramRowsExact`). */
    def observe(partial: DataFrame): Unit = {
      val rows = partial.collect()
      synchronized {
        rows.foreach { r =>
          val k = (r.getLong(0), r.getLong(1))
          val v = BigDecimal(r.getDecimal(2))
          acc.update(k, acc.getOrElse(k, BigDecimal(0)) + v)
        }
      }
    }

    /** The running Gram as a dense n × n double matrix (the
      * [[graft.arrays.Eigen]] input shape); absent cells are 0. */
    def gram(n: Int): Array[Array[Double]] = synchronized {
      val g = Array.ofDim[Double](n, n)
      acc.foreach { case ((i, j), v) => g(i.toInt)(j.toInt) = v.toDouble }
      g
    }

    /** The running Gram as `(i, j, value)` rows — the batch `arr_gram`
      * schema, for a direct stream ≡ batch compare. */
    def snapshot(spark: SparkSession): DataFrame = {
      import spark.implicits._
      synchronized {
        acc.toSeq.map { case ((i, j), v) => (i, j, v.toDouble) }
      }.toDF("i", "j", "value")
    }
  }

  /** Wire a [[RunningGram]] into the live chunk stream: per micro-batch
    * of complete timesteps the distributed exact Gram pass runs and its
    * k² artifact folds into `state`. */
  def run(
      chunks: DataFrame,
      name: String,
      geom: ArrayGeometry,
      state: RunningGram,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    Simulation.runArrayOp(chunks, name, geom,
      (a: ChunkedArray) => a.gramRowsExact(),
      (df: DataFrame, _: Long) => state.observe(df),
      trigger)
}
