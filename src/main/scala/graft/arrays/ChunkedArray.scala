package graft.arrays

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geometry of a regular chunk grid: `chunksPerDim(d)` chunks along each
  * dimension, every chunk `chunkShape(d)` elements wide. Mirrors the
  * reference's per-dimension chunk bookkeeping
  * (doreisa/head_node.py:49-58, `nb_chunks_per_dim` / `chunks_size`).
  */
final case class ArrayGeometry(chunksPerDim: Seq[Int], chunkShape: Seq[Int]) {
  require(chunksPerDim.length == chunkShape.length)
  def dims: Int = chunksPerDim.length
  def chunkElems: Int = chunkShape.product
  def dimSize(d: Int): Int = chunksPerDim(d) * chunkShape(d)
}

/** Distributed N-dimensional double array, chunked on a regular grid —
  * the Spark-first re-expression of the reference's distributed Dask
  * array (doreisa/head_node.py:120-164 assembles one from per-chunk
  * object refs; doreisa/window_api.py:38-119 streams one per timestep).
  *
  * Representation: a DataFrame with
  * `timestep: bigint, pos: array<int>, data: array<double>` — one row per
  * chunk, payload packed row-major. There is no head actor and no custom
  * scheduler: chunk rows are ordinary partitioned data, so Catalyst plans
  * the work and Spark's partial-aggregation machinery plays the role of
  * the reference's scheduling-actor reduction tree
  * (doreisa/_scheduling_actor.py).
  *
  * Scale posture (100 TB = ~10^8 chunks):
  *  - elementwise ops ([[mapValues]], [[zipWith]]) are chunk-local — no
  *    shuffle, one projection per op;
  *  - reductions ship per-chunk partials (one scalar or one small array
  *    per chunk), never elements;
  *  - [[sliceRange]] prunes whole chunks with a `pos` predicate before
  *    touching payloads (the analog of partition pruning);
  *  - [[zipWith]] joins on (timestep, pos) — co-partition/bucket both
  *    sides on that key to make it shuffle-free on a cluster.
  *
  * Exactness: reductions fold through DECIMAL accumulators (values in the
  * test data carry 2 decimals), so results are order-independent and
  * reproducible cross-engine (see SURVEY §5).
  */
final case class ChunkedArray(df: DataFrame, geom: ArrayGeometry) {
  import ChunkedArray._

  /** Elementwise map — doreisa's `preprocess` / dask elementwise ops. */
  def mapValues(f: Column => Column): ChunkedArray =
    copy(df = df.withColumn("data", transform(col("data"), f)))

  /** Elementwise binary op with an aligned array (same geometry). */
  def zipWith(other: ChunkedArray)(f: (Column, Column) => Column): ChunkedArray = {
    require(geom == other.geom, s"geometry mismatch: $geom vs ${other.geom}")
    val r = other.df.select(col("timestep").as("r_ts"), col("pos").as("r_pos"),
      col("data").as("r_data"))
    val j = df.join(r, col("timestep") === col("r_ts") && col("pos") === col("r_pos"))
    copy(df = j.select(col("timestep"), col("pos"),
      zip_with(col("data"), col("r_data"), f).as("data")))
  }

  /** Shift all timesteps by `k` — building block for sliding windows
    * (doreisa `window_size`, tests/test_sliding_window.py). */
  def shiftTimestep(k: Long): ChunkedArray =
    copy(df = df.withColumn("timestep", col("timestep") + lit(k)))

  /** Per-timestep global sum: chunk-local decimal fold, then a tiny
    * partial-agg shuffle of one scalar per chunk. */
  def sumPerTimestep(alias: String = "total"): DataFrame =
    df.select(col("timestep"), chunkSumDec(col("data")).as("csum"))
      .groupBy("timestep")
      .agg(sum(col("csum")).cast("double").as(alias))

  /** One-pass per-timestep stats (n/sum/min/max) from chunk partials. */
  def statsPerTimestep: DataFrame =
    df.select(col("timestep"),
        size(col("data")).cast("bigint").as("cn"),
        chunkSumDec(col("data")).as("csum"),
        array_min(col("data")).as("cmin"),
        array_max(col("data")).as("cmax"))
      .groupBy("timestep")
      .agg(
        sum(col("cn")).as("n_elems"),
        sum(col("csum")).cast("double").as("total"),
        min(col("cmin")).as("min_val"),
        max(col("cmax")).as("max_val"))

  /** Slice a global index range [lo, hi) of a 1-d array: prunes whole
    * chunks by `pos` (the analog of partition pruning), then takes the
    * kept span inside boundary chunks. The result is ragged, so it
    * supports reductions only. */
  def sliceRange(lo: Int, hi: Int): ChunkedArray = {
    require(geom.dims == 1, "sliceRange is 1-d; use slice2d for 2-d arrays")
    val cs = geom.chunkShape(0)
    val chunkLo = col("pos")(0) * cs
    val kept = df.filter(chunkLo < hi && chunkLo + cs > lo)
    val localLo = greatest(lit(lo) - chunkLo, lit(0))
    val localHi = least(lit(hi) - chunkLo, lit(cs))
    copy(df = kept.withColumn("data",
      slice(col("data"), localLo + 1, localHi - localLo)))
  }

  /** Slice `arr[rLo:rHi, cLo:cHi]` of a 2-d array. Both dimensions are
    * cut in one pass because the row-major payload must be re-packed with
    * the original chunk shape's strides. Non-overlapping chunks are
    * pruned before any payload work. */
  def slice2d(rLo: Int, rHi: Int, cLo: Int, cHi: Int): ChunkedArray = {
    require(geom.dims == 2, "slice2d requires a 2-d array")
    val (rows, cols) = (geom.chunkShape(0), geom.chunkShape(1))
    val rChunkLo = col("pos")(0) * rows
    val cChunkLo = col("pos")(1) * cols
    val kept = df.filter(
      rChunkLo < rHi && rChunkLo + rows > rLo &&
      cChunkLo < cHi && cChunkLo + cols > cLo)
    val (lrLo, lrHi) = (greatest(lit(rLo) - rChunkLo, lit(0)), least(lit(rHi) - rChunkLo, lit(rows)))
    val (lcLo, lcHi) = (greatest(lit(cLo) - cChunkLo, lit(0)), least(lit(cHi) - cChunkLo, lit(cols)))
    copy(df = kept.withColumn("data",
      flatten(transform(sequence(lrLo, lrHi - 1), i =>
        transform(sequence(lcLo, lcHi - 1), j =>
          col("data")(i * cols + j))))))
  }

  /** Sum a 2-d array along `axis`, dask's `arr.sum(axis=)`: chunk-local
    * fold along the axis (narrow), then an elementwise decimal merge of
    * the partial vectors across the chunk row/column (one small array per
    * chunk shuffles, never elements). Returns rows
    * `(timestep, index, value)` of the reduced 1-d array. */
  def axisSumRows(axis: Int): DataFrame = {
    require(geom.dims == 2, "axisSumRows requires a 2-d array")
    require(axis == 0 || axis == 1)
    val (rows, cols) = (geom.chunkShape(0), geom.chunkShape(1))
    val keep = 1 - axis // surviving dimension
    val outLen = geom.chunkShape(keep)
    // partial(k) = sum over the reduced axis inside this chunk, decimal-exact
    val partial = if (axis == 1) {
      transform(sequence(lit(0), lit(rows - 1)), i =>
        aggregate(sequence(lit(0), lit(cols - 1)), zeroDec,
          (acc, j) => addDec(acc, col("data")(i * cols + j))))
    } else {
      transform(sequence(lit(0), lit(cols - 1)), j =>
        aggregate(sequence(lit(0), lit(rows - 1)), zeroDec,
          (acc, i) => addDec(acc, col("data")(i * cols + j))))
    }
    val zeroVec = array_repeat(zeroDec, outLen)
    val merged = df
      .select(col("timestep"), col("pos")(keep).as("kpos"), partial.as("part"))
      .groupBy("timestep", "kpos")
      .agg(aggregate(collect_list(col("part")), zeroVec,
        (acc, v) => zip_with(acc, v, (a, b) => castDec(a + b))).as("vec"))
    merged
      .select(col("timestep"), col("kpos"),
        posexplode(col("vec")).as(Seq("local", "value")))
      .select(col("timestep"),
        (col("kpos") * geom.chunkShape(keep) + col("local")).cast("bigint").as("idx"),
        col("value").cast("double").as("value"))
  }
}

object ChunkedArray {
  private val DEC = "DECIMAL(28,2)"
  private[arrays] def zeroDec: Column = lit(0).cast(DEC)
  private[arrays] def castDec(c: Column): Column = c.cast(DEC)
  /** acc + x, rounding x to 2 decimals (exact for the 2-decimal payloads)
    * and keeping the accumulator type stable for `aggregate`. */
  private[arrays] def addDec(acc: Column, x: Column): Column =
    castDec(acc + x.cast("decimal(18,2)"))
  /** Order-independent chunk sum via a decimal fold. */
  def chunkSumDec(data: Column): Column =
    aggregate(data, zeroDec, (acc, x) => addDec(acc, x))
}
