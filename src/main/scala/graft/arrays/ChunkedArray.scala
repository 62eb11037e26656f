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

  /** Re-cluster chunks on the (timestep, pos) zip key — the explicit
    * analog of the reference's chunk->worker partitioning strategies
    * (doreisa/_scheduler.py, tests/test_partitioning.py). Partitioning on
    * the FULL key keeps parallelism proportional to #chunks (pos alone
    * would cap it at the grid size) and matches [[zipWith]]'s join key so
    * an aligned zip can reuse the exchange. Spark's locality-aware
    * scheduling already plays the reference's "greedy" role; reach for
    * this only in pipelines that re-zip the same arrays repeatedly. */
  def repartitionByGrid(): ChunkedArray =
    copy(df = df.repartition(col("timestep"), col("pos")))

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
    require(lo < hi, s"empty slice [$lo, $hi)")
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
    // an empty range would hit Spark's descending-sequence default
    // (sequence(1, 0) == [1, 0]) and gather garbage rather than nothing
    require(rLo < rHi && cLo < cHi, s"empty slice [$rLo,$rHi)x[$cLo,$cHi)")
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

  /** 5-point Laplacian stencil `4*v[i,j] - v[i±1,j] - v[i,j±1]` with
    * zero padding at the global boundary — the canonical in-situ
    * simulation analytic (time/space derivatives over the streamed
    * array). Distributed via halo exchange: every chunk ships only its
    * four EDGE STRIPS to grid neighbors (O(perimeter) shuffle, never
    * O(area)), then each chunk computes locally from its payload plus
    * received halos. This is the Spark-first form of the stencil a
    * doreisa callback would run with dask map_overlap. */
  def stencilLaplacian(): ChunkedArray = {
    require(geom.dims == 2, "stencilLaplacian requires a 2-d array")
    val (rows, cols) = (geom.chunkShape(0), geom.chunkShape(1))
    val (gr, gc) = (geom.chunksPerDim(0), geom.chunksPerDim(1))
    // (dr, dc, kind, strip): strip this chunk contributes to neighbor
    // (r+dr, c+dc); 'c' is the full payload to self.
    val topRow = slice(col("data"), 1, cols)
    val bottomRow = slice(col("data"), (rows - 1) * cols + 1, cols)
    val leftCol = transform(sequence(lit(0), lit(rows - 1)), i => col("data")(i * cols))
    val rightCol = transform(sequence(lit(0), lit(rows - 1)), i => col("data")(i * cols + cols - 1))
    val msgs = array(
      struct(lit(0).as("dr"), lit(0).as("dc"), lit("c").as("kind"), col("data").as("strip")),
      struct(lit(1).as("dr"), lit(0).as("dc"), lit("n").as("kind"), bottomRow.as("strip")),
      struct(lit(-1).as("dr"), lit(0).as("dc"), lit("s").as("kind"), topRow.as("strip")),
      struct(lit(0).as("dr"), lit(1).as("dc"), lit("w").as("kind"), rightCol.as("strip")),
      struct(lit(0).as("dr"), lit(-1).as("dc"), lit("e").as("kind"), leftCol.as("strip")))
    val sent = df
      .select(col("timestep"), col("pos"), explode(msgs).as("m"))
      .select(col("timestep"),
        (col("pos")(0) + col("m.dr")).as("r"), (col("pos")(1) + col("m.dc")).as("c"),
        col("m.kind").as("kind"), col("m.strip").as("strip"))
      .filter(col("r") >= 0 && col("r") < gr && col("c") >= 0 && col("c") < gc)
    val assembled = sent
      .groupBy("timestep", "r", "c")
      .agg(map_from_entries(collect_list(struct(col("kind"), col("strip")))).as("m"))
    // out[i,j] = 4*v - up - down - left - right, zero-padded via halos
    val out = assembled.select(
      col("timestep"), array(col("r"), col("c")).as("pos"),
      transform(sequence(lit(0), lit(rows * cols - 1)), idx => {
        val i = (idx / cols).cast("int")
        val j = idx % cols
        // A grid position can exist only as a halo target (its own chunk
        // missing = implicitly all-zero); treat the absent payload as 0s.
        val self = coalesce(element_at(col("m"), "c"), array_repeat(lit(0.0), rows * cols))
        val center = element_at(self, idx + 1)
        val up = when(i > 0, element_at(self, idx - cols + 1))
          .otherwise(coalesce(element_at(element_at(col("m"), "n"), j + 1), lit(0.0)))
        val down = when(i < rows - 1, element_at(self, idx + cols + 1))
          .otherwise(coalesce(element_at(element_at(col("m"), "s"), j + 1), lit(0.0)))
        val left = when(j > 0, element_at(self, idx))
          .otherwise(coalesce(element_at(element_at(col("m"), "w"), i + 1), lit(0.0)))
        val right = when(j < cols - 1, element_at(self, idx + 2))
          .otherwise(coalesce(element_at(element_at(col("m"), "e"), i + 1), lit(0.0)))
        center * 4.0 - up - down - left - right
      }).as("data"))
    copy(df = out)
  }

  /** Flatten a 2-d array to `(timestep, i, j, value)` rows. */
  def rows2d: DataFrame = {
    require(geom.dims == 2, "rows2d requires a 2-d array")
    val (rows, cols) = (geom.chunkShape(0), geom.chunkShape(1))
    df.select(col("timestep"), col("pos"),
        posexplode(col("data")).as(Seq("local", "value")))
      .select(col("timestep"),
        (col("pos")(0) * rows + (col("local") / cols).cast("int")).cast("bigint").as("i"),
        (col("pos")(1) * cols + col("local") % cols).cast("bigint").as("j"),
        col("value"))
  }

  /** Distributed block matrix multiply (dask `a @ b`), SUMMA-style:
    * chunk-pair block products where A's chunk-column meets B's
    * chunk-row (a co-partitioned equi-join on k), then an elementwise
    * merge of partial blocks per output position. Only chunk payloads
    * move — one shuffle keyed on k, one tiny reduce of partial blocks.
    * Block sums accumulate in DECIMAL(38,4): products of 2-decimal cell
    * values are exactly 4-decimal, so the result is order-independent
    * and reproducible cross-engine (SURVEY §5). */
  def matmul(other: ChunkedArray): ChunkedArray = {
    require(geom.dims == 2 && other.geom.dims == 2, "matmul requires 2-d arrays")
    require(geom.chunksPerDim(1) == other.geom.chunksPerDim(0) &&
      geom.chunkShape(1) == other.geom.chunkShape(0),
      s"inner dimensions must agree: $geom vs ${other.geom}")
    val (rI, kI) = (geom.chunkShape(0), geom.chunkShape(1))
    val cI = other.geom.chunkShape(1)
    val zero = lit(0).cast("decimal(38,4)")
    val a = df.select(col("timestep"), col("pos")(0).as("ra"),
      col("pos")(1).as("ka"), col("data").as("adata"))
    val b = other.df.select(col("timestep").as("bt"), col("pos")(0).as("kb"),
      col("pos")(1).as("cb"), col("data").as("bdata"))
    val block = transform(sequence(lit(0), lit(rI * cI - 1)), idx => {
      val i = (idx / cI).cast("int")
      val j = idx % cI
      aggregate(sequence(lit(0), lit(kI - 1)), zero, (acc, k) =>
        (acc + (col("adata")(i * kI + k) * col("bdata")(k * cI + j))
          .cast("decimal(18,4)")).cast("decimal(38,4)"))
    })
    val merged = a
      .join(b, col("timestep") === col("bt") && col("ka") === col("kb"))
      .select(col("timestep"), col("ra"), col("cb"), block.as("part"))
      .groupBy("timestep", "ra", "cb")
      .agg(aggregate(collect_list(col("part")), array_repeat(zero, rI * cI),
        (acc, v) => zip_with(acc, v, (x, y) => (x + y).cast("decimal(38,4)"))).as("vec"))
    val out = merged.select(col("timestep"),
      array(col("ra").cast("int"), col("cb").cast("int")).as("pos"),
      transform(col("vec"), v => v.cast("double")).as("data"))
    ChunkedArray(out,
      ArrayGeometry(Seq(geom.chunksPerDim(0), other.geom.chunksPerDim(1)), Seq(rI, cI)))
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
