package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.arrays.{ArrayGeometry, ChunkedArray}

/** Randomized model check: the distributed array engine vs an EXACT
  * dense reference, over fixed-seed random geometries (rank 1-3, mixed
  * chunk counts/shapes, so chunk-boundary/merge paths are hit in
  * combinations no hand fixture covers) and random 2-decimal payloads
  * (the engine's decimal-exact contract). The reference replays the
  * engine's arithmetic EXACTLY — BigDecimal for every fold, doubles
  * only in the same final operand order — so every comparison is `==`,
  * no tolerances. Seeded Random, not ScalaCheck: reproducible without
  * the scalatest-scalacheck bridge artifact. */
class ArrayModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def cartesian(dims: Seq[Int]): Seq[Seq[Int]] =
    dims.foldLeft(Seq(Seq.empty[Int]))((acc, n) =>
      acc.flatMap(p => (0 until n).map(p :+ _)))

  private def strides(shape: Seq[Int]): Seq[Int] =
    shape.scanRight(1)(_ * _).tail

  /** Dense row-major model with exact 2-decimal cells. */
  private case class Dense(shape: Seq[Int], cells: Vector[BigDecimal]) {
    val st: Seq[Int] = strides(shape)
    def at(ix: Seq[Int]): BigDecimal = cells(ix.zip(st).map { case (i, s) => i * s }.sum)
    /** All multi-indices of the dims in `keep`, with `axis` swept as a line. */
    def lines(axis: Int): Seq[(Seq[Int], Seq[BigDecimal])] = {
      val rem = shape.indices.filterNot(_ == axis)
      cartesian(rem.map(shape)).map { rix =>
        val full = Array.fill(shape.length)(0)
        rem.zip(rix).foreach { case (d, i) => full(d) = i }
        val line = (0 until shape(axis)).map { i => full(axis) = i; at(full.toSeq) }
        (rix, line.toVector)
      }
    }
  }

  /** Chunk the dense model onto a grid (shape must tile exactly). */
  private def chunked(d: Dense, cpd: Seq[Int]): ChunkedArray = {
    val cs = d.shape.zip(cpd).map { case (s, c) => require(s % c == 0); s / c }
    val rows = cartesian(cpd).map { pos =>
      val data = cartesian(cs).map { local =>
        d.at(pos.zip(local).zip(cs).map { case ((p, l), w) => p * w + l }).toDouble
      }
      (0L, pos, data)
    }
    ChunkedArray(rows.toDF("timestep", "pos", "data"), ArrayGeometry(cpd, cs))
  }

  private def randomCase(rnd: scala.util.Random, rank: Int): (Dense, Seq[Int]) = {
    val cpd = Seq.fill(rank)(1 + rnd.nextInt(3))
    val cs = Seq.fill(rank)(1 + rnd.nextInt(3))
    val shape = cpd.zip(cs).map { case (a, b) => a * b }
    val cells = Vector.fill(shape.product)(
      BigDecimal(rnd.between(-9999, 10000), 2)) // exact 2-decimal values
    (Dense(shape, cells), cpd)
  }

  private def rowsMap(a: ChunkedArray): Map[Seq[Long], Double] =
    a.rowsNd.collect().map { r =>
      val n = r.length
      ((1 until n - 1).map(r.getLong): Seq[Long]) -> r.getDouble(n - 1)
    }.toMap

  private def ixKey(ix: Seq[Int]): Seq[Long] = ix.map(_.toLong)

  test("reductions/scans/reshapes match the exact dense model on random arrays") {
    val rnd = new scala.util.Random(20260813L)
    for (caseNo <- 0 until 8) {
      val rank = 1 + rnd.nextInt(3)
      val (d, cpd) = randomCase(rnd, rank)
      val arr = chunked(d, cpd)
      val tag = s"case $caseNo shape=${d.shape} cpd=$cpd"

      // global sum + stats (exact decimal folds)
      val expSum = d.cells.sum
      assert(arr.sumPerTimestep().head.getDouble(1) == expSum.toDouble, s"$tag sum")
      val st0 = arr.statsPerTimestep.head
      assert(st0.getAs[Long]("n_elems") == d.cells.length.toLong, s"$tag n")
      assert(st0.getAs[Double]("total") == expSum.toDouble, s"$tag total")
      assert(st0.getAs[Double]("min_val") == d.cells.min.toDouble, s"$tag min")
      assert(st0.getAs[Double]("max_val") == d.cells.max.toDouble, s"$tag max")

      // global argmax/argmin: extreme value, ties to lowest row-major index
      val amx = arr.argmaxNd().head
      val mx = d.cells.max
      val mxIx = d.cells.indexOf(mx)
      assert(amx.getDouble(1) == mx.toDouble, s"$tag argmax val")
      (0 until rank).foreach { k =>
        assert(amx.getLong(2 + k) == (mxIx / d.st(k)) % d.shape(k), s"$tag argmax i$k")
      }
      val amn = arr.argminNd().head
      val mn = d.cells.min
      val mnIx = d.cells.indexOf(mn)
      assert(amn.getDouble(1) == mn.toDouble, s"$tag argmin val")
      (0 until rank).foreach { k =>
        assert(amn.getLong(2 + k) == (mnIx / d.st(k)) % d.shape(k), s"$tag argmin i$k")
      }

      // masked reduce at a random threshold (replay: filter then exact sum)
      val thr = rnd.between(-5000, 5000) / 100.0
      val kept = d.cells.filter(_.toDouble > thr)
      val mrow = arr.maskedSumPerTimestep(_ > lit(thr)).head
      assert(mrow.getAs[Long]("n_kept") == kept.length.toLong, s"$tag mask n")
      assert(mrow.getAs[Double]("total") == kept.sum.toDouble, s"$tag mask sum")

      // per-axis faces (rank >= 2) against the dense lines
      if (rank >= 2) for (axis <- 0 until rank) {
        val lines = d.lines(axis)
        val n = d.shape(axis)
        val sums = rowsMap(arr.axisSum(axis))
        val maxs = rowsMap(arr.axisMax(axis))
        val means = rowsMap(arr.axisMean(axis))
        val vars_ = rowsMap(arr.axisVar(axis))
        val amaxs = arr.axisArgmax(axis).rowsNd.collect().map { r =>
          val len = r.length
          ((1 until len - 1).map(r.getLong): Seq[Long]) -> r.getLong(len - 1)
        }.toMap
        for ((rix, line) <- lines) {
          val k = ixKey(rix)
          val t = line.sum
          assert(sums(k) == t.toDouble, s"$tag axisSum($axis) at $rix")
          assert(maxs(k) == line.max.toDouble, s"$tag axisMax($axis) at $rix")
          // replay operand order: exact-sum double / extent double
          assert(means(k) == t.toDouble / n.toDouble, s"$tag axisMean($axis) at $rix")
          // (q - t*t/n) / n with q, t doubles of the exact moments
          val q = line.map(x => x * x).sum
          assert(vars_(k) == (q.toDouble - t.toDouble * t.toDouble / n) / n,
            s"$tag axisVar($axis) at $rix")
          val bestIx = line.indexOf(line.max).toLong
          assert(amaxs(k) == bestIx, s"$tag axisArgmax($axis) at $rix")
        }
      }

      // per-axis distributed scan: running exact prefix per line
      for (axis <- 0 until rank) {
        val got = rowsMap(arr.cumsumAxis(axis))
        for ((rix, line) <- d.lines(axis); i <- line.indices) {
          val pref = line.take(i + 1).sum
          val rem = d.shape.indices.filterNot(_ == axis)
          val full = Array.fill(rank)(0L)
          rem.zip(rix).foreach { case (dd, ii) => full(dd) = ii.toLong }
          full(axis) = i.toLong
          assert(got(full.toSeq) == pref.toDouble, s"$tag cumsum($axis) at $rix:$i")
        }
      }

      // transpose by a random permutation: pure re-addressing, cell-exact
      if (rank >= 2) {
        val perm = rnd.shuffle((0 until rank).toList)
        val tmap = rowsMap(arr.transpose(perm))
        for (ix <- cartesian(d.shape)) {
          assert(tmap(ixKey(perm.map(ix))) == d.at(ix).toDouble, s"$tag transpose $perm at $ix")
        }
      }

      // rechunk to a random other exact tiling: cell-exact re-addressing
      val newShape = d.shape.map { s =>
        val divisors = (1 to s).filter(s % _ == 0)
        divisors(rnd.nextInt(divisors.length))
      }
      val rmap = rowsMap(arr.rechunk(newShape))
      for (ix <- cartesian(d.shape))
        assert(rmap(ixKey(ix)) == d.at(ix).toDouble, s"$tag rechunk $newShape at $ix")

      // random non-empty slice box: pruned + repacked, exact sum
      val ranges = d.shape.map { s =>
        val lo = rnd.nextInt(s)
        (lo, lo + 1 + rnd.nextInt(s - lo))
      }
      val sliced = cartesian(d.shape)
        .filter(ix => ix.zip(ranges).forall { case (i, (lo, hi)) => i >= lo && i < hi })
        .map(d.at)
      assert(arr.sliceNd(ranges).sumPerTimestep().head.getDouble(1) == sliced.sum.toDouble,
        s"$tag slice $ranges")

      // reshape to the flat 1-d vector under a random chunking: cell f of
      // the flattened row-major order, exactly
      val total = d.shape.product
      val flatDivs = (1 to total).filter(total % _ == 0)
      val flatChunk = flatDivs(rnd.nextInt(flatDivs.length))
      val fmap = rowsMap(arr.reshape(Seq(total), Seq(flatChunk)))
      for (f <- 0 until total)
        assert(fmap(Seq(f.toLong)) == d.cells(f).toDouble, s"$tag reshape flat=$f")

      // stack with the negated twin: slab 0 original, slab 1 negated
      val smap = rowsMap(ChunkedArray.stack(Seq(arr, arr.mapValues(_ * lit(-1.0)))))
      for (ix <- cartesian(d.shape)) {
        assert(smap(0L +: ixKey(ix)) == d.at(ix).toDouble, s"$tag stack slab0 $ix")
        assert(smap(1L +: ixKey(ix)) == -d.at(ix).toDouble, s"$tag stack slab1 $ix")
      }

      // truthiness: any/all against the model's nonzero counts after a
      // random threshold zeroing
      val zthr = rnd.between(-5000, 5000) / 100.0
      val zeroed = arr.where(_ > lit(zthr), lit(0.0))
      val nz = d.cells.count(_.toDouble > zthr)
      val trow = zeroed.truthPerTimestep.head
      assert(trow.getLong(1) == (if (nz > 0) 1L else 0L), s"$tag any")
      assert(trow.getLong(2) == (if (nz == d.cells.length) 1L else 0L), s"$tag all")

      // small-int axis product: pmod(floor(cell), 5) + 1 in 1..5, so every
      // line product is exact in double and order-free
      def toSmall(v: BigDecimal): Long =
        ((math.floor(v.toDouble).toLong % 5) + 5) % 5 + 1
      if (rank >= 2) {
        val axis = rnd.nextInt(rank)
        val small = arr.mapValues(x =>
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.floor(x).cast("bigint"), lit(5)) + lit(1))
        val pmap = rowsMap(small.axisProd(axis))
        for ((rix, line) <- d.lines(axis))
          assert(pmap(ixKey(rix)) == line.map(toSmall).product.toDouble,
            s"$tag axisProd($axis) at $rix")
      }

      // zipWithAuto across a random alternative chunking: the cell-wise
      // product (pairing-sensitive) replayed as the same double multiply
      val altShape = d.shape.map { s =>
        val divisors = (1 to s).filter(s % _ == 0)
        divisors(rnd.nextInt(divisors.length))
      }
      val zmap = rowsMap(arr.zipWithAuto(arr.rechunk(altShape))(_ * _))
      for (ix <- cartesian(d.shape))
        assert(zmap(ixKey(ix)) == d.at(ix).toDouble * d.at(ix).toDouble,
          s"$tag zipWithAuto $altShape at $ix")

      // axis stencil, both boundary modes, exact power-of-two weights:
      // replay the fixed fold order in doubles
      val sAxis = rnd.nextInt(rank)
      if (d.shape(sAxis) / cpd(sAxis) >= 2) {
        val w = Seq(0.25, 0.5, 0.25)
        for (mode <- Seq("zero", "reflect")) {
          val out = rowsMap(arr.stencilAxis(sAxis, w, mode))
          val n = d.shape(sAxis)
          def vat(ix: Seq[Int], o: Int): Double = {
            val x = ix(sAxis) + o
            if (x >= 0 && x < n) d.at(ix.updated(sAxis, x)).toDouble
            else if (mode == "zero") 0.0
            else if (x < 0) d.at(ix.updated(sAxis, -x)).toDouble
            else d.at(ix.updated(sAxis, 2 * (n - 1) - x)).toDouble
          }
          for (ix <- cartesian(d.shape)) {
            val exp = w.indices.map(k => w(k) * vat(ix, k - 1)).reduce(_ + _)
            assert(out(ixKey(ix)) == exp, s"$tag stencilAxis($sAxis,$mode) at $ix")
          }
        }
      }
    }
  }

  test("stencil2d full-neighborhood kernel matches the dense model (corner halos)") {
    val rnd = new scala.util.Random(20260815L)
    val w = Seq(
      Seq(0.0625, 0.125, 0.0625),
      Seq(0.125, 0.25, 0.125),
      Seq(0.0625, 0.125, 0.0625))
    var done = 0
    var tries = 0
    while (done < 6 && tries < 60) {
      tries += 1
      val (d, cpd) = randomCase(rnd, 2)
      // kernel reach 1 needs chunk extents >= 2 on both axes
      if (d.shape(0) / cpd(0) >= 2 && d.shape(1) / cpd(1) >= 2) {
        done += 1
        val arr = chunked(d, cpd)
        val tag = s"shape=${d.shape} cpd=$cpd"
        val (n0, n1) = (d.shape(0), d.shape(1))
        for (mode <- Seq("zero", "reflect")) {
          val out = rowsMap(arr.stencil2d(w, mode))
          def vat(y: Int, x: Int): Double = {
            def fold(t: Int, n: Int): Option[Int] =
              if (t >= 0 && t < n) Some(t)
              else if (mode == "zero") None
              else Some(if (t < 0) -t else 2 * (n - 1) - t)
            (fold(y, n0), fold(x, n1)) match {
              case (Some(yy), Some(xx)) => d.at(Seq(yy, xx)).toDouble
              case _ => 0.0
            }
          }
          for (iy <- 0 until n0; ix <- 0 until n1) {
            // replay the engine's fixed row-major fold in doubles
            val exp = (for (ky <- -1 to 1; kx <- -1 to 1)
              yield w(ky + 1)(kx + 1) * vat(iy + ky, ix + kx)).reduce(_ + _)
            assert(out(Seq(iy.toLong, ix.toLong)) == exp, s"$tag $mode at ($iy,$ix)")
          }
        }
      }
    }
    assert(done >= 6, s"only $done valid random cases in $tries tries")
  }

  test("stencilNd full-hypercube kernel matches the dense model at ranks 1-3") {
    val rnd = new scala.util.Random(20260816L)
    val w1 = Seq(0.25, 0.5, 0.25)
    var done = 0
    var tries = 0
    while (done < 6 && tries < 80) {
      tries += 1
      val rank = 1 + rnd.nextInt(3)
      val (d, cpd) = randomCase(rnd, rank)
      if (d.shape.zip(cpd).forall { case (s, c) => s / c >= 2 }) {
        done += 1
        val arr = chunked(d, cpd)
        val tag = s"shape=${d.shape} cpd=$cpd"
        // separable binomial kernel over the full 3^rank neighborhood,
        // row-major — same tap order as the engine
        val taps = cartesian(Seq.fill(rank)(3)).map(_.map(_ - 1))
        val kernel = taps.map(_.map(o => w1(o + 1)).product)
        for (mode <- Seq("zero", "reflect")) {
          val out = rowsMap(arr.stencilNd(kernel, Seq.fill(rank)(3), mode))
          def vat(ix: Seq[Int]): Double = {
            val eff = ix.zip(d.shape).map { case (t, nD) =>
              if (t >= 0 && t < nD) Some(t)
              else if (mode == "zero") None
              else Some(if (t < 0) -t else 2 * (nD - 1) - t)
            }
            if (eff.forall(_.isDefined)) d.at(eff.map(_.get)).toDouble else 0.0
          }
          for (ix <- cartesian(d.shape)) {
            val exp = taps.zip(kernel).map { case (ko, w) =>
              w * vat(ix.zip(ko).map { case (i, o) => i + o })
            }.reduce(_ + _)
            assert(out(ixKey(ix)) == exp, s"$tag rank=$rank $mode at $ix")
          }
        }
      }
    }
    assert(done >= 6, s"only $done valid random cases in $tries tries")
  }

  test("flip/roll/pad geometry faces match the exact dense model on random arrays") {
    val rnd = new scala.util.Random(20260814L)
    for (caseNo <- 0 until 8) {
      val rank = 1 + rnd.nextInt(3)
      val (d, cpd) = randomCase(rnd, rank)
      val arr = chunked(d, cpd)
      val tag = s"case $caseNo shape=${d.shape} cpd=$cpd"
      val axis = rnd.nextInt(rank)
      val size = d.shape(axis)

      // flip: out[ix] reads the mirrored axis coordinate
      val fmap = rowsMap(arr.flip(axis))
      for (ix <- cartesian(d.shape)) {
        val src = ix.updated(axis, size - 1 - ix(axis))
        assert(fmap(ixKey(ix)) == d.at(src).toDouble, s"$tag flip($axis) at $ix")
      }

      // roll by a random shift (negative and beyond-size included):
      // out[g] = in[(g - shift) mod size]
      val shift = rnd.between(-2 * size, 2 * size + 1)
      val rolled = rowsMap(arr.roll(axis, shift))
      for (ix <- cartesian(d.shape)) {
        val src = ix.updated(axis, (((ix(axis) - shift) % size) + size) % size)
        assert(rolled(ixKey(ix)) == d.at(src).toDouble, s"$tag roll($axis,$shift) at $ix")
      }

      // pad: random extents tiling the chunk extent; fill value exact
      val sA = size / cpd(axis)
      val before = rnd.nextInt(2 * sA + 1)
      val after = {
        val rem = (before + size) % sA
        (sA - rem) % sA + sA * rnd.nextInt(2)
      }
      if (before + after > 0) {
        val pv = rnd.between(-9999, 10000) / 100.0
        val padShape = d.shape.updated(axis, before + size + after)
        val pmap = rowsMap(arr.pad(axis, before, after, pv))
        assert(pmap.size == padShape.product,
          s"$tag pad($axis,$before,$after) cardinality ${pmap.size}")
        for (ix <- cartesian(padShape)) {
          val g = ix(axis) - before
          val exp = if (g >= 0 && g < size) d.at(ix.updated(axis, g)).toDouble else pv
          assert(pmap(ixKey(ix)) == exp, s"$tag pad($axis,$before,$after) at $ix")
        }
        // edge mode: every pad cell replicates the clamped boundary plane
        val emap = rowsMap(arr.pad(axis, before, after, mode = "edge"))
        for (ix <- cartesian(padShape)) {
          val g = (ix(axis) - before).max(0).min(size - 1)
          assert(emap(ixKey(ix)) == d.at(ix.updated(axis, g)).toDouble,
            s"$tag padEdge($axis,$before,$after) at $ix")
        }
      }
    }
  }

  test("takeRows gathers order- and duplicate-exactly on random 1-d arrays") {
    val rnd = new scala.util.Random(424213L)
    for (caseNo <- 0 until 6) {
      val (d, cpd) = randomCase(rnd, 1)
      val arr = chunked(d, cpd)
      val size = d.shape.head
      // random unsorted gather with duplicates, mixed chunk targets
      val k = 1 + rnd.nextInt(2 * size)
      val idx = Seq.fill(k)(rnd.nextInt(size))
      val got = arr.takeRows(idx).collect()
        .map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(got.length == k, s"case $caseNo cardinality ${got.length} != $k")
      idx.zipWithIndex.foreach { case (u, sel) =>
        assert(got(sel) == (sel.toLong, d.at(Seq(u)).toDouble),
          s"case $caseNo sel=$sel u=$u")
      }
    }
  }

  test("NaN/Infinity payloads keep SQL double semantics across ordering and re-addressing ops") {
    // The decimal-fold family (sum/stats total/var/cumsum) declares a
    // finite-decimal payload domain (NULL is the missing sentinel —
    // nanStats' contract); the ORDERING ops (min/max/arg-extremes) and
    // the RE-ADDRESSING ops (flip/roll/transpose/rechunk/reshape) are
    // defined for every double bit pattern. This check draws NaN and
    // ±Infinity with ~15% probability and replays Spark-SQL double
    // semantics exactly: NaN greatest, NaN == NaN, ties to the lowest
    // index; moved cells compare BIT-exactly (NaN != NaN under ==, so
    // equality goes through doubleToLongBits).
    val rnd = new scala.util.Random(77714L)
    val ord: Ordering[Double] = (a, b) => java.lang.Double.compare(a, b)
    def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)
    for (caseNo <- 0 until 6) {
      val rank = 1 + rnd.nextInt(3)
      val cpd = Seq.fill(rank)(1 + rnd.nextInt(3))
      val cs = Seq.fill(rank)(1 + rnd.nextInt(3))
      val shape = cpd.zip(cs).map { case (a, b) => a * b }
      val cells: Vector[Double] = Vector.fill(shape.product) {
        rnd.nextInt(20) match {
          case 0 => Double.NaN
          case 1 => Double.PositiveInfinity
          case 2 => Double.NegativeInfinity
          case _ => rnd.between(-9999, 10000) / 100.0
        }
      }
      val st = strides(shape)
      def at(ix: Seq[Int]): Double = cells(ix.zip(st).map { case (i, s) => i * s }.sum)
      val rows = cartesian(cpd).map { pos =>
        val data = cartesian(cs).map(local =>
          at(pos.zip(local).zip(cs).map { case ((p, l), w) => p * w + l }))
        (0L, pos, data)
      }
      val arr = ChunkedArray(rows.toDF("timestep", "pos", "data"),
        ArrayGeometry(cpd, cs))
      val tag = s"case $caseNo shape=$shape cpd=$cpd " +
        s"nan=${cells.count(_.isNaN)} inf=${cells.count(_.isInfinite)}"

      // (statsPerTimestep's decimal total is OUT of this domain: under
      // the session's ANSI default a NaN/Inf cell errors like any ANSI
      // double→decimal Cast — the ordering ops below carry the global
      // min/max instead)
      // global arg-extremes: NaN greatest, ties to the lowest flat index
      def bestIx(c: Seq[Double], isMax: Boolean): Int =
        c.indices.reduceLeft { (b, i) =>
          val cmp = ord.compare(c(i), c(b))
          if ((isMax && cmp > 0) || (!isMax && cmp < 0)) i else b
        }
      val amx = arr.argmaxNd().head
      val mxIx = bestIx(cells, isMax = true)
      assert(bits(amx.getDouble(1)) == bits(cells(mxIx)), s"$tag argmax val")
      (0 until rank).foreach { k =>
        assert(amx.getLong(2 + k) == (mxIx / st(k)) % shape(k), s"$tag argmax i$k")
      }
      val amn = arr.argminNd().head
      val mnIx = bestIx(cells, isMax = false)
      assert(bits(amn.getDouble(1)) == bits(cells(mnIx)), s"$tag argmin val")
      (0 until rank).foreach { k =>
        assert(amn.getLong(2 + k) == (mnIx / st(k)) % shape(k), s"$tag argmin i$k")
      }

      // axis extremes + axis arg-extremes against the dense lines
      if (rank >= 2) for (axis <- 0 until rank) {
        val linesD: Seq[(Seq[Int], Seq[Double])] = {
          val rem = shape.indices.filterNot(_ == axis)
          cartesian(rem.map(shape)).map { rix =>
            val full = Array.fill(rank)(0)
            rem.zip(rix).foreach { case (d2, i) => full(d2) = i }
            val line = (0 until shape(axis)).map { i => full(axis) = i; at(full.toSeq) }
            (rix, line)
          }
        }
        val maxs = rowsMap(arr.axisMax(axis))
        val mins = rowsMap(arr.axisMin(axis))
        val amaxs = arr.axisArgmax(axis).rowsNd.collect().map { r =>
          val len = r.length
          ((1 until len - 1).map(r.getLong): Seq[Long]) -> r.getLong(len - 1)
        }.toMap
        for ((rix, line) <- linesD) {
          val k = ixKey(rix)
          assert(bits(maxs(k)) == bits(line.max(ord)), s"$tag axisMax($axis) at $rix")
          assert(bits(mins(k)) == bits(line.min(ord)), s"$tag axisMin($axis) at $rix")
          assert(amaxs(k) == bestIx(line, isMax = true).toLong,
            s"$tag axisArgmax($axis) at $rix")
        }
      }

      // re-addressing moves every bit pattern intact
      val axis = rnd.nextInt(rank)
      val size = shape(axis)
      val fmap = rowsMap(arr.flip(axis))
      val shift = rnd.between(-size, size + 1)
      val rolled = rowsMap(arr.roll(axis, shift))
      val newShape = shape.map { s =>
        val divisors = (1 to s).filter(s % _ == 0)
        divisors(rnd.nextInt(divisors.length))
      }
      val rmap = rowsMap(arr.rechunk(newShape))
      val total = shape.product
      val flatDivs = (1 to total).filter(total % _ == 0)
      val fchunk = flatDivs(rnd.nextInt(flatDivs.length))
      val remap = rowsMap(arr.reshape(Seq(total), Seq(fchunk)))
      for (ix <- cartesian(shape)) {
        assert(bits(fmap(ixKey(ix))) == bits(at(ix.updated(axis, size - 1 - ix(axis)))),
          s"$tag flip at $ix")
        val rsrc = ix.updated(axis, (((ix(axis) - shift) % size) + size) % size)
        assert(bits(rolled(ixKey(ix))) == bits(at(rsrc)), s"$tag roll at $ix")
        assert(bits(rmap(ixKey(ix))) == bits(at(ix)), s"$tag rechunk at $ix")
        val flat = ix.zip(st).map { case (i, s) => i * s }.sum
        assert(bits(remap(Seq(flat.toLong))) == bits(at(ix)), s"$tag reshape at $ix")
      }
      if (rank >= 2) {
        val perm = rnd.shuffle((0 until rank).toList)
        val tmap = rowsMap(arr.transpose(perm))
        for (ix <- cartesian(shape))
          assert(bits(tmap(ixKey(perm.map(ix)))) == bits(at(ix)), s"$tag transpose at $ix")
      }

      // truthiness: NaN and ±Inf are nonzero, hence truthy
      val trow = arr.truthPerTimestep.head
      val nz = cells.count(v => bits(v) != bits(0.0) && bits(v) != bits(-0.0))
      assert(trow.getLong(1) == (if (nz > 0) 1L else 0L), s"$tag any")
      assert(trow.getLong(2) == (if (nz == cells.length) 1L else 0L), s"$tag all")
    }
  }

  test("arbitrary-axis-list tensordot matches the exact dense model") {
    // The full axes=(axesA, axesB) form across random ranks, random
    // (possibly non-contiguous, non-sorted) axis lists and random
    // chunkings — the transpose-then-SUMMA composition has to get the
    // pair ORDER right (axesA(i) contracts with axesB(i)), which no
    // fixed fixture pins as hard as shuffled axis draws. Products of
    // 2-decimal cells are exactly 4-decimal, the engine folds them in
    // decimal(38,4), so every comparison is `==`.
    val rnd = new scala.util.Random(99315L)
    for (caseNo <- 0 until 8) {
      val k = 1 + rnd.nextInt(2)
      val rankA = k + rnd.nextInt(4 - k)
      val rankB = k + rnd.nextInt(4 - k)
      val axesA = rnd.shuffle((0 until rankA).toList).take(k)
      val axesB = rnd.shuffle((0 until rankB).toList).take(k)
      // contracted pair i shares BOTH chunk grid and chunk shape
      val pairCpd = Seq.fill(k)(1 + rnd.nextInt(3))
      val pairCs = Seq.fill(k)(1 + rnd.nextInt(3))
      def operand(rank: Int, axes: Seq[Int]): (Dense, Seq[Int]) = {
        val cpd = Array.fill(rank)(0)
        val cs = Array.fill(rank)(0)
        axes.zipWithIndex.foreach { case (ax, i) =>
          cpd(ax) = pairCpd(i); cs(ax) = pairCs(i)
        }
        for (d <- 0 until rank if cpd(d) == 0) {
          cpd(d) = 1 + rnd.nextInt(3); cs(d) = 1 + rnd.nextInt(3)
        }
        val shape = cpd.zip(cs).map { case (a, b) => a * b }.toSeq
        (Dense(shape, Vector.fill(shape.product)(
          BigDecimal(rnd.between(-9999, 10000), 2))), cpd.toSeq)
      }
      val (da, cpdA) = operand(rankA, axesA)
      val (db, cpdB) = operand(rankB, axesB)
      val res = rowsMap(chunked(da, cpdA).tensordot(chunked(db, cpdB), axesA, axesB))
      val keepA = (0 until rankA).filterNot(axesA.contains)
      val keepB = (0 until rankB).filterNot(axesB.contains)
      val pairShape = axesA.map(da.shape)
      val tag = s"case $caseNo ranks=($rankA,$rankB) axes=($axesA,$axesB) " +
        s"shapes=(${da.shape},${db.shape}) cpd=($cpdA,$cpdB)"
      val expected = cartesian(keepA.map(da.shape)).flatMap { ia =>
        cartesian(keepB.map(db.shape)).map { ib =>
          val exp = cartesian(pairShape).map { kx =>
            val fullA = Array.fill(rankA)(0)
            keepA.zip(ia).foreach { case (d, i) => fullA(d) = i }
            axesA.zipWithIndex.foreach { case (ax, i) => fullA(ax) = kx(i) }
            val fullB = Array.fill(rankB)(0)
            keepB.zip(ib).foreach { case (d, i) => fullB(d) = i }
            axesB.zipWithIndex.foreach { case (ax, i) => fullB(ax) = kx(i) }
            da.at(fullA.toSeq) * db.at(fullB.toSeq)
          }.sum
          ixKey(ia ++ ib) -> exp.toDouble
        }
      }.toMap
      assert(res.keySet == expected.keySet, s"$tag output index set")
      expected.foreach { case (ix, v) =>
        assert(res(ix) == v, s"$tag at $ix")
      }
    }
  }

  test("diagonal / outer / batched tensordot match the exact dense model") {
    val rnd = new scala.util.Random(48217L)
    // diagonal: random rank 2-3, random matched axis pair (the two axes
    // forced to chunk identically — the operator's contract)
    for (caseNo <- 0 until 6) {
      val rank = 2 + rnd.nextInt(2)
      val pair = rnd.shuffle((0 until rank).toList).take(2).sorted
      val (a1, a2) = (pair(0), pair(1))
      val cpd = Array.fill(rank)(1 + rnd.nextInt(3))
      val cs = Array.fill(rank)(1 + rnd.nextInt(3))
      cpd(a2) = cpd(a1); cs(a2) = cs(a1)
      val shape = cpd.zip(cs).map { case (a, b) => a * b }.toSeq
      val d = Dense(shape, Vector.fill(shape.product)(
        BigDecimal(rnd.between(-9999, 10000), 2)))
      val res = rowsMap(chunked(d, cpd.toSeq).diagonal(a1, a2))
      val others = (0 until rank).filterNot(x => x == a1 || x == a2)
      val expected = cartesian(others.map(shape) :+ shape(a1)).map { ix =>
        val full = Array.fill(rank)(0)
        others.zipWithIndex.foreach { case (d0, i) => full(d0) = ix(i) }
        full(a1) = ix.last; full(a2) = ix.last
        ixKey(ix) -> d.at(full.toSeq).toDouble
      }.toMap
      assert(res == expected,
        s"diag case $caseNo rank=$rank axes=($a1,$a2) shape=$shape cpd=${cpd.toSeq}")
    }
    // outer (tensordot axes=0): random rank 1-2 × rank 1-2
    for (caseNo <- 0 until 5) {
      val (da, cpdA) = randomCase(rnd, 1 + rnd.nextInt(2))
      val (db, cpdB) = randomCase(rnd, 1 + rnd.nextInt(2))
      val res = rowsMap(chunked(da, cpdA).tensordot(chunked(db, cpdB), 0))
      val expected = cartesian(da.shape).flatMap { ia =>
        cartesian(db.shape).map { ib =>
          ixKey(ia ++ ib) -> (da.at(ia) * db.at(ib)).toDouble
        }
      }.toMap
      assert(res == expected,
        s"outer case $caseNo shapes=(${da.shape}, ${db.shape}) cpd=($cpdA, $cpdB)")
    }
    // batched tensordot: shared leading batch dim + k contracted dims,
    // random lead/trail extents and chunkings
    for (caseNo <- 0 until 6) {
      val k = 1 + rnd.nextInt(2)
      val nLead = rnd.nextInt(2)
      val nTrail = rnd.nextInt(2)
      val bCpd = 1 + rnd.nextInt(3)
      val bCs = 1 + rnd.nextInt(3)
      val pairCpd = Seq.fill(k)(1 + rnd.nextInt(3))
      val pairCs = Seq.fill(k)(1 + rnd.nextInt(3))
      def operand(nFree: Int, contractFirst: Boolean): (Dense, Seq[Int]) = {
        val freeCpd = Seq.fill(nFree)(1 + rnd.nextInt(3))
        val freeCs = Seq.fill(nFree)(1 + rnd.nextInt(3))
        val cpd = Seq(bCpd) ++ (if (contractFirst) pairCpd ++ freeCpd
          else freeCpd ++ pairCpd)
        val cs = Seq(bCs) ++ (if (contractFirst) pairCs ++ freeCs
          else freeCs ++ pairCs)
        val shape = cpd.zip(cs).map { case (a, b) => a * b }
        (Dense(shape, Vector.fill(shape.product)(
          BigDecimal(rnd.between(-9999, 10000), 2))), cpd)
      }
      val (da, cpdA) = operand(nLead, contractFirst = false)
      val (db, cpdB) = operand(nTrail, contractFirst = true)
      val res = rowsMap(
        chunked(da, cpdA).tensordotBatched(chunked(db, cpdB), 1, k))
      val leadShape = da.shape.slice(1, 1 + nLead)
      val kShape = da.shape.takeRight(k)
      val trailShape = db.shape.drop(1 + k)
      val tag = s"batched case $caseNo k=$k lead=$nLead trail=$nTrail " +
        s"shapes=(${da.shape}, ${db.shape})"
      val expected = (for {
        b <- 0 until da.shape.head
        ia <- cartesian(leadShape)
        ib <- cartesian(trailShape)
      } yield {
        val exp = cartesian(kShape).map { kx =>
          da.at(b +: (ia ++ kx)) * db.at(b +: (kx ++ ib))
        }.sum
        ixKey(b +: (ia ++ ib)) -> exp.toDouble
      }).toMap
      assert(res.keySet == expected.keySet, s"$tag index set")
      expected.foreach { case (ix, v) => assert(res(ix) == v, s"$tag at $ix") }
    }
  }

  test("nanStats matches the exact dense model under a random mask") {
    val rnd = new scala.util.Random(55511L)
    for (caseNo <- 0 until 6) {
      val rank = 1 + rnd.nextInt(3)
      val (d, cpd) = randomCase(rnd, rank)
      val thr = BigDecimal(rnd.between(-5000, 5000), 2)
      val arr = chunked(d, cpd).where(_ > lit(thr.toDouble), lit(null))
      val kept = d.cells.filter(_ > thr)
      val r = arr.nanStatsPerTimestep.collect().head
      assert(r.getLong(1) == kept.size, s"case $caseNo n_valid")
      assert(r.getDouble(2) == kept.sum.toDouble, s"case $caseNo nansum")
      if (kept.isEmpty) {
        assert(r.getDouble(2) == 0.0 && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
          s"case $caseNo all-missing convention")
      } else {
        assert(r.getDouble(3) == kept.min.toDouble, s"case $caseNo nanmin")
        assert(r.getDouble(4) == kept.max.toDouble, s"case $caseNo nanmax")
        assert(r.getDouble(5) == kept.sum.toDouble / kept.size.toDouble,
          s"case $caseNo nanmean")
      }
    }
  }

  test("searchsorted / norms / valid convolution match the exact dense model on random 1-d arrays") {
    val rnd = new scala.util.Random(20260816L)
    for (caseNo <- 0 until 6) {
      val (d, cpd) = randomCase(rnd, 1)
      val arr = chunked(d, cpd)
      val n = d.shape.head
      val tag = s"case $caseNo n=$n cpd=$cpd"

      // searchsorted(side='left'): insertion index = count strictly below
      val thr = Seq(-101.0, -0.005, 0.0, 33.17, 12000.0)
      val got = arr.searchSortedPerTimestep(thr).collect()
        .map(r => r.getDouble(1) -> r.getLong(2)).toMap
      assert(got.keySet == thr.toSet, s"$tag searchsorted thresholds")
      thr.foreach { t =>
        assert(got(t) == d.cells.count(_.toDouble < t), s"$tag searchsorted at $t")
      }

      // norms: exact decimal L1/sumsq, the one double sqrt in the same
      // operand order; L∞ an order-free max
      val row = arr.normsPerTimestep().collect().head
      assert(row.getDouble(1) == d.cells.map(_.abs).sum.toDouble, s"$tag l1")
      assert(row.getDouble(2) ==
        math.sqrt(d.cells.map(c => c * c).sum.toDouble), s"$tag l2")
      assert(row.getDouble(3) == d.cells.map(_.abs).max.toDouble, s"$tag linf")

      // valid-mode FIR: exact scaled integers end to end; numpy
      // convolve FLIPS the kernel (y[i] = Σ_j k[m−1−j]·x[i+j]) — the
      // n=2 truncation (25,50) is non-palindromic, so the model must
      // flip too (ADVICE r19 #4)
      val taps = Seq(25L, 50L, 25L).take(math.min(3, n))
      val xq = d.cells.map(c => (c * 100).toBigIntExact.get.toLong)
      val ys = arr.convolveValidRows(taps).collect()
        .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(ys.size == n - taps.length + 1, s"$tag conv count")
      for (i <- 0 to n - taps.length) {
        val yq = taps.reverse.zipWithIndex.map { case (t, j) => t * xq(i + j) }.sum
        assert(ys(i.toLong) == ((yq, yq.toDouble / 10000.0)), s"$tag conv at $i")
      }
    }
  }
}
