package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.arrays.{ArrayGeometry, ChunkedArray, Eigen}

/** Specs for the distributed linear-algebra faces (gram / svd) and
  * coarsen block-downsampling — VERDICT r15 next-round items 1 and 4. */
class ArrayLinalgSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** 4x4 2-d array as 2x2 chunks of 2x2; value(i,j) = 10*i + j at t=0. */
  def twoD: ChunkedArray = {
    val chunks = for (cr <- 0 to 1; cc <- 0 to 1) yield {
      val data = for (i <- 0 to 1; j <- 0 to 1)
        yield 10.0 * (2 * cr + i) + (2 * cc + j)
      (0L, Seq(cr, cc), data)
    }
    ChunkedArray(chunks.toDF("timestep", "pos", "data"), ArrayGeometry(Seq(2, 2), Seq(2, 2)))
  }

  def oneD: ChunkedArray = {
    val rows = Seq(
      (0L, Seq(0), Seq(1.0, 2.0, 3.0, 4.0)),
      (0L, Seq(1), Seq(5.0, 6.0, 7.0, 8.0)),
      (1L, Seq(0), Seq(2.0, 4.0, 6.0, 8.0)),
      (1L, Seq(1), Seq(10.0, 12.0, 14.0, 16.0)))
    ChunkedArray(rows.toDF("timestep", "pos", "data"), ArrayGeometry(Seq(2), Seq(4)))
  }

  private def cells2d(a: ChunkedArray): Map[(Long, Long, Long), Double] =
    a.rows2d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap

  // ---- coarsen ----

  test("coarsen sum: 2x2 blocks fold chunk-locally to the 2x2 thumbnail") {
    val c = cells2d(twoD.coarsen(Seq(2, 2), "sum"))
    assert(c == Map(
      (0L, 0L, 0L) -> 22.0, (0L, 0L, 1L) -> 30.0,
      (0L, 1L, 0L) -> 102.0, (0L, 1L, 1L) -> 110.0))
  }

  test("coarsen mean/max/min over the same blocks") {
    val m = cells2d(twoD.coarsen(Seq(2, 2), "mean"))
    assert(m((0L, 0L, 0L)) == 5.5 && m((0L, 1L, 1L)) == 27.5)
    val mx = cells2d(twoD.coarsen(Seq(2, 2), "max"))
    assert(mx((0L, 0L, 0L)) == 11.0 && mx((0L, 1L, 0L)) == 31.0)
    val mn = cells2d(twoD.coarsen(Seq(2, 2), "min"))
    assert(mn((0L, 0L, 0L)) == 0.0 && mn((0L, 1L, 1L)) == 22.0)
  }

  test("coarsen preserves the global sum (block partition of the cells)") {
    val m = oneD.coarsen(Seq(2)).sumPerTimestep().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m == Map(0L -> 36.0, 1L -> 72.0))
  }

  test("coarsen factor wider than the chunk rechunks, then folds") {
    // factor 8 on chunks of 4: one aligning rechunk, then a single block
    val rows = oneD.coarsen(Seq(8)).rowsNd.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows == Map((0L, 0L) -> 36.0, (1L, 0L) -> 72.0))
  }

  test("coarsen trim_excess drops the ragged tail (dask semantics)") {
    // 8 cells, factor 3: keep cells [0, 6), blocks of 3
    val rows = oneD.coarsen(Seq(3), "sum", trimExcess = true).rowsNd.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows == Map(
      (0L, 0L) -> 6.0, (0L, 1L) -> 15.0,
      (1L, 0L) -> 12.0, (1L, 1L) -> 30.0))
  }

  test("coarsen without trimExcess refuses non-tiling factors") {
    assertThrows[IllegalArgumentException](oneD.coarsen(Seq(3)))
  }

  // ---- gram ----

  /** Rank-2 single-chunk array per timestep from explicit row-major data. */
  private def mat(ts: Seq[(Long, Seq[Double])], rows: Int, cols: Int): ChunkedArray =
    ChunkedArray(
      ts.map { case (t, d) => (t, Seq(0, 0), d) }.toDF("timestep", "pos", "data"),
      ArrayGeometry(Seq(1, 1), Seq(rows, cols)))

  test("gramRows matches the hand-computed AᵀA on the chunked 4x4") {
    val g = twoD.gramRows().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val a = Array.tabulate(4, 4)((i, j) => 10.0 * i + j)
    for (i <- 0 until 4; j <- 0 until 4) {
      val want = (0 until 4).map(r => a(r)(i) * a(r)(j)).sum
      assert(g((i.toLong, j.toLong)) == want, s"G[$i][$j]")
    }
  }

  test("gramRows sums across timesteps (stacked tall matrix)") {
    // t0 rows [[1,0],[0,2]], t1 rows [[2,0],[0,1]] -> G = diag(5, 5)
    val a = mat(Seq(0L -> Seq(1.0, 0.0, 0.0, 2.0), 1L -> Seq(2.0, 0.0, 0.0, 1.0)), 2, 2)
    val g = a.gramRows().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(g == Map((0L, 0L) -> 5.0, (0L, 1L) -> 0.0, (1L, 0L) -> 0.0, (1L, 1L) -> 5.0))
  }

  // ---- eigensolve / singular values ----

  test("sigma_i^2 equal the Gram eigenvalues on a known factorization") {
    // A = [[3,4],[0,0]]: G = [[9,12],[12,16]], eig {25, 0}, sigma {5, 0}
    val a = mat(Seq(0L -> Seq(3.0, 4.0, 0.0, 0.0)), 2, 2)
    val g = Array.ofDim[Double](2, 2)
    a.gramRows().collect().foreach(r =>
      g(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2))
    assert(g(0)(0) == 9.0 && g(0)(1) == 12.0 && g(1)(0) == 12.0 && g(1)(1) == 16.0)
    val eig = Eigen.symEigenvalues(g)
    // the null eigenvalue lands at rotation round-off (~1e-15 * ||G||);
    // its sqrt amplifies to ~1e-7 — tolerances are scale-relative
    assert(math.abs(eig(0) - 25.0) < 1e-12 * 25.0 && math.abs(eig(1)) < 1e-13 * 25.0)
    val sv = Eigen.singularValuesFromGram(g)
    assert(math.abs(sv(0) - 5.0) < 1e-12 * 5.0 && math.abs(sv(1)) < 1e-6 * 5.0)
  }

  test("Jacobi eigenvalues: trace and Frobenius identities, descending order") {
    // deterministic symmetric 8x8 (no RNG in specs feeding literals)
    val n = 8
    val m = Array.tabulate(n, n)((i, j) =>
      math.sin(i * 7 + j * 3 + 1.0) + math.sin(j * 7 + i * 3 + 1.0) +
        (if (i == j) n.toDouble else 0.0))
    val eig = Eigen.symEigenvalues(m)
    assert(eig.sliding(2).forall(p => p(0) >= p(1)), "descending")
    val trace = (0 until n).map(i => m(i)(i)).sum
    val fro2 = m.flatten.map(x => x * x).sum
    assert(math.abs(eig.sum - trace) < 1e-9 * math.abs(trace))
    assert(math.abs(eig.map(x => x * x).sum - fro2) < 1e-9 * fro2)
  }

  test("Jacobi is exact on an already-diagonal matrix") {
    val m = Array.tabulate(4, 4)((i, j) => if (i == j) (4 - i).toDouble else 0.0)
    assert(Eigen.symEigenvalues(m) == IndexedSeq(4.0, 3.0, 2.0, 1.0))
  }

  test("symEigen vectors: A v = lambda v, orthonormal, value-aligned") {
    val n = 6
    val m = Array.tabulate(n, n)((i, j) =>
      1.0 / (i + j + 1) + (if (i == j) 2.0 else 0.0))
    val (vals, vecs) = Eigen.symEigen(m)
    assert(vals == Eigen.symEigenvalues(m), "values must match the value-only face")
    for (k <- 0 until n) {
      val v = vecs(k)
      // residual ||A v - lambda v||
      val res = (0 until n).map { r =>
        val av = (0 until n).map(c => m(r)(c) * v(c)).sum
        math.pow(av - vals(k) * v(r), 2)
      }.sum
      assert(math.sqrt(res) < 1e-9, s"eigenpair $k residual")
      // normal, and orthogonal to the others
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12)
      for (k2 <- k + 1 until n)
        assert(math.abs(v.zip(vecs(k2)).map { case (a, b) => a * b }.sum) < 1e-9)
    }
  }

  test("PCA projection of a known factorization recovers sigma") {
    // A = [[3,4],[0,0]]: top eigenvector of G is (0.6, 0.8) up to sign;
    // row 0 projects to +-5 (= sigma_1), row 1 to 0
    val g = Array(Array(9.0, 12.0), Array(12.0, 16.0))
    val (vals, vecs) = Eigen.symEigen(g)
    assert(math.abs(vals(0) - 25.0) < 1e-12 * 25.0)
    val v = vecs(0)
    val proj0 = 3.0 * v(0) + 4.0 * v(1)
    assert(math.abs(math.abs(proj0) - 5.0) < 1e-9)
  }

  test("Jacobi is deterministic: identical input bits, identical output bits") {
    val n = 6
    def m = Array.tabulate(n, n)((i, j) => 1.0 / (i + j + 1)) // Hilbert
    val a = Eigen.symEigenvalues(m)
    val b = Eigen.symEigenvalues(m)
    assert(a.zip(b).forall { case (x, y) =>
      java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y)
    })
  }

  // ---- Cholesky (the QR R factor) ----

  test("cholUpper on a known factorization: G = [[4,2],[2,2]] -> R = [[2,1],[0,1]]") {
    val r = Eigen.cholUpper(Array(Array(4.0, 2.0), Array(2.0, 2.0)))
    assert(r == IndexedSeq(IndexedSeq(2.0, 1.0), IndexedSeq(0.0, 1.0)))
  }

  test("cholUpper: RᵀR reconstructs the Gram, upper structure, positive diagonal") {
    val n = 6
    // SPD by construction: diagonally dominant deterministic symmetric
    val g = Array.tabulate(n, n)((i, j) =>
      1.0 / (i + j + 1) + (if (i == j) 2.0 else 0.0))
    val r = Eigen.cholUpper(g)
    for (i <- 0 until n) {
      assert(r(i)(i) > 0.0, s"diag $i")
      for (j <- 0 until i) assert(r(i)(j) == 0.0, s"below-diag ($i,$j)")
    }
    for (i <- 0 until n; j <- 0 until n) {
      val got = (0 until n).map(k => r(k)(i) * r(k)(j)).sum
      assert(math.abs(got - g(i)(j)) < 1e-12 * 3.0, s"RᵀR ($i,$j)")
    }
    // deterministic bit-for-bit
    val r2 = Eigen.cholUpper(g)
    for (i <- 0 until n; j <- 0 until n)
      assert(java.lang.Double.doubleToRawLongBits(r(i)(j)) ==
        java.lang.Double.doubleToRawLongBits(r2(i)(j)))
  }

  test("cholUpper zeroes the row of a degenerate (rank-deficient) column") {
    // G of A = [[3,4],[0,0]]: rank 1 — the second pivot vanishes
    val r = Eigen.cholUpper(Array(Array(9.0, 12.0), Array(12.0, 16.0)))
    assert(r(0)(0) == 3.0 && r(0)(1) == 4.0 && r(1)(0) == 0.0)
    assert(r(1)(1) == 0.0, "degenerate pivot zeroes, never NaNs")
  }

  // ---- corrcoef query (moment identities on the real fixture) ----

  test("arr_corrcoef: symmetric, unit diagonal, bounded, matches a direct compute") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.ArrayQueries.arrCorrcoef(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(got.size == 64)
    for (((i, j), v) <- got if !v.isNaN) {
      assert(math.abs(v) <= 1.0 + 1e-12, s"|corr($i,$j)| <= 1")
      // exact symmetry: operand-symmetric formula -> identical bits
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(got((j, i))), s"sym ($i,$j)")
      if (i == j) assert(math.abs(v - 1.0) < 1e-12, s"diag $i")
    }
    // independent dense reference from the flattened cells
    val cells = graft.operators.ArrayQueries.eventsArray2dCached(spark, dir)
      .rows2d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ts = cells.map(_._1).distinct
    val cols = Array.fill(8)(scala.collection.mutable.ArrayBuffer.empty[Double])
    for (t <- ts.sorted; u <- 0 until 8) {
      val row = Array.fill(8)(0.0)
      cells.filter(c => c._1 == t && c._2 == u).foreach(c => row(c._3.toInt) = c._4)
      for (h <- 0 until 8) cols(h) += row(h)
    }
    def pearson(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.length.toDouble
      val (sx, sy) = (x.sum, y.sum)
      val sxy = x.zip(y).map { case (a, b) => a * b }.sum
      val sxx = x.map(a => a * a).sum
      val syy = y.map(a => a * a).sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    for (i <- 0 until 8; j <- 0 until 8 if !got((i.toLong, j.toLong)).isNaN)
      assert(math.abs(got((i.toLong, j.toLong)) -
        pearson(cols(i).toSeq, cols(j).toSeq)) < 1e-9, s"ref ($i,$j)")
  }

  test("arr_svd_modes: A·v_k = sigma_k·u_k identity, U columns orthonormal") {
    val dir = "/root/testdata/sf0.001"
    val sig = graft.operators.ArrayQueries.arrSvdVals(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pc = graft.operators.ArrayQueries.arrPcaProject(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    val u = graft.operators.ArrayQueries.arrSvdModes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(u.nonEmpty && u.keySet == pc.keySet)
    // the defining identity: the pca fold IS A·v_k, the modes fold is
    // A·(v_k/sigma_k) — they must agree up to fold-order noise
    for ((key, (pc0, pc1)) <- pc) {
      val (u0, u1) = u(key)
      assert(math.abs(pc0 - sig(0L) * u0) <= 1e-9 * math.max(1.0, math.abs(pc0)),
        s"mode 0 identity at $key: $pc0 vs ${sig(0L) * u0}")
      assert(math.abs(pc1 - sig(1L) * u1) <= 1e-9 * math.max(1.0, math.abs(pc1)),
        s"mode 1 identity at $key: $pc1 vs ${sig(1L) * u1}")
    }
    // U columns are orthonormal: sum u_k^2 = 1, sum u_0·u_1 = 0
    val n00 = u.values.map(t => t._1 * t._1).sum
    val n11 = u.values.map(t => t._2 * t._2).sum
    val n01 = u.values.map(t => t._1 * t._2).sum
    assert(math.abs(n00 - 1.0) < 1e-6, s"|u0|^2 = $n00")
    assert(math.abs(n11 - 1.0) < 1e-6, s"|u1|^2 = $n11")
    assert(math.abs(n01) < 1e-6, s"<u0,u1> = $n01")
  }

  test("arr_cov: symmetric, diagonal = sample variance (ddof=1), matches a direct compute") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.ArrayQueries.arrCov(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == 64)
    // exact symmetry: the formula is operand-symmetric in (i, j)
    for (((i, j), v) <- got)
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(got((j, i))), s"sym ($i,$j)")
    // independent dense reference from the flattened cells
    val cells = graft.operators.ArrayQueries.eventsArray2dCached(spark, dir)
      .rows2d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ts = cells.map(_._1).distinct
    val cols = Array.fill(8)(scala.collection.mutable.ArrayBuffer.empty[Double])
    for (t <- ts.sorted; u <- 0 until 8) {
      val row = Array.fill(8)(0.0)
      cells.filter(c => c._1 == t && c._2 == u).foreach(c => row(c._3.toInt) = c._4)
      for (h <- 0 until 8) cols(h) += row(h)
    }
    // numpy's default ddof=1 (sample covariance) — the contract arr_cov ships
    def cov(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.length.toDouble
      (n * x.zip(y).map { case (a, b) => a * b }.sum - x.sum * y.sum) / (n * (n - 1.0))
    }
    for (i <- 0 until 8; j <- 0 until 8) {
      val want = cov(cols(i).toSeq, cols(j).toSeq)
      val tol = 1e-9 * math.max(1.0, math.abs(want))
      assert(math.abs(got((i.toLong, j.toLong)) - want) < tol, s"ref ($i,$j)")
    }
    // diagonal = sample variance (non-negative)
    for (i <- 0 until 8) assert(got((i.toLong, i.toLong)) >= -1e-9, s"var $i")
  }

  test("arr_qr_r: R reconstructs the Gram and matches the svd spectrum scale") {
    val dir = "/root/testdata/sf0.001"
    val rRows = graft.operators.ArrayQueries.arrQrR(spark, dir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    assert(rRows.size == 36, "upper triangle of 8x8")
    val g = Array.ofDim[Double](8, 8)
    graft.operators.ArrayQueries.arrGram(spark, dir).collect().foreach(r =>
      g(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2))
    def rAt(i: Int, j: Int): Double = if (i <= j) rRows((i, j)) else 0.0
    val fro = math.sqrt(g.flatten.map(x => x * x).sum)
    for (i <- 0 until 8; j <- 0 until 8) {
      val got = (0 until 8).map(k => rAt(k, i) * rAt(k, j)).sum
      assert(math.abs(got - g(i)(j)) < 1e-12 * fro, s"RᵀR ($i,$j)")
    }
    for (i <- 0 until 8) assert(rAt(i, i) >= 0.0, s"diag sign $i")
  }

  test("cholSolve on a known system and on a rank-deficient one") {
    val g = Array(Array(4.0, 2.0), Array(2.0, 2.0))
    val x = Eigen.cholSolve(g, Array(10.0, 8.0))
    assert(x == IndexedSeq(1.0, 3.0)) // exact: every pivot is exact
    // duplicate column: the degenerate component is zeroed, the rest
    // still satisfies its equation
    val d = Array(Array(1.0, 1.0), Array(1.0, 1.0))
    val xd = Eigen.cholSolve(d, Array(3.0, 3.0))
    assert(xd == IndexedSeq(3.0, 0.0))
  }

  test("arr_lstsq: matches an independent Gaussian-elimination fit") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.ArrayQueries.arrLstsq(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.size == 10, "7 slopes + intercept + rss + r2")
    // dense reference: collect the stacked rows, build the normal
    // system independently, solve by Gaussian elimination w/ pivoting
    val cells = graft.operators.ArrayQueries.eventsArray2dCached(spark, dir)
      .rows2d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val rows = cells.groupBy(c => (c._1, c._2)).values.toSeq.map { cs =>
      val v = Array.fill(8)(0.0)
      cs.foreach(c => v(c._3.toInt) = c._4)
      v
    }
    val m = Array.ofDim[Double](8, 8)
    val v = Array.fill(8)(0.0)
    for (r <- rows) {
      val x = r.take(7) :+ 1.0
      for (a <- 0 until 8; b <- 0 until 8) m(a)(b) += x(a) * x(b)
      for (a <- 0 until 8) v(a) += x(a) * r(7)
    }
    // Gaussian elimination with partial pivoting (independent path)
    val aug = m.zip(v).map { case (row, rhs) => row :+ rhs }
    for (c <- 0 until 8) {
      val piv = (c until 8).maxBy(r => math.abs(aug(r)(c)))
      val t = aug(c); aug(c) = aug(piv); aug(piv) = t
      for (r <- 0 until 8 if r != c && aug(c)(c) != 0.0) {
        val f = aug(r)(c) / aug(c)(c)
        for (k <- c to 8) aug(r)(k) -= f * aug(c)(k)
      }
    }
    val ref = (0 until 8).map(i => aug(i)(8) / aug(i)(i))
    val scale = ref.map(math.abs).max
    for (j <- 0 until 7)
      assert(math.abs(got(s"x$j") - ref(j)) < 1e-6 * scale, s"beta x$j")
    assert(math.abs(got("intercept") - ref(7)) < 1e-6 * scale)
    // rss against the direct residual sum from the reference fit
    val rssRef = rows.map { r =>
      val pred = (0 until 7).map(j => ref(j) * r(j)).sum + ref(7)
      val e = r(7) - pred; e * e
    }.sum
    assert(math.abs(got("rss") - rssRef) < 1e-6 * math.max(rssRef, 1.0))
    assert(got("r2") <= 1.0 + 1e-12)
  }

  test("arr_lstsq_resid: per-timestep SSE sums to rss within quantization") {
    val dir = "/root/testdata/sf0.001"
    val fit = graft.operators.ArrayQueries.arrLstsq(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val resid = graft.operators.ArrayQueries.arrLstsqResid(spark, dir).collect()
    val nCells = resid.map(_.getLong(1)).sum
    val total = resid.map(_.getDouble(3)).sum
    // each quantized square under-counts by < 1e-6; rss is the exact-
    // moment spelling, so allow the quantization band plus float slack
    assert(math.abs(total - fit("rss")) <=
      nCells * 1e-6 + 1e-6 * math.max(fit("rss"), 1.0),
      s"sum sse $total vs rss ${fit("rss")} over $nCells cells")
    // sse_q is exactly floor-sum consistent with the emitted double
    resid.foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / 1e6)
    }
  }
}
