package graft.arrays

/** Deterministic driver-side symmetric eigensolver for the tiny k x k
  * artifacts the distributed passes produce (the Gram matrix of
  * [[ChunkedArray.gramRows]]; k = a column count, never data-scale).
  * Cyclic Jacobi with a FIXED sweep order and a fixed convergence
  * threshold: given identical input doubles it performs the identical
  * rotation sequence, so the eigenvalues are bit-reproducible across
  * runs — the property the trained-literal oracle posture needs
  * (SURVEY §5; same discipline as Similarity's k-means fits).
  *
  * Classic cyclic Jacobi (Golub & Van Loan §8.5): each sweep visits
  * (p, q) in row-major order and zeroes a(p)(q) with a Givens rotation;
  * off-diagonal mass falls quadratically, ~8 sweeps suffice at k <= 64.
  */
object Eigen {

  /** Eigenvalues of symmetric `a0`, descending. `a0` is not mutated. */
  def symEigenvalues(a0: Array[Array[Double]]): IndexedSeq[Double] =
    symEigen(a0)._1

  /** Eigen-decomposition of symmetric `a0`: (eigenvalues descending,
    * eigenvectors as ROWS in the matching order). The rotation sequence
    * is the same fixed cyclic sweep as [[symEigenvalues]], with the
    * vector matrix accumulated column-wise per rotation — deterministic
    * bit-for-bit, like the values. Ties in the descending sort keep the
    * pre-sort (diagonal-index) order. */
  def symEigen(a0: Array[Array[Double]]): (IndexedSeq[Double], IndexedSeq[IndexedSeq[Double]]) = {
    val n = a0.length
    require(n > 0 && a0.forall(_.length == n), "matrix must be square")
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    // scale for the absolute convergence floor: Frobenius norm
    val fro = math.sqrt(a.map(_.map(x => x * x).sum).sum)
    val eps = 1e-14 * math.max(fro, 1e-300)
    def off(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) { var q = p + 1; while (q < n) { s += math.abs(a(p)(q)); q += 1 }; p += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > eps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > eps / (n.toLong * n)) {
            // rotation angle: t = tan(theta), the smaller root (|t|<=1)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val tau = s / (1.0 + c)
            val app = a(p)(p)
            val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0
            a(q)(p) = 0.0
            var k = 0
            while (k < n) {
              if (k != p && k != q) {
                val akp = a(k)(p)
                val akq = a(k)(q)
                a(k)(p) = akp - s * (akq + tau * akp)
                a(p)(k) = a(k)(p)
                a(k)(q) = akq + s * (akp - tau * akq)
                a(q)(k) = a(k)(q)
              }
              // accumulate the rotation into the eigenvector columns
              val vkp = v(k)(p)
              val vkq = v(k)(q)
              v(k)(p) = vkp - s * (vkq + tau * vkp)
              v(k)(q) = vkq + s * (vkp - tau * vkq)
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)),
      order.map(c => (0 until n).map(r => v(r)(c)): IndexedSeq[Double]))
  }

  /** Singular values (descending) of the matrix whose Gram is `gram`:
    * sigma_i = sqrt(max(lambda_i, 0)) — the clamp absorbs the tiny
    * negative eigenvalues a positive-semidefinite Gram can acquire from
    * rotation round-off. sqrt is IEEE correctly-rounded, so the values
    * are as deterministic as the eigenvalues. */
  def singularValuesFromGram(gram: Array[Array[Double]]): IndexedSeq[Double] =
    symEigenvalues(gram).map(l => math.sqrt(math.max(l, 0.0)))

  /** Upper-triangular Cholesky factor R of symmetric positive-definite
    * `g` (RᵀR = g, diagonal > 0) — which IS the R of the thin QR
    * factorization A = QR when g = AᵀA (the factor TSQR materializes;
    * Q never needs to exist: Q = A·R⁻¹ row-locally if a caller wants
    * it). Classic right-looking Cholesky with a FIXED loop order: the
    * inner dot products fold k = 0..i-1 left-to-right, so identical
    * input doubles give identical output bits (the trained-literal
    * oracle property, SURVEY §5). A non-positive pivot (rank-deficient
    * Gram) zeroes its row — the defensive convention, never hit by a
    * full-column-rank field. `g` is not mutated. */
  def cholUpper(g: Array[Array[Double]]): IndexedSeq[IndexedSeq[Double]] = {
    val n = g.length
    require(n > 0 && g.forall(_.length == n), "matrix must be square")
    val r = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var s = g(i)(i)
      var k = 0
      while (k < i) { s -= r(k)(i) * r(k)(i); k += 1 }
      if (s > 0.0) {
        val d = math.sqrt(s)
        r(i)(i) = d
        var j = i + 1
        while (j < n) {
          var t = g(i)(j)
          k = 0
          while (k < i) { t -= r(k)(i) * r(k)(j); k += 1 }
          r(i)(j) = t / d
          j += 1
        }
      } // else: row stays zero (degenerate column)
      i += 1
    }
    (0 until n).map(ii => (0 until n).map(jj => r(ii)(jj)))
  }

  /** Solve the symmetric positive-definite system `g x = v` through the
    * [[cholUpper]] factor: forward-substitute Rᵀ z = v, back-substitute
    * R x = z. Fixed left-to-right substitution order, so identical
    * input doubles give identical solution bits (the trained-literal
    * oracle property). A zeroed pivot row (rank-deficient `g`, see
    * [[cholUpper]]) zeroes its solution component — the pseudo-inverse
    * convention for a redundant regressor, never hit by a
    * full-column-rank design. */
  def cholSolve(g: Array[Array[Double]], v: Array[Double]): IndexedSeq[Double] = {
    val n = g.length
    require(v.length == n, "rhs length must match the matrix")
    val r = cholUpper(g)
    val z = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (r(i)(i) == 0.0) z(i) = 0.0
      else {
        var s = v(i)
        var k = 0
        while (k < i) { s -= r(k)(i) * z(k); k += 1 }
        z(i) = s / r(i)(i)
      }
      i += 1
    }
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      if (r(i)(i) == 0.0) x(i) = 0.0
      else {
        var s = z(i)
        var k = i + 1
        while (k < n) { s -= r(i)(k) * x(k); k += 1 }
        x(i) = s / r(i)(i)
      }
      i -= 1
    }
    x.toIndexedSeq
  }
}
