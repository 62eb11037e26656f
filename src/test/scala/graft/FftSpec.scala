package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftexpr.Fft
import org.scalatest.funsuite.AnyFunSuite

import graft.arrays.{ArrayGeometry, ChunkedArray}

/** Specs for the spectral family (`arr_fft` / `arr_spectrum`, VERDICT
  * r18 next-round #1): the radix-2 kernel against an independent
  * O(n²) reference DFT, the analytic identities a correct transform
  * must satisfy exactly (impulse, constant, Parseval, Hermitian
  * symmetry of a real input), and determinism of the fixed butterfly
  * order. */
class FftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val N = 16

  /** A 16-cell 1-d array in 4 chunks of 4; two timesteps. */
  private def arr(cells: Long => Int => Double, ts: Seq[Long] = Seq(0L, 1L)): ChunkedArray = {
    val rows = for (t <- ts; c <- 0 to 3)
      yield (t, Seq(c), (0 to 3).map(i => cells(t)(4 * c + i)))
    ChunkedArray(rows.toDF("timestep", "pos", "data"), ArrayGeometry(Seq(4), Seq(4)))
  }

  private def fftMap(a: ChunkedArray): Map[(Long, Long), (Double, Double)] =
    a.fftRows().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap

  /** Independent O(n²) reference DFT — plain sums of cos/sin products,
    * no butterfly structure shared with the kernel. */
  private def dftRef(x: IndexedSeq[Double]): IndexedSeq[(Double, Double)] = {
    val n = x.length
    (0 until n).map { k =>
      var re = 0.0; var im = 0.0
      for (j <- 0 until n) {
        val ang = -2.0 * StrictMath.PI * k * j / n
        re += x(j) * StrictMath.cos(ang)
        im += x(j) * StrictMath.sin(ang)
      }
      (re, im)
    }
  }

  test("impulse at 0 transforms to exactly (1, 0) in every bin") {
    val a = arr(_ => i => if (i == 0) 1.0 else 0.0, Seq(0L))
    val f = fftMap(a)
    assert(f.size == N)
    for (u <- 0 until N) {
      val (re, im) = f((0L, u.toLong))
      assert(re == 1.0 && im == 0.0, s"bin $u: ($re, $im)")
    }
  }

  test("constant line: bin 0 holds exactly n*c, others vanish to ~0") {
    val c = 2.5
    val a = arr(_ => _ => c, Seq(0L))
    val f = fftMap(a)
    assert(f((0L, 0L)) == ((N * c, 0.0)))
    for (u <- 1 until N) {
      val (re, im) = f((0L, u.toLong))
      assert(math.abs(re) < 1e-12 && math.abs(im) < 1e-12, s"bin $u: ($re, $im)")
    }
  }

  test("kernel agrees with the independent O(n^2) DFT; real input is Hermitian") {
    // deterministic non-trivial cells; distinct per timestep
    val a = arr(t => i => ((i * 37 + 11 + t * 5) % 23) * 0.5 - 4.0)
    val f = fftMap(a)
    for (t <- Seq(0L, 1L)) {
      val x = (0 until N).map(i => ((i * 37 + 11 + t * 5) % 23) * 0.5 - 4.0)
      val ref = dftRef(x)
      for (u <- 0 until N) {
        val (re, im) = f((t, u.toLong))
        assert(math.abs(re - ref(u)._1) < 1e-9 && math.abs(im - ref(u)._2) < 1e-9,
          s"t=$t bin $u: kernel ($re, $im) vs ref ${ref(u)}")
      }
      // Hermitian symmetry of a real signal: X[n-u] = conj(X[u])
      for (u <- 1 until N) {
        val (re, im) = f((t, u.toLong))
        val (re2, im2) = f((t, (N - u).toLong))
        assert(math.abs(re - re2) < 1e-9 && math.abs(im + im2) < 1e-9,
          s"t=$t Hermitian pair ($u, ${N - u})")
      }
      // Parseval: sum |x|^2 == (1/n) sum |X|^2
      val lhs = x.map(v => v * v).sum
      val rhs = (0 until N).map { u =>
        val (re, im) = f((t, u.toLong)); re * re + im * im
      }.sum / N
      assert(math.abs(lhs - rhs) < 1e-9, s"t=$t Parseval: $lhs vs $rhs")
    }
  }

  test("power spectrum face: one-sided bins, power == re^2 + im^2 of the fft") {
    val a = arr(t => i => ((i * 7 + 3 + t) % 11) * 1.25)
    val f = fftMap(a)
    val p = a.powerSpectrumRows().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p.size == 2 * (N / 2 + 1))
    for (((t, u), pw) <- p) {
      val (re, im) = f((t, u))
      assert(pw == re * re + im * im, s"t=$t u=$u")
    }
    assert(!p.keySet.exists(_._2 > N / 2))
  }

  test("fixed butterfly order is deterministic: two evaluations bit-equal") {
    val a = arr(t => i => math.sin(i * 0.7 + t) * 3.0)
    val f1 = fftMap(a)
    val f2 = fftMap(a)
    assert(f1 == f2)
    // and the twiddle/bitrev tables themselves are stable
    assert(Fft.twiddles(64)._1.toSeq == Fft.twiddles(64)._1.toSeq)
    assert(Fft.bitrev(8).toSeq == Seq(0, 4, 2, 6, 1, 5, 3, 7))
  }

  test("ifft round trip reconstructs the line; imaginary part vanishes") {
    val a = arr(t => i => ((i * 29 + 7 + t * 3) % 13) * 1.5 - 6.0)
    val got = a.ifftRoundtripRows().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.size == 2 * N)
    for (t <- Seq(0L, 1L); i <- 0 until N) {
      val want = ((i * 29 + 7 + t * 3) % 13) * 1.5 - 6.0
      val (re, im) = got((t, i.toLong))
      assert(math.abs(re - want) < 1e-9, s"t=$t i=$i: $re vs $want")
      assert(math.abs(im) < 1e-12, s"t=$t i=$i residual imag $im")
    }
  }

  test("convolution theorem: fft-path equals the direct circular convolution") {
    val h = {
      val t = Array.fill(N)(0.0)
      t(0) = 0.5; t(1) = 0.25; t(N - 1) = 0.25
      t
    }
    val a = arr(t => i => ((i * 17 + 3 + t) % 23) * 0.25)
    val got = a.convolveFftRows(h.toSeq).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    for (t <- Seq(0L, 1L)) {
      val x = (0 until N).map(i => ((i * 17 + 3 + t) % 23) * 0.25)
      for (u <- 0 until N) {
        // direct circular convolution: sum_j x[j] * h[(u - j) mod n]
        val want = (0 until N).map(j => x(j) * h(((u - j) % N + N) % N)).sum
        val (re, im) = got((t, u.toLong))
        assert(math.abs(re - want) < 1e-9, s"t=$t u=$u: $re vs $want")
        assert(math.abs(im) < 1e-12, s"t=$t u=$u residual imag $im")
      }
    }
    // a wrong-length kernel refuses loudly
    val e = intercept[IllegalArgumentException](a.convolveFftRows(Seq(1.0, 2.0)))
    assert(e.getMessage.contains("full circular length"))
  }

  test("direct valid-mode FIR agrees with the circular theorem path on the interior") {
    // same 5-tap kernel both ways: valid-mode direct taps (hundredths)
    // vs the centered circular layout arr_conv_fft uses — away from the
    // wraparound, circular output at i+2 equals valid output at i
    val taps = Seq(10L, 20L, 40L, 20L, 10L)
    val h = {
      val t = Array.fill(N)(0.0)
      t(0) = 0.4; t(1) = 0.2; t(2) = 0.1; t(N - 2) = 0.1; t(N - 1) = 0.2
      t
    }
    val a = arr(t => i => ((i * 13 + 5 + t) % 31) * 0.25)
    val direct = a.convolveValidRows(taps).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val circ = a.convolveFftRows(h.toSeq).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(direct.size == 2 * (N - taps.length + 1))
    for (t <- Seq(0L, 1L); i <- 0 to N - taps.length) {
      val want = circ((t, (i + 2).toLong))
      assert(math.abs(direct((t, i.toLong)) - want) < 1e-9,
        s"t=$t i=$i: ${direct((t, i.toLong))} vs $want")
    }
    // the direct path is exact integers: y_q * 1e-4 round-trips
    val q = a.convolveValidRows(taps).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    q.foreach { case (yq, y) => assert(y == yq.toDouble / 10000.0) }
    // an oversized kernel refuses loudly
    val e2 = intercept[IllegalArgumentException](
      a.convolveValidRows(Seq.fill(N + 1)(1L)))
    assert(e2.getMessage.contains("out of range"))
  }

  test("rfft is exactly fft's bins 0..n/2 with the rfftfreq axis") {
    val a = arr(t => i => ((i * 7 + 3 + t) % 23) * 0.5)
    val full = fftMap(a)
    val packed = a.rfftRows().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(packed.size == 2 * (N / 2 + 1))
    for (t <- Seq(0L, 1L); u <- 0 to N / 2) {
      val (freq, re, im) = packed((t, u.toLong))
      assert(freq == u.toDouble / N, s"rfftfreq at $u")
      assert((re, im) == full((t, u.toLong)), s"bin $u must be the fft bin verbatim")
    }
  }

  test("fftshift is the centered permutation of the same bins") {
    val a = arr(t => i => ((i * 5 + 1 + t) % 17) * 0.25)
    val full = fftMap(a)
    val sh = a.fftshiftRows().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(sh.size == 2 * N)
    for (t <- Seq(0L, 1L); k <- 0 until N) {
      val (freq, re, im) = sh((t, k.toLong))
      val u = (k + N / 2) % N // shifted position k holds original bin u
      assert(freq == (k - N / 2).toDouble / N, s"shifted freq at $k")
      assert((re, im) == full((t, u.toLong)), s"k=$k must hold bin $u")
    }
    // zero frequency sits dead center
    assert(sh((0L, (N / 2).toLong))._1 == 0.0)
  }

  test("irfft(rfft(x)) reconstructs the real input from packed bins") {
    val a = arr(t => i => ((i * 13 + 5 + t) % 31) * 0.25)
    val got = a.irfftRoundtripRows().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == 2 * N)
    for (t <- Seq(0L, 1L); i <- 0 until N) {
      val want = ((i * 13 + 5 + t) % 31) * 0.25
      assert(math.abs(got((t, i.toLong)) - want) < 1e-12, s"t=$t i=$i")
    }
  }

  test("valid-mode FIR flips a NON-symmetric kernel like numpy convolve") {
    // numpy convolve(x, k, 'valid'): y[i] = Σⱼ x[i+j]·k[K−1−j] — the
    // kernel reversal is observable only off the palindrome; this pins
    // the orientation so a future asymmetric FIR can't silently become
    // a sliding dot (ADVICE r19 #4)
    val taps = Seq(10L, 20L, 70L) // deliberately asymmetric
    val a = arr(t => i => ((i * 13 + 5 + t) % 31) * 0.25, Seq(0L))
    val x = (0 until N).map(i => ((i * 13 + 5) % 31) * 0.25)
    val got = a.convolveValidRows(taps).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got.size == N - taps.length + 1)
    val k = taps.length
    for (i <- 0 to N - k) {
      // exact integer replay of the numpy formula at scale 10⁻⁴
      val want = (0 until k).map { j =>
        taps(k - 1 - j) * math.round(x(i + j) * 100)
      }.sum
      assert(got(i.toLong) == want, s"i=$i: ${got(i.toLong)} vs $want")
    }
  }

  test("correlation theorem: fft-path xcorr equals the direct lag sums") {
    val a = arr(t => i => ((i * 11 + 2 + t) % 9) * 0.5)
    val b = arr(t => i => ((i * 5 + 7 + t * 2) % 13) * 0.25)
    val got = a.xcorrFftRows(b).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    for (t <- Seq(0L, 1L)) {
      val xa = (0 until N).map(i => ((i * 11 + 2 + t) % 9) * 0.5)
      val xb = (0 until N).map(i => ((i * 5 + 7 + t * 2) % 13) * 0.25)
      for (l <- 0 until N) {
        val want = (0 until N).map(j => xa(j) * xb((j + l) % N)).sum
        val (re, im) = got((t, l.toLong))
        assert(math.abs(re - want) < 1e-9, s"t=$t lag=$l: $re vs $want")
        assert(math.abs(im) < 1e-12, s"t=$t lag=$l residual imag $im")
      }
    }
    // a timestep present in only one operand drops (the zip convention)
    val aOnly = arr(t => i => i.toDouble, Seq(0L, 7L))
    val keys = aOnly.xcorrFftRows(b).select("timestep").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(keys == Set(0L))
  }

  test("fft2 agrees with the independent O(n^4) 2-d reference DFT") {
    import graft.arrays.{ArrayGeometry, ChunkedArray}
    val n = 8
    def cell(i: Int, j: Int): Double = ((i * 5 + j * 11 + 3) % 17) * 0.75 - 4.0
    val rows = for (cr <- 0 to 1; cc <- 0 to 1)
      yield (0L, Seq(cr, cc),
        for (i <- 0 to 3; j <- 0 to 3) yield cell(4 * cr + i, 4 * cc + j))
    val a = ChunkedArray(rows.toDF("timestep", "pos", "data"),
      ArrayGeometry(Seq(2, 2), Seq(4, 4)))
    val got = a.fft2Rows().collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.size == n * n)
    for (u <- 0 until n; v <- 0 until n) {
      var re = 0.0; var im = 0.0
      for (i <- 0 until n; j <- 0 until n) {
        val ang = -2.0 * StrictMath.PI * (u.toDouble * i / n + v.toDouble * j / n)
        re += cell(i, j) * StrictMath.cos(ang)
        im += cell(i, j) * StrictMath.sin(ang)
      }
      val (gre, gim) = got((u.toLong, v.toLong))
      assert(math.abs(gre - re) < 1e-9 && math.abs(gim - im) < 1e-9,
        s"bin ($u,$v): ($gre,$gim) vs ref ($re,$im)")
    }
    // 2-d impulse at the origin: every bin exactly (1, 0)
    val imp = for (cr <- 0 to 1; cc <- 0 to 1)
      yield (0L, Seq(cr, cc), (0 until 16).map(k =>
        if (cr == 0 && cc == 0 && k == 0) 1.0 else 0.0))
    val fi = ChunkedArray(imp.toDF("timestep", "pos", "data"),
      ArrayGeometry(Seq(2, 2), Seq(4, 4))).fft2Rows().collect()
    assert(fi.length == n * n)
    assert(fi.forall(r => r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0))
  }

  test("Bluestein chirp-z: non-power-of-two DFT agrees with the O(n^2) reference") {
    // a 12-cell line in 3 chunks of 4 (12 = 4·3, not a power of two)
    val n = 12
    def arr12(cells: Long => Int => Double): ChunkedArray = {
      val rows = for (t <- Seq(0L, 1L); c <- 0 to 2)
        yield (t, Seq(c), (0 to 3).map(i => cells(t)(4 * c + i)))
      import spark.implicits._
      ChunkedArray(rows.toDF("timestep", "pos", "data"), ArrayGeometry(Seq(3), Seq(4)))
    }
    val a = arr12(t => i => ((i * 19 + 3 + t) % 29) * 0.25)
    val got = a.bluesteinRows().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.size == 2 * n)
    for (t <- Seq(0L, 1L)) {
      val x = (0 until n).map(i => ((i * 19 + 3 + t) % 29) * 0.25)
      val ref = dftRef(x)
      for (k <- 0 until n) {
        val (re, im) = got((t, k.toLong))
        assert(math.abs(re - ref(k)._1) < 1e-9, s"t=$t k=$k re: $re vs ${ref(k)._1}")
        assert(math.abs(im - ref(k)._2) < 1e-9, s"t=$t k=$k im: $im vs ${ref(k)._2}")
      }
    }
    // impulse at 0: every bin exactly the chirp identity value (1, 0)
    // up to the chain's rounding
    val imp = arr12(_ => i => if (i == 0) 1.0 else 0.0)
    imp.bluesteinRows().collect().foreach { r =>
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12, s"impulse re bin ${r.getLong(1)}")
      assert(math.abs(r.getDouble(3)) < 1e-12, s"impulse im bin ${r.getLong(1)}")
    }
    // determinism: two evaluations bit-equal
    val r1 = a.bluesteinRows().collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3))).toSeq.sortBy(x => (x._1, x._2))
    val r2 = a.bluesteinRows().collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3))).toSeq.sortBy(x => (x._1, x._2))
    assert(r1 == r2, "bit-deterministic")
    // a power-of-two length refuses loudly toward fftRows
    val p2 = arr(t => i => i.toDouble)
    val e = intercept[IllegalArgumentException](p2.bluesteinRows())
    assert(e.getMessage.contains("power of two"))
  }

  test("non-power-of-two length refused loudly") {
    val rows = Seq((0L, Seq(0), (0 until 6).map(_.toDouble)))
    val bad = ChunkedArray(rows.toDF("timestep", "pos", "data"),
      ArrayGeometry(Seq(1), Seq(6)))
    val e = intercept[IllegalArgumentException](bad.fftRows())
    assert(e.getMessage.contains("power of two"))
  }
}
