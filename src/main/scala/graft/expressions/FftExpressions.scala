// Lives under org.apache.spark.sql for the same private[sql] bridge
// reasons as VectorExpressions.scala.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Shared radix-2 FFT scaffolding — the SAME driver-side tables feed
  * the Spark kernel ([[FftLine]]) and the DuckDB oracle's literal
  * lists, so no transcendental is ever evaluated cross-engine (the
  * `arr_svd_vals` trained-literal discipline, SURVEY §5): the twiddle
  * factors w_k = e^(−2πik/n) are computed ONCE here with StrictMath
  * (bit-reproducible across JVMs, unlike Math.cos) and embedded as
  * round-trip-exact literals on the oracle side, while the butterfly
  * itself is a FIXED per-element formula both engines replay
  * operand-for-operand in IEEE doubles — identical inputs, identical
  * operation order, identical bits.
  *
  * Re-expresses the dask `da.fft.fft` surface a doreisa callback can
  * reach (the callback receives an unrestricted dask array,
  * doreisa/window_api.py:38-119); sign/scale conventions follow
  * numpy's forward transform (no 1/n factor, negative exponent).
  * Algorithm: Cooley & Tukey 1965, "An algorithm for the machine
  * calculation of complex Fourier series" (the radix-2
  * decimation-in-time form).
  */
object Fft {

  /** log₂(n), requiring a power of two. */
  def log2(n: Int): Int = {
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of two, got $n")
    java.lang.Integer.numberOfTrailingZeros(n)
  }

  /** Bit-reversal permutation: input cell `brev(i)` lands at work
    * position i before the first butterfly stage (the standard
    * decimation-in-time layout, so every stage reads CONTIGUOUS
    * blocks). */
  def bitrev(n: Int): Array[Int] = {
    val bits = log2(n)
    Array.tabulate(n)(i => Integer.reverse(i) >>> (32 - bits))
  }

  /** Twiddle tables (cos, sin) of w_k = e^(−2πik/n) for k < n/2 —
    * StrictMath for bit-reproducibility; the oracle embeds these
    * exact doubles as round-trip literals. */
  def twiddles(n: Int): (Array[Double], Array[Double]) = {
    val wr = new Array[Double](n / 2)
    val wi = new Array[Double](n / 2)
    var k = 0
    while (k < n / 2) {
      val ang = -2.0 * StrictMath.PI * k / n
      wr(k) = StrictMath.cos(ang)
      wi(k) = StrictMath.sin(ang)
      k += 1
    }
    (wr, wi)
  }

  /** Column wrapper for [[FftLine]]. */
  def fftLine(x: Column, n: Int): Column =
    ExpressionUtils.column(FftLine(ExpressionUtils.expression(x), n))

  /** Column wrapper for [[FftLineC]] (complex input — the column pass
    * of a 2-d transform). */
  def fftLineC(re: Column, im: Column, n: Int): Column =
    ExpressionUtils.column(FftLineC(
      ExpressionUtils.expression(re), ExpressionUtils.expression(im), n))

  /** Driver-side transform of LITERAL data (e.g. a convolution
    * kernel's frequency response, embedded as round-trip-exact
    * literals in both plans): the identical gather + butterfly code
    * path the distributed kernels run, on plain JVM arrays. */
  def fftArrays(xr: Array[Double], xi: Array[Double]): (Array[Double], Array[Double]) = {
    val n = xr.length
    require(xi.length == n, s"re/im length mismatch: $n vs ${xi.length}")
    val brev = bitrev(n)
    val (wr, wi) = twiddles(n)
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) { re(i) = xr(brev(i)); im(i) = xi(brev(i)); i += 1 }
    butterflies(re, im, wr, wi)
  }

  /** Bluestein chirp tables for an ARBITRARY-length DFT (Bluestein
    * 1970: X_k = a_k · Σⱼ (xⱼ·aⱼ)·b_{k−j} with a_k = e^(−iπk²/n),
    * b_l = e^(+iπl²/n) — the length-n transform as ONE circular
    * convolution of length m = next power of two ≥ 2n−1, so the
    * radix-2 kernels carry it): returns (ar, ai, fbr, fbi, m) where
    * (ar, ai) is the length-n chirp and (fbr, fbi) the LENGTH-m
    * forward transform of the wrapped b filter, computed through the
    * identical [[fftArrays]] path. Angles reduce on the exact integer
    * k² mod 2n BEFORE the one StrictMath call per entry, so the
    * tables are bit-reproducible and shared verbatim with the oracle
    * (the twiddle discipline). */
  def bluestein(n: Int): (Array[Double], Array[Double], Array[Double], Array[Double], Int) = {
    require(n >= 2, s"Bluestein needs n >= 2, got $n")
    var m = Integer.highestOneBit(2 * n - 1)
    if (m < 2 * n - 1) m <<= 1
    def ang(l: Long): Double =
      StrictMath.PI * ((l * l) % (2L * n)).toDouble / n
    val ar = Array.tabulate(n)(k => StrictMath.cos(ang(k.toLong)))
    val ai = Array.tabulate(n)(k => -StrictMath.sin(ang(k.toLong)))
    val br = new Array[Double](m)
    val bi = new Array[Double](m)
    var l = -(n - 1)
    while (l <= n - 1) {
      val idx = ((l % m) + m) % m
      br(idx) = StrictMath.cos(ang(l.toLong))
      bi(idx) = StrictMath.sin(ang(l.toLong))
      l += 1
    }
    val (fbr, fbi) = fftArrays(br, bi)
    (ar, ai, fbr, fbi, m)
  }

  /** The shared butterfly: run the radix-2 stages IN PLACE over
    * already-bit-reversed (re, im) work arrays — the exact per-element
    * formulas the oracle's stage CTEs replay (see [[FftLine]]). */
  private[graftexpr] def butterflies(
      re0: Array[Double], im0: Array[Double],
      wr: Array[Double], wi: Array[Double]): (Array[Double], Array[Double]) = {
    val n = re0.length
    var re = re0
    var im = im0
    var nextRe = new Array[Double](n)
    var nextIm = new Array[Double](n)
    var half = 1
    while (half < n) {
      val block = half * 2
      val step = n / block
      var j = 0
      while (j < n) {
        val pos = j % block
        if (pos < half) {
          val w = pos * step
          val p = j + half
          val tRe = wr(w) * re(p) - wi(w) * im(p)
          val tIm = wr(w) * im(p) + wi(w) * re(p)
          nextRe(j) = re(j) + tRe
          nextIm(j) = im(j) + tIm
        } else {
          val w = (pos - half) * step
          val tRe = wr(w) * re(j) - wi(w) * im(j)
          val tIm = wr(w) * im(j) + wi(w) * re(j)
          nextRe(j) = re(j - half) - tRe
          nextIm(j) = im(j - half) - tIm
        }
        j += 1
      }
      val sr = re; val si = im
      re = nextRe; im = nextIm
      nextRe = sr; nextIm = si
      half = block
    }
    (re, im)
  }
}

/** Radix-2 decimation-in-time FFT of one real-valued n-cell line
  * (n a power of two), returning `struct(re array<double>,
  * im array<double>)` — the per-line kernel under `arr_fft` /
  * `arr_spectrum`.
  *
  * The butterfly order is FIXED and purely functional per stage: with
  * `half = 2^s`, `block = 2·half`, `step = n/block`, output element i
  * of stage s is
  * {{{
  *   pos = i mod block
  *   pos <  half: t = w[pos·step]       · prev[i+half];  out[i] = prev[i]      + t
  *   pos >= half: t = w[(pos−half)·step] · prev[i],      out[i] = prev[i−half] − t
  * }}}
  * with the complex product spelled `tRe = wr·re − wi·im;
  * tIm = wr·im + wi·re` — each stage reads only the previous stage's
  * arrays, so the identical formula replays per-element in a DuckDB
  * `list_transform` and every IEEE operation happens in the same
  * order on both engines (bit-exact oracle gate). One compiled loop
  * per line (the ChunkFolds posture); a NULL cell fails loudly — the
  * dense zero-filled array never produces one, and an FFT over a
  * silently-zeroed hole would be a wrong spectrum, not a convenience.
  */
case class FftLine(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  Fft.log2(n): Unit // constructor-time power-of-two check

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("re", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("im", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_fft_line"

  @transient private lazy val brev: Array[Int] = Fft.bitrev(n)
  @transient private lazy val tw: (Array[Double], Array[Double]) = Fft.twiddles(n)

  def compute(xAny: Any): InternalRow = {
    val x = xAny.asInstanceOf[ArrayData]
    require(x.numElements() == n,
      s"graft_fft_line: expected a $n-cell line, got ${x.numElements()}")
    val (wr, wi) = tw
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) {
      val src = brev(i)
      if (x.isNullAt(src))
        throw new IllegalArgumentException(
          s"graft_fft_line: NULL cell at index $src — densify before the transform")
      re(i) = x.getDouble(src)
      i += 1
    }
    val (outRe, outIm) = Fft.butterflies(re, im, wr, wi)
    InternalRow(new GenericArrayData(outRe), new GenericArrayData(outIm))
  }

  override def nullSafeEval(x: Any): Any = compute(x)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fftLine", this, classOf[FftLine].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Complex-input radix-2 FFT of one n-cell line — the COLUMN pass of
  * the 2-d transform (`arr_fft2`): identical butterfly machinery as
  * [[FftLine]] (shared [[Fft.butterflies]], so the per-element
  * formulas the oracle replays are the same code), with the imaginary
  * part arriving from the row pass instead of a zero fill. Both input
  * arrays are bit-reverse gathered before the stages, like the real
  * face. */
case class FftLineC(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  Fft.log2(n): Unit

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("re", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("im", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_fft_line_c"

  @transient private lazy val brev: Array[Int] = Fft.bitrev(n)
  @transient private lazy val tw: (Array[Double], Array[Double]) = Fft.twiddles(n)

  def compute(reAny: Any, imAny: Any): InternalRow = {
    val xr = reAny.asInstanceOf[ArrayData]
    val xi = imAny.asInstanceOf[ArrayData]
    require(xr.numElements() == n && xi.numElements() == n,
      s"graft_fft_line_c: expected two $n-cell lines, got " +
        s"(${xr.numElements()}, ${xi.numElements()})")
    val (wr, wi) = tw
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) {
      val src = brev(i)
      if (xr.isNullAt(src) || xi.isNullAt(src))
        throw new IllegalArgumentException(
          s"graft_fft_line_c: NULL cell at index $src — densify before the transform")
      re(i) = xr.getDouble(src)
      im(i) = xi.getDouble(src)
      i += 1
    }
    val (outRe, outIm) = Fft.butterflies(re, im, wr, wi)
    InternalRow(new GenericArrayData(outRe), new GenericArrayData(outIm))
  }

  override def nullSafeEval(r: Any, i: Any): Any = compute(r, i)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fftLineC", this, classOf[FftLineC].getName)
    nullSafeCodeGen(ctx, ev, (r, i) => s"${ev.value} = $ref.compute($r, $i);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
