// Lives under org.apache.spark.sql for the private[sql] Expression <->
// Column bridge, like VectorExpressions (same extension-library technique).
package org.apache.spark.sql.graftexpr

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.errors.QueryExecutionErrors
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Native per-chunk AXIS folds — the line-strided siblings of
  * [[ChunkFolds]] for the `axisSum`/`axisVar`/`axisMax`/`axisArgmax`
  * family ([[graft.arrays.ChunkedArray]]).
  *
  * The HOF spelling (`transform(sequence(0, outElems-1), s =>
  * aggregate(sequence(0, extent-1), ...))`) is a NESTED interpreted
  * fold: outElems × extent closure dispatches per chunk, i.e. every
  * cell of every chunk goes through a CodegenFallback lambda — the
  * axis family's dominant CPU at 100 TB (arr_argmax_axis was a bench
  * top-5 at sf0.1). These expressions run the same loops as tight JVM
  * code, one call per chunk, and replicate the fold arithmetic
  * BIT-FOR-BIT: the decimal sums use [[ChunkFolds]]' cast semantics
  * (fast long-cents path + BigDecimal slow path, ANSI-aware error
  * domain), the min/max and argmax comparisons replay Spark's SQL
  * double ordering (-0.0 == 0.0, NaN greatest, null never wins). The
  * cross-chunk partial-block merges stay in the Column DSL — they
  * touch O(outElems · chunks-per-line), not O(cells).
  *
  * Semantics are re-proven by the randomized dense-model gate
  * (ArrayModelSpec) + the unchanged CORRECTNESS hashes; the null/error
  * paths by AxisFoldSpec's direct HOF comparison. */
object AxisFolds {

  /** Spark SQL double compare (SQLOrderingUtil): == first so -0.0/0.0
    * tie, NaN greatest. */
  def cmp(a: Double, b: Double): Int =
    if (a == b) 0
    else if (a < b) -1
    else if (a > b) 1
    else if (java.lang.Double.isNaN(a)) { if (java.lang.Double.isNaN(b)) 0 else 1 }
    else -1

  private val FastMaxCents = 8e14
  private val PromoteCents = 4500000000000000000L
  private val Max18 = java.math.BigInteger.TEN.pow(18)
  private val Max28 = java.math.BigInteger.TEN.pow(28)
  private val Max38 = java.math.BigInteger.TEN.pow(38)

  private def cast18_2(x: Double, ansi: Boolean): JBigDecimal = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) {
      if (ansi) Decimal(x): Unit
      return null
    }
    val bd = JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)
    if (bd.unscaledValue().abs().compareTo(Max18) >= 0) {
      if (ansi) throw QueryExecutionErrors.cannotChangeDecimalPrecisionError(
        Decimal(bd), 18, 2, null)
      return null
    }
    bd
  }

  /** Strides + line geometry for a row-major chunk of `shape` reduced
    * along `axis`: (axisStride, axisExtent, line base offsets). */
  private def lineBases(shape: Array[Int], axis: Int): (Int, Int, Array[Int]) = {
    val n = shape.length
    val strides = new Array[Int](n)
    var acc = 1
    var d = n - 1
    while (d >= 0) { strides(d) = acc; acc *= shape(d); d -= 1 }
    val rem = (0 until n).filter(_ != axis).toArray
    val outElems = rem.map(shape).product
    val bases = new Array[Int](outElems)
    var s = 0
    while (s < outElems) {
      var rest = s
      var base = 0
      var j = rem.length - 1
      while (j >= 0) {
        val dim = rem(j)
        base += (rest % shape(dim)) * strides(dim)
        rest /= shape(dim)
        j -= 1
      }
      bases(s) = base
      s += 1
    }
    (strides(axis), shape(axis), bases)
  }

  /** Per-line decimal(28,2) sums — axisSum's chunk partial. A null (or
    * non-ANSI error-domain) element poisons ITS line to null. */
  def sumDec(data: ArrayData, shape: Array[Int], axis: Int, ansi: Boolean): ArrayData = {
    val (st, ext, bases) = lineBases(shape, axis)
    val out = new Array[Any](bases.length)
    var s = 0
    while (s < bases.length) {
      out(s) = lineSum(data, bases(s), st, ext, ansi)
      s += 1
    }
    new GenericArrayData(out)
  }

  private def lineSum(data: ArrayData, base: Int, st: Int, ext: Int, ansi: Boolean): Decimal = {
    var cents = 0L
    var big: JBigDecimal = null
    var i = 0
    while (i < ext) {
      val ix = base + i * st
      if (data.isNullAt(ix)) return null
      val x = data.getDouble(ix)
      val c = Math.rint(x * 100.0)
      if (big == null && c / 100.0 == x && c <= FastMaxCents && c >= -FastMaxCents) {
        cents += c.toLong
        if (cents > PromoteCents || cents < -PromoteCents)
          big = JBigDecimal.valueOf(cents, 2)
      } else {
        if (big == null) big = JBigDecimal.valueOf(cents, 2)
        val bd = cast18_2(x, ansi)
        if (bd == null) return null
        big = big.add(bd)
        if (big.unscaledValue().abs().compareTo(Max28) >= 0) {
          if (ansi) throw QueryExecutionErrors.cannotChangeDecimalPrecisionError(
            Decimal(big), 28, 2, null)
          return null
        }
      }
      i += 1
    }
    if (big == null) Decimal(cents, 28, 2) else Decimal(big, 28, 2)
  }

  /** Per-line (sum decimal(28,2), sumsq decimal(38,4)) moment pairs —
    * axisVar's chunk partial. */
  def moments(data: ArrayData, shape: Array[Int], axis: Int, ansi: Boolean): ArrayData = {
    val (st, ext, bases) = lineBases(shape, axis)
    val out = new Array[Any](bases.length)
    var s = 0
    while (s < bases.length) {
      var cents = 0L
      var sq = 0L
      var bigT: JBigDecimal = null
      var bigQ: JBigDecimal = null
      var poisoned = false
      var i = 0
      while (i < ext && !poisoned) {
        val ix = bases(s) + i * st
        if (data.isNullAt(ix)) poisoned = true
        else {
          val x = data.getDouble(ix)
          val c = Math.rint(x * 100.0)
          if (bigT == null && c / 100.0 == x && c <= 3e9 && c >= -3e9) {
            val cl = c.toLong
            cents += cl
            sq += cl * cl
            if (cents > PromoteCents || cents < -PromoteCents || sq > PromoteCents) {
              bigT = JBigDecimal.valueOf(cents, 2)
              bigQ = JBigDecimal.valueOf(sq, 4)
            }
          } else {
            if (bigT == null) {
              bigT = JBigDecimal.valueOf(cents, 2)
              bigQ = JBigDecimal.valueOf(sq, 4)
            }
            val bd = cast18_2(x, ansi)
            if (bd == null) poisoned = true
            else {
              bigT = bigT.add(bd)
              bigQ = bigQ.add(bd.multiply(bd))
              if (bigT.unscaledValue().abs().compareTo(Max28) >= 0) {
                if (ansi) throw QueryExecutionErrors.cannotChangeDecimalPrecisionError(
                  Decimal(bigT), 28, 2, null)
                poisoned = true
              } else if (bigQ.unscaledValue().abs().compareTo(Max38) >= 0) {
                if (ansi) throw QueryExecutionErrors.cannotChangeDecimalPrecisionError(
                  Decimal(bigQ), 38, 4, null)
                poisoned = true
              }
            }
          }
        }
        i += 1
      }
      out(s) =
        if (poisoned) InternalRow(null, null)
        else if (bigT == null) InternalRow(Decimal(cents, 28, 2), Decimal(sq, 38, 4))
        else InternalRow(Decimal(bigT, 28, 2), Decimal(bigQ, 38, 4))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-line min/max doubles — axisMax/axisMin's chunk partial under
    * greatest/least semantics: null elements are skipped, an all-null
    * line yields null, SQL double ordering. */
  def extreme(data: ArrayData, shape: Array[Int], axis: Int, isMax: Boolean): ArrayData = {
    val (st, ext, bases) = lineBases(shape, axis)
    val out = new Array[Any](bases.length)
    var s = 0
    while (s < bases.length) {
      var has = false
      var best = 0.0
      var i = 0
      while (i < ext) {
        val ix = bases(s) + i * st
        if (!data.isNullAt(ix)) {
          val x = data.getDouble(ix)
          if (!has || (if (isMax) cmp(x, best) > 0 else cmp(x, best) < 0)) {
            best = x; has = true
          }
        }
        i += 1
      }
      out(s) = if (has) java.lang.Double.valueOf(best) else null
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-line (value, global axis coordinate) winners — axisArgmax /
    * axisArgmin's chunk partial. `gbase` = pos(axis) * extent, the
    * line's global coordinate base. Replays the HOF combine: better
    * value wins, ties to the LOWER coordinate, a null challenger never
    * wins, a null accumulator is replaced. */
  def argExtreme(
      data: ArrayData, gbase: Long, shape: Array[Int], axis: Int,
      isMax: Boolean): ArrayData = {
    val (st, ext, bases) = lineBases(shape, axis)
    val out = new Array[Any](bases.length)
    var s = 0
    while (s < bases.length) {
      // seed = first cell (may be null); nulls never win thereafter
      var bestV: java.lang.Double =
        if (data.isNullAt(bases(s))) null else data.getDouble(bases(s))
      var bestK = gbase
      var i = 1
      while (i < ext) {
        val ix = bases(s) + i * st
        if (!data.isNullAt(ix)) {
          val x = data.getDouble(ix)
          if (bestV == null ||
            (if (isMax) cmp(x, bestV) > 0 else cmp(x, bestV) < 0)) {
            bestV = x; bestK = gbase + i
          }
          // equal value: the running acc already has the lower k
        }
        i += 1
      }
      out(s) = InternalRow(bestV, bestK)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** array<decimal(28,2)> of per-line sums along `axis`. */
case class AxisSumDec(child: Expression, shape: Seq[Int], axis: Int, ansi: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DecimalType(28, 2), containsNull = true)
  override def prettyName: String = "graft_axis_sum_dec"
  @transient private lazy val shapeArr = shape.toArray
  override def nullSafeEval(input: Any): Any =
    AxisFolds.sumDec(input.asInstanceOf[ArrayData], shapeArr, axis, ansi)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val shapeRef = ctx.addReferenceObj("axisShape", shapeArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.AxisFolds.sumDec($c, $shapeRef, $axis, $ansi);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<struct<t: decimal(28,2), q: decimal(38,4)>> per-line moments. */
case class AxisMomentsDec(child: Expression, shape: Seq[Int], axis: Int, ansi: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", DecimalType(28, 2), nullable = true),
    StructField("q", DecimalType(38, 4), nullable = true))), containsNull = false)
  override def prettyName: String = "graft_axis_moments_dec"
  @transient private lazy val shapeArr = shape.toArray
  override def nullSafeEval(input: Any): Any =
    AxisFolds.moments(input.asInstanceOf[ArrayData], shapeArr, axis, ansi)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val shapeRef = ctx.addReferenceObj("axisShape", shapeArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.AxisFolds.moments($c, $shapeRef, $axis, $ansi);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<double> of per-line min/max along `axis`. */
case class AxisExtreme(child: Expression, shape: Seq[Int], axis: Int, isMax: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "graft_axis_extreme"
  @transient private lazy val shapeArr = shape.toArray
  override def nullSafeEval(input: Any): Any =
    AxisFolds.extreme(input.asInstanceOf[ArrayData], shapeArr, axis, isMax)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val shapeRef = ctx.addReferenceObj("axisShape", shapeArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.AxisFolds.extreme($c, $shapeRef, $axis, $isMax);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<struct<v: double, k: bigint>> per-line argmax/argmin winners;
  * right child = the line's global axis coordinate base (bigint). */
case class AxisArgExtreme(
    left: Expression, right: Expression, shape: Seq[Int], axis: Int, isMax: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = true),
    StructField("k", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_axis_arg_extreme"
  @transient private lazy val shapeArr = shape.toArray
  override def nullSafeEval(data: Any, gbase: Any): Any =
    AxisFolds.argExtreme(data.asInstanceOf[ArrayData],
      gbase.asInstanceOf[Long], shapeArr, axis, isMax)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val shapeRef = ctx.addReferenceObj("axisShape", shapeArr, "int[]")
    nullSafeCodeGen(ctx, ev, (c, g) =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.AxisFolds.argExtreme($c, $g, $shapeRef, $axis, $isMax);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object AxisFoldExpressions {
  def axisSumDec(data: Column, shape: Seq[Int], axis: Int): Column =
    ExpressionUtils.column(AxisSumDec(
      ExpressionUtils.expression(data), shape, axis, SQLConf.get.ansiEnabled))
  def axisMomentsDec(data: Column, shape: Seq[Int], axis: Int): Column =
    ExpressionUtils.column(AxisMomentsDec(
      ExpressionUtils.expression(data), shape, axis, SQLConf.get.ansiEnabled))
  def axisExtreme(data: Column, shape: Seq[Int], axis: Int, isMax: Boolean): Column =
    ExpressionUtils.column(AxisExtreme(
      ExpressionUtils.expression(data), shape, axis, isMax))
  def axisArgExtreme(data: Column, gbase: Column, shape: Seq[Int], axis: Int,
      isMax: Boolean): Column =
    ExpressionUtils.column(AxisArgExtreme(
      ExpressionUtils.expression(data), ExpressionUtils.expression(gbase),
      shape, axis, isMax))
}
