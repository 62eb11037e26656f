// Lives under org.apache.spark.sql for the private[sql] Expression <->
// Column bridge, like VectorExpressions (same extension-library technique).
package org.apache.spark.sql.graftexpr

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.errors.QueryExecutionErrors
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Native chunk-local folds for the array engine's decimal hot path.
  *
  * [[graft.arrays.ChunkedArray.chunkSumDec]] and the variance
  * square-fold were interpreted `aggregate(...)` higher-order functions:
  * CodegenFallback, one closure dispatch + Decimal allocation per CELL.
  * At 100 TB every cell of every chunk passes through them, making the
  * closure dispatch the array engine's dominant CPU (VERDICT r12 item 2).
  * These expressions compile into whole-stage codegen (the loop itself
  * lives in a static JVM method, one call per chunk) and replicate the
  * HOF fold's arithmetic BIT-FOR-BIT:
  *
  *   - each element goes through Spark's double -> DECIMAL(18,2) cast
  *     semantics (shortest-decimal-string, HALF_UP),
  *   - the accumulator is re-capped at DECIMAL(28,2) (sum) /
  *     DECIMAL(38,4) (sum of squares) after every add,
  *   - a null element poisons the whole fold to null (acc + null),
  *   - error-domain inputs (|x| >= 1e16, NaN/Infinity, accumulator
  *     overflow) follow the session's cast mode, captured at Column
  *     construction: ANSI throws (Spark 4's default), non-ANSI
  *     null-poisons — exactly what the Cast inside the HOF did,
  *
  * so CORRECTNESS hashes are unchanged (gated by ChunkFoldSpec's
  * HOF-equivalence property over exact-2-decimal AND pathological
  * doubles, in both cast modes).
  *
  * Fast path: a double x with `rint(x*100)/100.0 == x` and
  * |rint(x*100)| <= 8e14 is EXACTLY the 2-decimal value c/100 (at that
  * magnitude adjacent 0.01-grid rationals round to distinct doubles and
  * fl(100x) stays within 0.5 of the true integer), so its cast is c
  * cents exactly — accumulate a long of cents, no allocation. Anything
  * else (or an accumulator past the promotion guard) drops to the
  * BigDecimal slow path that mirrors the cast literally.
  */
case class ChunkSumDec(child: Expression, ansi: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DecimalType(28, 2)
  override def prettyName: String = "graft_chunk_sum_dec"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ChunkFolds.sumDec(input.asInstanceOf[ArrayData], ansi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.sql.graftexpr.ChunkFolds.sumDec($c, $ansi);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sum of squares in exact DECIMAL(38,4) — the second moment of
  * [[graft.arrays.ChunkedArray.variancePerTimestep]]'s chunk partial.
  * Same cast/overflow/null-poison contract as [[ChunkSumDec]]; the
  * square of a (18,2) value is 4-decimal-exact, matching
  * `(acc + d2(x)*d2(x)).cast(decimal(38,4))`. */
case class ChunkSumSqDec(child: Expression, ansi: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DecimalType(38, 4)
  override def prettyName: String = "graft_chunk_sumsq_dec"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ChunkFolds.sumSqDec(input.asInstanceOf[ArrayData], ansi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.sql.graftexpr.ChunkFolds.sumSqDec($c, $ansi);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkFolds {
  /** |cents| bound under which the long fast path is PROVABLY identical
    * to the BigDecimal cast (see class doc: distinct-double grid +
    * fl(100x) error both hold below 8e12 dollars). */
  private val FastMaxCents = 8e14
  /** Promote the long accumulator to BigDecimal before it can overflow:
    * 4.5e18 + FastMaxCents < Long.MaxValue. */
  private val PromoteCents = 4500000000000000000L
  /** Unscaled bounds: decimal(p,s) holds |unscaled| < 10^p. */
  private val Max18 = java.math.BigInteger.TEN.pow(18)
  private val Max28 = java.math.BigInteger.TEN.pow(28)
  private val Max38 = java.math.BigInteger.TEN.pow(38)

  /** Replays Spark's Cast(double -> decimal(18,2)): shortest-decimal-
    * string then HALF_UP. Error domain (NaN/Infinity, overflow) follows
    * the captured cast mode: ANSI throws the same errors Cast does,
    * non-ANSI returns the null that poisons the fold. */
  private def cast18_2(x: Double, ansi: Boolean): JBigDecimal = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) {
      // ANSI Cast surfaces Decimal(d)'s NumberFormatException
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

  private def capOrNull(big: JBigDecimal, max: java.math.BigInteger,
      p: Int, s: Int, ansi: Boolean): Boolean = {
    if (big.unscaledValue().abs().compareTo(max) >= 0) {
      if (ansi) throw QueryExecutionErrors.cannotChangeDecimalPrecisionError(
        Decimal(big), p, s, null)
      true
    } else false
  }

  def sumDec(data: ArrayData, ansi: Boolean): Decimal = {
    val n = data.numElements()
    var cents = 0L
    var big: JBigDecimal = null // non-null once off the fast path
    var i = 0
    while (i < n) {
      if (data.isNullAt(i)) return null
      val x = data.getDouble(i)
      val c = Math.rint(x * 100.0)
      if (big == null && c / 100.0 == x && c <= FastMaxCents && c >= -FastMaxCents) {
        cents += c.toLong
        if (cents > PromoteCents || cents < -PromoteCents)
          big = JBigDecimal.valueOf(cents, 2)
      } else {
        if (big == null) big = JBigDecimal.valueOf(cents, 2)
        val bd = cast18_2(x, ansi)
        if (bd == null) return null // null element poisons the fold
        big = big.add(bd)
        // the HOF re-caps at (28,2) after EVERY add; only the slow path
        // can reach the bound (the fast accumulator tops out at ~4.5e16)
        if (capOrNull(big, Max28, 28, 2, ansi)) return null
      }
      i += 1
    }
    if (big == null) Decimal(cents, 28, 2)
    else Decimal(big, 28, 2)
  }

  def sumSqDec(data: ArrayData, ansi: Boolean): Decimal = {
    val n = data.numElements()
    // unscaled at scale 4: (c cents)^2 == c*c "basis points squared"
    var sq = 0L
    var big: JBigDecimal = null
    var i = 0
    while (i < n) {
      if (data.isNullAt(i)) return null
      val x = data.getDouble(i)
      val c = Math.rint(x * 100.0)
      // squares need the tighter |c| <= 2.1e9: c*c <= 4.41e18, and a
      // just-under-guard accumulator (PromoteCents = 4.5e18) plus one
      // more square stays < Long.MaxValue (8.91e18 < 9.22e18) — a 3e9
      // bound admitted 4.5e18 + 9e18, silently wrapping the long
      if (big == null && c / 100.0 == x && c <= 2.1e9 && c >= -2.1e9) {
        val cl = c.toLong
        sq += cl * cl
        if (sq > PromoteCents) big = JBigDecimal.valueOf(sq, 4)
      } else {
        if (big == null) big = JBigDecimal.valueOf(sq, 4)
        val bd = cast18_2(x, ansi)
        if (bd == null) return null
        big = big.add(bd.multiply(bd)) // scale 4, exact
        if (capOrNull(big, Max38, 38, 4, ansi)) return null
      }
      i += 1
    }
    if (big == null) Decimal(sq, 38, 4)
    else Decimal(big, 38, 4)
  }

  /** Scale-4 twin of the element cast, for the matmul product fold:
    * Spark's Cast(double -> decimal(18,4)). */
  private def cast18_4(x: Double, ansi: Boolean): JBigDecimal = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) {
      if (ansi) Decimal(x): Unit
      return null
    }
    val bd = JBigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP)
    if (bd.unscaledValue().abs().compareTo(Max18) >= 0) {
      if (ansi) throw QueryExecutionErrors.cannotChangeDecimalPrecisionError(
        Decimal(bd), 18, 4, null)
      return null
    }
    bd
  }

  /** Dense block product out[i·cI + j] = Σ_k cast(a[i·kI+k] · b[k·cI+j],
    * dec(18,4)) accumulated at decimal(38,4) — the tensordot/matmul
    * chunk-pair kernel. Replaces the triple-nested interpreted HOF
    * (rI·cI·kI closure dispatches per chunk pair) with a tight loop;
    * arithmetic replays the fold bit-for-bit: double multiply, THEN the
    * scale-4 cast (fast path: products that are provably exact 1e-4
    * grid values accumulate as longs), null element poisons only its
    * output cell, ANSI throws where the Cast would. */
  def blockMatmul(a: ArrayData, b: ArrayData, rI: Int, kI: Int, cI: Int,
      ansi: Boolean): ArrayData = {
    val out = new Array[Any](rI * cI)
    var i = 0
    while (i < rI) {
      var j = 0
      while (j < cI) {
        var u4 = 0L // unscaled at scale 4
        var big: JBigDecimal = null
        var poisoned = false
        var k = 0
        while (k < kI && !poisoned) {
          val ia = i * kI + k
          val ib = k * cI + j
          if (a.isNullAt(ia) || b.isNullAt(ib)) poisoned = true
          else {
            val p = a.getDouble(ia) * b.getDouble(ib)
            val c = Math.rint(p * 1e4)
            if (big == null && c / 1e4 == p && c <= FastMaxCents && c >= -FastMaxCents) {
              u4 += c.toLong
              if (u4 > PromoteCents || u4 < -PromoteCents)
                big = JBigDecimal.valueOf(u4, 4)
            } else {
              if (big == null) big = JBigDecimal.valueOf(u4, 4)
              val bd = cast18_4(p, ansi)
              if (bd == null) poisoned = true
              else {
                big = big.add(bd)
                if (big.unscaledValue().abs().compareTo(Max38) >= 0) {
                  if (ansi) throw QueryExecutionErrors.cannotChangeDecimalPrecisionError(
                    Decimal(big), 38, 4, null)
                  poisoned = true
                }
              }
            }
          }
          k += 1
        }
        out(i * cI + j) =
          if (poisoned) null
          else if (big == null) Decimal(u4, 38, 4)
          else Decimal(big, 38, 4)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact decimal dot product of two aligned chunk payloads — the Σxy
    * partial of [[graft.arrays.ChunkedArray.corrPerTimestep]]: each pair
    * goes through Spark's double -> DECIMAL(18,2) cast FIRST, the two
    * decimals multiply exactly at scale 4, and the accumulator re-caps
    * at DECIMAL(38,4) after every add — i.e. the same arithmetic as the
    * relational `SUM(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2)))`
    * moments (q_corr), so a DuckDB oracle replays it verbatim. A null
    * element poisons the fold (the aligned-zip dense contract); mismatched
    * lengths are a geometry bug and throw. */
  def dotDec(a: ArrayData, b: ArrayData, ansi: Boolean): Decimal = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dotDec: mismatched chunk payloads (${a.numElements()} vs ${b.numElements()})")
    var u4 = 0L // unscaled at scale 4: (c1 cents)·(c2 cents)
    var big: JBigDecimal = null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      val cx = Math.rint(x * 100.0)
      val cy = Math.rint(y * 100.0)
      // |c| <= 2.1e9 keeps |cx*cy| <= 4.41e18 so a just-under-guard
      // accumulator (4.5e18) plus one product cannot wrap Long.MaxValue
      // (see the square fold — 3e9 admitted a silent wrap)
      if (big == null && cx / 100.0 == x && cy / 100.0 == y &&
          cx <= 2.1e9 && cx >= -2.1e9 && cy <= 2.1e9 && cy >= -2.1e9) {
        u4 += cx.toLong * cy.toLong
        if (u4 > PromoteCents || u4 < -PromoteCents)
          big = JBigDecimal.valueOf(u4, 4)
      } else {
        if (big == null) big = JBigDecimal.valueOf(u4, 4)
        val bx = cast18_2(x, ansi)
        val by = cast18_2(y, ansi)
        if (bx == null || by == null) return null
        big = big.add(bx.multiply(by)) // scale 4, exact
        if (capOrNull(big, Max38, 38, 4, ansi)) return null
      }
      i += 1
    }
    if (big == null) Decimal(u4, 38, 4)
    else Decimal(big, 38, 4)
  }

  /** Column wrappers; the session's cast mode is captured HERE (query
    * construction time), exactly when the Cast inside the HOF spelling
    * would have captured it. */
  def chunkSumDecNative(data: Column): Column =
    ExpressionUtils.column(ChunkSumDec(
      ExpressionUtils.expression(data), SQLConf.get.ansiEnabled))
  def chunkSumSqDecNative(data: Column): Column =
    ExpressionUtils.column(ChunkSumSqDec(
      ExpressionUtils.expression(data), SQLConf.get.ansiEnabled))
  def blockMatmulNative(a: Column, b: Column, rI: Int, kI: Int, cI: Int): Column =
    ExpressionUtils.column(BlockMatmulDec(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      rI, kI, cI, SQLConf.get.ansiEnabled))
  def chunkDotDecNative(a: Column, b: Column): Column =
    ExpressionUtils.column(ChunkDotDec(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      SQLConf.get.ansiEnabled))
  def chunkArgExtremeNative(data: Column, base: Column, shape: Seq[Int],
      gstrides: Seq[Long], isMax: Boolean): Column =
    ExpressionUtils.column(ChunkArgExtreme(
      ExpressionUtils.expression(data), ExpressionUtils.expression(base),
      shape, gstrides, isMax))
  def gatherAffineNative(data: Column, shape: Seq[Int], mult: Seq[Int],
      add: Seq[Int], srcStrides: Seq[Int]): Column =
    ExpressionUtils.column(GatherStatic(ExpressionUtils.expression(data),
      shape, mult, add, srcStrides))
}

/** array<decimal(38,4)> block product of two flattened chunk payloads —
  * see [[ChunkFolds.blockMatmul]]. */
case class BlockMatmulDec(left: Expression, right: Expression,
    rI: Int, kI: Int, cI: Int, ansi: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DecimalType(38, 4), containsNull = true)
  override def prettyName: String = "graft_block_matmul_dec"

  override def nullSafeEval(a: Any, b: Any): Any =
    ChunkFolds.blockMatmul(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      rI, kI, cI, ansi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.ChunkFolds.blockMatmul($a, $b, $rI, $kI, $cI, $ansi);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static per-chunk gather — the payload permutation of
  * [[graft.arrays.ChunkedArray.flip]]/`transpose`: `out[k] =
  * data[Σ_d (mult_d · coord_d(k) + add_d) · srcStride_d]` where
  * `coord_d(k)` are k's row-major coordinates in `shape` — the affine
  * index form that covers every geometry-constant gather the engine
  * emits (transpose: identity mult/add, permuted strides; flip:
  * mult=-1/add=S-1 on the mirrored axis). The Catalyst spelling
  * evaluates the index arithmetic expression tree per cell inside an
  * interpreted `transform`; here the gather is one compiled loop per
  * chunk. The expression carries only the few-int spec — a literal
  * chunkElems-length index map would serialize O(chunkElems) into the
  * plan shipped to EVERY task (the repo's large-chunk posture); the
  * map is materialized lazily once per deserialized instance instead.
  * Null elements pass through as nulls, exactly like the `transform`
  * read. Double payloads only — the Catalyst path remains for other
  * dtypes (dtype preservation). Model-gated by the flip/transpose
  * dense-model checks plus a null-equivalence spec. */
case class GatherStatic(child: Expression, shape: Seq[Int],
    mult: Seq[Int], add: Seq[Int], srcStrides: Seq[Int])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "graft_gather_static"

  @transient private lazy val mapA: Array[Int] = {
    val dims = shape.length
    val shapeA = shape.toArray
    val multA = mult.toArray
    val addA = add.toArray
    val strA = srcStrides.toArray
    val outStrides = shape.scanRight(1)(_ * _).tail.toArray
    val n = shapeA.product
    val out = new Array[Int](n)
    var k = 0
    while (k < n) {
      var s = 0
      var d = 0
      while (d < dims) {
        s += (multA(d) * ((k / outStrides(d)) % shapeA(d)) + addA(d)) * strA(d)
        d += 1
      }
      out(k) = s
      k += 1
    }
    out
  }

  def compute(dataAny: Any): ArrayData = {
    val arr = dataAny.asInstanceOf[ArrayData]
    val n = mapA.length
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val src = mapA(i)
      out(i) = if (arr.isNullAt(src)) null else java.lang.Double.valueOf(arr.getDouble(src))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(d: Any): Any = compute(d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gatherStatic", this,
      classOf[GatherStatic].getName)
    nullSafeCodeGen(ctx, ev, d => s"${ev.value} = $ref.compute($d);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-chunk arg-extreme fold — the chunk-local half of
  * [[graft.arrays.ChunkedArray.argmaxRows]]/`argExtremeNd`: one
  * (value, tie-key) struct per chunk, where the tie key is the global
  * row-major flat index (negated for max, so the downstream struct
  * max/min keeps the LOWEST index on value ties — numpy's rule). The
  * Catalyst spelling builds a struct PER CELL inside `transform` and
  * folds with an interpreted `aggregate` lambda; this runs the same
  * comparisons in one compiled loop, under Spark-SQL double ordering
  * (`Double.compare` — NaN greatest, NaN == NaN, -0.0 == 0.0 — the
  * semantics GreaterThan/EqualTo codegen via SQLOrderingUtil, NOT raw
  * primitive `>`/`==`, which would drop every NaN). Null cells are skipped
  * (they fail every comparison, acc retained); an all-null/empty chunk
  * returns the seed sentinel (±Inf, Long.Min/MaxValue) — identical to
  * the fold's seed, which the final projection maps to null.
  * Equivalence spec-gated in ChunkFoldSpec. */
case class ChunkArgExtreme(data: Expression, base: Expression,
    shape: Seq[Int], gstrides: Seq[Long], isMax: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def left: Expression = data
  override def right: Expression = base
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("k", LongType, nullable = false)))
  override def prettyName: String = "graft_chunk_arg_extreme"

  private val strides: Array[Int] = shape.scanRight(1)(_ * _).tail.toArray
  private val shapeA: Array[Int] = shape.toArray
  private val gstridesA: Array[Long] = gstrides.toArray

  def compute(dataAny: Any, baseAny: Any): Any = {
    val arr = dataAny.asInstanceOf[ArrayData]
    val b = baseAny.asInstanceOf[Long]
    val n = arr.numElements()
    val dims = shapeA.length
    var bv = if (isMax) Double.NegativeInfinity else Double.PositiveInfinity
    var bk = if (isMax) Long.MinValue else Long.MaxValue
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getDouble(i)
        var local = 0L
        var d = 0
        while (d < dims) {
          local += ((i / strides(d)) % shapeA(d)).toLong * gstridesA(d)
          d += 1
        }
        val gflat = b + local
        val k = if (isMax) -gflat else gflat
        // Spark SQL double ordering (SQLOrderingUtil.compareDoubles):
        // NaN is greater than everything and NaN == NaN, -0.0 == 0.0 —
        // a raw Java '>' never selects NaN, diverging from the Catalyst
        // fold (and numpy argmax) on NaN payloads.
        val cmp = if (v == bv) 0 else java.lang.Double.compare(v, bv)
        val win =
          if (isMax) cmp > 0 || (cmp == 0 && k > bk)
          else cmp < 0 || (cmp == 0 && k < bk)
        if (win) { bv = v; bk = k }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bv, bk))
  }

  override def nullSafeEval(d: Any, b: Any): Any = compute(d, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argExtreme", this,
      classOf[ChunkArgExtreme].getName)
    nullSafeCodeGen(ctx, ev, (d, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($d, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(data = l, base = r)
}

/** Exact DECIMAL(38,4) dot product of two aligned chunk payloads — see
  * [[ChunkFolds.dotDec]]. */
case class ChunkDotDec(left: Expression, right: Expression, ansi: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DecimalType(38, 4)
  override def prettyName: String = "graft_chunk_dot_dec"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ChunkFolds.dotDec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ansi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = org.apache.spark.sql.graftexpr.ChunkFolds.dotDec($a, $b, $ansi);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
