// Lives under org.apache.spark.sql so it can use the private[sql]
// Expression <-> Column bridge (classic.ExpressionUtils) and the
// private[sql] AbstractDataType hierarchy — the same technique Spark
// extension libraries use to add native expressions.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native dot product over two double arrays.
  *
  * This replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)` in the vector
  * hot path: higher-order functions are CodegenFallback (interpreted
  * lambdas, one closure call per element), while this expression compiles
  * to a tight primitive loop inside whole-stage codegen. The evaluation
  * order (left-to-right, 0.0 init) is IDENTICAL to the HOF fold, so
  * results are bit-for-bit unchanged and the DuckDB oracles still match
  * (SURVEY §5).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // can be null on length mismatch even with non-null children; without
  // this, codegen would emit an assignment to the constant-false isNull
  override def nullable: Boolean = true

  // Length mismatch yields NULL, matching the zip_with+aggregate HOF form
  // (zip_with pads the short side with nulls, poisoning the fold).
  // Caveat vs the HOF form: null ELEMENTS are not checked per slot (the
  // callers feed non-null parquet vectors; checking would cost a branch
  // per element in the hot loop).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int ${ev.value}_n = $a.numElements();
         |if (${ev.value}_n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double ${ev.value}_s = 0.0;
         |  for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |    ${ev.value}_s += $a.getDouble(${ev.value}_i) * $b.getDouble(${ev.value}_i);
         |  }
         |  ${ev.value} = ${ev.value}_s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Column wrapper for [[DotProduct]]. */
  def dotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Running (inclusive) prefix sum of a double array in exact
  * DECIMAL(28,2) — the chunk-local half of the distributed scan
  * ([[graft.arrays.ChunkedArray.cumsumRows]]). Each element is rounded
  * to 2 decimals exactly as Spark's double->DECIMAL cast does
  * (shortest-decimal-string, HALF_UP) before accumulating, so the
  * result matches the SQL `SUM(CAST(x AS DECIMAL)) OVER (...)` fold
  * bit-for-bit. One pass; the HOF spelling (aggregate with an array
  * accumulator) copies the accumulator per element — O(n^2) per chunk. */
case class PrefixSumDec(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DecimalType(28, 2), containsNull = false)
  override def prettyName: String = "graft_prefix_sum_dec"

  // Entry point for generated code: a plain instance method avoids the
  // static-forwarder name clash (the companion's eval(ArrayData) vs the
  // inherited Expression.eval(InternalRow) suppresses the forwarder, so
  // `PrefixSumDec.eval(...)` does NOT resolve from generated Java).
  def compute(input: Any): ArrayData =
    PrefixSumDec.eval(input.asInstanceOf[ArrayData])

  override def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefixSumDec", this, classOf[PrefixSumDec].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PrefixSumDec {
  def eval(data: ArrayData): ArrayData = {
    val n = data.numElements()
    val out = new Array[Any](n)
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      // BigDecimal.valueOf == shortest-string conversion, matching
      // Spark's Decimal(double); setScale(2, HALF_UP) matches the cast
      acc = acc.add(java.math.BigDecimal.valueOf(data.getDouble(i))
        .setScale(2, java.math.RoundingMode.HALF_UP))
      out(i) = org.apache.spark.sql.types.Decimal(acc, 28, 2)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def prefixSumDec(data: Column): Column =
    ExpressionUtils.column(PrefixSumDec(ExpressionUtils.expression(data)))
}

/** Native max(|v|) over a double array — replaces the interpreted
  * `array_max(transform(emb, abs))` HOF pair in the quantization hot
  * path (r21 optimization; guide step 4 — HOFs are CodegenFallback,
  * one closure call per element). Semantics are element-for-element
  * the Catalyst chain's: null elements are skipped (abs(null) = null,
  * array_max ignores nulls), an empty/all-null array yields NULL, and
  * the max uses Spark-SQL double ordering (NaN greatest — Math.max is
  * NaN-sticky, which agrees). Equivalence spec-gated in VectorSpec. */
case class AbsMax(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_abs_max"

  def compute(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = Double.NaN
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = Math.abs(arr.getDouble(i))
        if (!seen) { best = v; seen = true }
        else if (java.lang.Double.compare(v, best) > 0 || v != v) best = v
        i += 1
      } else i += 1
    }
    if (!seen) null else java.lang.Double.valueOf(best)
  }

  override def nullSafeEval(a: Any): Any = compute(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("absMax", this, classOf[AbsMax].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object ${ev.value}_o = $ref.compute($c);
      |if (${ev.value}_o == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ((java.lang.Double) ${ev.value}_o).doubleValue(); }
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native int8-quantization accounting over one vector — ONE compiled
  * pass producing (sum_q, sum_abs_q, nnz, err_max) for
  * [[graft.operators.Similarity.embQuantInt8]], replacing four
  * interpreted HOF folds (transform + 2×aggregate + filter/size +
  * zip_with/array_max) that dominated the query's single scan stage
  * (r21 optimization; guide step 4). Element semantics are identical
  * to the Catalyst chain: q_i = floor(v·scale + 0.5) as long; a null
  * element poisons sum_q/sum_abs_q to NULL (aggregate over a null
  * element), is excluded from nnz (filter drops null predicates) and
  * from err_max (array_max skips nulls); empty/all-null err_max is
  * NULL; err_max uses Spark double ordering (NaN greatest).
  * Equivalence spec-gated in VectorSpec. */
case class QuantInt8Stats(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("sum_q", LongType, nullable = true),
    StructField("sum_abs_q", LongType, nullable = true),
    StructField("nnz", LongType, nullable = false),
    StructField("err_max", DoubleType, nullable = true)))
  override def prettyName: String = "graft_quant_int8_stats"

  def compute(a: Any, s: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val n = arr.numElements()
    var sumQ = 0L
    var sumAbsQ = 0L
    var nnz = 0L
    var errMax = Double.NaN
    var errSeen = false
    var sawNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { sawNull = true }
      else {
        val v = arr.getDouble(i)
        val q = Math.floor(v * scale + 0.5).toLong
        sumQ += q
        sumAbsQ += Math.abs(q)
        if (q != 0L) nnz += 1L
        val err = Math.abs(v - q.toDouble / scale)
        if (!errSeen) { errMax = err; errSeen = true }
        else if (java.lang.Double.compare(err, errMax) > 0 || err != err) errMax = err
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      if (sawNull) null else java.lang.Long.valueOf(sumQ),
      if (sawNull) null else java.lang.Long.valueOf(sumAbsQ),
      java.lang.Long.valueOf(nnz),
      if (!errSeen) null else java.lang.Double.valueOf(errMax)))
  }

  override def nullSafeEval(a: Any, s: Any): Any = compute(a, s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantStats", this, classOf[QuantInt8Stats].getName)
    nullSafeCodeGen(ctx, ev, (a, s) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($a, $s);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object QuantExpressions {
  def absMax(a: Column): Column =
    ExpressionUtils.column(AbsMax(ExpressionUtils.expression(a)))
  def quantInt8Stats(a: Column, scale: Column): Column =
    ExpressionUtils.column(QuantInt8Stats(
      ExpressionUtils.expression(a), ExpressionUtils.expression(scale)))
}
