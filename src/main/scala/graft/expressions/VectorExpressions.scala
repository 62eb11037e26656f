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
