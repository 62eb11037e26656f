// Lives under org.apache.spark.sql for the same private[sql] bridge
// reasons as VectorExpressions.scala.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** All MinHash permutation minima in ONE pass over the hash array.
  *
  * Replaces k separate `array_min(transform(hs, h -> (a*(h%p)+b)%p))`
  * columns: those are interpreted HOFs (CodegenFallback closures, one
  * call per element per permutation, k traversals of the array); this
  * compiles to a tight two-level primitive loop inside whole-stage
  * codegen and traverses the array once. The arithmetic — min over
  * elements of (a_j * (h mod p) + b_j) mod p, evaluated in long math —
  * is IDENTICAL to the HOF form and to the DuckDB oracle, so signatures
  * are bit-for-bit unchanged (SURVEY §5).
  *
  * An empty input array yields NULL (array_min over an empty transform
  * is NULL in the HOF form), which downstream band hashing propagates
  * into dropped join keys — same semantics as before.
  */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(a.length == b.length, "permutation coefficient arrays must align")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = true // empty array -> NULL

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = hs.getLong(i) % p
      var j = 0
      while (j < k) {
        val v = (aArr(j) * hm + bArr(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val hm = ctx.freshName("hm")
    val v = ctx.freshName("v")
    val mins = ctx.freshName("mins")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$aRef.length];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $hm = $c.getLong($i) % ${p}L;
         |    for (int $j = 0; $j < $aRef.length; $j++) {
         |      long $v = ($aRef[$j] * $hm + $bRef[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bits`-wide SimHash signature in ONE pass over the token-hash array.
  *
  * Replaces `bits` interpreted `aggregate(hs, 0, ...)` bit-plane folds
  * (each traversing the whole array through a closure) with a single
  * codegen'd loop keeping `bits` running counts. Bit b of the result is
  * set iff the count of elements with bit b set exceeds the count
  * without — exactly the `SUM(+1/-1) > 0` rule of the fold form and the
  * oracle, so signatures are bit-for-bit unchanged. An empty array
  * yields 0 (the fold's zero), matching the HOF form.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 63, s"simhash width must be in [1, 63], got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < bits) {
        counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val h = ctx.freshName("h")
    val counts = ctx.freshName("counts")
    val sig = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $counts[$b] += ((($h >> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($counts[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExpressions {
  /** Column wrapper for [[MinHashSignature]]. */
  def minhashSignature(hs: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(hs), a, b, p))

  /** Column wrapper for [[SimHash]]. */
  def simhash(hs: Column, bits: Int): Column =
    ExpressionUtils.column(SimHash(ExpressionUtils.expression(hs), bits))

  /** Back-compat 32-bit wrapper. */
  def simhash32(hs: Column): Column = simhash(hs, 32)
}
