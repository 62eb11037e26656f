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

/** Misra-Gries heavy-hitters sketch as a native
  * [[TypedImperativeAggregate]] — the bounded-state frequent-items
  * pass a 100 TB stream needs: each partition folds its rows into at
  * most k-1 (item, counter) pairs, the shuffle moves ONE small sketch
  * per partition, and merge is the mergeable-summaries combine
  * (Agarwal et al.: sum counters, then subtract the k-th largest and
  * drop non-positive), so state never depends on the data volume.
  *
  * Guarantees: every reported count is a LOWER bound within N/k of the
  * true frequency, and every item with true frequency > N/k survives.
  * When the column's distinct cardinality is at most k-1 the sketch
  * never evicts, counts are EXACT, and the result equals the plain
  * GROUP BY — which is what the oracle gate checks (the bound path is
  * spec-asserted on synthetic skew). Output is sorted (count desc,
  * item asc) so the exact case is deterministic cross-engine. */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]]
  with ImplicitCastInputTypes {

  require(k >= 2, s"k must be >= 2, got $k")

  import org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("lower_bound", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap

  private def accumulate(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      item: UTF8String, cnt: Long): Unit = {
    val cur = buf.get(item)
    buf.put(item, if (cur == null) cnt else cur + cnt): Unit
  }

  /** Amortization slack: the working buffer may grow to 2(k-1) counters
    * between shrinks, so the O(size log size) sort+pass runs at most
    * once per k-1 insertions instead of once per row — O(log k)
    * amortized (ADVICE r12). The N/k bound is unchanged: a shrink
    * subtracts the k-th largest δ while >= k counters hold >= δ, so
    * every shrink still destroys >= k·δ of the N total weight. The
    * k-1-counter STATE contract holds at every boundary the outside
    * world sees: [[serialize]] (the wire sketch) and [[eval]] shrink to
    * capacity first — one shrink suffices, since only counters STRICTLY
    * above the k-th largest survive it (<= k-1 of them). */
  private def slack: Int = 2 * (k - 1)

  /** Insert-then-shrink (the mergeable form of the classic decrement):
    * if more than k-1 counters survive, subtract the k-th largest from
    * all and drop non-positive ones. */
  private def shrink(buf: java.util.HashMap[UTF8String, java.lang.Long]): Unit =
    if (buf.size > k - 1) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val it0 = buf.values().iterator()
      while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - k) // k-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - sub
        if (nv <= 0) it.remove() else e.setValue(nv): Unit
      }
    }

  override def update(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      // clone: the UTF8String may be backed by a reused row buffer
      accumulate(buf, v.asInstanceOf[UTF8String].clone(), 1L)
      if (buf.size > slack) shrink(buf)
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      other: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      accumulate(buf, e.getKey, e.getValue)
    }
    if (buf.size > slack) shrink(buf)
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    shrink(buf) // k-1-counter output contract at the visible boundary
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      org.apache.spark.sql.catalyst.InternalRow(item, cnt)
    })
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    shrink(buf) // the wire sketch stays <= k-1 counters (SURVEY posture)
    val bos = new java.io.ByteArrayOutputStream
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val cnt = in.readLong()
      buf.put(UTF8String.fromBytes(b), cnt)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** K-bounded merge of per-chunk sorted top-k blocks — the final
  * aggregate of [[graft.arrays.ChunkedArray.topkRows]].
  *
  * The collect_list form it replaces buffered EVERY chunk's k-block
  * unsliced on one reducer per timestep — O(k · #chunks) structs sorted
  * in one place, the last near-single-reducer pattern in the array
  * engine (VERDICT r12 item 3). This TypedImperativeAggregate keeps the
  * running buffer at AT MOST k entries everywhere: map-side partials
  * fold a whole partition's chunks into one k-block, the shuffle moves
  * one k-block per partition, and the final merge is a two-pointer
  * sorted merge that never materializes more than 2k entries.
  *
  * Ordering replays the array_sort struct comparator exactly: ascending
  * (nv, gidx) with SQL double semantics (-0.0 == 0.0, ties fall to
  * gidx), so results are bit-identical to the collect_list form
  * (ChunkedArraySpec equivalence + unchanged CORRECTNESS hash). Input
  * blocks MUST be sorted ascending (the chunk-side
  * `slice(array_sort(...), 1, k)` guarantees it). */
case class TopKSortedMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    TopKSortedMerge.Buf] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nv", DoubleType, nullable = false),
    StructField("gidx", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk_merge"

  override def createAggregationBuffer(): TopKSortedMerge.Buf =
    new TopKSortedMerge.Buf(0, new Array[Double](k), new Array[Long](k))

  /** SQL double comparison (SQLOrderingUtil.compareDoubles): == first so
    * -0.0 and 0.0 tie (then gidx breaks), NaN greatest. */
  private def lt(nv1: Double, g1: Long, nv2: Double, g2: Long): Boolean = {
    val c =
      if (nv1 == nv2) 0
      else if (nv1 < nv2) -1
      else if (nv1 > nv2) 1
      else if (java.lang.Double.isNaN(nv1)) { if (java.lang.Double.isNaN(nv2)) 0 else 1 }
      else -1
    if (c != 0) c < 0 else g1 < g2
  }

  /** Merge a sorted block (ArrayData of (nv, gidx) structs) into the
    * sorted buffer, keeping the k smallest. */
  private def mergeBlock(buf: TopKSortedMerge.Buf, block: ArrayData): TopKSortedMerge.Buf = {
    val m = block.numElements()
    if (m == 0) return buf
    val outNv = new Array[Double](k)
    val outG = new Array[Long](k)
    var i = 0; var j = 0; var o = 0
    while (o < k && (i < buf.n || j < m)) {
      val takeBuf =
        if (i >= buf.n) false
        else if (j >= m) true
        else {
          val s = block.getStruct(j, 2)
          lt(buf.nv(i), buf.gidx(i), s.getDouble(0), s.getLong(1))
        }
      if (takeBuf) { outNv(o) = buf.nv(i); outG(o) = buf.gidx(i); i += 1 }
      else {
        val s = block.getStruct(j, 2)
        outNv(o) = s.getDouble(0); outG(o) = s.getLong(1); j += 1
      }
      o += 1
    }
    System.arraycopy(outNv, 0, buf.nv, 0, o)
    System.arraycopy(outG, 0, buf.gidx, 0, o)
    buf.n = o
    buf
  }

  override def update(
      buf: TopKSortedMerge.Buf,
      input: org.apache.spark.sql.catalyst.InternalRow): TopKSortedMerge.Buf = {
    val v = child.eval(input)
    if (v == null) buf else mergeBlock(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: TopKSortedMerge.Buf, other: TopKSortedMerge.Buf): TopKSortedMerge.Buf = {
    if (other.n == 0) return buf
    val outNv = new Array[Double](k)
    val outG = new Array[Long](k)
    var i = 0; var j = 0; var o = 0
    while (o < k && (i < buf.n || j < other.n)) {
      val takeBuf =
        if (i >= buf.n) false
        else if (j >= other.n) true
        else lt(buf.nv(i), buf.gidx(i), other.nv(j), other.gidx(j))
      if (takeBuf) { outNv(o) = buf.nv(i); outG(o) = buf.gidx(i); i += 1 }
      else { outNv(o) = other.nv(j); outG(o) = other.gidx(j); j += 1 }
      o += 1
    }
    System.arraycopy(outNv, 0, buf.nv, 0, o)
    System.arraycopy(outG, 0, buf.gidx, 0, o)
    buf.n = o
    buf
  }

  override def eval(buf: TopKSortedMerge.Buf): Any =
    new GenericArrayData((0 until buf.n).map(i =>
      org.apache.spark.sql.catalyst.InternalRow(buf.nv(i), buf.gidx(i))).toArray[Any])

  override def serialize(buf: TopKSortedMerge.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.nv(i)); bb.putLong(buf.gidx(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKSortedMerge.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKSortedMerge.Buf(n, new Array[Double](k), new Array[Long](k))
    var i = 0
    while (i < n) { buf.nv(i) = bb.getDouble(); buf.gidx(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSortedMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSortedMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKSortedMerge {
  /** Sorted ascending by (nv, gidx); n <= k always. */
  final class Buf(var n: Int, val nv: Array[Double], val gidx: Array[Long])
}

/** One-pass outer-product accumulation of a quantized integer vector
  * column: the dim×dim Gram, the per-dim sums AND the row count in a
  * SINGLE [[org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate]]
  * — the mergeable-summaries posture (MisraGries' contract) for
  * second-moment statistics over embedding space. Buffer layout:
  * `[0, dim²)` = row-major Gram, `[dim², dim²+dim)` = sums, last = n;
  * ~33 KB at dim 64. Map-side partials fold every row where it sits
  * and the shuffle moves ONE buffer per partition — vs the posexplode
  * self-join spelling, which shuffled n·dim rows per side and
  * materialized n·dim² join rows through the aggregate (measured r17:
  * that intermediate churn pressured the whole bench JVM, a uniform
  * +5 s across unrelated queries). Exact integer arithmetic throughout:
  * the caller bounds |q| so each PRODUCT fits a Long, and every
  * accumulation is overflow-CHECKED (`Math.addExact`/`multiplyExact`)
  * so a row count large enough to wrap the Long sums fails loudly
  * instead of silently wrapping — at true 100 TB row counts use
  * [[GramWide]], the 128-bit-accumulating sibling whose sums cannot
  * overflow at any physical scale. A NULL vector element likewise
  * fails loudly: the oracle's NULL arithmetic would silently diverge,
  * and a null embedding component is upstream corruption, not data. */
case class GramLong(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    Array[Long]] with ImplicitCastInputTypes {

  require(dim >= 1, s"dim must be >= 1, got $dim")
  private val len = dim * dim + dim + 1

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_long"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    require(a.numElements() == dim,
      s"expected $dim components, got ${a.numElements()}")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"graft_gram_long: NULL component at index $i — the oracle's " +
            "NULL arithmetic would silently diverge; clean or drop the row")
      }
      q(i) = a.getLong(i); i += 1
    }
    i = 0
    while (i < dim) {
      val qi = q(i)
      val base = i * dim
      var j = 0
      while (j < dim) {
        buf(base + j) = Math.addExact(buf(base + j), Math.multiplyExact(qi, q(j)))
        j += 1
      }
      buf(dim * dim + i) = Math.addExact(buf(dim * dim + i), qi)
      i += 1
    }
    buf(len - 1) += 1L
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(len * 8)
    var i = 0
    while (i < len) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](len)
    var i = 0
    while (i < len) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** [[GramLong]]'s true-scale sibling: the same one-pass Gram + sums +
  * count layout accumulated in SIGNED 128-BIT integers (two Longs per
  * cell: hi word signed, lo word unsigned) and emitted as
  * `array<decimal(38,0)>` — the "DECIMAL(38,0) widening at true
  * scale" SURVEY §2.E documents, as code. With |q| ≤ 2³⁰ each product
  * is ≤ 2⁶⁰, so the 128-bit sums would need ~2⁶⁷ rows to overflow —
  * physically unreachable; the fold is exact at ANY row count while
  * [[GramLong]] fails loudly (addExact) past ~2⁶³/|q|² rows. Per-row
  * cost is one `multiplyHigh` + carry per cell over GramLong's fused
  * multiply-add; the wire shape is unchanged (ONE ~66 KB buffer per
  * partition at dim 64, still independent of row count). NULL
  * components fail loudly for the same oracle-divergence reason. */
case class GramWide(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    Array[Long]] with ImplicitCastInputTypes {

  require(dim >= 1, s"dim must be >= 1, got $dim")
  // logical cells: dim² gram + dim sums + 1 count; physical = 2 longs each
  private val cells = dim * dim + dim + 1

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = false)
  override def prettyName: String = "graft_gram_wide"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells * 2)

  /** buf(2c) += hi(p), buf(2c+1) += lo(p) with carry — two's-complement
    * 128-bit add of the 128-bit product (phi, plo). */
  @inline private def add128(buf: Array[Long], c: Int, phi: Long, plo: Long): Unit = {
    val lo = buf(2 * c + 1)
    val nlo = lo + plo
    // unsigned carry out of the low-word add
    val carry = ((lo & plo) | ((lo | plo) & ~nlo)) >>> 63
    buf(2 * c) += phi + carry
    buf(2 * c + 1) = nlo
  }

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    require(a.numElements() == dim,
      s"expected $dim components, got ${a.numElements()}")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"graft_gram_wide: NULL component at index $i — the oracle's " +
            "NULL arithmetic would silently diverge; clean or drop the row")
      }
      q(i) = a.getLong(i); i += 1
    }
    i = 0
    while (i < dim) {
      val qi = q(i)
      val base = i * dim
      var j = 0
      while (j < dim) {
        val qj = q(j)
        add128(buf, base + j, Math.multiplyHigh(qi, qj), qi * qj)
        j += 1
      }
      // sum cell: qi sign-extended to 128 bits
      add128(buf, dim * dim + i, qi >> 63, qi)
      i += 1
    }
    add128(buf, cells - 1, 0L, 1L)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var c = 0
    while (c < cells) { add128(b1, c, b2(2 * c), b2(2 * c + 1)); c += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](cells)
    var c = 0
    while (c < cells) {
      val bi = java.math.BigInteger.valueOf(buf(2 * c)).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(buf(2 * c + 1))))
      out(c) = org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(bi), 38, 0)
      c += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(cells * 16)
    var i = 0
    while (i < cells * 2) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](cells * 2)
    var i = 0
    while (i < cells * 2) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramWide =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramWide =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** K-minimum-values distinct sketch: the k SMALLEST DISTINCT values of
  * a 60-bit-hash column, as a sorted `array<bigint>`. The consumer
  * estimates distinct counts: m < k ⇒ exactly m distinct hashes seen;
  * otherwise the k-th smallest hash h_k estimates (k−1)·2⁶⁰/h_k
  * (Bar-Yossef et al. 2002; the Theta-sketch family's KMV form).
  *
  * Unlike HLL, the result is DETERMINISTIC AND MERGE-ORDER INVARIANT:
  * the state is the k smallest elements of a SET, a commutative
  * semilattice — any partitioning, any merge tree, same answer — so a
  * DuckDB oracle replays it exactly (ORDER BY hash LIMIT k) and the
  * estimate cross-engine hash-matches; the error bound (~1/√k rank
  * deviation w.h.p. over the hash) is spec-asserted against exact
  * counts. State is ≤ k longs per group per partition; map-side
  * partials shrink every group to ≤ k before the exchange. */
case class KMinHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    java.util.TreeSet[java.lang.Long]] with ImplicitCastInputTypes {

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmin_hash"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size() < k) { buf.add(h): Unit }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.pollLast(): Unit }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size() * 8)
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { bb.putLong(it.next()): Unit }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong): Unit; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Deterministic bounded quantile sample: the k (hash, value) pairs
  * with the SMALLEST hashes — a uniform-without-replacement sample of
  * size k whose membership depends only on the input MULTISET (k
  * smallest of a union: commutative, associative, merge-order
  * invariant) — evaluated to the sample's values SORTED ASCENDING.
  * The consumer reads rank-indexed quantile estimates (integer rank
  * arithmetic, no interpolation), so the whole estimate is exact-
  * replayable in a DuckDB oracle (row_number ≤ k by (hash, value),
  * then rank by value) — the deterministic mergeable quantile sketch
  * VERDICT r17 #2 asked for, closing the one rows-only exemption.
  * Rank error is the classic bottom-k-sample bound ~1/√k w.h.p. over
  * the hash (spec-asserted against exact quantiles). State: ≤ k
  * (long, double) pairs per group per partition, a bounded max-heap;
  * one ≤ 16k-byte buffer per group crosses the wire. */
case class KSmallestByHash(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    emitPairs: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    java.util.PriorityQueue[KSmallestByHash.P]] with ImplicitCastInputTypes {

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)
  override def nullable: Boolean = false
  /** Default: values sorted ascending (the quantile read). With
    * `emitPairs`, the raw (h, v) sample sorted by (h, v) — the
    * MERGEABLE form a streaming consumer folds into running state
    * (values alone cannot merge: the k-smallest rule needs hashes). */
  override def dataType: DataType =
    if (emitPairs) ArrayType(StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))), containsNull = false)
    else ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_ksmallest_by_hash"

  override def createAggregationBuffer(): java.util.PriorityQueue[KSmallestByHash.P] =
    new java.util.PriorityQueue[KSmallestByHash.P](k + 1, KSmallestByHash.MaxFirst)

  private def insert(buf: java.util.PriorityQueue[KSmallestByHash.P],
      h: Long, v: Double): Unit = {
    if (buf.size() < k) { buf.offer(new KSmallestByHash.P(h, v)): Unit }
    else {
      val top = buf.peek()
      if (h < top.h || (h == top.h && v < top.v)) {
        buf.poll(): Unit
        buf.offer(new KSmallestByHash.P(h, v)): Unit
      }
    }
  }

  override def update(buf: java.util.PriorityQueue[KSmallestByHash.P],
      input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.PriorityQueue[KSmallestByHash.P] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null) {
      insert(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[KSmallestByHash.P],
      b2: java.util.PriorityQueue[KSmallestByHash.P])
      : java.util.PriorityQueue[KSmallestByHash.P] = {
    val it = b2.iterator()
    while (it.hasNext) { val p = it.next(); insert(b1, p.h, p.v) }
    b1
  }

  override def eval(buf: java.util.PriorityQueue[KSmallestByHash.P]): Any = {
    if (emitPairs) {
      val arr = new Array[KSmallestByHash.P](buf.size())
      buf.toArray(arr): Unit
      java.util.Arrays.sort(arr, KSmallestByHash.MaxFirst.reversed())
      new GenericArrayData(arr.map(p =>
        org.apache.spark.sql.catalyst.InternalRow(p.h, p.v): Any))
    } else {
      val out = new Array[Double](buf.size())
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next().v; i += 1 }
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: java.util.PriorityQueue[KSmallestByHash.P]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size() * 16)
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      bb.putLong(p.h)
      bb.putDouble(p.v): Unit
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[KSmallestByHash.P] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer(new KSmallestByHash.P(bb.getLong, bb.getDouble)): Unit; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KSmallestByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KSmallestByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
}

object KSmallestByHash {
  /** A sampled (hash, value) pair. */
  final class P(val h: Long, val v: Double)
  /** Max-first on (h, v) — the heap root is the eviction candidate. */
  val MaxFirst: java.util.Comparator[P] = new java.util.Comparator[P] {
    override def compare(a: P, b: P): Int = {
      val c = java.lang.Long.compare(b.h, a.h)
      if (c != 0) c else java.lang.Double.compare(b.v, a.v)
    }
  }
}

/** Exact set Jaccard of two `array<bigint>` columns in ONE pass.
  *
  * Replaces `size(array_intersect(a, b)) / size(array_union(a, b))` —
  * two independent hash-set constructions, each MATERIALIZING its
  * result array only for `size` to discard it — in the dedup family's
  * per-candidate-pair hot path (verifiedPairs, dd_simhash_est,
  * dd_span-adjacent faces). One hash set of a's elements, one dedup
  * set over b, zero intermediate arrays.
  *
  * Semantics replicate the Catalyst spelling exactly: DISTINCT-set
  * counts (duplicates collapse, like array_intersect/array_union), a
  * null ELEMENT counts as one distinct member on its side (intersect
  * iff both sides hold a null — Spark's null-as-value collection
  * semantics), |A∩B| and |A∪B| are exact ints and the result is their
  * double ratio. A NULL array on either side yields NULL. The one
  * declared divergence is OUT of the queries' domain: on empty/empty
  * inputs (every verify pair carries non-empty hs by construction)
  * this yields pure-IEEE NaN where the ANSI Catalyst spelling throws —
  * Spark 4's ANSI Divide raises DIVIDE_BY_ZERO even for DOUBLE 0.0/0.0
  * (probe-verified against this build; the "doubles are IEEE under
  * ANSI" folklore does not hold here).
  * Equivalence spec-gated incl. dups, nulls and empties
  * (FunctionsSpec). */
/** KLL/MRL-style deterministic-compaction rank sketch over doubles
  * (VERDICT r18 #6, the SECOND deterministic rank sketch next to the
  * bottom-k sample; Karnin, Lang & Liberty 2016 "Optimal quantile
  * approximation in streams" give the randomized compactor, Manku,
  * Rajagopalan & Lindsay 1998 the deterministic collapse scheme this
  * variant follows): a hierarchy of levels where level i holds items
  * of weight 2^i and at most `k` of them; a full level sorts, keeps
  * every second item starting at an ALTERNATING parity (the classic
  * MRL determinization of KLL's random coin — consecutive compactions'
  * ±w/2 rank errors cancel), and promotes the survivors one level up.
  *
  * Why it exists next to [[KSmallestByHash]]: bottom-k holds k items
  * for ~1/√k rank error and its state is input-SET-determined (merge-
  * order invariant — the oracle-replayable face, which stays the
  * gate); the compactor holds O(k·log(n/k)) items for O(log(n/k)/k)
  * rank error — at 100 TB group cardinalities the log-factor state
  * buys orders of magnitude tighter ranks than the same memory spent
  * on a flat sample. The price is that the RESULT depends on the
  * partition/merge layout (any compaction scheme's does), so this
  * face is SPEC-gated on its error bounds against exact ranks
  * ([[graft.KllSketchSpec]]), not oracle-hashed.
  *
  * Wire contract (the mergeable-summaries posture): one ≤ k·levels
  * item buffer per group per partition, map-side shrunk; merge
  * concatenates levels pairwise and re-compacts. Output: the sketch's
  * (value, weight) pairs sorted by (value, weight) — total weight
  * equals n exactly, and rank queries walk the cumulative weights. */
case class KllDouble(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[
    KllDouble.Buf]
  with ImplicitCastInputTypes {

  require(k >= 4 && k % 2 == 0, s"k must be even and >= 4, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("weight", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_kll_double"

  override def createAggregationBuffer(): KllDouble.Buf = new KllDouble.Buf

  /** See [[KllDouble.compact]] — shared with the streaming running
    * state, which folds eval()'d (value, weight) pairs into the same
    * Buf and compacts with the same rules. */
  private def compactFrom(buf: KllDouble.Buf, from: Int): Unit =
    KllDouble.compact(buf, k, from)

  override def update(buf: KllDouble.Buf,
      input: org.apache.spark.sql.catalyst.InternalRow): KllDouble.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      if (buf.levels.isEmpty) {
        buf.levels += new scala.collection.mutable.ArrayBuffer[Double]
        buf.parity += 0
      }
      buf.levels(0) += v.asInstanceOf[Double]
      compactFrom(buf, 0)
    }
    buf
  }

  override def merge(buf: KllDouble.Buf, other: KllDouble.Buf): KllDouble.Buf = {
    buf.n += other.n
    var i = 0
    while (i < other.levels.length) {
      if (i >= buf.levels.length) {
        buf.levels += new scala.collection.mutable.ArrayBuffer[Double]
        buf.parity += 0
      }
      buf.levels(i) ++= other.levels(i)
      i += 1
    }
    compactFrom(buf, 0)
    buf
  }

  override def eval(buf: KllDouble.Buf): Any = {
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < buf.levels.length) {
      val w = 1L << i
      buf.levels(i).foreach(v => pairs += ((v, w)))
      i += 1
    }
    val sorted = pairs.sortBy(identity).toArray
    new GenericArrayData(sorted.map { case (v, w) =>
      org.apache.spark.sql.catalyst.InternalRow(v, w)
    })
  }

  override def serialize(buf: KllDouble.Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.levels.length)
    var i = 0
    while (i < buf.levels.length) {
      out.writeInt(buf.parity(i))
      val lvl = buf.levels(i)
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllDouble.Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new KllDouble.Buf
    buf.n = in.readLong()
    val nl = in.readInt()
    var i = 0
    while (i < nl) {
      buf.parity += in.readInt()
      val len = in.readInt()
      val lvl = new scala.collection.mutable.ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { lvl += in.readDouble(); j += 1 }
      buf.levels += lvl
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDouble =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDouble =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KllDouble {
  /** Levels of weighted items: level i items carry weight 2^i;
    * `parity(i)` alternates which half a compaction of level i keeps. */
  final class Buf {
    var n: Long = 0L
    val levels = scala.collection.mutable.ArrayBuffer.empty[
      scala.collection.mutable.ArrayBuffer[Double]]
    val parity = scala.collection.mutable.ArrayBuffer.empty[Int]
  }

  /** Compact every level over capacity `k`, cascading upward: sort; an
    * odd-length level holds ONE boundary item back (alternating which
    * end — weight is conserved exactly: 2·(m/2 promoted) + held == m);
    * the even remainder keeps every second item from the level's
    * alternating parity and promotes at doubled weight. A merge can
    * overfill a high level while the ones below are within capacity,
    * so the walk visits EVERY level from `from` (promotions land at
    * i+1, which it reaches next). */
  private[graftexpr] def compact(buf: Buf, k: Int, from: Int = 0): Unit = {
    var i = from
    while (i < buf.levels.length) {
      if (buf.levels(i).length <= k) { i += 1 }
      else {
        val lvl = buf.levels(i)
        val arr = lvl.toArray
        java.util.Arrays.sort(arr)
        lvl.clear()
        if (i + 1 >= buf.levels.length) {
          buf.levels += new scala.collection.mutable.ArrayBuffer[Double]
          buf.parity += 0
        }
        val p = buf.parity(i)
        var lo = 0
        var hi = arr.length
        if (arr.length % 2 == 1) {
          if (p == 0) { hi -= 1; lvl += arr(hi) } else { lvl += arr(0); lo = 1 }
        }
        val up = buf.levels(i + 1)
        var j = lo + p
        while (j < hi) { up += arr(j); j += 2 }
        buf.parity(i) = 1 - p
        i += 1
      }
    }
  }

  /** Fold eval()'d (value, weight-2^i) pairs into `buf` — the
    * streaming consumer's merge: each item inserts at its weight's
    * level (level lists concatenate, exactly like the aggregate's own
    * merge), then one compaction pass. Weights must be powers of two
    * (the sketch's own output invariant). */
  def mergePairs(buf: Buf, k: Int, pairs: Iterator[(Double, Long)]): Unit = {
    while (pairs.hasNext) {
      val (v, w) = pairs.next()
      require(w > 0 && (w & (w - 1)) == 0, s"weight $w is not a power of two")
      val lvl = java.lang.Long.numberOfTrailingZeros(w)
      while (buf.levels.length <= lvl) {
        buf.levels += new scala.collection.mutable.ArrayBuffer[Double]
        buf.parity += 0
      }
      buf.levels(lvl) += v
      buf.n += w
    }
    compact(buf, k)
  }

  /** The (value, weight) pairs of a Buf, sorted — [[quantile]]'s
    * input shape (the same ordering eval() emits). */
  def pairsOf(buf: Buf): Seq[(Double, Long)] = {
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < buf.levels.length) {
      val w = 1L << i
      buf.levels(i).foreach(v => pairs += ((v, w)))
      i += 1
    }
    pairs.sortBy(identity).toSeq
  }

  /** Rank query over an eval()'d sketch: the smallest value whose
    * cumulative weight reaches ceil(q·n) (rank 1 = smallest; q = 0
    * reads the minimum retained item). */
  def quantile(pairs: Seq[(Double, Long)], q: Double): Double = {
    require(pairs.nonEmpty, "quantile of an empty sketch")
    val n = pairs.map(_._2).sum
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    val it = pairs.iterator
    while (it.hasNext) {
      val (v, w) = it.next()
      cum += w
      if (cum >= target) return v
    }
    pairs.last._1
  }
}

/** The 62-bit digit-vector key hash as ONE compiled expression — the
  * [[graft.operators.Relational]] `permHash62` math (base-p digits,
  * two independent mod-p linear combinations) in a single tight JVM
  * method instead of a ~28-node Catalyst tree. The sketch aggregates
  * (KMinHash / KSmallestByHash) are TypedImperativeAggregates whose
  * child expressions evaluate INTERPRETED per row inside
  * ObjectHashAggregate, so the r19 widening's tree-size tripled the
  * per-row eval cost there (q_approx_sketch 0.64 → 1.2 s isolated,
  * A/B-measured); one expression node restores it. Values are
  * IDENTICAL to the Catalyst spelling and the DuckDB oracle twin —
  * exact int64 arithmetic, same formulas (equivalence spec-gated in
  * RelationalSpec; CodegenGate compile-gated). */
case class PermHash62(child: Expression, p: Long,
    a1: Long, a3: Long, a5: Long, b1: Long,
    a2: Long, a4: Long, a6: Long, b2: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_perm_hash62"

  def compute(x: Long): Long = {
    val d0 = x % p
    val d1 = (x / p) % p
    val d2 = x / (p * p)
    val h1 = ((a1 * d0) % p + (a3 * d1) % p + (a5 * d2) % p + b1) % p
    val h2 = ((a2 * d0) % p + (a4 * d1) % p + (a6 * d2) % p + b2) % p
    h1 * p + h2
  }

  override def nullSafeEval(x: Any): Any = compute(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("permHash62", this, classOf[PermHash62].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.compute($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class JaccardSet(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"
  override def nullable: Boolean = true

  // returns primitive double (nullSafeCodeGen already guards null arrays)
  def compute(aAny: Any, bAny: Any): Double = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[java.lang.Long](Math.max(8, na * 2))
    var aNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aNull = true
      else setA.add(a.getLong(i)): Unit
      i += 1
    }
    val seenB = new java.util.HashSet[java.lang.Long](Math.max(8, nb * 2))
    var bNull = false
    var inter = 0
    var bOnly = 0
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bNull = true
      else {
        val v = b.getLong(i)
        if (seenB.add(v)) {
          if (setA.contains(v)) inter += 1 else bOnly += 1
        }
      }
      i += 1
    }
    val interN = inter + (if (aNull && bNull) 1 else 0)
    val unionN = setA.size + bOnly + (if (aNull || bNull) 1 else 0)
    // 0/0 -> NaN, exactly like cast(size)/cast(size) on empty inputs
    interN.toDouble / unionN.toDouble
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any = compute(aAny, bAny)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccardSet", this, classOf[JaccardSet].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SketchExpressions {
  /** Exact integer division of a non-negative BIGINT column by a
    * positive literal (Catalyst `IntegralDivide`, i.e. SQL `div`):
    * never routes through a double, so keys above 2⁵³ divide exactly.
    * DuckDB twin: `x // d`. */
  def intDiv(x: Column, d: Long): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ExpressionUtils.expression(x),
        org.apache.spark.sql.catalyst.expressions.Literal(d)))

  /** Column wrapper for [[MinHashSignature]]. */
  def minhashSignature(hs: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(hs), a, b, p))

  /** Column wrapper for [[JaccardSet]]. */
  def jaccardSet(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSet(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column wrapper for [[SimHash]]. */
  def simhash(hs: Column, bits: Int): Column =
    ExpressionUtils.column(SimHash(ExpressionUtils.expression(hs), bits))

  /** Back-compat 32-bit wrapper. */
  def simhash32(hs: Column): Column = simhash(hs, 32)

  /** Aggregate Column wrapper for [[MisraGries]]: heavy hitters of a
    * string column with at most k-1 counters of state. */
  def heavyHitters(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGries(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Aggregate Column wrapper for [[TopKSortedMerge]]: k-bounded merge
    * of sorted per-chunk top-k blocks. */
  def topkSortedMerge(c: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKSortedMerge(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Aggregate Column wrapper for [[GramLong]]: one-pass Gram + sums +
    * count of a quantized integer vector column. */
  def gramLong(c: Column, dim: Int): Column =
    ExpressionUtils.column(
      GramLong(ExpressionUtils.expression(c), dim).toAggregateExpression())

  /** Aggregate Column wrapper for [[GramWide]]: the 128-bit /
    * decimal(38,0) widening of [[gramLong]] for true-scale row counts. */
  def gramWide(c: Column, dim: Int): Column =
    ExpressionUtils.column(
      GramWide(ExpressionUtils.expression(c), dim).toAggregateExpression())

  /** Aggregate Column wrapper for [[KMinHash]]: k smallest distinct
    * hashes, sorted — the deterministic KMV distinct sketch. */
  def kMinHash(c: Column, k: Int): Column =
    ExpressionUtils.column(
      KMinHash(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Aggregate Column wrapper for [[KSmallestByHash]]: the values of
    * the k smallest-hash rows, sorted ascending — the deterministic
    * bounded quantile sample. */
  def kSmallestByHash(h: Column, v: Column, k: Int): Column =
    ExpressionUtils.column(
      KSmallestByHash(ExpressionUtils.expression(h),
        ExpressionUtils.expression(v), k).toAggregateExpression())

  /** [[kSmallestByHash]]'s mergeable form: the raw (h, v) sample —
    * what a streaming consumer folds into running state. */
  def kSmallestPairsByHash(h: Column, v: Column, k: Int): Column =
    ExpressionUtils.column(
      KSmallestByHash(ExpressionUtils.expression(h),
        ExpressionUtils.expression(v), k, emitPairs = true).toAggregateExpression())

  /** Aggregate Column wrapper for [[KllDouble]]: the deterministic-
    * compaction rank sketch's (value, weight) pairs. */
  def kllDouble(c: Column, k: Int): Column =
    ExpressionUtils.column(
      KllDouble(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Column wrapper for [[PermHash62]]. */
  def permHash62Native(c: Column, p: Long,
      a1: Long, a3: Long, a5: Long, b1: Long,
      a2: Long, a4: Long, a6: Long, b2: Long): Column =
    ExpressionUtils.column(PermHash62(
      ExpressionUtils.expression(c), p, a1, a3, a5, b1, a2, a4, a6, b2))
}
