package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence gate for the native decimal chunk folds
  * (ChunkFoldExpressions.scala): the codegen'd expressions must match
  * the interpreted `aggregate(...)` HOF spelling they replaced
  * BIT-FOR-BIT — on the real corpus-shaped payloads (exact 2-decimal
  * doubles, the fast path) AND on pathological inputs that force the
  * BigDecimal slow path. Error-domain inputs ((18,2) overflow, NaN)
  * follow the session cast mode like the HOF's inner Cast did: ANSI
  * (Spark 4's default) throws, non-ANSI null-poisons — both asserted.
  * Same gate pattern as the WordNgrams/MinHashSignature equivalence
  * specs. */
class ChunkFoldSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  import org.apache.spark.sql.graftexpr.ChunkFolds

  private val DEC = "DECIMAL(28,2)"
  private def hofSum(data: org.apache.spark.sql.Column) =
    aggregate(data, lit(0).cast(DEC),
      (acc, x) => (acc + x.cast("decimal(18,2)")).cast(DEC))
  private def hofSumSq(data: org.apache.spark.sql.Column) = {
    val d2 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
    aggregate(data, lit(0).cast("decimal(38,4)"),
      (acc, x) => (acc + d2(x) * d2(x)).cast("decimal(38,4)"))
  }

  /** In-domain corpus: fast-path 2-decimal values, slow-path full-
    * precision doubles, nulls, empties — no cast errors. Seeded. */
  private def probeDf = {
    val rnd = new scala.util.Random(13)
    val rows: Seq[Seq[java.lang.Double]] =
      // corpus-shaped: exact 2-decimal payloads of varied magnitude
      (0 until 40).map(_ => Seq.fill(rnd.nextInt(50) + 1)(
        java.lang.Double.valueOf(math.round(rnd.nextGaussian() * 1e5) / 100.0))) ++
      // slow path: full-precision doubles
      (0 until 20).map(_ => Seq.fill(rnd.nextInt(30) + 1)(
        java.lang.Double.valueOf(rnd.nextGaussian() * math.pow(10, rnd.nextInt(12) - 4)))) ++
      Seq(
        Seq.empty[java.lang.Double],                       // empty -> seed
        Seq(java.lang.Double.valueOf(1.5), null),          // null element poisons
        Seq(null, java.lang.Double.valueOf(3.25)),
        Seq(java.lang.Double.valueOf(0.005), java.lang.Double.valueOf(-0.005)),
        Seq(java.lang.Double.valueOf(123.455), java.lang.Double.valueOf(0.015)),
        // large exact cents near the fast-path magnitude guard
        Seq(java.lang.Double.valueOf(7.9e12), java.lang.Double.valueOf(-7.9e12)),
        Seq(java.lang.Double.valueOf(9.5e13), java.lang.Double.valueOf(1.23)))
    rows.toDF("data")
  }

  /** Cast-error corpus: (18,2) overflow and specials. */
  private def errorDf = Seq(
    Seq(java.lang.Double.valueOf(1e17)),
    Seq(java.lang.Double.valueOf(-1e17), java.lang.Double.valueOf(2.0)),
    Seq(java.lang.Double.valueOf(Double.NaN)),
    Seq(java.lang.Double.valueOf(Double.PositiveInfinity))).toDF("data")

  test("native ChunkSumDec == interpreted HOF fold, incl. slow paths") {
    val diff = probeDf
      .select(ChunkFolds.chunkSumDecNative(col("data")).as("nat"),
        hofSum(col("data")).as("hof"))
      .filter(!(col("nat") <=> col("hof")))
    assert(diff.count() == 0, diff.collect().mkString("; "))
  }

  test("native ChunkSumSqDec == interpreted HOF square fold") {
    val diff = probeDf
      .select(ChunkFolds.chunkSumSqDecNative(col("data")).as("nat"),
        hofSumSq(col("data")).as("hof"))
      .filter(!(col("nat") <=> col("hof")))
    assert(diff.count() == 0, diff.collect().mkString("; "))
  }

  test("error-domain inputs null-poison under non-ANSI, matching the HOF") {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val diff = errorDf
        .select(ChunkFolds.chunkSumDecNative(col("data")).as("nat"),
          hofSum(col("data")).as("hof"),
          ChunkFolds.chunkSumSqDecNative(col("data")).as("natsq"),
          hofSumSq(col("data")).as("hofsq"))
        .filter(!(col("nat") <=> col("hof")) || !(col("natsq") <=> col("hofsq")))
      assert(diff.count() == 0, diff.collect().mkString("; "))
      // and they really are null (poisoned), not merely equal
      val r = errorDf.select(ChunkFolds.chunkSumDecNative(col("data"))).collect()
      assert(r.forall(_.isNullAt(0)))
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("error-domain inputs throw under ANSI, matching the HOF's Cast") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val overflow = Seq(Seq(java.lang.Double.valueOf(1e17))).toDF("data")
    intercept[Exception] {
      overflow.select(ChunkFolds.chunkSumDecNative(col("data"))).collect()
    }
    intercept[Exception] {
      overflow.select(hofSum(col("data"))).collect()
    }
  }

  test("null array -> null, matching the HOF") {
    val df = Seq(Tuple1(null.asInstanceOf[Array[java.lang.Double]]))
      .toDF("data")
    val r = df.select(
      ChunkFolds.chunkSumDecNative(col("data")),
      ChunkFolds.chunkSumSqDecNative(col("data"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("fast-path long-accumulator promotion (many large exact cents)") {
    // 1000 x 7.9e12 = 7.9e15 dollars: each element is fast-path exact,
    // the running cents total crosses the 4.5e18 promotion guard mid-fold
    val big = Seq(Seq.fill(1000)(java.lang.Double.valueOf(7.9e12))).toDF("data")
    val r = big.select(ChunkFolds.chunkSumDecNative(col("data")).as("nat"),
      hofSum(col("data")).as("hof")).head()
    assert(r.getDecimal(0) == r.getDecimal(1))
    assert(r.getDecimal(0) == new java.math.BigDecimal("7900000000000000.00"))
  }

  test("native BlockMatmulDec == interpreted triple-HOF block product") {
    import org.apache.spark.sql.graftexpr.ChunkFolds
    val (rI, kI, cI) = (3, 4, 2)
    def hofBlock(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val zero = lit(0).cast("decimal(38,4)")
      transform(sequence(lit(0), lit(rI * cI - 1)), idx => {
        val i = (idx / cI).cast("int")
        val j = idx % cI
        aggregate(sequence(lit(0), lit(kI - 1)), zero, (acc, k) =>
          (acc + (a(i * kI + k) * b(k * cI + j))
            .cast("decimal(18,4)")).cast("decimal(38,4)"))
      })
    }
    val rnd = new scala.util.Random(99)
    val rows = (0 until 30).map { r =>
      def mk(n: Int, exact: Boolean): Seq[java.lang.Double] = Seq.fill(n)(
        java.lang.Double.valueOf(
          if (exact) math.round(rnd.nextGaussian() * 1e4) / 100.0
          else rnd.nextGaussian() * 1e3))
      (mk(rI * kI, r % 2 == 0), mk(kI * cI, r % 3 != 0))
    } :+ (
      // null element poisons only the cells that read it
      (0 until rI * kI).map(i => if (i == 5) null
        else java.lang.Double.valueOf(i * 1.5)): Seq[java.lang.Double],
      (0 until kI * cI).map(i => java.lang.Double.valueOf(i * 0.25)): Seq[java.lang.Double])
    val df = rows.toDF("a", "b")
    val diff = df.select(
      ChunkFolds.blockMatmulNative(col("a"), col("b"), rI, kI, cI).as("nat"),
      hofBlock(col("a"), col("b")).as("hof"))
      .filter(!(col("nat") <=> col("hof")))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
  }

  /** The interpreted spelling of the dot fold: cast each side to
    * DECIMAL(18,2) FIRST, multiply the exact decimals (scale 4),
    * re-cap at DECIMAL(38,4) per add — the q_corr moment verbatim. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val d2 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
    // zip_with, not sequence(0, size-1): an empty payload would hit
    // Spark's descending-sequence default and index out of bounds
    aggregate(zip_with(a, b, (x, y) => d2(x) * d2(y)), lit(0).cast("decimal(38,4)"),
      (acc, p) => (acc + p).cast("decimal(38,4)"))
  }

  test("native ChunkDotDec == interpreted cast-first product fold") {
    val rnd = new scala.util.Random(77)
    def mk(n: Int, exact: Boolean): Seq[java.lang.Double] = Seq.fill(n)(
      java.lang.Double.valueOf(
        if (exact) math.round(rnd.nextGaussian() * 1e5) / 100.0
        else rnd.nextGaussian() * math.pow(10, rnd.nextInt(10) - 4)))
    val rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] =
      (0 until 40).map { r =>
        val n = rnd.nextInt(50) + 1
        (mk(n, r % 2 == 0), mk(n, r % 3 != 0))
      } ++ Seq(
        (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]),
        // null on either side poisons
        (Seq(java.lang.Double.valueOf(1.5), null),
          Seq(java.lang.Double.valueOf(2.0), java.lang.Double.valueOf(3.0))),
        (Seq(java.lang.Double.valueOf(1.5), java.lang.Double.valueOf(2.5)),
          Seq(null, java.lang.Double.valueOf(3.0))),
        // fast-path magnitude guard boundary (3e9 cents = 3e7 dollars)
        (Seq(java.lang.Double.valueOf(2.9e7), java.lang.Double.valueOf(3.1e7)),
          Seq(java.lang.Double.valueOf(2.9e7), java.lang.Double.valueOf(-3.1e7))))
    val df = rows.toDF("a", "b")
    val diff = df.select(
      ChunkFolds.chunkDotDecNative(col("a"), col("b")).as("nat"),
      hofDot(col("a"), col("b")).as("hof"))
      .filter(!(col("nat") <=> col("hof")))
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
  }

  test("near-guard accumulation cannot wrap the long fast path (sumsq/dot)") {
    // 4 x 1e7-dollar elements leave the long accumulator at 4e18 (just
    // under the 4.5e18 promotion guard, still on the fast path); the
    // next element's square/product is ~8.41e18 — with the old 3e9-cent
    // element guard the add wrapped Long.MaxValue and the corrupted
    // value was silently promoted to BigDecimal. The 2.1e9 guard routes
    // the big element through the exact slow path instead.
    val base = Seq.fill(4)(java.lang.Double.valueOf(1e7))
    val spike = java.lang.Double.valueOf(2.9e7)
    val sq = Seq(base :+ spike).toDF("data")
    val rSq = sq.select(ChunkFolds.chunkSumSqDecNative(col("data")).as("nat"),
      hofSumSq(col("data")).as("hof")).head()
    assert(rSq.getDecimal(0) == rSq.getDecimal(1), s"sumsq: $rSq")
    assert(rSq.getDecimal(0).signum() > 0)
    val dot = Seq((base :+ spike, base :+ spike)).toDF("a", "b")
    val rDot = dot.select(
      ChunkFolds.chunkDotDecNative(col("a"), col("b")).as("nat"),
      hofDot(col("a"), col("b")).as("hof")).head()
    assert(rDot.getDecimal(0) == rDot.getDecimal(1), s"dot: $rDot")
    assert(rDot.getDecimal(0).signum() > 0)
  }

  test("ChunkDotDec rejects mismatched payload lengths") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(ChunkFolds.chunkDotDecNative(col("a"), col("b"))).collect()
    }
  }

  test("native ChunkArgExtreme == interpreted struct fold (ranks 1-3, ties, nulls)") {
    import graft.arrays.{ArrayGeometry, ChunkedArray}
    import org.apache.spark.sql.graftexpr.ChunkFolds
    def cartesian(dims: Seq[Int]): Seq[Seq[Int]] =
      dims.foldLeft(Seq(Seq.empty[Int]))((acc, m) =>
        acc.flatMap(p => (0 until m).map(p :+ _)))
    val rnd = new scala.util.Random(31847L)
    for (caseNo <- 0 until 8; isMax <- Seq(true, false)) {
      val rank = 1 + rnd.nextInt(3)
      val cpd = Seq.fill(rank)(1 + rnd.nextInt(3))
      val cs = Seq.fill(rank)(1 + rnd.nextInt(4))
      val rows = cartesian(cpd).map { pos =>
        // tiny value set -> frequent ties (the tie-break is the point);
        // occasional nulls; one case with an ALL-null chunk (seed path);
        // one case mixing NaN payloads (Spark SQL ordering: NaN greatest,
        // NaN == NaN — a raw Java '>' would diverge here)
        val data: Seq[java.lang.Double] = Seq.fill(cs.product)(
          if (caseNo == 3) null
          else if (caseNo == 4 && rnd.nextInt(3) == 0)
            java.lang.Double.valueOf(Double.NaN)
          else if (rnd.nextInt(10) == 0) null
          else java.lang.Double.valueOf(rnd.nextInt(4).toDouble))
        (0L, pos, data)
      }
      val arr = ChunkedArray(rows.toDF("timestep", "pos", "data"),
        ArrayGeometry(cpd, cs))
      val gdims = (0 until rank).map(i => cpd(i) * cs(i))
      val gstrides = gdims.map(_.toLong).scanRight(1L)(_ * _).tail
      val base = (0 until rank).map(d =>
        col("pos")(d).cast("bigint") * (cs(d) * gstrides(d))).reduce(_ + _)
      val nat = ChunkFolds.chunkArgExtremeNative(col("data"), base, cs, gstrides, isMax)
      val hof =
        if (rank == 1 && isMax) arr.catalystArgFold(cs.head)
        else arr.catalystArgFoldNd(isMax)
      val diff = arr.df.select(nat.as("nat"), hof.as("hof"))
        .filter(!(col("nat") <=> col("hof")))
      assert(diff.count() == 0,
        s"case $caseNo isMax=$isMax cpd=$cpd cs=$cs: " +
          diff.collect().take(3).mkString("; "))
    }
  }

  test("native GatherStatic == interpreted transform gather, nulls pass through") {
    import org.apache.spark.sql.graftexpr.ChunkFolds
    val rnd = new scala.util.Random(6109L)
    val n = 24
    val rows: Seq[Seq[java.lang.Double]] = (0 until 20).map(_ =>
      Seq.fill(n)(if (rnd.nextInt(6) == 0) null
        else java.lang.Double.valueOf(rnd.nextGaussian() * 100)))
    val df = rows.toDF("data")
    // affine specs over a (4,6) output shape: transpose of a row-major
    // (6,4) source, axis-1 mirror, and a stride-0 broadcast (dup
    // sources) — the forms the engine's transpose/flip emit
    val shape = Seq(4, 6)
    val specs = Seq(
      (Seq(1, 1), Seq(0, 0), Seq(1, 4)),  // transpose gather
      (Seq(1, -1), Seq(0, 5), Seq(6, 1)), // flip axis 1
      (Seq(1, 1), Seq(0, 0), Seq(0, 1)))  // row broadcast (dup reads)
    for ((mult, add, srcStr) <- specs) {
      val outStrides = shape.scanRight(1)(_ * _).tail
      val idxMap = (0 until n).map { k =>
        shape.indices.map(d =>
          (mult(d) * ((k / outStrides(d)) % shape(d)) + add(d)) * srcStr(d)).sum
      }
      assert(idxMap.forall(i => i >= 0 && i < n))
      val hof = transform(sequence(lit(0), lit(n - 1)), k =>
        element_at(col("data"),
          idxMap.zipWithIndex.foldLeft(lit(0)) { case (acc, (m, i)) =>
            when(k === i, lit(m)).otherwise(acc)
          } + 1))
      val diff = df.select(
        ChunkFolds.gatherAffineNative(col("data"), shape, mult, add, srcStr).as("nat"),
        hof.as("ref"))
        .filter(!(col("nat") <=> col("ref")))
      assert(diff.count() == 0,
        s"spec ($mult,$add,$srcStr): " + diff.collect().take(2).mkString("; "))
    }
  }

  test("GatherStatic serializes O(dims), not O(chunkElems)") {
    // The ADVICE r13 finding: a literal index map serialized chunkElems
    // ints into every task's plan. The affine spec must keep the
    // expression's serialized form small even for a large chunk.
    import org.apache.spark.sql.graftexpr.GatherStatic
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val big = GatherStatic(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      shape = Seq(1024, 1024), mult = Seq(1, 1), add = Seq(0, 0),
      srcStrides = Seq(1, 1024)) // a 1M-cell transpose gather
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(big); oos.close()
      bos.size()
    }
    assert(bytes < 16 * 1024, s"serialized GatherStatic is $bytes bytes")
    // and the lazily-built map still gathers correctly after a
    // serialization round-trip (fresh instance, map rebuilt on demand)
    val small = GatherStatic(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      shape = Seq(2, 3), mult = Seq(1, 1), add = Seq(0, 0),
      srcStrides = Seq(1, 2)) // transpose of a (3,2) row-major source
    val restored = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(small); oos.close()
      new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[GatherStatic]
    }
    val data = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](0.0, 1.0, 2.0, 3.0, 4.0, 5.0))
    val out = restored.compute(data)
    assert((0 until 6).map(out.getDouble) ==
      Seq(0.0, 2.0, 4.0, 1.0, 3.0, 5.0))
  }

  test("folds run on the real events corpus identically (sf0.001)") {
    val arr = graft.operators.ArrayQueries
      .eventsArray1dCached(spark, "/root/testdata/sf0.001")
    val diff = arr.df
      .select(ChunkFolds.chunkSumDecNative(col("data")).as("nat"),
        hofSum(col("data")).as("hof"),
        ChunkFolds.chunkSumSqDecNative(col("data")).as("natsq"),
        hofSumSq(col("data")).as("hofsq"))
      .filter(!(col("nat") <=> col("hof")) || !(col("natsq") <=> col("hofsq")))
    assert(diff.count() == 0)
  }
}
