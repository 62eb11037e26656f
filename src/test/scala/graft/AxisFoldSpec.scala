package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence gate for the native axis line folds
  * (AxisFoldExpressions.scala) against the interpreted HOF spellings
  * they replaced in axisSum/axisVar/axisMax/axisArgmax — including the
  * paths the dense-model gate can't reach: null elements (line
  * poisoning vs skipping), NaN ordering, -0.0/0.0 ties, argmax tie
  * direction. Semantics on real payloads are covered by ArrayModelSpec
  * + the CORRECTNESS oracles; this spec pins the corner cases. */
class AxisFoldSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  import org.apache.spark.sql.graftexpr.AxisFoldExpressions._

  // 2-d chunks: shape (3, 4), reduced along axis 0 (stride 4, extent 3)
  private val shape = Seq(3, 4)
  private val axis = 0

  /** In-domain rows for the decimal folds (no NaN/overflow: those are
    * ANSI cast errors, probed mode-split below). */
  private def df = {
    val rnd = new scala.util.Random(42)
    val rows: Seq[Seq[java.lang.Double]] =
      (0 until 20).map(_ => Seq.fill(12)(
        java.lang.Double.valueOf(math.round(rnd.nextGaussian() * 1e4) / 100.0))) ++
      (0 until 10).map(_ => Seq.fill(12)(
        java.lang.Double.valueOf(rnd.nextGaussian() * 1e3))) ++
      Seq(
        // a null in line (column) 2 poisons only that line's sum
        (0 until 12).map(i => if (i == 6) null
          else java.lang.Double.valueOf(i * 1.25)): Seq[java.lang.Double],
        // -0.0 vs 0.0 ties for the comparison folds
        (0 until 12).map(i => java.lang.Double.valueOf(
          if (i == 5) -0.0 else if (i == 9) 0.0 else i * 1.0)): Seq[java.lang.Double],
        // equal values down a line: argmax tie -> lowest coordinate
        Seq.fill(12)(java.lang.Double.valueOf(7.5)))
    rows.toDF("data").withColumn("pos", array(lit(1), lit(0)))
  }

  /** Comparison-fold probes where NaN is a VALUE (no decimal cast):
    * NaN orders greatest, nulls are skipped. */
  private def dfNaN = Seq(
    (0 until 12).map(i => java.lang.Double.valueOf(
      if (i == 1) Double.NaN else if (i == 5) -0.0 else if (i == 9) 0.0
      else i * 1.0)): Seq[java.lang.Double])
    .toDF("data").withColumn("pos", array(lit(1), lit(0)))

  /** Decimal-cast error domain: NaN and (18,2) overflow in a line. */
  private def dfErr = Seq(
    (0 until 12).map(i => java.lang.Double.valueOf(
      if (i == 2) Double.NaN else i * 1.0)): Seq[java.lang.Double],
    (0 until 12).map(i => java.lang.Double.valueOf(
      if (i == 7) 1e17 else i * 1.0)): Seq[java.lang.Double])
    .toDF("data").withColumn("pos", array(lit(1), lit(0)))

  // the production HOF spellings, re-spelled verbatim
  private val strides = Seq(4, 1)
  private val rem = Seq(1)
  private val outStrides = Seq(1)
  private def fdiv(a: Column, b: Int): Column = (a / lit(b)).cast("int")
  private def bases(s: Column): Column =
    rem.zip(outStrides).map { case (j, os) =>
      (fdiv(s, os) % shape(j)) * strides(j)
    }.reduce(_ + _)
  private val DEC = "DECIMAL(28,2)"
  private def addDec(acc: Column, x: Column): Column =
    (acc + x.cast("decimal(18,2)")).cast(DEC)

  private def hofSum: Column =
    transform(sequence(lit(0), lit(3)), s =>
      aggregate(sequence(lit(0), lit(2)), lit(0).cast(DEC),
        (acc, i) => addDec(acc, col("data")(bases(s) + i * 4))))

  private def hofMoments: Column = {
    val d2 = (c: Column) => c.cast("decimal(18,2)")
    val zeroM = struct(lit(0).cast(DEC).as("t"), lit(0).cast("decimal(38,4)").as("q"))
    transform(sequence(lit(0), lit(3)), s =>
      aggregate(sequence(lit(0), lit(2)), zeroM, (acc, i) => {
        val x = col("data")(bases(s) + i * 4)
        struct(addDec(acc("t"), x).as("t"),
          (acc("q") + d2(x) * d2(x)).cast("decimal(38,4)").as("q"))
      }))
  }

  private def hofExtreme(isMax: Boolean): Column =
    transform(sequence(lit(0), lit(3)), s =>
      aggregate(sequence(lit(1), lit(2)), col("data")(bases(s)),
        (acc, i) => (if (isMax) greatest(_: Column, _: Column)
          else least(_: Column, _: Column))(acc, col("data")(bases(s) + i * 4))))

  private def hofArg(isMax: Boolean): Column = {
    def wins(x: Column, acc: Column): Column =
      (if (isMax) x("v") > acc("v") else x("v") < acc("v")) ||
        (x("v") === acc("v") && x("k") < acc("k")) ||
        (acc("v").isNull && x("v").isNotNull)
    val gbase = col("pos")(axis).cast("bigint") * shape(axis)
    transform(sequence(lit(0), lit(3)), s => {
      val first = struct(col("data")(bases(s)).as("v"), gbase.as("k"))
      aggregate(sequence(lit(1), lit(2)), first, (acc, i) => {
        val x = struct(col("data")(bases(s) + i * 4).as("v"), (gbase + i).as("k"))
        when(wins(x, acc), x).otherwise(acc)
      })
    })
  }

  test("native axis sum == HOF line fold (nulls poison their line only)") {
    val diff = df.select(
      axisSumDec(col("data"), shape, axis).as("nat"), hofSum.as("hof"))
      .filter(!(col("nat") <=> col("hof")))
    assert(diff.count() == 0, diff.collect().mkString("; "))
  }

  test("native axis moments == HOF two-moment fold") {
    val diff = df.select(
      axisMomentsDec(col("data"), shape, axis).as("nat"), hofMoments.as("hof"))
      .filter(!(col("nat") <=> col("hof")))
    assert(diff.count() == 0, diff.collect().mkString("; "))
  }

  test("native axis extreme == greatest/least folds (NaN, -0.0, null-skip)") {
    for (isMax <- Seq(true, false); probe <- Seq(df, dfNaN)) {
      val diff = probe.select(
        axisExtreme(col("data"), shape, axis, isMax).as("nat"),
        hofExtreme(isMax).as("hof"))
        .filter(!(col("nat") <=> col("hof")))
      assert(diff.count() == 0, s"isMax=$isMax: " + diff.collect().mkString("; "))
    }
  }

  test("native axis argextreme == wins() fold (ties to lower coord, null seed)") {
    val gbase = col("pos")(axis).cast("bigint") * shape(axis)
    for (isMax <- Seq(true, false); probe <- Seq(df, dfNaN)) {
      val diff = probe.select(
        axisArgExtreme(col("data"), gbase, shape, axis, isMax).as("nat"),
        hofArg(isMax).as("hof"))
        .filter(!(col("nat") <=> col("hof")))
      assert(diff.count() == 0, s"isMax=$isMax: " + diff.collect().mkString("; "))
    }
  }

  test("decimal-cast error domain: non-ANSI null-poisons the line, ANSI throws (both spellings)") {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val diff = dfErr.select(
        axisSumDec(col("data"), shape, axis).as("nat"), hofSum.as("hof"),
        axisMomentsDec(col("data"), shape, axis).as("natm"), hofMoments.as("hofm"))
        .filter(!(col("nat") <=> col("hof")) || !(col("natm") <=> col("hofm")))
      assert(diff.count() == 0, diff.collect().mkString("; "))
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    // ANSI: BOTH spellings surface a cast error on NaN / overflow, so
    // the native mimic is validated against the HOF's actual behavior
    intercept[Exception](dfErr.select(hofSum).collect())
    intercept[Exception](dfErr.select(axisSumDec(col("data"), shape, axis)).collect())
  }
}
