package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.arrays.{ArrayGeometry, ChunkedArray}

/** Boolean-mask compaction (`ChunkedArray.compressRows`, VERDICT r19
  * next-round #3): output addressing and STABILITY — survivors must
  * keep their original relative order with dense per-timestep indices,
  * under any chunk geometry, including the all-pass and all-fail
  * masks. */
class CompressSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val N = 16

  /** A 16-cell 1-d array in 4 chunks of 4; two timesteps. */
  private def arr(cells: Long => Int => Double, ts: Seq[Long] = Seq(0L, 1L)): ChunkedArray = {
    val rows = for (t <- ts; c <- 0 to 3)
      yield (t, Seq(c), (0 to 3).map(i => cells(t)(4 * c + i)))
    ChunkedArray(rows.toDF("timestep", "pos", "data"), ArrayGeometry(Seq(4), Seq(4)))
  }

  test("survivors keep original order with dense 0..k-1 indices") {
    // values chosen so matches straddle chunk boundaries unevenly:
    // chunk 0 has 1 match, chunk 1 none, chunk 2 three, chunk 3 two
    val x = IndexedSeq(
      1.0, 7.0, 2.0, 3.0, // chunk 0: one match (7 at cell 1)
      0.0, 4.0, 4.5, 1.0, // chunk 1: none
      9.0, 6.0, 5.5, 2.0, // chunk 2: three (cells 8, 9, 10)
      8.0, 0.5, 5.1, 3.0) // chunk 3: two (cells 12, 14)
    val a = arr(_ => i => x(i), Seq(0L))
    val got = a.compressRows(_ > lit(5.0)).orderBy("idx").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    val want = x.filter(_ > 5.0).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    assert(got.toSeq == want)
  }

  test("all-pass mask is the identity line; all-fail is empty") {
    val a = arr(t => i => (i + 17 * t).toDouble)
    val all = a.compressRows(_ > lit(-1.0)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(all.size == 2 * N)
    for (t <- Seq(0L, 1L); i <- 0 until N)
      assert(all((t, i.toLong)) == i + 17 * t)
    assert(a.compressRows(_ > lit(1e9)).count() == 0)
  }

  test("compaction is chunk-geometry invariant") {
    val a = arr(t => i => ((i * 13 + 5 + t) % 31) * 0.25)
    val fine = a.compressRows(_ > lit(3.0)).orderBy("timestep", "idx").collect()
    val coarse = a.rechunk(Seq(8)).compressRows(_ > lit(3.0))
      .orderBy("timestep", "idx").collect()
    assert(fine.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      coarse.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    assert(fine.nonEmpty)
  }
}
