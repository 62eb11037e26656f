package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WindowHardening

/** SURVEY §4 WW#3's escape hatch, gated: the salt-split (time-slice) +
  * boundary-merge spellings of the two per-user-window queries must
  * equal the naive full-history window EXACTLY on a synthetic corpus
  * with one 100×-hot user — including transitions and session merges
  * that straddle slice boundaries. */
class WindowHardeningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val gapUs = 1800L * 1000000L // 30 min, the ev_sessionize gap
  private val sliceUs = 3600L * 1000000L // 1-hour slices: many boundaries

  /** One 100×-hot user (50k events, deterministic mixed gaps: bursts,
    * exact-gap edges, inter-session pauses) + 100 normal users. Gaps
    * chosen so sessions regularly STRADDLE the 1-hour slice boundary. */
  private def corpus: DataFrame = {
    val types = Seq("view", "click", "purchase", "error", "signup")
    val hot = (0 until 50000).scanLeft(0L) { (t, i) =>
      // mostly 7-min steps (sessions straddle slices), a >gap pause
      // every 40 events, an exact-gap edge every 97
      val step =
        if (i % 97 == 0) gapUs
        else if (i % 40 == 0) gapUs + 1000000L
        else 420L * 1000000L
      t + step
    }.zipWithIndex.map { case (us, i) =>
      (1L, new java.sql.Timestamp(us / 1000L), types(i % types.length), i.toLong)
    }
    val normal = for (u <- 2L until 102L; k <- 0 until 50) yield {
      val us = u * 1000000L + k * (if (k % 9 == 0) gapUs + 5000000L else 300L * 1000000L)
      (u, new java.sql.Timestamp(us / 1000L), types(((u + k) % 5).toInt),
        1000000L + u * 1000L + k)
    }
    (hot ++ normal).toDF("user_id", "ts", "event_type", "event_id")
  }

  private def naiveMarkov(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_type", "to_type")
  }

  private def naiveSessionize(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  test("salted markov transitions equal the naive full-history window (100x-hot user)") {
    val ev = corpus.persist()
    try {
      val naive = naiveMarkov(ev).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val hard = WindowHardening.markovTransitions(ev, sliceUs).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(naive.nonEmpty && hard == naive)
      // sanity: the slice split actually happened (hot user spans many
      // hours), so boundary transitions were exercised, not vacuous
      val hotSpanUs = 50000L * 420L * 1000000L
      assert(hotSpanUs / sliceUs > 100, "fixture must straddle many slices")
    } finally { ev.unpersist(): Unit }
  }

  test("salted sessionize equals the naive full-history window (boundary merges)") {
    val ev = corpus.persist()
    try {
      val naive = naiveSessionize(ev).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val hard = WindowHardening.sessionize(ev, gapUs, sliceUs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(hard == naive)
      // the hot user's 7-min cadence means nearly every 1-hour slice
      // boundary falls INSIDE a session — the merge pass is load-bearing
      val hot = naive(1L)
      assert(hot._2 == 50001L && hot._1 > 100L, s"hot user profile: $hot")
    } finally { ev.unpersist(): Unit }
  }

  test("hardened spellings agree with the shipped queries on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val naiveM = graft.operators.Relational.evMarkov(spark, dir).collect().toSeq
    val hardM = WindowHardening.markovTransitions(ev).collect().toSeq
    assert(naiveM.map(_.toSeq) == hardM.map(_.toSeq))
    val naiveS = graft.operators.Relational.evSessionize(spark, dir).collect().toSeq
    val hardS = WindowHardening.sessionize(ev).collect().toSeq
    assert(naiveS.map(_.toSeq) == hardS.map(_.toSeq))
  }
}
