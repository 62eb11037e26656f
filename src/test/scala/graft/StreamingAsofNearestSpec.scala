package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{NearestMatch, StreamingAsofNearest}

/** StreamingAsofNearest — the forward/nearest stream twin of
  * ev_asof_nearest (VERDICT r18 #5): an error waits out a declared
  * FUTURE horizon before emitting, so its forward candidate set is
  * watermark-complete; within the horizon the emitted row equals the
  * batch window's answer exactly (full-corpus equality, the
  * StreamingGram discipline); beyond it the declared bounded-wait
  * semantics fall back to the backward match. */
class StreamingAsofNearestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("nearest picks the closer side; backward wins the equal-distance tie") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = StreamingAsofNearest.matches(ev, delay = "10 minutes",
      horizonUs = 3600L * 1000000L).writeStream
      .format("memory").queryName("asofn_near")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      // user 1: purchase 10 min before, purchase 5 min after -> forward
      (1L, ts("2026-01-01 09:50:00"), "purchase", 1L),
      (1L, ts("2026-01-01 10:00:00"), "error", 2L),
      (1L, ts("2026-01-01 10:05:00"), "purchase", 3L),
      // user 2: equidistant (10 min both sides) -> backward wins
      (2L, ts("2026-01-01 09:50:00"), "purchase", 4L),
      (2L, ts("2026-01-01 10:00:00"), "error", 5L),
      (2L, ts("2026-01-01 10:10:00"), "purchase", 6L))
    q.processAllAvailable()
    // push the watermark past te + horizon for both errors
    in.addData((9L, ts("2026-01-01 12:00:00"), "purchase", 9L))
    q.processAllAvailable()
    q.processAllAvailable()
    val rows = spark.table("asofn_near").as[NearestMatch].collect()
      .map(m => m.event_id -> m).toMap
    q.stop()
    assert(rows.keySet == Set(2L, 5L))
    assert(rows(2L).nearest_purchase_ts.contains(ts("2026-01-01 10:05:00")),
      s"forward is closer: ${rows(2L)}")
    assert(rows(2L).last_purchase_ts.contains(ts("2026-01-01 09:50:00")))
    assert(rows(2L).next_purchase_ts.contains(ts("2026-01-01 10:05:00")))
    assert(rows(5L).nearest_purchase_ts.contains(ts("2026-01-01 09:50:00")),
      s"equal distance -> backward, the batch rule: ${rows(5L)}")
  }

  test("a next purchase BEYOND the horizon is not waited for: backward fallback") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    // horizon = 30 min
    val q = StreamingAsofNearest.matches(ev, delay = "10 minutes",
      horizonUs = 1800L * 1000000L).writeStream
      .format("memory").queryName("asofn_hz")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      (1L, ts("2026-01-01 09:00:00"), "purchase", 1L),
      (1L, ts("2026-01-01 10:00:00"), "error", 2L),
      // 45 min after the error: outside the 30 min horizon
      (1L, ts("2026-01-01 10:45:00"), "purchase", 3L))
    q.processAllAvailable()
    in.addData((9L, ts("2026-01-01 12:00:00"), "purchase", 9L))
    q.processAllAvailable()
    q.processAllAvailable()
    val rows = spark.table("asofn_hz").as[NearestMatch].collect()
    q.stop()
    assert(rows.length == 1 && rows.head.event_id == 2L)
    assert(rows.head.next_purchase_ts.isEmpty,
      s"beyond-horizon purchase must not serve forward: ${rows.head}")
    assert(rows.head.nearest_purchase_ts.contains(ts("2026-01-01 09:00:00")),
      s"declared bounded-wait semantics: backward fallback: ${rows.head}")
  }

  test("out-of-order purchase inside the horizon becomes the forward match") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = StreamingAsofNearest.matches(ev, delay = "1 hour",
      horizonUs = 3600L * 1000000L).writeStream
      .format("memory").queryName("asofn_ooo")
      .outputMode(OutputMode.Append()).start()
    in.addData((1L, ts("2026-01-01 10:00:00"), "error", 1L))
    q.processAllAvailable()
    // arrives later, timestamped 20 min AFTER the error
    in.addData((1L, ts("2026-01-01 10:20:00"), "purchase", 2L))
    q.processAllAvailable()
    assert(spark.table("asofn_ooo").count() == 0,
      "error must wait out the horizon, not emit optimistically")
    in.addData((9L, ts("2026-01-01 13:00:00"), "purchase", 9L))
    q.processAllAvailable()
    q.processAllAvailable()
    val rows = spark.table("asofn_ooo").as[NearestMatch].collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head.last_purchase_ts.isEmpty)
    assert(rows.head.nearest_purchase_ts.contains(ts("2026-01-01 10:20:00")),
      s"the late forward purchase serves: ${rows.head}")
  }

  test("full-corpus equality with batch ev_asof_nearest under a covering horizon") {
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.Relational.evAsofNearest(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[Timestamp]("last_purchase_ts")),
          Option(r.getAs[Timestamp]("next_purchase_ts")),
          Option(r.getAs[Timestamp]("nearest_purchase_ts")))))
      .toMap
    val raw = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[(Long, Timestamp, String, Long)].collect().toSeq
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    // horizon far past the corpus span: the stream face equals the
    // batch (unbounded-forward) face exactly
    val q = StreamingAsofNearest.matches(ev, delay = "48 hours",
      horizonUs = 370L * 24L * 3600L * 1000000L).writeStream
      .format("memory").queryName("asofn_full")
      .outputMode(OutputMode.Append()).start()
    raw.grouped((raw.size / 3).max(1)).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    in.addData((999999L, ts("2030-01-01 00:00:00"), "purchase", 10000000L))
    q.processAllAvailable()
    q.processAllAvailable()
    val stream = spark.table("asofn_full").as[NearestMatch].collect()
      .filter(_.user_id != 999999L)
      .map(m => m.event_id ->
        ((m.last_purchase_ts, m.next_purchase_ts, m.nearest_purchase_ts)))
      .toMap
    q.stop()
    assert(stream.size == batch.size,
      s"stream served ${stream.size} errors vs batch ${batch.size}")
    for ((eid, want) <- batch)
      assert(stream(eid) == want, s"event $eid: stream ${stream(eid)} vs batch $want")
  }
}
