package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AsofMatch, StreamingAsof}

/** StreamingAsof — the stream face of the batch as-of family: an error
  * emits only once the watermark guarantees its backward candidate set
  * is complete, so cross-batch and out-of-order purchases inside the
  * horizon serve exactly like the batch window; full-corpus equality
  * against ev_asof_tol (the StreamingGram prefix-equality discipline);
  * idle TTL drops a drained user's state wholesale. */
class StreamingAsofSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("out-of-order purchase inside the horizon serves an earlier-arriving error") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = StreamingAsof.matches(ev, delay = "1 hour").writeStream
      .format("memory").queryName("asof_ooo")
      .outputMode(OutputMode.Append()).start()
    // batch 1: a purchase then an error 30 min later — NOT servable yet
    in.addData(
      (1L, ts("2026-01-01 10:00:00"), "purchase", 100L),
      (1L, ts("2026-01-01 10:30:00"), "error", 101L))
    q.processAllAvailable()
    assert(spark.table("asof_ooo").count() == 0,
      "error must wait for the watermark, not emit optimistically")
    // batch 2: an OUT-OF-ORDER purchase at 10:20 (inside the 1h horizon)
    in.addData((1L, ts("2026-01-01 10:20:00"), "purchase", 102L))
    q.processAllAvailable()
    // batch 3: another user far in the future pushes the watermark past
    // the error; the late purchase must win the backward match
    in.addData((99L, ts("2026-01-01 13:00:00"), "purchase", 999L))
    q.processAllAvailable()
    q.processAllAvailable()
    val rows = spark.table("asof_ooo").as[AsofMatch].collect()
    q.stop()
    assert(rows.length == 1, s"exactly the one error: ${rows.toSeq}")
    val m = rows.head
    assert(m.event_id == 101L && m.user_id == 1L)
    assert(m.last_purchase_ts.contains(ts("2026-01-01 10:20:00")),
      s"the out-of-order 10:20 purchase must serve, got ${m.last_purchase_ts}")
    assert(m.staleness_us.contains(600L * 1000000L))
  }

  test("staleness tolerance NULLs the match but keeps the measured staleness") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    // tol = 1 hour
    val q = StreamingAsof.matches(ev, delay = "10 minutes", tolUs = 3600L * 1000000L)
      .writeStream.format("memory").queryName("asof_tol")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      (1L, ts("2026-01-01 08:00:00"), "purchase", 1L),
      (1L, ts("2026-01-01 10:00:00"), "error", 2L), // 2h stale: beyond tol
      (2L, ts("2026-01-01 10:00:00"), "error", 3L)) // no purchase at all
    q.processAllAvailable()
    in.addData((9L, ts("2026-01-01 12:00:00"), "purchase", 9L))
    q.processAllAvailable()
    q.processAllAvailable()
    val rows = spark.table("asof_tol").as[AsofMatch].collect()
      .map(m => m.event_id -> m).toMap
    q.stop()
    assert(rows.keySet == Set(2L, 3L))
    assert(rows(2L).last_purchase_ts.isEmpty, "beyond tol -> NULL match")
    assert(rows(2L).staleness_us.contains(7200L * 1000000L),
      "staleness still measured when a purchase exists (the batch contract)")
    assert(rows(3L).last_purchase_ts.isEmpty && rows(3L).staleness_us.isEmpty)
  }

  test("equal-timestamp tie: a purchase AT the error's ts matches (the batch '>=') ") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = StreamingAsof.matches(ev, delay = "10 minutes").writeStream
      .format("memory").queryName("asof_tie")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      (1L, ts("2026-01-01 10:00:00"), "purchase", 1L),
      (1L, ts("2026-01-01 10:00:00"), "error", 2L))
    q.processAllAvailable()
    in.addData((9L, ts("2026-01-01 12:00:00"), "purchase", 9L))
    q.processAllAvailable()
    q.processAllAvailable()
    val rows = spark.table("asof_tie").as[AsofMatch].collect()
    q.stop()
    assert(rows.length == 1 && rows.head.event_id == 2L)
    assert(rows.head.last_purchase_ts.contains(ts("2026-01-01 10:00:00")),
      s"ties match like the batch backward window: ${rows.head}")
    assert(rows.head.staleness_us.contains(0L))
  }

  test("watermark-millisecond boundary: pruning must not shadow an earlier purchase") {
    // A pending error can sit up to 999 µs BELOW the ms watermark; a
    // purchase between the error and the watermark must not evict the
    // earlier purchase that actually serves it (regression: the prune
    // bound ran at wm·1000 instead of one full ms under it).
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = StreamingAsof.matches(ev, delay = "10 minutes").writeStream
      .format("memory").queryName("asof_msb")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      (1L, ts("2026-01-01 10:00:00"), "purchase", 1L), // the true match
      (1L, ts("2026-01-01 10:10:00.0001"), "error", 2L), // te = wm·1000 − 900 µs
      (1L, ts("2026-01-01 10:10:00.0005"), "purchase", 3L)) // AFTER the error
    q.processAllAvailable()
    // wm -> 10:10:00.001: the error's ms ceiling equals the watermark,
    // so it stays pending while the prune pass runs at this boundary
    in.addData((9L, ts("2026-01-01 10:20:00.0015"), "purchase", 9L))
    q.processAllAvailable()
    // now let it serve
    in.addData((9L, ts("2026-01-01 10:30:00"), "purchase", 10L))
    q.processAllAvailable()
    q.processAllAvailable()
    val rows = spark.table("asof_msb").as[AsofMatch].collect()
      .filter(_.user_id == 1L)
    q.stop()
    assert(rows.length == 1 && rows.head.event_id == 2L)
    assert(rows.head.last_purchase_ts.contains(ts("2026-01-01 10:00:00")),
      s"the 10:00 purchase serves; the later same-ms purchase must not shadow it: ${rows.head}")
  }

  test("full-corpus equality with batch ev_asof_tol (prefix-equality discipline)") {
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.Relational.evAsofTol(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[Timestamp]("last_purchase_ts")),
          Option(r.getAs[java.lang.Long]("staleness_us")).map(_.longValue))))
      .toMap
    val raw = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[(Long, Timestamp, String, Long)].collect().toSeq
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = StreamingAsof.matches(ev, delay = "48 hours").writeStream
      .format("memory").queryName("asof_full")
      .outputMode(OutputMode.Append()).start()
    // feed in three arrival chunks (same-batch arrival order is
    // irrelevant by construction), then a sentinel far past everything
    raw.grouped((raw.size / 3).max(1)).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    in.addData((999999L, ts("2030-01-01 00:00:00"), "purchase", 10000000L))
    q.processAllAvailable()
    q.processAllAvailable()
    val stream = spark.table("asof_full").as[AsofMatch].collect()
      .filter(_.user_id != 999999L)
      .map(m => m.event_id -> ((m.last_purchase_ts, m.staleness_us))).toMap
    q.stop()
    assert(stream.size == batch.size,
      s"stream served ${stream.size} errors vs batch ${batch.size}")
    for ((eid, want) <- batch)
      assert(stream(eid) == want, s"event $eid: stream ${stream(eid)} vs batch $want")
  }

  test("idle TTL drops a drained user's state (the dead-producer contract)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = StreamingAsof.matches(ev, delay = "1 minute", idleTtlMs = 1L)
      .writeStream.format("memory").queryName("asof_ttl")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .start()
    // user 1 purchases, then goes silent while the watermark advances
    in.addData((1L, ts("2026-01-01 10:00:00"), "purchase", 1L))
    q.processAllAvailable()
    in.addData((9L, ts("2026-01-01 12:00:00"), "purchase", 9L))
    q.processAllAvailable()
    Thread.sleep(500) // let the 1 ms idle TTL lapse and a no-data batch fire it
    q.processAllAvailable()
    // user 1 errors much later: the TTL'd state must have forgotten the
    // purchase (staleness unbounded anyway under any sane tol)
    in.addData((1L, ts("2026-01-01 14:00:00"), "error", 2L))
    q.processAllAvailable()
    in.addData((9L, ts("2026-01-01 16:00:00"), "purchase", 10L))
    q.processAllAvailable()
    q.processAllAvailable()
    val deadline = System.currentTimeMillis + 30000
    while (spark.table("asof_ttl").count() < 1 && System.currentTimeMillis < deadline)
      Thread.sleep(50)
    val rows = spark.table("asof_ttl").as[AsofMatch].collect()
    q.stop()
    assert(rows.length == 1 && rows.head.event_id == 2L)
    assert(rows.head.last_purchase_ts.isEmpty && rows.head.staleness_us.isEmpty,
      s"TTL'd state must not serve the forgotten purchase: ${rows.head}")
  }
}
