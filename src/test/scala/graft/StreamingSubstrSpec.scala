package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingSubstr, SubstrStats}

/** StreamingSubstr — the live ExactSubstr pass: a single-batch replay
  * reproduces the batch dd_substr_remove accounting EXACTLY (the keep
  * rules coincide); across batches the keep rule is first-arrival;
  * gram memory expires on the event-time horizon; stats emit in the
  * document's own arrival batch. */
class StreamingSubstrSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Driver-side accumulation of every emitted per-doc stats row. */
  private def harness(in: MemoryStream[(Timestamp, Long, String)],
      delay: String = "10 minutes", memoryMs: Long = 3600L * 1000L) = {
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    val q = StreamingSubstr.run(
      in.toDF().toDF("ts", "doc_id", "text"),
      stats => acc.synchronized {
        stats.collect().foreach(s => acc.update(s.doc_id,
          (s.n_words, s.n_spans, s.rm_words, s.kept_words)))
      },
      delay = delay, memoryMs = memoryMs)
    (acc, q)
  }

  test("single-batch replay equals batch dd_substr_remove on the real corpus") {
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.Dedup.ddSubstrRemove(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Timestamp, Long, String)]
    val (acc, q) = harness(in)
    try {
      in.addData(docs.map(d => (ts("2026-01-01 00:00:00"), d._1, d._2)))
      q.processAllAvailable()
    } finally { q.stop() }
    val got = acc.toMap
    assert(got.size == batch.size, s"${got.size} docs vs batch ${batch.size}")
    for ((id, want) <- batch)
      assert(got(id) == want, s"doc $id: ${got(id)} vs batch $want")
  }

  test("cross-batch first-arrival keep rule; gram memory expires on the horizon") {
    implicit val sc = spark.sqlContext
    val B = (0 until 12).map(i => s"b$i").mkString(" ")
    val in = MemoryStream[(Timestamp, Long, String)]
    val (acc, q) = harness(in, memoryMs = 30L * 60L * 1000L)
    try {
      // batch 1: doc 1 owns block B (plus filler) — emits immediately,
      // in its own arrival batch (no emission window to wait out)
      in.addData((ts("2026-01-01 00:00:00"), 1L,
        B + " " + (0 until 6).map(i => s"u$i").mkString(" ")))
      q.processAllAvailable()
      assert(acc(1L) == ((18L, 0L, 0L, 18L)), s"first arrival untouched: ${acc.get(1L)}")
      // batch 2 (5 min later, inside memory): doc 2 repeats B -> cut
      // (the gram timeout re-arms to 00:05 + 30 min = 00:35)
      in.addData((ts("2026-01-01 00:05:00"), 2L,
        (0 until 4).map(i => s"v$i").mkString(" ") + " " + B))
      q.processAllAvailable()
      assert(acc(2L) == ((16L, 1L, 12L, 4L)), s"in-memory repeat cut: ${acc.get(2L)}")
      // advance the watermark past the 00:35 timeout (wm = max ts − 10
      // min = 01:20), then one more tick so the EXPIRY actually fires —
      // timeouts are evaluated against the PREVIOUS batch's watermark
      in.addData((ts("2026-01-01 01:30:00"), 8L, "advance"))
      q.processAllAvailable()
      in.addData((ts("2026-01-01 01:31:00"), 7L, "tick"))
      q.processAllAvailable()
      // doc 3 repeats B AFTER the expiry: state forgotten -> NOT cut
      in.addData((ts("2026-01-01 01:40:00"), 3L,
        B + " " + (0 until 3).map(i => s"w$i").mkString(" ")))
      q.processAllAvailable()
      assert(acc(3L) == ((15L, 0L, 0L, 15L)),
        s"past-horizon repeat must NOT be cut: ${acc.get(3L)}")
      // doc 3 re-seeded the grams: doc 4 a minute later is cut again
      in.addData((ts("2026-01-01 01:41:00"), 4L,
        B + " " + (0 until 2).map(i => s"x$i").mkString(" ")))
      q.processAllAvailable()
      assert(acc(4L) == ((14L, 1L, 12L, 2L)), s"re-seeded repeat cut: ${acc.get(4L)}")
      // sub-gram doc accounting
      in.addData((ts("2026-01-01 01:42:00"), 9L, "tiny doc"))
      q.processAllAvailable()
      assert(acc(9L) == ((2L, 0L, 0L, 2L)), s"gram-less doc reports: ${acc.get(9L)}")
    } finally { q.stop() }
  }
}
