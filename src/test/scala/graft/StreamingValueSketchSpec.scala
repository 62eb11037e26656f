package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingValueSketch

/** StreamingValueSketch — the live quantile sketch: because the sample
  * is the k smallest (hash, value) pairs of a multiset, the running
  * state after EVERY micro-batch is exactly the batch sketch over the
  * same prefix, under any arrival order or split. */
class StreamingValueSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** The batch sample rule in plain Scala: k smallest by (h, v). */
  private def batchSample(rows: Seq[(Long, String, Double)], k: Int,
      group: String): Seq[Double] = {
    def h62(x: Long): Long = graft.operators.Relational.permHash62L(x)
    rows.filter(_._2 == group)
      .map(r => (h62(r._1), r._3))
      .sorted.take(k).map(_._2).sorted
  }

  test("running sample is prefix-EXACT to the batch rule at every micro-batch split") {
    implicit val sc = spark.sqlContext
    val k = 16
    // 3 groups, 400 rows, deterministic values; fed in 4 unequal chunks
    // in a scrambled order (arrival order must not matter)
    val rows = (0 until 400).map { i =>
      (i.toLong, s"t${i % 3}", ((i * 37) % 101).toDouble)
    }
    val scrambled = rows.sortBy(r => (r._1 * 2654435761L) % 1000003L)
    val chunks = Seq(
      scrambled.slice(0, 50), scrambled.slice(50, 230),
      scrambled.slice(230, 231), scrambled.slice(231, 400))
    val in = MemoryStream[(Long, String, Double, Timestamp)]
    val ev = in.toDF().toDF("event_id", "event_type", "value", "ts")
    val state = new StreamingValueSketch.RunningSketch(k)
    val q = StreamingValueSketch.run(ev, state)
    try {
      var seen = Seq.empty[(Long, String, Double)]
      for (chunk <- chunks) {
        in.addData(chunk.map(r => (r._1, r._2, r._3,
          Timestamp.valueOf("2026-01-01 00:00:00"))))
        q.processAllAvailable()
        seen = seen ++ chunk
        for (g <- Seq("t0", "t1", "t2")) {
          val want = batchSample(seen, k, g)
          assert(state.values(g) == want,
            s"prefix ${seen.size}, group $g: ${state.values(g)} != $want")
          assert(state.nRows(g) == seen.count(_._2 == g).toLong)
        }
      }
    } finally { q.stop() }
  }

  test("snapshot matches the batch ev_value_sketch face after a full replay") {
    implicit val sc = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.Relational.evValueSketch(spark, dir)
      .collect().map(_.toSeq).toSeq
    val raw = graft.sources.Tables.load(spark, dir, "events")
      .select("event_id", "event_type", "value", "ts")
      .as[(Long, String, Double, Timestamp)].collect().toSeq
    val in = MemoryStream[(Long, String, Double, Timestamp)]
    val ev = in.toDF().toDF("event_id", "event_type", "value", "ts")
    val state = new StreamingValueSketch.RunningSketch(
      graft.operators.Relational.EvSketchK)
    val q = StreamingValueSketch.run(ev, state)
    try {
      raw.grouped(300).foreach { c => in.addData(c); q.processAllAvailable() }
    } finally { q.stop() }
    val snap = state.snapshot(spark).collect().map(_.toSeq).toSeq
    assert(snap == batch,
      s"stream snapshot != batch ev_value_sketch:\n$snap\nvs\n$batch")
  }
}
