package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCusum

/** StreamingCusum — the live change-point scan: exact decimal day
  * totals are a commutative fold, so the running series (and hence the
  * recomputed CUSUM) is prefix-exact to the batch rule under any
  * arrival order or micro-batch split. */
class StreamingCusumSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** The batch rule in plain BigDecimal (the EventProfilesSpec replay). */
  private def batchCusum(rows: Seq[(Timestamp, Double)]): Seq[(String, Double)] = {
    val daily = rows
      .groupBy(_._1.toLocalDateTime.toLocalDate.toString).toSeq
      .map { case (d, vs) =>
        (d, vs.map(v => BigDecimal(v._2).setScale(2)).sum)
      }.sortBy(_._1)
    val n = daily.size
    val stot = daily.map(_._2).sum
    var p = BigDecimal(0)
    daily.zipWithIndex.map { case ((d, x), i) =>
      p += x
      ((d, (BigDecimal(n) * p - BigDecimal(i + 1) * stot).toDouble))
    }
  }

  test("running CUSUM is prefix-exact at every split; planted shift peaks at the shift") {
    implicit val sc = spark.sqlContext
    // 20 days, 10 events/day; a +50 level shift from day 12 on
    val rows = for (d <- 0 until 20; e <- 0 until 10) yield {
      val base = ((d * 31 + e * 7) % 23).toDouble + (if (d >= 12) 50.0 else 0.0)
      (Timestamp.valueOf(f"2026-02-${d + 1}%02d 0${e % 10}:15:00"), base)
    }
    val scrambled = rows.sortBy(r => (r._2 * 31 + r._1.getTime) % 997)
    val chunks = Seq(
      scrambled.slice(0, 23), scrambled.slice(23, 120),
      scrambled.slice(120, 121), scrambled.slice(121, 200))
    val in = MemoryStream[(Timestamp, Double)]
    val stream = in.toDF().toDF("ts", "value")
    val state = new StreamingCusum.RunningCusum
    val q = StreamingCusum.run(spark, stream, state)
    try {
      var seen = Seq.empty[(Timestamp, Double)]
      for (chunk <- chunks) {
        in.addData(chunk)
        q.processAllAvailable()
        seen = seen ++ chunk
        val want = batchCusum(seen)
        val got = state.cusum().map(c => (c._1, c._2))
        assert(got == want, s"prefix ${seen.size}")
        // the /n read divides the same scaled double by the same n
        state.cusum().zip(want).foreach { case ((_, sc2, c), (_, w)) =>
          assert(c == w / state.nDays.toDouble && sc2 == w)
        }
      }
      // the full-series change point: |CUSUM| peaks at the last pre-shift
      // day (the level leaves the long-run mean hardest right before the
      // shifted regime starts pulling the mean up)
      val peak = state.peakDay()
      assert(peak.contains("2026-02-12"), s"peak at the shift boundary, got $peak")
      // terminal telescoping identity survives streaming accumulation
      assert(state.cusum().last._2 == 0.0)
    } finally q.stop()
  }
}
