package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingKll

/** StreamingKll — the live compactor face: after EVERY micro-batch the
  * running quantiles are rank-accurate against the exact prefix, the
  * state stays O(k·log n), and the observed weight equals the rows
  * fed. (The compactor's result is batch-layout-dependent by design —
  * the bound, not the bits, is the contract; bottom-k remains the
  * prefix-exact face.) */
class StreamingKllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("running quantiles hold rank bounds at every micro-batch split") {
    implicit val sc = spark.sqlContext
    val k = 128
    val perBatch = 2000
    val batches = 3
    def value(g: Int, i: Int): Double = (((i.toLong * 7919 + g * 13) % 20011)).toDouble
    val in = MemoryStream[(String, Double)]
    val ev = in.toDF().toDF("event_type", "value")
    val state = new StreamingKll.RunningKll(k)
    val q = StreamingKll.run(ev, state)
    val seen = scala.collection.mutable.Map(("g0", List.empty[Double]), ("g1", List.empty[Double]))
    for (b <- 0 until batches) {
      val rows = for (g <- 0 to 1; i <- 0 until perBatch)
        yield (s"g$g", value(g, b * perBatch + i))
      rows.foreach { case (g, v) => seen(g) = v :: seen(g) }
      in.addData(rows)
      q.processAllAvailable()
      for (g <- Seq("g0", "g1")) {
        val exact = seen(g).sorted.toIndexedSeq
        val n = exact.size
        assert(state.n(g) == n.toLong, s"$g weight after batch $b")
        // O(k log n) state: well under the flat-sample equivalent
        val levels = (math.log(math.max(n.toDouble / k, 1.0)) / math.log(2.0)).toInt + 2
        assert(state.retained(g) <= k * (levels + 1),
          s"$g retained ${state.retained(g)} after batch $b")
        for (p <- Seq(0.1, 0.5, 0.9)) {
          val est = state.quantile(g, p).get
          val trueRank = exact.count(_ <= est)
          val target = math.max(1L, math.ceil(p * n).toLong)
          assert(math.abs(trueRank - target) <= math.max(n / 50, 8),
            s"$g q=$p after batch $b: rank $trueRank vs target $target")
        }
      }
    }
    q.stop()
  }

  test("below capacity the running sketch is exact at any split") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val ev = in.toDF().toDF("event_type", "value")
    val state = new StreamingKll.RunningKll(256)
    val q = StreamingKll.run(ev, state)
    val vals = (0 until 100).map(i => ((i * 37) % 101).toDouble)
    vals.grouped(30).foreach { chunk =>
      in.addData(chunk.map(("g", _)))
      q.processAllAvailable()
    }
    q.stop()
    val sorted = vals.sorted
    assert(state.n("g") == 100L)
    assert(state.retained("g") == 100, "no compaction below capacity")
    for (p <- Seq(0.25, 0.5, 0.99))
      assert(state.quantile("g", p).contains(
        sorted(math.max(1, math.ceil(p * 100).toInt) - 1)), s"q=$p exact")
  }
}
