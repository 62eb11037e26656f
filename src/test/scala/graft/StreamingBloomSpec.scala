package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingBloom

/** StreamingBloom — the live per-source Bloom filters: bit_or is a
  * commutative-IDEMPOTENT semilattice, so the running filter after any
  * prefix of batches equals the batch filter over the same rows under
  * any split AND under at-least-once replay. */
class StreamingBloomSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  /** The batch filter rule in plain Scala (the DedupSpec replay). */
  private def batchFilter(rows: Seq[(String, String)], src: String): Vector[Long] = {
    val m = graft.operators.Dedup.BloomM
    val bpw = graft.operators.Dedup.BloomBitsPerWord
    val w = new Array[Long](graft.operators.Dedup.BloomWords)
    rows.filter(_._1 == src)
      .flatMap(_._2.split(" ").filter(_.nonEmpty))
      .map(graft.functions.localHash60).distinct
      .foreach { h =>
        Seq(h % m, (h / m) % m).foreach { p =>
          w((p / bpw).toInt) |= 1L << (p % bpw).toInt
        }
      }
    w.toVector
  }

  test("running filters are prefix-exact at every split and idempotent under replay") {
    implicit val sc = spark.sqlContext
    // real sf0.001 corpus, scrambled, fed in 3 unequal chunks
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val scrambled = docs.sortBy(d => (d._2.length * 2654435761L) % 1000003L)
    val chunks = Seq(
      scrambled.slice(0, 7), scrambled.slice(7, 31),
      scrambled.slice(31, scrambled.size))
    val in = MemoryStream[(String, String)]
    val stream = in.toDF().toDF("source", "text")
    val state = new StreamingBloom.RunningBloom
    var seen = Seq.empty[(String, String)]
    for (chunk <- chunks) {
      in.addData(chunk)
      val q = StreamingBloom.run(spark, stream, state,
        trigger = Some(Trigger.AvailableNow()))
      try q.awaitTermination() finally q.stop()
      seen = seen ++ chunk
      seen.map(_._1).distinct.foreach { src =>
        val want = batchFilter(seen, src)
        assert(state.filter(src).contains(want), s"prefix ${seen.size}, source $src")
        assert(state.bitsSet(src) ==
          want.map(java.lang.Long.bitCount(_).toLong).sum, s"$src popcount")
      }
    }
    // idempotence: replaying the LAST chunk's contributions changes nothing
    val before = seen.map(_._1).distinct.sorted.map(s => state.filter(s).get)
    val qr = StreamingBloom.run(spark, stream, state,
      trigger = Some(Trigger.AvailableNow()))
    try {
      in.addData(chunks.last)
      qr.awaitTermination()
    } finally qr.stop()
    val after = seen.map(_._1).distinct.sorted.map(s => state.filter(s).get)
    assert(after == before, "at-least-once replay must be a no-op")
    // snapshot shape
    val snap = state.snapshot(spark).collect()
    assert(snap.length == seen.map(_._1).distinct.size)
    snap.foreach { r =>
      assert(r.getSeq[Long](1).map(java.lang.Long.bitCount(_).toLong).sum ==
        r.getLong(2))
    }
  }
}
