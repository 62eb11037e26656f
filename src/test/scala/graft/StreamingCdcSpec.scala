package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCdc

/** StreamingCdc — the live chunk store: stream chunking is bit-equal
  * to the batch CdcChunks kernel, repeats add nothing, edited copies
  * add only their genuinely new chunks. */
class StreamingCdcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def synth(seed: Long, n: Int): String = {
    val sb = new StringBuilder
    var x = seed
    for (_ <- 0 until n) {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      val r = ((x >>> 33) % 27).toInt
      sb.append(if (r == 26) ' ' else ('a' + r).toChar)
    }
    sb.toString
  }

  test("admitted chunks = batch-distinct chunks; repeats admit nothing") {
    val docA = synth(1, 1200)
    val docB = synth(2, 300) + docA.substring(200) // shares A's tail
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingCdc.newChunks(docs, delay = "1 hour").writeStream
      .format("memory").queryName("cdc_new")
      .outputMode(OutputMode.Append()).start()
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")

    in.addData((t0, 0L, docA))
    q.processAllAvailable()
    val afterA = spark.table("cdc_new").collect().map(_.getAs[String]("ch"))
    // stream chunking == the batch kernel's distinct chunk hashes
    val batchA = Seq(docA).toDF("text")
      .select(explode(org.apache.spark.sql.graftexpr.TextExpressions
        .cdcChunks(col("text"))).as("c"))
      .select(md5(col("c"))).distinct().collect().map(_.getString(0))
    assert(afterA.sorted.toSeq == batchA.sorted.toSeq)

    // an exact repeat inside the watermark admits nothing
    in.addData((Timestamp.valueOf("2026-01-01 00:10:00"), 1L, docA))
    q.processAllAvailable()
    assert(spark.table("cdc_new").count() == afterA.length.toLong)

    // an edited copy admits ONLY its new-prefix chunks: every admitted
    // chunk hash is absent from A's store, and far fewer arrive than
    // B has chunks in total
    in.addData((Timestamp.valueOf("2026-01-01 00:20:00"), 2L, docB))
    q.processAllAvailable()
    val all = spark.table("cdc_new").collect().map(_.getAs[String]("ch"))
    q.stop()
    val newB = all.diff(afterA)
    val batchB = Seq(docB).toDF("text")
      .select(explode(org.apache.spark.sql.graftexpr.TextExpressions
        .cdcChunks(col("text"))).as("c"))
      .select(md5(col("c"))).distinct().collect().map(_.getString(0))
    assert(newB.toSet.subsetOf(batchB.toSet -- batchA.toSet))
    assert(newB.length < batchB.length / 2,
      s"${newB.length} admitted of ${batchB.length} total in the copy")
  }

  test("ingestCounts reports new chunk mass per window") {
    val docA = synth(10, 800)
    val docC = synth(11, 800)
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingCdc.ingestCounts(docs,
      delay = "10 minutes", windowLen = "1 hour").writeStream
      .format("memory").queryName("cdc_counts")
      .outputMode(OutputMode.Append()).start()
    // window 1: A + repeat of A; window 2: C
    in.addData(
      (Timestamp.valueOf("2026-01-01 00:05:00"), 0L, docA),
      (Timestamp.valueOf("2026-01-01 00:06:00"), 1L, docA),
      (Timestamp.valueOf("2026-01-01 01:05:00"), 2L, docC))
    q.processAllAvailable()
    in.addData((Timestamp.valueOf("2026-01-01 05:00:00"), 9L, "tail"))
    q.processAllAvailable()
    val got = spark.table("cdc_counts").collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    q.stop()
    def distinctMass(t: String) = {
      val rows = Seq(t).toDF("text")
        .select(explode(org.apache.spark.sql.graftexpr.TextExpressions
          .cdcChunks(col("text"))).as("c"))
        .select(md5(col("c")).as("h"), length(col("c")).cast("long").as("l"))
        .distinct().collect()
      (rows.length.toLong, rows.map(_.getLong(1)).sum)
    }
    val (na, ma) = distinctMass(docA)
    val (nc, mc) = distinctMass(docC)
    assert(got(Timestamp.valueOf("2026-01-01 00:00:00")) == ((na, ma)),
      "window 1: the repeat adds nothing")
    assert(got(Timestamp.valueOf("2026-01-01 01:00:00")) == ((nc, mc)))
  }
}
