package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingLines

/** StreamingLines — the live line-level keep-first pass: stream
  * normalization equals the batch lineRelOf semantics, duplicated
  * lines (within and across documents, inside the watermark) admit
  * nothing, and the windowed monitor counts distinct-new mass. */
class StreamingLinesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("first arrival wins per normalized line; batch normalization semantics") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingLines.newLines(docs, delay = "1 hour").writeStream
      .format("memory").queryName("lines_new")
      .outputMode(OutputMode.Append()).start()
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")

    // doc 0: "hello" twice + blank + padded variant of "world"
    in.addData((t0, 0L, "hello\nworld\n\nhello\n  world  "))
    q.processAllAvailable()
    val afterA = spark.table("lines_new").collect()
    // normalization: trim + drop blanks -> only (hello, world) admit,
    // the in-document repeat and the padded re-spelling both drop
    assert(afterA.length == 2)
    val batch = graft.operators.Dedup.lineRelOf(
        Seq((0L, "hello\nworld\n\nhello\n  world  ")).toDF("doc_id", "text"))
      .select("lh").distinct().collect().map(_.getString(0)).toSet
    assert(afterA.map(_.getAs[String]("lh")).toSet == batch,
      "stream line hashes == the batch lineRelOf distinct hashes")

    // a later doc repeating known lines + adding one new line admits
    // exactly the new line (the keep-first rule, cross-document)
    in.addData((Timestamp.valueOf("2026-01-01 00:10:00"), 1L,
      "hello\nfresh line\nworld"))
    q.processAllAvailable()
    val all = spark.table("lines_new").collect()
    q.stop()
    assert(all.length == 3)
    val newOnes = all.map(_.getAs[String]("lh")).toSet -- batch
    assert(newOnes.size == 1)
    // the admitted row carries the hash + length, never the text
    assert(!all.head.schema.fieldNames.contains("text"))
    assert(all.forall(_.getAs[Long]("llen") > 0L))
  }

  test("ingestCounts: repeats add nothing to the window's distinct-new mass") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingLines.ingestCounts(docs,
      delay = "10 minutes", windowLen = "1 hour").writeStream
      .format("memory").queryName("lines_counts")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      (Timestamp.valueOf("2026-01-01 00:05:00"), 0L, "aa bb\ncc dd"),
      (Timestamp.valueOf("2026-01-01 00:06:00"), 1L, "aa bb\ncc dd"),
      (Timestamp.valueOf("2026-01-01 01:05:00"), 2L, "ee ff"))
    q.processAllAvailable()
    in.addData((Timestamp.valueOf("2026-01-01 05:00:00"), 9L, "tail"))
    q.processAllAvailable()
    val got = spark.table("lines_counts").collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    q.stop()
    // window 1: two distinct lines ("aa bb", "cc dd") despite the repeat
    assert(got(Timestamp.valueOf("2026-01-01 00:00:00")) == ((2L, 10L)))
    // window 2: one new line of 5 codepoints
    assert(got(Timestamp.valueOf("2026-01-01 01:00:00")) == ((1L, 5L)))
  }
}
