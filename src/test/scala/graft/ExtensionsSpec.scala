package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("GraftExtensions registers graft_dot for SQL users") {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(r == 11.0)
    } finally () // shared JVM session registry; leave the session alone
  }

  test("Async.prepare computes in the background (doreisa persist analog)") {
    val df = spark.range(1000).toDF("id")
    val fut = Async.prepare(df.selectExpr("sum(id) AS s"))
    val rows = fut.get()
    assert(rows.head.getLong(0) == 499500L)
  }

  test("as-of join picks the latest purchase at-or-before each error") {
    val sf = "/root/testdata/sf0.001"
    val out = Relational.evAsofJoin(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(!r.getTimestamp(3).after(r.getTimestamp(2)),
        s"purchase ${r.getTimestamp(3)} is after error ${r.getTimestamp(2)}")
    }
    // spot-check one user by hand
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "user_id", "timestamp_micros(ts div 1000) AS ts", "event_type")
    val someUser = rows.filter(!_.isNullAt(3)).head.getLong(1)
    val purchases = ev.where(s"user_id = $someUser AND event_type = 'purchase'")
      .select("ts").as[java.sql.Timestamp].collect()
    rows.filter(r => r.getLong(1) == someUser && !r.isNullAt(3)).foreach { r =>
      val expected = purchases.filter(p => !p.after(r.getTimestamp(2))).max
      assert(r.getTimestamp(3) == expected)
    }
  }
}
