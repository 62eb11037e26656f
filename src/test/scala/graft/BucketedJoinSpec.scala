package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Structural witness for SURVEY §4's co-partitioning claim: a
  * fact-fact join between tables bucketed on the join key by
  * [[Tables.writeBucketed]] must run with NO Exchange — Spark reads the
  * matching buckets co-located, so the 100 TB lineitem⋈orders join
  * skips the shuffle that otherwise moves both fact streams. The
  * un-bucketed control join on the same data must show the Exchange,
  * so the assertion can't pass vacuously. Broadcast is disabled for
  * the probe (a broadcast join would skip the shuffle for the wrong
  * reason at this SF). */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join eliminates the exchange; control join shuffles") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.writeBucketed(
        Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
        "graft_li_bucketed", "l_orderkey", 4)
      Tables.writeBucketed(
        Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderpriority"),
        "graft_ord_bucketed", "o_orderkey", 4)
      val j = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderpriority")
      val n = j.count()
      assert(n > 0, "bucketed join returned no rows")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed fact-fact join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan did not engage the bucket layout:\n$plan")

      // control: same join on the raw (un-bucketed) parquet MUST shuffle,
      // proving the assertion above isn't vacuous
      val raw = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderpriority")
      raw.count(): Unit
      val rawPlan = raw.queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange"),
        s"control join unexpectedly shuffle-free:\n$rawPlan")

      // correctness of the co-partitioned path: same row count both ways
      assert(n == raw.count(), "bucketed join row count diverges from control")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }
}
