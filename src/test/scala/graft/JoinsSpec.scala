package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Joins, Relational}

class JoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join on skewed data") {
    // 10k rows, 90% on one hot key
    val big = spark.range(10000)
      .selectExpr("CASE WHEN id % 10 = 0 THEN id ELSE 7 END AS k", "id AS payload")
    val small = Seq((7L, "hot"), (0L, "zero"), (10L, "ten")).toDF("sk", "name")
    val plain = big.join(small, $"k" === $"sk").select("k", "payload", "name")
    val salted = Joins.saltedJoin(big, small, "k", "sk", 8).select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q5 plan broadcasts dimensions and pushes filters to the scan") {
    val plan = Relational.q5RegionVolume(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dimensions should broadcast")
    assert(plan.contains("PushedFilters: [IsNotNull"), "scan should have pushed filters")
  }

  test("q_filter_project prunes columns and pushes predicates") {
    val plan = Relational.qFilterProject(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual"),
      s"expected shipdate pushdown in:\n$plan")
    // scan reads only the 5 needed columns of lineitem's 11
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_shipdate"),
      s"scan should read only needed columns:\n$plan")
    assert(!plan.contains("l_returnflag"), "unused columns must be pruned")
  }

  test("q_topn plans as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.qTopN(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
