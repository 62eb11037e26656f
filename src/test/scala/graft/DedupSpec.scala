package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("connectedComponents labels a chain transitively (multi-round)") {
    // Path 1-2-3-4 has diameter 3: the min label must propagate over
    // several rounds, so this exercises the convergence loop, not just
    // one-hop neighbors. 10-11 is a separate component.
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (11L, 10L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents on an empty edge list is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(edges).isEmpty)
  }

  test("dd_cluster clusters cover every verified pair endpoint exactly once") {
    val dir = "/root/testdata/sf0.001"
    val clusters = Dedup.ddCluster(spark, dir).as[(Long, Long)].collect()
    // every cluster has >= 2 members (singletons have no dup pair) and
    // the canonical ids are distinct
    assert(clusters.forall(_._2 >= 2))
    assert(clusters.map(_._1).distinct.length == clusters.length)
  }

  test("dd_cluster plan has no broadcast of the corpus signature relation") {
    val plan = Dedup.ddCluster(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the verify join must stay a shuffle join keyed on doc_id; only
    // genuinely small relations (candidate pairs) may broadcast
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
