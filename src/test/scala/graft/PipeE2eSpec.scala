package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

/** The end-to-end composite (`pipe_e2e`, VERDICT r19 next-round #2):
  * the per-source survivor accounting must RECONCILE — every document
  * lands in exactly one terminal stage, the quality/exact-dedup columns
  * equal the pipe_clean stage face's by shared-relation construction,
  * and the shuffle/pack tails run over exactly the final corpus. */
class PipeE2eSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val report = Pipeline.pipeE2e(spark, dir).collect()
    .map(r => r.getString(0) -> r).toMap

  test("per-source stage counts reconcile exactly to n_docs") {
    assert(report.nonEmpty)
    report.foreach { case (src, r) =>
      val total = r.getLong(2) + r.getLong(3) + r.getLong(4) +
        r.getLong(5) + r.getLong(6) + r.getLong(7) + r.getLong(8)
      assert(total == r.getLong(1), s"$src: stages sum $total != n_docs ${r.getLong(1)}")
      assert(r.getLong(10) <= r.getLong(9), s"$src: final_tokens exceed raw_tokens")
    }
    // something must actually survive, and something must actually drop
    assert(report.values.map(_.getLong(8)).sum > 0, "no final survivors")
    assert(report.values.map(r => r.getLong(1) - r.getLong(8)).sum > 0,
      "no document dropped anywhere — the chain is vacuous on this corpus")
  }

  test("quality and exact-dedup columns equal the pipe_clean stage face") {
    val clean = Pipeline.pipeClean(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(clean.keySet == report.keySet)
    clean.foreach { case (src, (nLowq, nDup)) =>
      assert(report(src).getLong(2) == nLowq, s"$src n_lowq")
      assert(report(src).getLong(3) == nDup, s"$src n_exact_dup")
    }
  }

  test("the shuffle tail permutes exactly the final corpus, densely") {
    val nFinal = report.values.map(_.getLong(8)).sum
    val sh = Pipeline.pipeE2eShuffle(spark, dir).collect()
    assert(sh.length.toLong == nFinal)
    val positions = sh.map(_.getLong(1)).sorted
    assert(positions.toSeq == (0L until nFinal).toSeq, "positions not dense 0..k-1")
    // shard = pos div PackDocsPerShard
    sh.foreach(r =>
      assert(r.getLong(2) == r.getLong(1) / Pipeline.PackDocsPerShard))
    // the permuted ids ARE the final survivor ids
    val finIds = Pipeline.e2eStages(spark, dir).s6
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sh.map(_.getLong(0)).toSet == finIds)
  }

  test("the pack tail budgets exactly the final corpus's surviving tokens") {
    val finalTokens = report.values.map(_.getLong(10)).sum
    val nFinal = report.values.map(_.getLong(8)).sum
    val pack = Pipeline.pipeE2ePack(spark, dir).collect()
    assert(pack.map(_.getLong(2)).sum == finalTokens, "packed token total")
    assert(pack.map(_.getLong(1)).sum == nFinal, "packed doc total")
    // per shard: sequence count is the 128-token ceil of its tokens
    pack.foreach { r =>
      assert(r.getLong(3) == math.ceil(r.getLong(2) / 128.0).toLong,
        s"shard ${r.getString(0)} sequence count")
    }
  }
}
