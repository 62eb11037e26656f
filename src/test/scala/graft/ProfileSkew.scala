package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

// A/B harness for Joins.skewBound overhead (run: Test/runMain graft.ProfileSkew)
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("profq").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val queries: Seq[(String, () => DataFrame)] = Seq(
      "dd_simhash" -> (() => graft.operators.Dedup.ddSimhash(spark, dir)),
      "dd_simhash_est" -> (() => graft.operators.Dedup.ddSimhashEst(spark, dir)),
      "dd_minhash_lsh" -> (() => graft.operators.Dedup.ddMinhashLsh(spark, dir)),
      "dd_ngram_jaccard" -> (() => graft.operators.Dedup.ddNgramJaccard(spark, dir)),
      "sim_knn_join" -> (() => graft.operators.Similarity.simKnnJoin(spark, dir)))
    def minOf(n: Int)(f: () => DataFrame): Double =
      (0 until n).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    for ((name, f) <- queries) {
      // warm the session caches once, then alternate variant blocks
      spark.sharedState.cacheManager.clearCache()
      graft.operators.Joins.skewBoundEnabled = false
      val off1 = minOf(3)(f)
      graft.operators.Joins.skewBoundEnabled = true
      val on1 = minOf(3)(f)
      graft.operators.Joins.skewBoundEnabled = false
      val off2 = minOf(3)(f)
      graft.operators.Joins.skewBoundEnabled = true
      val on2 = minOf(3)(f)
      println(f"RESULT $name%-18s off=${math.min(off1, off2)}%.3f on=${math.min(on1, on2)}%.3f")
    }
    spark.stop()
  }
}
