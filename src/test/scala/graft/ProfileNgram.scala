package graft

// Scratch profiling main (test scope, not shipped): stage-by-stage cost
// of the dd_ngram_jaccard / dd_cluster LSH pipeline at sf0.1.
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // replicate docShingles(n=2) without the private access
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .repartition(col("doc_id"))
      .withColumn("tk", tokens(col("text")))
      .withColumn("ss", array_distinct(shingles(col("tk"), 2)))
      .withColumn("hs", array_distinct(transform(col("ss"), sh => hash60(sh))))
      .select("doc_id", "source", "ss", "hs")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docShingles build+count")(println("docs=" + docs.count()))
    val cand = graft.operators.Dedup.lshCandidates(docs)
    time("lshCandidates")(println("cand=" + cand.count()))
    time("lshCandidates again (cached?)")(println("cand=" + cand.count()))
    time("full dd_ngram_jaccard")(
      graft.operators.Dedup.ddNgramJaccard(spark, dir).collect())
    time("full dd_cluster")(
      graft.operators.Dedup.ddCluster(spark, dir).collect())
    time("dd_cluster again")(
      graft.operators.Dedup.ddCluster(spark, dir).collect())
    spark.stop()
  }
}
