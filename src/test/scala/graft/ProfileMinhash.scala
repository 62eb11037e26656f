package graft

// Scratch profiling main (test scope, not shipped).
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .repartition(col("doc_id"))
      .withColumn("tk", tokens(col("text")))
      .withColumn("ss", array_distinct(shingles(col("tk"), 3)))
      .withColumn("hs", array_distinct(transform(col("ss"), sh => hash60(sh))))
      .select("doc_id", "source", "ss", "hs")
      .filter(size(col("ss")) > 0)
    time("warmup")(docs.count())
    time("docs hot")(docs.count())
    val withMh = (0 until 16).foldLeft(docs) { (df, j) =>
      val (a, b) = graft.operators.Dedup.perm(j)
      df.withColumn(s"mh$j",
        array_min(transform(col("hs"), h =>
          (lit(a) * (h % lit(graft.operators.Dedup.MinhashP)) + lit(b)) % lit(graft.operators.Dedup.MinhashP))))
    }
    time("withMh hot")(withMh.select(max(col("mh15"))).collect())
    val bandStructs = (0 until 4).map { bnd =>
      struct(lit(bnd).as("band"),
        md5(concat_ws(",", (0 until 4).map(k => col(s"mh${4 * bnd + k}").cast("string")): _*)).as("bh"))
    }
    val bands = withMh
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
    time("bands hot")(bands.count())
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("cand hot")(cand.count())
    time("full hot")(graft.operators.Dedup.ddMinhashLsh(spark, dir).count())
    println(withMh.select(max(col("mh15"))).queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
