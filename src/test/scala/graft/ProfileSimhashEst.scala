package graft

// Scratch profiling main (test scope, not shipped): stage-level costs of
// dd_simhash_est at sf0.1 — the round's slowest query. Rebuilds the
// calibration pipeline stage by stage and times each materialization.
object ProfileSimhashEst {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
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
    time("warmup tables")(graft.sources.Tables.load(spark, dir, "documents").count())

    // replicate simhashDocs
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        org.apache.spark.sql.graftexpr.TextExpressions
          .hashWordNgrams(col("text"), 1).as("hs"))
      .withColumn("sig", org.apache.spark.sql.graftexpr.SketchExpressions
        .simhash(col("hs"), 60))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("1 simhashDocs build")(docs.count())

    val sigs = docs.groupBy("sig").agg(count(lit(1)).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("2 sigs distinct agg")(sigs.count())

    val mask = (1L << 15) - 1
    val bands = sigs.select(col("sig"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            expr(s"(sig >> ${15 * b}) & $mask").as("bv"))): _*)).as("e"))
      .select(col("sig"), col("e.band").as("band"), col("e.bv").as("bv"))
    val sigPairs = bands.as("a")
      .join(bands.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.sig") < col("b.sig"))
      .select(col("a.sig").as("sa"), col("b.sig").as("sb"),
        expr("CAST(bit_count(a.sig ^ b.sig) AS BIGINT)").as("hamming"))
      .filter(col("hamming").between(1, 3))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("3 band self-join + distinct")(println("pairs=" + sigPairs.count()))

    val da = docs.select(col("sig").as("sa"), col("doc_id").as("ida"), col("hs").as("hsa"))
    val db = docs.select(col("sig").as("sb"), col("doc_id").as("idb"), col("hs").as("hsb"))
    val jac = org.apache.spark.sql.graftexpr.SketchExpressions
      .jaccardSet(col("hsa"), col("hsb"))
    val cross = sigPairs
      .hint("shuffle_hash").join(da, "sa")
      .hint("shuffle_hash").join(db, "sb")
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"),
        col("hamming"), jac.as("jaccard"), lit(1L).as("n_pairs"))
    time("4 cross expansion + jaccard")(
      cross.write.format("noop").mode("overwrite").save())

    val w = org.apache.spark.sql.expressions.Window.partitionBy("sig").orderBy("doc_id")
    val reps0 = docs.select(col("doc_id"), col("sig"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("sig")
      .agg(count(lit(1)).as("nr"),
        min(col("doc_id")).as("doc_a"), max(col("doc_id")).as("doc_b"))
      .filter(col("nr") === 2)
      .join(sigs.hint("shuffle_hash"), "sig")
    val reps = reps0
      .select(col("sig"), col("g"), col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("rid"))
      .hint("shuffle_hash")
      .join(docs.select(col("doc_id").as("rid"), col("hs")), "rid")
      .groupBy("sig", "g", "doc_a", "doc_b")
      .agg(expr("min_by(hs, rid)").as("hsa"), expr("max_by(hs, rid)").as("hsb"))
      .select(col("doc_a"), col("doc_b"), lit(0L).as("hamming"),
        org.apache.spark.sql.graftexpr.SketchExpressions
          .jaccardSet(col("hsa"), col("hsb")).as("jaccard"),
        expr("g * (g - 1) div 2").as("n_pairs"))
    time("5 hamming-0 reps path")(
      reps.write.format("noop").mode("overwrite").save())

    time("6 full union + sort")(
      cross.union(reps).orderBy("doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
