package graft

// Scratch profiling main (test scope, not shipped): stage-level costs of
// the native LSH dedup pipeline at sf0.1 — which part of the signature
// build / band join / expansion / verify actually burns the seconds.
object ProfileStages {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup tables")(graft.sources.Tables.load(spark, dir, "documents").count())

    // native docShingles(n=2) replica
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .repartition(col("doc_id"))
      .withColumn("hs",
        org.apache.spark.sql.graftexpr.TextExpressions.hashWordNgrams(col("text"), 2))
      .select("doc_id", "source", "hs")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("1 docShingles(2) native build")(docs.count())

    val NumPerms = 16; val NumBands = 4; val RowsPerBand = 4
    val MinhashP = 2305843009213693951L
    def perm(j: Int): (Long, Long) = {
      val r = new scala.util.Random(42 + j)
      (math.abs(r.nextLong()) % (MinhashP - 1) + 1, math.abs(r.nextLong()) % MinhashP)
    }
    val (as, bs) = (0 until NumPerms).map(perm).unzip
    val withMh = docs.select("doc_id", "hs")
      .withColumn("mh",
        org.apache.spark.sql.graftexpr.SketchExpressions
          .minhashSignature(col("hs"), as, bs, MinhashP))
    time("2 minhash only")(withMh.select(col("mh").getItem(0)).write
      .format("noop").mode("overwrite").save())
    val sigParts = (0 until NumPerms).flatMap(k =>
      Seq(lit(if (k == 0) "" else ","), col("mh").getItem(k).cast("string")))
    val withKey = withMh
      .withColumn("sigkey", md5(concat(sigParts: _*)))
      .filter(col("sigkey").isNotNull)
    time("3 +sigkey")(withKey.select("sigkey").write
      .format("noop").mode("overwrite").save())
    val sigs = withKey
      .withColumn("rep", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("sigkey")))
      .select("rep", "doc_id", "mh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("4 +window rep, persist")(sigs.count())
    val membership = sigs.select("rep", "doc_id")
    val reps = sigs.filter(col("doc_id") === col("rep")).select("rep", "mh")
    val bandStructs = (0 until NumBands).map { b =>
      val sig = (0 until RowsPerBand).flatMap(k =>
        Seq(lit(if (k == 0) "" else ","),
          col("mh").getItem(RowsPerBand * b + k).cast("string")))
      struct(lit(b).as("band"), md5(concat(sig: _*)).as("bh"))
    }
    val bands = reps
      .select(col("rep"), explode(array(bandStructs: _*)).as("e"))
      .select(col("rep"), col("e.band").as("band"), col("e.bh").as("bh"))
    val repPairs = bands.as("a")
      .join(bands.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("ra"), col("b.rep").as("rb"))
      .distinct()
    time("5 band self-join")(repPairs.write.format("noop").mode("overwrite").save())
    val cross = repPairs
      .join(membership.select(col("rep").as("ra"), col("doc_id").as("da"))
        .hint("shuffle_hash"), "ra")
      .join(membership.select(col("rep").as("rb"), col("doc_id").as("db"))
        .hint("shuffle_hash"), "rb")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"))
    val within = membership.as("x")
      .join(membership.as("y").hint("shuffle_hash"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val cand = cross.union(within)
    time("6 expansion joins -> cand")(cand.write.format("noop").mode("overwrite").save())
    // verify join (joinSignatures + jaccard)
    val hsA = docs.select(col("doc_id"), col("source"), col("hs"))
    val hsB = docs.select(col("doc_id"), col("hs"))
    val joined = cand
      .hint("shuffle_hash").join(hsA, col("doc_a") === col("doc_id"))
      .withColumnRenamed("hs", "hsa").drop("doc_id")
      .hint("shuffle_hash").join(hsB, col("doc_b") === col("doc_id"))
      .withColumnRenamed("hs", "hsb").drop("doc_id")
    val jac = size(array_intersect(col("hsa"), col("hsb"))).cast("double") /
      size(array_union(col("hsa"), col("hsb"))).cast("double")
    val out = joined.select(col("source"), jac.as("jac"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("jac") >= 0.5, 1L).otherwise(0L)).as("n_close"),
        max(col("jac")).as("max_jac"))
      .orderBy("source")
    time("7 verify+agg")(out.collect())
    time("8 whole thing again (all cached)")(out.collect())
    spark.stop()
  }
}
