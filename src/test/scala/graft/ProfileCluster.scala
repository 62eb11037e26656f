package graft

// Scratch profiling main (test scope, not shipped): dd_cluster stage costs.
object ProfileCluster {
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
    // mirror ddCluster's edge construction via the public query minus CC:
    // time the pieces separately through ddNgramJaccard-style reuse
    time("warmup tables")(graft.sources.Tables.load(spark, dir, "documents").count())
    val t0 = System.nanoTime()
    val cl = graft.operators.Dedup.ddCluster(spark, dir)
    println(f"[prof] plan build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    time("dd_cluster total")(cl.collect())
    time("dd_cluster repeat (caches hot)")(
      graft.operators.Dedup.ddCluster(spark, dir).collect())
    // CC loop alone on a tiny in-memory edge list
    import spark.implicits._
    val edges = Seq((1L,2L),(2L,3L),(10L,11L),(20L,21L),(21L,22L),(22L,23L)).toDF("a","b")
    time("cc loop tiny 1st")(graft.operators.Dedup.connectedComponents(edges).collect())
    time("cc loop tiny 2nd")(graft.operators.Dedup.connectedComponents(edges).collect())
    spark.stop()
  }
}
