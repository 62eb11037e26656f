package graft

// Scratch profiling main (test scope, not shipped): txt_contamination
// stage costs at sf0.1.
object ProfileContam {
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
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .withColumn("tk3", shingles(tokens(col("text")), 3))
    time("warm scan")(docs.select(count(lit(1))).collect())
    time("bench grams distinct")(println(docs.filter(col("source") === "src0")
      .select(explode(col("tk3")).as("g")).distinct().count()))
    time("corpus explode count")(println(docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), explode_outer(col("tk3")).as("g")).count()))
    time("full txt_contamination")(
      graft.operators.Pipeline.txtContamination(spark, dir).collect())
    time("full again")(
      graft.operators.Pipeline.txtContamination(spark, dir).collect())
    spark.stop()
  }
}
