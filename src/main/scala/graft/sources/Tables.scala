package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the test star schema.
  *
  * In the reference, data enters the engine as pushed array chunks
  * (doreisa/simulation_node.py:35-75); here batch data enters via columnar
  * parquet scans so Catalyst can push filters/projections into the source.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // long (spark.sql.legacy.parquet.nanosAsLong=true, set in our session
    // builders). Normalize to a microsecond timestamp; DuckDB's
    // CAST(ts AS TIMESTAMP) floors ns->us identically for positive epochs.
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else df
  }

  /** Register every table as a temp view (for spark.sql users). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
