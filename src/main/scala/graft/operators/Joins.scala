package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed workloads (SURVEY §4).
  *
  * AQE's skew-join handling splits oversized partitions automatically;
  * explicit salting is the tool for the pathological case it can't fix —
  * one reduce-side key so hot that a single task would own it (e.g. a
  * null-ish default key owning 30% of a 100 TB fact table).
  */
object Joins {

  /** Skew-safe equi-join of a skewed `big` side with a smaller `small`
    * side: the big side's key space is split into `buckets` sub-keys via
    * a per-row salt, and the small side is replicated once per salt, so
    * the hot key's rows spread over `buckets` reduce tasks.
    *
    * The salt hashes the full row (deterministic for retries). Output
    * columns = big.* ++ small.* (join columns included once each side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt_b",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val replicated = small.withColumn("__salt_s",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          col("__salt_b") === col("__salt_s"))
      .drop("__salt_b", "__salt_s")
  }
}
