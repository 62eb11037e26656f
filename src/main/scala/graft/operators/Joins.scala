package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Default per-reduce-cell cap for [[skewBound]]: small enough that
    * one task's share of a hot key stays comfortably in executor memory
    * at the 100 TB posture, large enough that every key at test scale
    * keeps m = 1 — the salted plan then replicates nothing and its
    * output is the naive join's (it is for ANY cap; m = 1 just also
    * makes the cost identical). */
  val SkewCap: Int = 1 << 16

  /** Adaptive salted split for a skewed band/bucket equi-join — the
    * self-join twin of [[saltedJoin]] (which replicates the ENTIRE small
    * side `buckets`×; here replication is per-key ceil(n/cap), i.e. 1
    * for every non-hot key, so the non-skewed majority pays nothing).
    * A hot band bucket (a common MinHash band value, a crowded LSH
    * hyperplane region) otherwise serializes one reduce task at corpus
    * scale: shuffle_hash joins hash ALL of a key's rows to one cell, and
    * AQE's skew split only divides observed partitions by mapper ranges
    * after the fact (and not below a key). This bound is structural.
    *
    * `salted` gets ONE split per row: `__split` = pmod(saltExpr, m)
    * with m = ceil(count(key in salted) / cap). `replicated` is
    * exploded to all m splits of its matching key (`__split_r`; a key
    * absent from `salted` gets m = 1 and produces no pairs anyway —
    * left-outer + coalesce, so no row is lost and, being provably
    * non-null, no isnotnull is inferred into scans). Joining on
    *   saltedKeys == replicatedKeys && __split === __split_r
    * reproduces EXACTLY the original equi-join pair set — a matching
    * pair meets in precisely the one cell the salted row's split picks —
    * while no reduce cell holds more than ~cap salted-side rows of one
    * key, so a 100×-hot bucket spreads over ceil(n/cap) tasks
    * (spec: JoinsSpec hot-bucket fixture).
    *
    * Cost: the per-key count aggregate (map-side combinable) joined
    * onto both sides. With `broadcastCounts` — ONLY for key spaces
    * bounded by construction (e.g. the 2^planes LSH buckets × labels) —
    * the count joins are broadcasts and no extra shuffle exists
    * anywhere; otherwise they are pinned shuffle_hash and cost one
    * extra skinny shuffle per side (the band relations at the call
    * sites are key-only projections of already-persisted signature
    * tables, so that shuffle carries a few columns, never payloads). */
  def skewBound(salted: DataFrame, replicated: DataFrame,
      saltedKeys: Seq[String], replicatedKeys: Seq[String],
      saltExpr: Column, cap: Int = SkewCap,
      broadcastCounts: Boolean = false): (DataFrame, DataFrame) = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(saltedKeys.length == replicatedKeys.length,
      "saltedKeys and replicatedKeys must pair up 1:1")
    val cnt = salted.groupBy(saltedKeys.map(col): _*)
      .agg(count(lit(1L)).as("__skb_n"))
      .withColumn("__skb_m",
        greatest(lit(1L), ceil(col("__skb_n") / lit(cap.toDouble))).cast("int"))
      .drop("__skb_n")
    def pin(df: DataFrame): DataFrame =
      if (broadcastCounts) broadcast(df) else df.hint("shuffle_hash")
    val s = salted.join(pin(cnt), saltedKeys)
      .withColumn("__split", pmod(saltExpr, col("__skb_m")))
      .drop("__skb_m")
    val cntR = saltedKeys.zip(replicatedKeys).foldLeft(cnt) {
      case (d, (sk, rk)) => if (sk == rk) d else d.withColumnRenamed(sk, rk)
    }
    val r = replicated.join(pin(cntR), replicatedKeys, "left")
      .withColumn("__split_r",
        explode(sequence(lit(0), coalesce(col("__skb_m"), lit(1)) - 1)))
      .drop("__skb_m")
    (s, r)
  }
}
