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

  /** Hot-key sets at most this large are inlined as literal when-chains
    * (the trained-model posture: a bounded driver-side artifact shaping
    * the plan). Larger sets — skew so broad that per-key literals would
    * bloat codegen — take the sound DataFrame-join fallback. */
  val MaxInlineHot: Int = 64

  /** Operational escape hatch (and A/B profiling seam): `false` makes
    * [[skewBound]] emit the degenerate single-split columns without
    * running the detection pass — exactly the naive self-join plan. */
  @volatile var skewBoundEnabled: Boolean = true

  /** Session-lifetime memo of resolved hot-key sets, keyed by the
    * salted plan's canonicalized semantic hash + keys + cap (the
    * trained-model fingerprint posture: sources are static within a
    * session, so the detection pass runs ONCE per distinct input plan,
    * not once per query construction — a measured ~0.3 s fixed job
    * cost at sf0.1 that would otherwise recur on every re-run). */
  private val hotMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[org.apache.spark.sql.Row]]()

  /** Invalidation hook for the hot-set memo (ADVICE r15): call after
    * replacing a table's data in place mid-session (the memo key is the
    * canonicalized PLAN, which doesn't see file contents) or from test
    * harnesses that re-measure detection cost. Safe anytime — the next
    * construction simply re-runs the bounded detection pass. */
  def clearSkewMemo(): Unit = hotMemo.clear()

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
    * with m = ceil(count(key in salted) / cap); `replicated` gets every
    * split of its matching key (`__split_r`), a key absent from
    * `salted` defaulting to m = 1. Joining on
    *   saltedKeys == replicatedKeys && __split === __split_r
    * reproduces EXACTLY the original equi-join pair set — a matching
    * pair meets in precisely the one cell the salted row's split picks —
    * while no reduce cell holds more than ~cap salted-side rows of one
    * key, so a 100×-hot bucket spreads over ceil(n/cap) tasks
    * (spec: JoinsSpec hot-bucket fixture).
    *
    * The hot-key set is resolved EAGERLY, at query-construction time
    * (the trained-model posture — one exact, map-side-combinable count
    * pass over the skinny keys, collecting only keys with count > cap,
    * a driver artifact bounded by n/cap and truncated at
    * [[MaxInlineHot]]), because the split plan must stay CHEAP when no
    * skew exists — the overwhelmingly common case:
    *  - no hot keys → both split columns are literal 0 and the join is
    *    byte-identical to the naive self-join, whose two identical
    *    subtrees ReuseExchange serves from ONE shuffle. Measured: the
    *    lazy count-relation variant of this helper cost +30–65% on the
    *    simhash/minhash family at sf0.1 purely from losing that reuse
    *    and serializing cache/count/broadcast stages.
    *  - ≤ [[MaxInlineHot]] hot keys → m is a literal when-chain
    *    (null-safe key equality, so no IsNotNull is inferred into any
    *    scan); only the replicated side grows a Generate node.
    *  - more (adversarially broad skew) → the DataFrame-join fallback:
    *    the count>cap hot relation (≤ n/cap skinny rows, `__skb_`
    *    columns) left-joins onto both sides — broadcast at plan time
    *    when `broadcastCounts` says the key space is bounded by
    *    construction, else unpinned for AQE's runtime choice — and the
    *    multiply-read input is persisted (ReuseExchange can't serve
    *    structurally different sides). */
  def skewBound(salted: DataFrame, replicated: DataFrame,
      saltedKeys: Seq[String], replicatedKeys: Seq[String],
      saltExpr: Column, cap: Int = SkewCap,
      broadcastCounts: Boolean = false): (DataFrame, DataFrame) = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(saltedKeys.length == replicatedKeys.length,
      "saltedKeys and replicatedKeys must pair up 1:1")
    def degenerate = (salted.withColumn("__split", lit(0)),
      replicated.withColumn("__split_r", lit(0)))
    if (!skewBoundEnabled) return degenerate
    // Phase 1 (eager, bounded, memoized): exact per-key counts, hot
    // keys only.
    val memoKey = salted.queryExecution.logical.canonicalized.semanticHash().toString +
      "|" + saltedKeys.mkString(",") + "|" + cap
    // compute OUTSIDE any map lock (a Spark job inside computeIfAbsent
    // would hold the bin lock for the collect's duration, blocking
    // concurrent query constructions hashing to the same bin); the
    // putIfAbsent race at worst runs the bounded pass twice and both
    // winners see one consistent value
    val hotRows = {
      val cached = hotMemo.get(memoKey)
      if (cached != null) cached
      else {
        val computed = salted.groupBy(saltedKeys.map(col): _*)
          .agg(count(lit(1L)).as("__skb_n"))
          .filter(col("__skb_n") > cap.toLong)
          .limit(MaxInlineHot + 1)
          .collect()
        if (hotMemo.size > 256) hotMemo.clear() // crude bound, like Tables.cache
        val prev = hotMemo.putIfAbsent(memoKey, computed)
        if (prev != null) prev else computed
      }
    }
    if (hotRows.isEmpty) return degenerate
    if (hotRows.length <= MaxInlineHot) {
      // Phase 2a: literal split plan from the bounded hot set.
      def mExpr(keys: Seq[String]): Column = {
        def keyEq(row: org.apache.spark.sql.Row): Column =
          keys.zipWithIndex.map { case (k, i) =>
            col(k) <=> lit(row.get(i))
          }.reduce(_ && _)
        def mOf(row: org.apache.spark.sql.Row): Int =
          math.ceil(row.getLong(keys.length).toDouble / cap).toInt
        hotRows.tail.foldLeft(when(keyEq(hotRows.head), mOf(hotRows.head))) {
          (acc, row) => acc.when(keyEq(row), mOf(row))
        }.otherwise(lit(1))
      }
      (salted.withColumn("__split", pmod(saltExpr, mExpr(saltedKeys))),
        replicated.withColumn("__split_r",
          explode(sequence(lit(0), mExpr(replicatedKeys) - 1))))
    } else {
      // Phase 2b: skew too broad to inline — count-relation joins.
      val saltedP = Persists.cached(salted)
      val replicatedP = if (replicated eq salted) saltedP else replicated
      val hot = saltedP.groupBy(saltedKeys.map(col): _*)
        .agg(count(lit(1L)).as("__skb_n"))
        .filter(col("__skb_n") > cap.toLong)
        .withColumn("__skb_m",
          ceil(col("__skb_n") / lit(cap.toDouble)).cast("int"))
        .drop("__skb_n")
      def pin(df: DataFrame): DataFrame =
        if (broadcastCounts) broadcast(df) else df
      val m = coalesce(col("__skb_m"), lit(1))
      val s = saltedP.join(pin(hot), saltedKeys, "left")
        .withColumn("__split", pmod(saltExpr, m))
        .drop("__skb_m")
      val hotR = saltedKeys.zip(replicatedKeys).foldLeft(hot) {
        case (d, (sk, rk)) => if (sk == rk) d else d.withColumnRenamed(sk, rk)
      }
      val r = replicatedP.join(pin(hotR), replicatedKeys, "left")
        .withColumn("__split_r", explode(sequence(lit(0), m - 1)))
        .drop("__skb_m")
      (s, r)
    }
  }
}
