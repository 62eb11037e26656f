package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Persists.PersistOps
import graft.sources.Tables

/** Relational analytics suite (SURVEY §2.B/§2.C).
  *
  * Conventions for cross-engine (DuckDB oracle) determinism:
  *  - money/quantity math is done in DECIMAL (exact), emitted as DOUBLE;
  *  - every output has a total deterministic ORDER BY;
  *  - aggregate columns are aliased identically in Spark and oracle SQL.
  *
  * Scale notes: dimension tables are broadcast explicitly; aggregates rely
  * on Catalyst partial aggregation (map-side combine); top-N uses
  * TakeOrderedAndProject (no global sort materialization).
  */
object Relational {

  /** Exact decimal view of a money/quantity double column. */
  private def dec2(c: String): Column = col(c).cast("decimal(18,2)")
  /** ext * (1 - disc) in exact decimal. */
  private val discPrice: Column =
    dec2("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec2("l_discount"))
  private val chargePrice: Column =
    discPrice * (lit(1).cast("decimal(18,2)") + dec2("l_tax"))

  /** Exact integer hundredths (cents) of a 2-decimal money/quantity
    * double — the narrow-type row representation for HOT aggregate
    * paths (guide §2.3): per-row LONG multiplies replace per-row
    * BigDecimal casts/multiplies (measured 2-3x on the q1/q_corr scan
    * stage). Value-equal to `dec2(c) * 100` for every double whose
    * nearest-decimal reading has <= 2 fraction digits: both
    * `cast(double AS decimal(18,2))` and `round(double)` round
    * HALF_UP, and the *100 double product of such a value lands well
    * inside 1e-10 of the true integer, never at a .5 boundary. */
  private[graft] def cents(c: String): Column = round(col(c) * 100).cast("long")

  /** Overflow-safe exact sum of a long `units` column scaled by
    * 10^-scale, emitted as DOUBLE: the accumulator is DECIMAL (38
    * digits of headroom — a LONG accumulator would wrap at ~10^19,
    * within reach of a 100 TB fact table), and the final scaling is a
    * decimal multiply by the exact 10^-scale literal so the emitted
    * double is bit-identical to `CAST(exact_decimal_sum AS DOUBLE)`
    * (a double division would round twice once the sum passes 2^53). */
  private[graft] def sumUnits(units: Column, scale: Int): Column =
    // the ROW-level cast stays at 18 digits (every unit value here is
    // bounded ~1e11/row) so rows keep Spark Decimal's compact-long
    // representation — precision > 18 per row forces the BigInteger
    // path in UnsafeRow and costs more than the decimal math it
    // replaces (measured); sum() itself widens the buffer to (28,0)
    (sum(units.cast("decimal(18,0)")).cast("decimal(36,0)") *
      lit(new java.math.BigDecimal(java.math.BigInteger.ONE, scale)))
      .cast("double")

  /** ext * (1 - disc) in exact integer 10^-4 units (LONG per row:
    * pc ≤ ~1e9·(100−dc) stays far under 2^63) — the [[cents]] row
    * representation of [[discPrice]] for HOT aggregate paths (r21,
    * guide §2.3 narrower types): `sumUnits(discPriceUnits, 4)` emits a
    * double bit-identical to `sum(discPrice).cast("double")` (the q1
    * sum_disc_price equivalence, oracle-gated there and at every
    * converted site). */
  private val discPriceUnits: Column =
    cents("l_extendedprice") * (lit(100L) - cents("l_discount"))

  /** The drop-in replacement for `sum(discPrice).cast("double")`. */
  private def sumDiscPrice: Column = sumUnits(discPriceUnits, 4)

  /** TPC-H Q1 shape: scan + filter + groupBy aggregate w/ partial agg.
    * Money math runs in exact integer cents per row ([[cents]]) with
    * decimal accumulators ([[sumUnits]]): same exact values as the
    * decimal spelling the oracle keeps, ~2x less scan-stage CPU. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .select(col("l_returnflag"), col("l_linestatus"),
        cents("l_quantity").as("qc"), cents("l_extendedprice").as("pc"),
        cents("l_discount").as("dc"), cents("l_tax").as("tc"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumUnits(col("qc"), 2).as("sum_qty"),
        sumUnits(col("pc"), 2).as("sum_base_price"),
        sumUnits(col("pc") * (lit(100L) - col("dc")), 4).as("sum_disc_price"),
        sumUnits(col("pc") * (lit(100L) - col("dc")) * (lit(100L) + col("tc")), 6)
          .as("sum_charge"),
        count(lit(1)).as("count_order"))
      .transform(Present.sorted("l_returnflag", "l_linestatus"))

  /** TPC-H Q3 shape: 3-way join (1 broadcast) + agg + top-N. */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01"))
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01"))
    li.join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sumDiscPrice.as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-way join, dims broadcast, local-supplier condition. */
  def q5RegionVolume(s: SparkSession, dir: String): DataFrame = {
    // r21: the region filter + local-supplier condition IMPLY both the
    // supplier AND the customer sit in an ASIA nation — resolve
    // region⋈nation first (a ≤|nations| relation), attach it to each
    // dim, and broadcast the pruned dims BELOW the lineitem⋈orders
    // exchange: both fact sides shrink to ASIA rows (~1/5 at uniform
    // regions) before the only fact-fact shuffle, which previously
    // carried every lineitem and every 2-year order (guide §2.2
    // shuffle fewer bytes, §3.2 pre-filter the big side). The
    // local-supplier equality (cn_key = s_nationkey) survives as the
    // post-shuffle residual it always was, so the surviving rows — and
    // the aggregate — are identical.
    val asiaNations = Tables.load(s, dir, "nation")
      .join(broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.load(s, dir, "supplier")
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val cust = Tables.load(s, dir, "customer")
      .join(broadcast(asiaNations.select(col("n_nationkey").as("cn_dim"))),
        col("c_nationkey") === col("cn_dim"))
      .select(col("c_custkey"), col("c_nationkey").as("cn_key"))
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    Tables.load(s, dir, "lineitem")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey") && col("cn_key") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sumDiscPrice.as("revenue"))
      .transform(Present.sortedBy(desc("revenue"), asc("n_name")))
  }

  /** TPC-H Q7 shape: two-nation trade volume by ship year. The nation
    * dims join twice (supplier side and customer side, both broadcast);
    * the disjunctive nation-pair filter runs after the joins, and the
    * single fact-fact shuffle is lineitem-orders on orderkey. */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    // r21: the disjunctive pair predicate IMPLIES supp_nation ∈ {N1,N2}
    // and cust_nation ∈ {N1,N2} — attach the nation name to each dim,
    // filter the DIMS to the two nations, and broadcast them BELOW the
    // lineitem⋈orders exchange: both fact sides shrink to the two
    // nations' rows (~2/25 of suppliers / customers) before the only
    // fact-fact shuffle, which previously carried every row (guide
    // §2.2 shuffle fewer bytes, §3.2 pre-filter the big side). The
    // residual pair filter (excluding N1–N1 / N2–N2) is unchanged, so
    // the surviving rows — and the aggregate — are identical.
    val pairNations = Seq("NATION_1", "NATION_2")
    val supp = Tables.load(s, dir, "supplier")
      .join(broadcast(Tables.load(s, dir, "nation")
          .filter(col("n_name").isin(pairNations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.load(s, dir, "customer")
      .join(broadcast(Tables.load(s, dir, "nation")
          .filter(col("n_name").isin(pairNations: _*))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.load(s, dir, "lineitem")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val ord = Tables.load(s, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    li.join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(sumDiscPrice.as("revenue"))
      .transform(Present.sorted("supp_nation", "cust_nation", "l_year"))
  }

  /** TPC-H Q10 shape: returned-item revenue ranking per customer —
    * join + agg keyed on the customer, then top-20 via
    * TakeOrderedAndProject (no global sort). */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    val cust = Tables.load(s, dir, "customer")
    li.join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(sumDiscPrice.as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q19 shape: disjunctive brand/size/quantity predicate over a
    * broadcast part join — the OR-of-ANDs must not defeat pushdown of
    * the shared conjuncts (part is filtered to the brand union before
    * broadcast). Single summary row. */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
    val li = Tables.load(s, dir, "lineitem")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 30) &&
          col("l_quantity").between(20, 35)))
      .agg(sumDiscPrice.as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q4 shape: correlated EXISTS as a left-semi join with a
    * non-equi extra condition (late shipment: l_shipdate more than 60
    * days after the order date). The semi join keeps the equi key for
    * the shuffle; the inequality is evaluated post-match, so no
    * cross product materializes. (The synthetic lineitem has no
    * commit/receipt dates; late-vs-orderdate keeps the Q4 shape.) */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01") &&
        col("o_orderdate") < lit("1996-10-01"))
    // r21 (the q_late_orders collapse): ∃ late line ⟺ the order's MAX
    // ship date is late — per-order max via map-side partial agg, so
    // the orderkey exchange carries O(|orders|) rows instead of every
    // line; the aggregate's ≤1 row per key makes the semi ≡ inner.
    val lastShip = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("last_ship"))
    ord.join(lastShip.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("last_ship") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .transform(Present.sorted("o_orderpriority"))
  }

  /** TPC-H Q13 shape: customer-order distribution. Left outer join with
    * a join-side filter (status <> 'F' must stay in the join condition,
    * not a WHERE, to preserve customers with zero matching orders),
    * per-customer count, then a second tiny agg over the counts. */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders")
    cust.join(ord.hint("shuffle_hash"),
        col("c_custkey") === col("o_custkey") && col("o_orderstatus") =!= "F",
        "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .transform(Present.sortedBy(desc("custdist"), desc("c_count")))
  }

  /** TPC-H Q22 shape: scalar aggregate subquery (global positive-balance
    * average, a 1-row broadcast) as the filter threshold, then an anti
    * join against orders, grouped by nation. Threshold is computed in
    * decimal and rounded to cents so the comparison is exact
    * cross-engine. */
  def q22GlobalSales(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(dec2("c_acctbal")).cast("decimal(18,2)").as("avg_bal"))
    val ord = Tables.load(s, dir, "orders")
    cust.join(broadcast(avgBal))
      .filter(dec2("c_acctbal") > col("avg_bal"))
      .join(ord.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum(dec2("c_acctbal")).cast("double").as("totacctbal"))
      .transform(Present.sorted("c_nationkey"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting, adapted to this
    * schema's shipdate lateness): a line shipped > 60 days after its
    * order date counts against its supplier only when ANOTHER supplier
    * shares the order (EXISTS -> left-semi) and NO other supplier was
    * late on it (NOT EXISTS -> left-anti over the late set) — the sole
    * guilty supplier. Both correlated subqueries become hash joins keyed
    * on the order key; the late relation is built once and feeds both
    * the probe and the anti side, and the 100-row supplier dim
    * broadcasts. */
  def q21SoleLate(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val ord = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
    // orders is fact-scale too: the lateness join shuffles on the order
    // key (same layout the semi/anti below reuse), no orders broadcast.
    // late feeds BOTH the main pipeline and the anti build below —
    // truncate its lineage so the plan materializes the lateness join
    // once instead of scanning lineitem 3x / orders 2x (Checkpoints
    // routes to reliable checkpoint under the cluster posture flag).
    val late = li
      .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .transform(Checkpoints.truncate)
    // r21: the correlated EXISTS / NOT EXISTS collapse to per-order
    // supplier-set tests — "another supplier shares the order" is
    // min(l_suppkey) ≠ max(l_suppkey) over the order's lines (the late
    // row's own supplier is in that set, so ≥2 distinct ⟺ ∃ other),
    // and "no other supplier was late" is min = max over the order's
    // LATE suppliers (the row's sk is in that set, so 1 distinct ⟺
    // none other). Both sides become order-scale 1-column semi builds
    // fed by partial-aggregated min/max — the old spelling shuffled
    // every (orderkey, suppkey) LINE twice (semi probe + anti probe)
    // with a ≠ residual; this shuffles O(|orders|) rows (guide §2.2
    // map-side aggregation, §3.1 smallest sufficient join side).
    val multiSupp = li
      .groupBy(col("l_orderkey").as("ok2"))
      .agg(min(col("l_suppkey")).as("s_lo"), max(col("l_suppkey")).as("s_hi"))
      .filter(col("s_lo") =!= col("s_hi"))
      .select("ok2").hint("shuffle_hash")
    val soleLate = late
      .groupBy(col("ok").as("ok3"))
      .agg(min(col("sk")).as("k_lo"), max(col("sk")).as("k_hi"))
      .filter(col("k_lo") === col("k_hi"))
      .select("ok3").hint("shuffle_hash")
    late
      .join(multiSupp, col("ok2") === col("ok"), "left_semi")
      .join(soleLate, col("ok3") === col("ok"), "left_semi")
      .join(broadcast(Tables.load(s, dir, "supplier")), col("s_suppkey") === col("sk"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q20 shape (nested aggregate feeding an IN): suppliers who
    * shipped > 100 units of some single part whose name matches a
    * pattern. The inner aggregate prunes lineitem with a semi join on
    * the filtered parts BEFORE grouping, groups on (supp, part) with
    * partial aggs, and the outer IN is a semi join against the tiny
    * distinct supplier set. */
  def q20HeavyParts(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(s, dir, "part")
      .filter(col("p_name").like("%a%")).select("p_partkey")
    val heavy = Tables.load(s, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey", "l_partkey")
      // integer-cents quantity units with a decimal accumulator (the
      // q1 posture, r21); qd > 100 ⟺ qu > 10000 exactly (qd = qu/100)
      .agg(sum(cents("l_quantity").cast("decimal(18,0)")).as("qu"))
      .filter(col("qu") > 10000)
      .select(col("l_suppkey").as("hk")).distinct()
    Tables.load(s, dir, "supplier")
      .join(heavy, col("s_suppkey") === col("hk"), "left_semi")
      .select(col("s_suppkey"), col("s_name"),
        dec2("s_acctbal").cast("double").as("s_acctbal"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q6 shape: the pushdown showcase — a single scan whose date,
    * discount and quantity predicates all reach the parquet reader, one
    * global aggregate, no join. The discount band compares in exact
    * decimal so the boundary rows match cross-engine. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        dec2("l_discount").between(
          lit("0.05").cast("decimal(18,2)"), lit("0.07").cast("decimal(18,2)")) &&
        col("l_quantity") < 24)
      .agg(sum(dec2("l_extendedprice") * dec2("l_discount")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q8 shape: national market share — the widest join tree in the
    * suite (lineitem ⋈ part ⋈ orders ⋈ supplier ⋈ customer ⋈ nation×2 ⋈
    * region). Every dimension broadcasts; the single fact-fact shuffle is
    * lineitem-orders on the order key. The share is a conditional/total
    * ratio of exact decimal sums, divided once in double. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part").filter(col("p_type") === "PROMO")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val li = Tables.load(s, dir, "lineitem")
    val supp = Tables.load(s, dir, "supplier")
    val cust = Tables.load(s, dir, "customer")
    val n1 = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey"))
    val n2 = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
    val region = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val zero = lit("0").cast("decimal(18,2)")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(
        // integer 10^-4 units per row (discPriceUnits) with decimal
        // accumulators — bit-identical doubles, ~2x less agg-stage CPU
        sumUnits(when(col("supp_nation") === "NATION_1", discPriceUnits)
          .otherwise(lit(0L)), 4).as("nation_volume"),
        sumDiscPrice.as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .transform(Present.sorted("o_year"))
  }

  /** TPC-H Q15 shape: top supplier by quarter revenue. The revenue
    * aggregate is computed once in exact decimal; its max is a 1-row
    * broadcast joined back by exact equality (no ties lost to double
    * rounding), and the supplier dim broadcasts. */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    // revenue accumulates as exact integer 10^-4 units (discPriceUnits,
    // the q1/q8 posture — r21): max + the equality join-back compare
    // the unit sums, a bijection of the decimal revenues (rev_d =
    // rev_u · 10^-4), so the tie semantics are unchanged; the emitted
    // double scales the exact decimal once, bit-identical to the old
    // `CAST(decimal_sum AS DOUBLE)`.
    val rev = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(discPriceUnits.cast("decimal(18,0)")).cast("decimal(36,0)").as("rev_u"))
    val mx = rev.agg(max(col("rev_u")).as("mx"))
    rev.join(broadcast(mx), col("rev_u") === col("mx"))
      .join(broadcast(Tables.load(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_u") * lit(new java.math.BigDecimal(java.math.BigInteger.ONE, 4)))
          .cast("double").as("total_revenue"))
      .transform(Present.sorted("s_suppkey"))
  }

  /** Predicate pushdown + column pruning: both must reach the parquet scan. */
  def qFilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1999-01-01") &&
        col("l_shipdate") < lit("1999-02-01") && col("l_quantity") < 5)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Global top-N: planned as TakeOrderedAndProject, not a full sort. */
  def qTopN(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast("decimal(18,2)").cast("double").as("o_totalprice"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(20)

  /** distinct + countDistinct (expand + two-phase agg). */
  def qDistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .transform(Present.sorted("l_returnflag"))

  /** Window function: top-3 customers by acctbal per nation. */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.load(s, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"),
        col("c_acctbal").cast("decimal(18,2)").cast("double").as("c_acctbal"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= 3)
      .transform(Present.sorted("c_nationkey", "rk"))
  }

  /** Left-semi + left-anti joins, labeled and unioned. */
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders")
    val semi = cust.join(ord.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))
      .withColumn("has_orders", lit("yes"))
    val anti = cust.join(ord.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))
      .withColumn("has_orders", lit("no"))
    semi.unionByName(anti)
      .select("c_nationkey", "has_orders", "n_customers")
      .transform(Present.sorted("c_nationkey", "has_orders"))
  }

  /** Multi-level rollup aggregate — two-phase like [[qCube]]: base
    * aggregate first, rollup over the tiny base (sums of sums,
    * decimal-exact), so Expand never multiplies the fact stream. */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    groupedQtyBase(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(col("qty_d")).cast("double").as("sum_qty"),
        sum(col("base_rows")).as("n_rows"))
      .transform(Present.sortedBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")))

  /** Conditional (pivot-style) aggregation. */
  def qCaseAgg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
        sum(when(col("o_totalprice") > 200000, dec2("o_totalprice")).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("big_total"))
      .transform(Present.sorted("o_orderpriority"))

  /** Min-per-group + join-back (TPC-H Q2 shape): cheapest part(s) per
    * brand. The aggregate side is broadcast back against the fact. */
  def qMinJoinback(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
    val mins = part.groupBy(col("p_brand").as("mb"))
      .agg(min(dec2("p_retailprice")).as("min_price"))
    part.join(broadcast(mins),
        col("p_brand") === col("mb") &&
          dec2("p_retailprice") === col("min_price"))
      .select(col("p_brand"), col("p_partkey"),
        col("min_price").cast("double").as("min_price"))
      .transform(Present.sorted("p_brand", "p_partkey"))
  }

  /** Outer-join histogram (TPC-H Q13 shape): distribution of per-customer
    * order counts, including zero-order customers. */
  def qOuterHistogram(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders")
    cust.join(ord.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .transform(Present.sortedBy(desc("custdist"), desc("c_count")))
  }

  /** Conditional-aggregate ratio (TPC-H Q14 shape): PROMO revenue share. */
  def qPromoRatio(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-07-01"))
    val part = Tables.load(s, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        // integer 10^-4 units per row (the q8 posture): same doubles
        sumUnits(when(col("p_type") === "PROMO", discPriceUnits)
          .otherwise(lit(0L)), 4).as("promo_revenue"),
        sumDiscPrice.as("total_revenue"))
      .select(
        (col("promo_revenue") * 100.0 / col("total_revenue")).as("promo_pct"),
        col("promo_revenue"), col("total_revenue"))
  }

  /** Anti-join over a subquery (TPC-H Q16 NOT IN shape): brands counted
    * over parts never shipped in near-max quantity. */
  def qNotinBrands(s: SparkSession, dir: String): DataFrame = {
    val hot = Tables.load(s, dir, "lineitem")
      .filter(col("l_quantity") >= 49).select(col("l_partkey"))
    Tables.load(s, dir, "part")
      .join(hot.hint("shuffle_hash"), col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"))
      .transform(Present.sorted("p_brand"))
  }

  /** Large-volume orders (TPC-H Q18 shape): HAVING over a grouped join. */
  def qBigOrders(s: SparkSession, dir: String): DataFrame = {
    // integer-cents quantity units with a decimal accumulator (the q1
    // posture, r21): the HAVING compares exact integers (> 250 ⟺
    // > 25000 units) and the emitted double scales the exact decimal
    // once — bit-identical to the old CAST(decimal_sum AS DOUBLE)
    val big = Tables.load(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(cents("l_quantity").cast("decimal(18,0)")).cast("decimal(36,0)").as("qu"))
      .filter(col("qu") > 25000)
    Tables.load(s, dir, "orders")
      .join(big.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"),
        dec2("o_totalprice").cast("double").as("o_totalprice"),
        (col("qu") * lit(new java.math.BigDecimal(java.math.BigInteger.ONE, 2)))
          .cast("double").as("sum_qty"))
      .orderBy(desc("sum_qty"), asc("o_orderkey"))
  }

  /** Correlated scalar subquery (TPC-H Q17 shape): lineitems below 20% of
    * their part's average quantity. Decorrelated as a per-part aggregate
    * joined back; the threshold math (0.2 * sum/count in double) is
    * written identically in the oracle so the comparison is exact. */
  def qSmallQty(s: SparkSession, dir: String): DataFrame = {
    // integer-cents units with decimal accumulators (the q1 posture,
    // r21): sumUnits == CAST(exact_decimal_sum AS DOUBLE), so both the
    // avg_qty division operands and total_price are bit-identical
    val li = Tables.load(s, dir, "lineitem")
    val avgQty = li.groupBy(col("l_partkey").as("pk"))
      .agg((sumUnits(cents("l_quantity"), 2) / count(lit(1)).cast("double")).as("avg_qty"))
    li.join(avgQty, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.2)
      .agg(sumUnits(cents("l_extendedprice"), 2).as("total_price"),
        count(lit(1)).as("n_items"))
  }

  /** Correlated EXISTS (TPC-H Q4 shape): orders with at least one late
    * line (shipped >90 days after the order date), counted by priority. */
  def qLateOrders(s: SparkSession, dir: String): DataFrame = {
    // r21: "∃ line shipped > 90 days after the order date" ⟺ the
    // order's MAX ship date is — collapse lineitem to a per-order max
    // (map-side partial agg) before the only fact-fact exchange, so the
    // shuffle carries O(|orders|) rows instead of every line; the
    // non-equi lateness check runs post-join on the max, and the
    // aggregate's ≤1 row per key makes the semi ≡ inner (guide §2.2
    // map-side aggregation, §3.1 smallest sufficient join side).
    val lastShip = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("lk"))
      .agg(max(col("l_shipdate")).as("last_ship"))
    Tables.load(s, dir, "orders")
      .join(lastShip.hint("shuffle_hash"), col("o_orderkey") === col("lk"))
      .filter(col("last_ship") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .transform(Present.sorted("o_orderpriority"))
  }

  /** String expression pipeline: substring buckets, LIKE filters, case
    * transforms over part names. */
  def qStringOps(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .select(upper(substring(col("p_name"), 1, 2)).as("prefix"),
        when(col("p_name").like("%a%"), 1L).otherwise(0L).as("has_a"),
        length(regexp_replace(col("p_name"), "[aeiou]", "")).cast("bigint").as("consonant_len"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("has_a")).as("n_with_a"),
        sum(col("consonant_len")).as("total_consonants"))
      .transform(Present.sorted("prefix"))

  /** Sketch size for [[qApproxSketch]] (KMV distinct + bottom-k
    * quantile sample): rank/count error ~1/√k ≈ 3%. */
  val SketchK = 1024

  /** Sketch-key hashing: two independent vector hashes over
    * p = 2³¹ − 1 combined as h₁·p + h₂ — a 62-bit key in PURE exact
    * int64 arithmetic, codegen'd on the Spark side and spelled
    * identically in the oracle. The key is decomposed into its BASE-p
    * DIGITS (d₀ = x mod p, d₁ = ⌊x/p⌋ mod p, d₂ = ⌊x/p²⌋ ∈ {0,1,2} —
    * injective for EVERY non-negative int64, via exact integer
    * division, never a double), and each hᵢ is an independent linear
    * combination of the digits mod p. The first permutation spelling
    * hashed only x mod p, so keys differing by a multiple of p
    * collided with CERTAINTY — KMV estimates would saturate near p
    * and bottom-k samples bias once key cardinality passes ~2³¹
    * (ADVICE r18); with the digit vector, distinct keys give distinct
    * digit vectors and a collision needs both independent mod-p
    * combinations to vanish (~2⁻⁶² per pair, no deterministic
    * structure). Every intermediate stays under 2⁶² (a·d ≤ (p−1)²;
    * the four summands are each reduced below p before adding), so
    * both engines evaluate in exact int64. An EARLIER spelling hashed
    * with per-row md5 (hash60) and measured 4× slower at sf0.1
    * (0.49 → 1.93 s isolated) — the sketch inserts are cheap, the
    * cryptographic hash was the cost. */
  val SkP: Long = 2147483647L
  val SkA1: Long = 1 + graft.functions.localHash60("sketch_a_1") % (SkP - 1)
  val SkB1: Long = graft.functions.localHash60("sketch_b_1") % SkP
  val SkA2: Long = 1 + graft.functions.localHash60("sketch_a_2") % (SkP - 1)
  val SkB2: Long = graft.functions.localHash60("sketch_b_2") % SkP
  val SkA3: Long = 1 + graft.functions.localHash60("sketch_a_3") % (SkP - 1)
  val SkA4: Long = 1 + graft.functions.localHash60("sketch_a_4") % (SkP - 1)
  val SkA5: Long = 1 + graft.functions.localHash60("sketch_a_5") % (SkP - 1)
  val SkA6: Long = 1 + graft.functions.localHash60("sketch_a_6") % (SkP - 1)

  /** 62-bit digit-vector hash of a NON-NEGATIVE int64 key column —
    * one compiled expression node
    * ([[org.apache.spark.sql.graftexpr.PermHash62]]): the Catalyst
    * spelling of the same math built a ~28-node tree that the sketch
    * aggregates evaluate INTERPRETED per row (TypedImperativeAggregate
    * children inside ObjectHashAggregate), tripling q_approx_sketch's
    * cost — A/B-measured and re-kerneled r19. The coalesce makes the
    * hash provably NON-NULLABLE so a join on it never infers
    * IsNotNull(hash) — the inferred predicate pushes the kernel into
    * the parquet scan and evaluates it twice per row (the §4
    * pushdown-duplication class, caught by PlanShapeSpec on
    * smp_fixed_k; every call site hashes a non-null key, so the −1
    * branch is dead and the oracle twin needs no coalesce). */
  private[graft] def permHash62(x: Column): Column =
    coalesce(org.apache.spark.sql.graftexpr.SketchExpressions.permHash62Native(
      x.cast("long"), SkP, SkA1, SkA3, SkA5, SkB1, SkA2, SkA4, SkA6, SkB2),
      lit(-1L))

  /** [[permHash62]] in plain JVM longs — the driver/spec twin (the
    * identical digit decomposition and staged mod-p arithmetic). */
  private[graft] def permHash62L(x: Long): Long = {
    val d0 = x % SkP
    val d1 = (x / SkP) % SkP
    val d2 = x / (SkP * SkP)
    val h1 = ((SkA1 * d0) % SkP + (SkA3 * d1) % SkP +
      (SkA5 * d2) % SkP + SkB1) % SkP
    val h2 = ((SkA2 * d0) % SkP + (SkA4 * d1) % SkP +
      (SkA6 * d2) % SkP + SkB2) % SkP
    h1 * SkP + h2
  }

  /** The KMV estimate's hash-range numerator (k−1)·p² as an exact
    * plan-time double (shortest-round-trip replayed in the oracle). */
  val SkKmvNumerator: Double = (SketchK - 1).toDouble * SkP.toDouble * SkP.toDouble

  /** [[permHash62]] spelled for a DuckDB oracle, operand-for-operand
    * (`//` is DuckDB's exact integer division — same truncation as
    * Catalyst `div` on non-negative operands). */
  private[graft] def permHash62Sql(x: String): String = {
    val pp = SkP * SkP
    s"(((($SkA1 * (($x) % $SkP)) % $SkP + " +
      s"($SkA3 * ((($x) // $SkP) % $SkP)) % $SkP + " +
      s"($SkA5 * (($x) // $pp)) % $SkP + $SkB1) % $SkP) * $SkP + " +
      s"((($SkA2 * (($x) % $SkP)) % $SkP + " +
      s"($SkA4 * ((($x) // $SkP) % $SkP)) % $SkP + " +
      s"($SkA6 * (($x) // $pp)) % $SkP + $SkB2) % $SkP))"
  }

  /** Sketch aggregates, DETERMINISTIC AND ORACLE-GATED (VERDICT r17
    * #2): Spark's HLL/approx_percentile built-ins are engine-specific,
    * so this query's first spelling was the suite's one rows-only
    * exemption. These sketches keep the same mergeable-summary wire
    * shape (one ≤ k-entry buffer per group per partition, map-side
    * shrunk) but their state is the k SMALLEST elements of a set /
    * multiset — a commutative semilattice, so ANY partitioning and
    * merge order yields bit-identical results and DuckDB replays them
    * exactly (ORDER BY hash LIMIT k):
    *  - distinct parts: KMV over permHash62(l_partkey) — m < k ⇒
    *    exact m, else (k−1)·p²/h_k (Bar-Yossef et al. 2002);
    *  - median quantity: the bottom-k-by-row-hash uniform sample,
    *    rank-indexed (integer rank math, no interpolation).
    * ~1/√k error is spec-asserted against exact values
    * (RelationalSpec); the estimates themselves hash-match the oracle. */
  def qApproxSketch(s: SparkSession, dir: String): DataFrame = {
    val k = SketchK
    val partH = permHash62(col("l_partkey"))
    // (orderkey, linenumber) is the row identity; linenumber ∈ [1, 7]
    val rowH = permHash62(col("l_orderkey") * lit(8L) + col("l_linenumber"))
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        org.apache.spark.sql.graftexpr.SketchExpressions
          .kMinHash(partH, k).as("hs"),
        org.apache.spark.sql.graftexpr.SketchExpressions
          .kSmallestByHash(rowH, col("l_quantity"), k).as("vs"))
      .select(col("l_returnflag"),
        when(size(col("hs")) < k, size(col("hs")).cast("double"))
          .otherwise(lit(SkKmvNumerator) /
            element_at(col("hs"), k).cast("double")).as("approx_parts"),
        element_at(col("vs"),
          (floor(((size(col("vs")) - 1) * 50) / lit(100.0)) + 1).cast("int"))
          .as("approx_median_qty"))
      .transform(Present.sorted("l_returnflag"))
  }

  /** Sketch size for [[evValueSketch]]. */
  val EvSketchK = 512

  /** Deterministic quantile sketch over the event value stream, per
    * event type — the [[qApproxSketch]] quantile machinery as a
    * first-class events face: exact row counts + the bottom-k-by-hash
    * sample's rank-indexed p50/p90/p99. The sample membership depends
    * only on the input multiset (merge-order invariant), so the
    * estimates are oracle-gated, and the state is ≤ k (hash, value)
    * pairs per type per partition — at 100 TB the wire carries one
    * ~8 KB buffer per type per partition, never the value stream. */
  def evValueSketch(s: SparkSession, dir: String): DataFrame = {
    val k = EvSketchK
    def pick(p: Int): Column = element_at(col("vs"),
      (floor(((size(col("vs")) - 1) * p) / lit(100.0)) + 1).cast("int"))
    Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        org.apache.spark.sql.graftexpr.SketchExpressions
          .kSmallestByHash(permHash62(col("event_id")), col("value"), k).as("vs"))
      .select(col("event_type"), col("n_rows"),
        size(col("vs")).cast("bigint").as("m"),
        pick(50).as("est_p50"), pick(90).as("est_p90"), pick(99).as("est_p99"))
      .transform(Present.sorted("event_type"))
  }

  /** Exact median via the lower-middle-row definition (deterministic and
    * identical cross-engine, unlike interpolated percentile built-ins):
    * the value at position k = ceil(n/2) of each group ordered by value.
    *
    * Two-pass histogram form: groupBy (flag, quantity) counts (partial
    * aggs map-side), then a cumulative sum over the tiny per-flag
    * histogram (#distinct quantities rows, invariant of row count) finds
    * the bucket containing position k. No task ever sorts raw rows — the
    * windowed relation is the histogram, so the plan survives a 100x
    * scale-up where the old per-flag full sort of n/3 rows dies. */
  /** Per-flag quantity histogram with cumulative (`cum`) and total
    * (`n`) counts — the shared quantile scaffold of [[qMedian]] and
    * [[qPercentiles]]: O(distinct values) rows, both windows bounded
    * to the histogram, never the fact stream. */
  private def quantityHistogram(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("l_returnflag")))
  }

  def qMedian(s: SparkSession, dir: String): DataFrame = {
    quantityHistogram(s, dir)
      .withColumn("k", ceil(col("n") / lit(2.0)).cast("bigint"))
      .filter(col("cum") >= col("k") && col("cum") - col("cnt") < col("k"))
      .select(col("l_returnflag"), col("l_quantity").as("median_qty"), col("n").as("n_rows"))
      .transform(Present.sorted("l_returnflag"))
  }

  /** Per-nation customer revenue deciles — the segmentation pass behind
    * tiered marketing/capacity analytics: per-customer revenue totals
    * (decimal exact, one partial-agg pass over orders, shuffle-hash
    * joined to the customer dimension for the nation key), ntile(10)
    * within each nation over the deterministic (revenue desc, custkey)
    * order, then the per-(nation, decile) rollup. The window runs over
    * the CUSTOMER aggregate partitioned BY NATION (the qWindowRank
    * posture — never a single global partition, never raw orders);
    * ntile's SQL-standard floor-split replays identically in DuckDB
    * given the identical total order. */
  def qDecileRevenue(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.load(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(dec2("o_totalprice")).as("rev"))
      .hint("shuffle_hash")
      .join(Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("rev"), asc("o_custkey"))
    perCust
      .withColumn("decile", ntile(10).over(w).cast("bigint"))
      .groupBy("c_nationkey", "decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("rev")).cast("double").as("revenue"))
      .transform(Present.sorted("c_nationkey", "decile"))
  }

  /** Daily active users + per-user event density — the engagement
    * profile over the event stream: one (day, user) distinct pass
    * (partial-agg, O(day·user) rows shuffle), then the per-day rollup;
    * the density ratio divides two exact integers in the same order in
    * both engines. */
  /** Trailing-7-day active users per day (WAU) — the SLIDING-WINDOW
    * DISTINCT shape daily dashboards are built on, and the one a naive
    * `COUNT(DISTINCT) OVER (RANGE 6 PRECEDING)` cannot express in
    * Spark (distinct windows unsupported) and would single-partition
    * anyway. Posture: collapse to distinct (day, user) pairs first
    * (partial-agg, corpus -> activity-scale), expand each by the FIXED
    * 7-day horizon (×7, bounded), distinct again on (window-day, user),
    * count per day — every step a partial-aggregated shuffle on
    * day-spread keys, no window, no skew pivot. Emitted only for days
    * that exist in the data. */
  /** The distinct (day, user) activity relation [[evWau]] and
    * [[evStickiness]] both fan out from — persisted (r21): each face
    * referenced it 2–3× in one plan tree, and Spark re-ran the events
    * scan + distinct shuffle per reference (ev_wau's plan held 4
    * parquet scans, ev_stickiness's 6). One persisted instance serves
    * every branch of both faces; it is activity-scale (O(day·user)),
    * the same bound its downstream shuffles already carry
    * (guide §1.2 exchange-count / §5 reuse-don't-recompute). */
  private def dayUserRel(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .cachedPersist()

  def evWau(s: SparkSession, dir: String): DataFrame = {
    val du = dayUserRel(s, dir)
    val days = du.select(col("day").as("wday")).distinct()
    du
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"),
        col("user_id"))
      .distinct()
      .join(days.hint("shuffle_hash"), "wday")
      .groupBy("wday")
      .agg(count(lit(1)).as("wau"))
      .select(col("wday").as("day"), col("wau"))
      .transform(Present.sorted("day"))
  }

  /** Time-to-convert through the funnel (view → click → purchase, the
    * stage pairing of [[evFunnel]]): per converting user, the delay
    * between the FIRST view and the first subsequent click (and click →
    * purchase), summarized per stage as exact user counts and
    * percentile_disc delay quantiles. Delays are exact BIGINT
    * microseconds (unix_micros both engines), so the quantile scaffold
    * — per-stage delay histogram, cumulative window bounded to it,
    * conditional MIN per quantile — replays deterministically; the
    * stage relations are the same min-ts shuffle_hash chain as
    * ev_funnel (no fact broadcast, per-user partials). */
  def evFunnelTime(s: SparkSession, dir: String): DataFrame = {
    // the persisted stage chain shared with ev_funnel (see funnelViews)
    val c = funnelClicks(s, dir)
    val p = funnelPurchases(s, dir)
    val d1 = c.select(lit("view_to_click").as("stage"),
      (unix_micros(col("t_click")) - unix_micros(col("t_view"))).as("delay_us"))
    val d2 = p.select(lit("click_to_purchase").as("stage"),
      (unix_micros(col("t_buy")) - unix_micros(col("t_click"))).as("delay_us"))
    val hist = d1.unionByName(d2)
      .groupBy("stage", "delay_us").agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy("stage").orderBy("delay_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("stage")))
    def pick(q: Double) =
      min(when(col("cum") >= ceil(col("n") * lit(q)).cast("bigint"), col("delay_us")))
    h.groupBy("stage")
      .agg(max(col("n")).as("n_users"),
        pick(0.50).as("med_delay_us"), pick(0.90).as("p90_delay_us"))
      .transform(Present.sorted("stage"))
  }

  /** Stickiness (DAU / trailing-7-day AU per day) — the engagement
    * ratio product dashboards put next to WAU: both sides come from
    * the same distinct (day, user) activity relation ([[evWau]]'s
    * posture), the ratio is one exact integer division. The WAU side
    * reuses the fixed-horizon expansion; the join is day-keyed
    * shuffle_hash (both sides day-scale aggregates, no fact
    * broadcast). */
  def evStickiness(s: SparkSession, dir: String): DataFrame = {
    val du = dayUserRel(s, dir) // shared persisted activity relation
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
        col("user_id"))
      .distinct()
      .join(du.select("day").distinct().hint("shuffle_hash"), "day")
      .groupBy("day")
      .agg(count(lit(1)).as("wau"))
    dau.join(wau.hint("shuffle_hash"), "day")
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
      .transform(Present.sorted("day"))
  }

  def evActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    daily.groupBy("day")
      .agg(count(lit(1)).as("dau"), sum(col("c")).as("n_events"))
      .select(col("day"), col("dau"), col("n_events"),
        (col("n_events").cast("double") / col("dau").cast("double"))
          .as("events_per_user"))
      .transform(Present.sorted("day"))
  }

  /** Exact multi-quantile profile (p25/p50/p75 of quantity per return
    * flag) — [[qMedian]]'s histogram-cumulative technique generalized:
    * ONE value-histogram pass (O(distinct values) rows shuffle, never
    * the fact stream), one bounded window over the per-flag histogram,
    * and each quantile selects the first value whose cumulative count
    * reaches ceil(q·n) — percentile_disc semantics, exact and
    * order-stable in both engines (no interpolation, no doubles). */
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    // each quantile = MIN value whose cumulative count reaches ceil(q·n)
    // — three conditional aggregates over the one histogram, no joins
    def pick(q: Double) =
      min(when(col("cum") >= ceil(col("n") * lit(q)).cast("bigint"),
        col("l_quantity")))
    quantityHistogram(s, dir).groupBy("l_returnflag")
      .agg(pick(0.25).as("p25"), pick(0.50).as("p50"), pick(0.75).as("p75"))
      .transform(Present.sorted("l_returnflag"))
  }

  /** Exact per-event-type latency-style quantiles (p50/p95/p99 of
    * `value`) — the SLO statistic over the event stream, via the
    * [[qPercentiles]] histogram-cumulative scaffold applied to a
    * CONTINUOUS measure: one (type, value) partial-agg pass (the
    * shuffle carries O(distinct values) rows — collisions collapse
    * map-side; worst case it degenerates to the fact cardinality of
    * that type, the inherent cost of any EXACT quantile), one window
    * bounded to a single event type's value histogram, and each
    * quantile is a conditional MIN reaching ceil(q·n) —
    * percentile_disc semantics, so the result is an actual data value
    * and hashes identically cross-engine (no interpolation). */
  def evQuantiles(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.load(s, dir, "events")
      .where(col("value").isNotNull)
      .groupBy("event_type", "value")
      .agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("event_type")))
    def pick(q: Double) =
      min(when(col("cum") >= ceil(col("n") * lit(q)).cast("bigint"), col("value")))
    h.groupBy("event_type")
      .agg(pick(0.50).as("p50"), pick(0.95).as("p95"), pick(0.99).as("p99"))
      .transform(Present.sorted("event_type"))
  }

  /** Interpolated per-event-type latency quantiles — [[evQuantiles]]'s
    * LINEAR-INTERPOLATION twin (SQL `percentile_cont` / dask
    * `da.percentile` default semantics): same one-histogram-pass wire
    * posture, but each quantile needs the order statistics at 0-indexed
    * ranks floor(h) and ceil(h) for h = (n-1)·q — two conditional MINs
    * over the cumulative histogram — then interpolates
    * `lo·(1-d) + hi·d`, d = h - floor(h), replaying DuckDB
    * `quantile_cont`'s double operand order exactly (h is the same
    * double product; d is exact; fl(1-d) == fl(ceil(h)-h); the lo term
    * leads the add) so hashes replay bit-for-bit cross-engine. */
  def evQuantilesCont(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.load(s, dir, "events")
      .where(col("value").isNotNull)
      .groupBy("event_type", "value")
      .agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("event_type")))
    def hq(q: Double) = (col("n") - 1).cast("double") * lit(q)
    val qs = Seq(("p50", 0.50), ("p95", 0.95), ("p99", 0.99))
    val aggs = qs.zipWithIndex.flatMap { case ((_, q), i) =>
      Seq(
        min(when(col("cum") >= floor(hq(q)) + 1, col("value"))).as(s"_lo$i"),
        min(when(col("cum") >= ceil(hq(q)) + 1, col("value"))).as(s"_hi$i"),
        min(hq(q)).as(s"_h$i"))
    }
    h.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
      .select(col("event_type") +: qs.zipWithIndex.map { case ((nm, _), i) =>
        val hh = col(s"_h$i")
        val d = hh - floor(hh).cast("double")
        when(floor(hh) === ceil(hh), col(s"_lo$i"))
          .otherwise(col(s"_lo$i") * (lit(1.0) - d) + col(s"_hi$i") * d)
          .as(nm)
      }: _*)
      .transform(Present.sorted("event_type"))
  }

  /** Frequent event types through the native Misra-Gries sketch
    * ([[org.apache.spark.sql.graftexpr.MisraGries]], §2.I): each
    * partition folds to at most k-1 counters and the shuffle moves one
    * small sketch per partition — the bounded-state heavy-hitter pass
    * for a 100 TB stream, vs the exact GROUP BY whose state is
    * O(distinct). Here k = 8 exceeds the five event types, so the
    * sketch never evicts, counts are exact, and the DuckDB GROUP BY is
    * a legitimate oracle; the approximation bounds (lower-bound counts
    * within N/k, all above-threshold items kept) are spec-asserted on
    * synthetic skew with forced partition merges. */
  def evHeavyHitters(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .agg(org.apache.spark.sql.graftexpr.SketchExpressions
        .heavyHitters(col("event_type"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("event_type"), col("e.lower_bound").as("n_events"))
      .transform(Present.sortedBy(col("n_events").desc, col("event_type")))

  /** Frame window: 7-row moving average of daily order revenue
    * (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW).
    *
    * The naive form is `Window.orderBy("day")` with no partition — the
    * canonical single-partition scale trap. Instead the day series is
    * partitioned by year and each year's last 6 rows are replicated into
    * the next year's partition ("carry"), so every 7-row frame is fully
    * local to one partition; carry rows are dropped after the window.
    * Exact-equivalent to the global frame provided every year in the
    * data has >= 6 order days (holds for any TPC-H-shaped date range;
    * decimal addition is order-independent so the stitched sums are
    * bit-identical). */
  def qMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(dec2("o_totalprice")).as("rev_d"))
      .withColumn("y", year(col("day")))
    val tail6 = Window.partitionBy("y").orderBy(desc("day"))
    val carry = daily
      .withColumn("rn_tail", row_number().over(tail6))
      .filter(col("rn_tail") <= 6)
      .drop("rn_tail")
      .withColumn("y", col("y") + 1)
      .withColumn("is_carry", lit(true))
    val w = Window.partitionBy("y").orderBy("day").rowsBetween(-6, Window.currentRow)
    daily.withColumn("is_carry", lit(false)).unionByName(carry)
      .withColumn("ma7",
        sum(col("rev_d")).over(w).cast("double") / count(lit(1)).over(w).cast("double"))
      .filter(!col("is_carry"))
      .select(col("day"), col("rev_d").cast("double").as("daily_rev"), col("ma7"))
      .orderBy("day")
  }

  /** Exact-decimal (flag, status) base aggregate feeding [[qRollup]] /
    * [[qCube]]: ONE fact pass + one tiny shuffle to the 6-row grid. */
  private def groupedQtyBase(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(dec2("l_quantity")).as("qty_d"), count(lit(1)).as("base_rows"))

  /** CUBE aggregate over two dimensions — TWO-PHASE: Spark plans
    * `cube()` as Expand BELOW the partial aggregate, so the fact stream
    * is multiplied by the number of grouping sets (4x here) through the
    * map-side hash — at 100 TB that is three extra passes over the scan
    * for margins derivable from 6 rows. Aggregate to the (flag, status)
    * base first, then cube the BASE: identical results (sums of exact
    * decimal sums; counts sum), with Expand x4 over 6 rows instead of
    * the corpus. Plan-gated: the Expand's subtree must contain the base
    * aggregate (PlanShapeSpec). */
  def qCube(s: SparkSession, dir: String): DataFrame =
    groupedQtyBase(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(sum(col("qty_d")).cast("double").as("sum_qty"),
        sum(col("base_rows")).as("n_rows"))
      .transform(Present.sortedBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")))

  /** GROUPING SETS with NON-hierarchical margins — ((flag), (status)):
    * the member of the cube/rollup family neither of those can express
    * (rollup nests, cube takes every subset; grouping sets picks the
    * exact list). Same TWO-PHASE posture as [[qCube]]: aggregate to the
    * (flag, status) base first, then expand the 6-row BASE — Expand
    * never multiplies the fact stream. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    groupedQtyBase(s, dir)
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("qty_d")).cast("double").as("sum_qty"),
        sum(col("base_rows")).as("n_rows"))
      .transform(Present.sortedBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")))

  /** Set operations: INTERSECT / EXCEPT between big-order buyers and the
    * BUILDING segment. */
  def qSetops(s: SparkSession, dir: String): DataFrame = {
    val building = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    val bigBuyers = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("k"))
    val i = bigBuyers.intersect(building)
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
    val e = bigBuyers.except(building)
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
    i.unionByName(e).select("op", "n").transform(Present.sorted("op"))
  }

  /** Pivot (explicit value list keeps the plan one-pass). */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .transform(Present.sorted("o_orderpriority"))

  // ---- §2.C events / time-series ----

  /** Event-time tumbling window aggregation (batch form). */
  def evHourly(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2("value")).cast("double").as("total_value"))
      .orderBy("hour", "event_type")

  /** Gap-based sessionization (30 min) via lag + running sum of boundaries. */
  def evSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.load(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Per-type top-3 users by total value (window rank over aggregate). */
  def evTopUsers(s: SparkSession, dir: String): DataFrame = {
    val totals = Tables.load(s, dir, "events")
      .groupBy("event_type", "user_id")
      .agg(sum(dec2("value")).cast("double").as("total_value"))
    val w = Window.partitionBy("event_type")
      .orderBy(desc("total_value"), asc("user_id"))
    totals.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= 3)
      .transform(Present.sorted("event_type", "rk"))
  }

  /** As-of join: for every `error` event, the most recent `purchase` of
    * the same user at-or-before it. Spark lacks a native as-of join, so
    * this uses the scalable union + running-window trick: one shuffle on
    * (user, time), no range-join pair explosion. Purchases sort before
    * errors at equal timestamps to match ASOF `>=` semantics (the DuckDB
    * oracle uses its native ASOF LEFT JOIN). */
  /** Forward + nearest as-of lookups (pandas `merge_asof`
    * direction='forward'/'nearest', both with exact matches allowed) —
    * the two companions of [[evAsofJoin]]'s backward as-of, through the
    * same union-interleave trick: one shuffle on user_id carries BOTH
    * window passes (same partition key, two sort orders), the backward
    * running max and the forward running min of purchase timestamps.
    * At equal timestamps a purchase joins BOTH directions (exact
    * matches: it precedes the error in the backward order and follows
    * it in the forward order). `nearest` picks the closer side by
    * exact microsecond arithmetic (BIGINT — no interval comparison
    * crosses engines), ties to the backward side (the pandas rule).
    * Same per-user window-width posture as ev_asof_join (SURVEY §4). */
  def evAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val u = ev.filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("isp"))
    val wB = Window.partitionBy("user_id")
      .orderBy(asc("ts"), desc("isp"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("user_id")
      .orderBy(asc("ts"), asc("isp"), asc("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withW = u
      .withColumn("last_purchase_ts",
        max(when(col("isp") === 1, col("ts"))).over(wB))
      .withColumn("next_purchase_ts",
        min(when(col("isp") === 1, col("ts"))).over(wF))
    val tsU = unix_micros(col("ts"))
    val lU = unix_micros(col("last_purchase_ts"))
    val nU = unix_micros(col("next_purchase_ts"))
    withW.filter(col("isp") === 0)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_purchase_ts"), col("next_purchase_ts"),
        when(col("last_purchase_ts").isNull, col("next_purchase_ts"))
          .when(col("next_purchase_ts").isNull, col("last_purchase_ts"))
          .when(tsU - lU <= nU - tsU, col("last_purchase_ts"))
          .otherwise(col("next_purchase_ts")).as("nearest_purchase_ts"))
      .orderBy("event_id")
  }

  /** pandas `merge_asof(tolerance=)` — the staleness-bounded backward
    * as-of, completing merge_asof's parameter surface next to
    * [[evAsofJoin]] (backward) and [[evAsofNearest]] (forward/nearest):
    * the feature-serving rule that context older than the tolerance is
    * no context. Identical one-shuffle union-interleave machinery; the
    * cut is decided on exact microsecond BIGINTs (the ev_asof_nearest
    * discipline — no interval comparison crosses engines), emitting the
    * tolerance-filtered match plus the raw staleness for observability.
    * Same per-user window-width posture as ev_asof_join (SURVEY §4). */
  val AsofTolUs: Long = 24L * 3600L * 1000000L // 24 hours

  def evAsofTol(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("isp"), col("event_id"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), lit(0).as("isp"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts"), desc("isp"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stale = unix_micros(col("ts")) - unix_micros(col("lp"))
    purch.unionByName(err)
      .withColumn("lp", max(when(col("isp") === 1, col("ts"))).over(w))
      .filter(col("isp") === 0)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(stale <= AsofTolUs, col("lp")).as("last_purchase_ts"),
        when(col("lp").isNotNull, stale).as("staleness_us"))
      .orderBy("event_id")
  }

  def evAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("isp"), col("event_id"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), lit(0).as("isp"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts"), desc("isp"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purch.unionByName(err)
      .withColumn("last_purchase_ts", max(when(col("isp") === 1, col("ts"))).over(w))
      .filter(col("isp") === 0)
      .select(col("event_id"), col("user_id"), col("ts"), col("last_purchase_ts"))
      .orderBy("event_id")
  }

  /** Per-type top-3 users via graft's native bounded-heap TopKPerKey
    * operator (custom LogicalPlan + Strategy + SparkPlan; SURVEY §2.I) —
    * O(n log k) per partition, no per-group sort, vs the window
    * row_number form in [[evTopUsers]]. */
  def evTopUsersNative(s: SparkSession, dir: String): DataFrame = {
    val totals = Tables.load(s, dir, "events")
      .groupBy("event_type", "user_id")
      .agg(sum(dec2("value")).cast("double").as("total_value"))
    org.apache.spark.sql.graftexpr.TopKPerKey
      .perKey(totals, Seq("event_type"), Seq(("total_value", false), ("user_id", true)), 3)
      .transform(Present.sortedBy(asc("event_type"), desc("total_value"), asc("user_id")))
  }

  /** Per-user activity anomalies: hours where a user's event count sits
    * more than 2 population standard deviations above their own mean
    * hourly rate (over their active hours) — the burst-detection pass a
    * behavioral pipeline runs for abuse/alerting. The hourly counts are
    * one partial-agg pass; the per-user moments are unordered window
    * aggregates over the HOURLY relation (partition width = one user's
    * active hours, never raw events), so nothing re-shuffles the event
    * stream and no per-user collection happens. All moments are exact
    * integers; the single z-score expression replays the identical
    * double operand order in the oracle, so the >2 cut is bit-stable
    * cross-engine (an all-constant user has sd = 0 and is excluded by
    * the guarding CASE in both engines). */
  def evAnomaly(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val n = col("n_hours").cast("double")
    val sc = col("sc").cast("double")
    val scc = col("scc").cast("double")
    // an all-constant user has sd = 0 (and every hour at the mean):
    // the CASE keeps ANSI division happy and the oracle mirrors it
    val z = when(col("sd") > 0.0, (col("c").cast("double") - sc / n) / col("sd"))
    Tables.load(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n_hours", count(lit(1)).over(byUser))
      .withColumn("sc", sum(col("c")).over(byUser))
      .withColumn("scc", sum(col("c") * col("c")).over(byUser))
      .withColumn("sd", sqrt((scc - sc * sc / n) / n))
      .withColumn("z", z)
      .filter(col("z") > 2.0)
      .select(col("user_id"), col("hour"), col("c").as("n_events"), col("z"))
      .orderBy("user_id", "hour")
  }

  /** Pearson correlation between quantity and discount per return flag
    * — the column-statistics pass an optimizer or data-profiling
    * pipeline runs over a fact table. All five moments fold as exact
    * decimals in ONE partial-agg pass (2-dec payloads, 4-dec-exact
    * products — the arr_var recipe on a second column pair); the
    * single corr expression runs double math once over the exact
    * operands, replayed in the oracle operand-for-operand, with a
    * guarding CASE for degenerate zero-variance groups (ANSI-safe).
    * The column PAIR matters: qty x discount moments keep every sum's
    * unscaled value below 2^53, so the decimal->double casts are exact
    * in both engines — sum(price²) overflows that bound and DuckDB's
    * decimal->double conversion double-rounds 1 ulp off Java's. */
  def qCorr(s: SparkSession, dir: String): DataFrame = {
    val n = col("n").cast("double")
    val sx = col("sx")
    val sy = col("sy")
    // greatest(·, 0) clamps the ulp-negative a degenerate zero-variance
    // group can round to: Spark's sqrt(-x) is NaN but DuckDB's hard-
    // errors, so the clamp (not the den CASE) is what keeps the oracle
    // alive on such data — both engines compute the sqrt unconditionally
    val den = sqrt(greatest(n * col("sxx") - sx * sx, lit(0.0))) *
      sqrt(greatest(n * col("syy") - sy * sy, lit(0.0)))
    // Moments in exact integer cents per row ([[cents]] — the decimal
    // q*q / q*p products were the scan stage's dominant per-row cost),
    // decimal accumulators + exact-decimal double emission ([[sumUnits]]):
    // every emitted double is bit-identical to the decimal spelling's.
    Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"),
        cents("l_quantity").as("qc"), cents("l_discount").as("dc"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sumUnits(col("qc"), 2).as("sx"), sumUnits(col("dc"), 2).as("sy"),
        sumUnits(col("qc") * col("qc"), 4).as("sxx"),
        sumUnits(col("dc") * col("dc"), 4).as("syy"),
        sumUnits(col("qc") * col("dc"), 4).as("sxy"))
      .withColumn("den", den)
      .select(col("l_returnflag"), col("n"),
        when(col("den") > 0.0,
          (n * col("sxy") - sx * sy) / col("den"))
          .as("corr_qty_disc"))
      .transform(Present.sorted("l_returnflag"))
  }

  /** Per-user event-type transition matrix (first-order Markov counts)
    * — the behavioral-model fitting pass over the event stream: each
    * user's time-ordered lag pairs, counted per (from, to). One window
    * partitioned by user (width = one user's events, never the stream),
    * then an O(|types|²)-row partial aggregate; the (ts, event_id)
    * ordering tie-break replays identically in the oracle. */
  def evMarkov(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.load(s, dir, "events")
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .transform(Present.sorted("from_type", "to_type"))
  }

  /** Conversion funnel (view -> later click -> later purchase), the
    * classic product-analytics shape: each stage is a per-user MIN
    * aggregate conditioned on the previous stage's first timestamp, so
    * the chain is three partial-agg passes joined on user_id — shuffle
    * hash joins on the user key (both sides are user-cardinality,
    * fact-derived: never broadcast), no window over raw events, no
    * per-user event collection. */
  /** The three per-user funnel stage relations (first view → first
    * later click → first later purchase) — persisted and SHARED by
    * [[evFunnel]] (stage counts) and [[evFunnelTime]] (stage delays):
    * each query referenced the chain 3× in one plan tree with no
    * exchange reuse (ev_funnel's plan held 6 events scans,
    * ev_funnel_time's 5), so the events stream was re-scanned per
    * reference. One persisted user-scale instance per stage serves
    * every consumer of both faces; the carried t_view/t_click columns
    * are exactly what ev_funnel_time's delay histograms already
    * aggregated (guide §5 reuse-don't-recompute). */
  private def funnelViews(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      .cachedPersist()

  private def funnelClicks(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").filter(col("event_type") === "click")
      .join(funnelViews(s, dir).hint("shuffle_hash"), "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id")
      .agg(min(col("ts")).as("t_click"), min(col("t_view")).as("t_view"))
      .cachedPersist()

  private def funnelPurchases(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").filter(col("event_type") === "purchase")
      .join(funnelClicks(s, dir).hint("shuffle_hash"), "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id")
      .agg(min(col("ts")).as("t_buy"), min(col("t_click")).as("t_click"))
      .cachedPersist()

  def evFunnel(s: SparkSession, dir: String): DataFrame =
    funnelViews(s, dir).agg(count(lit(1)).as("n_view"))
      .crossJoin(funnelClicks(s, dir).agg(count(lit(1)).as("n_click_after")))
      .crossJoin(funnelPurchases(s, dir).agg(count(lit(1)).as("n_purchase_after")))

  /** Day-7 cohort retention: users active on day d who are also active
    * on day d+7. One distinct (user, day) pass, then a self-join keyed
    * on (user, day) — both shuffle hash joins on composite keys, output
    * one row per cohort day. */
  def evRetention(s: SparkSession, dir: String): DataFrame = {
    // persisted (r21): `days` feeds both join sides and each re-ran the
    // events scan + distinct shuffle (guide §5 reuse-don't-recompute).
    // date_trunc keeps TIMESTAMP type (vs dayUserRel's to_date), so
    // this face keeps its own activity-scale relation.
    val days = Tables.load(s, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
      .cachedPersist()
    val later = days.select(col("user_id").as("uid2"),
      (col("day") - expr("INTERVAL 7 DAYS")).as("cohort_day"))
    days.join(later.hint("shuffle_hash"),
        col("user_id") === col("uid2") && col("day") === col("cohort_day"),
        "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        count(col("cohort_day")).as("n_retained7"))
      .transform(Present.sorted("day"))
  }

  /** JSON property extraction + aggregation. */
  def evJson(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("k")).as("max_k"))
      .transform(Present.sorted("k_bucket"))

  /** Per-user session DURATION profile — [[evSessionize]]'s counts with
    * the metric product analytics actually reads off sessions (how long
    * does a user stay): the same 30-min gap machinery assigns session
    * ids, events collapse to one row per (user, session) carrying exact
    * BIGINT-microsecond span + event count, and the per-user summary
    * (median/max duration) runs over the SESSION relation — windows are
    * partitioned per user with width = that user's session count, never
    * raw events. Median is percentile_disc semantics (conditional MIN at
    * ceil(n/2) — an actual data value, exact cross-engine). */
  def evSessionStats(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = Tables.load(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"),
        count(lit(1)).as("n_ev"))
    // percentile_disc scaffold over the per-user session durations
    val w = Window.partitionBy("user_id").orderBy("dur_us", "session_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions
      .withColumn("cum", count(lit(1)).over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
      .groupBy("user_id")
      .agg(max(col("n")).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        min(when(col("cum") >= ceil(col("n") / lit(2.0)).cast("bigint"),
          col("dur_us"))).as("med_dur_us"),
        max(col("dur_us")).as("max_dur_us"))
      .orderBy("user_id")
  }

  /** Inter-arrival gap profile per event type (the traffic-shape
    * statistic next to the SLO quantiles): consecutive same-user
    * same-type gaps in exact BIGINT microseconds (one window per
    * (user, type) — width = one user's events of that type), then the
    * [[evQuantiles]] histogram-cumulative scaffold per type: the gap
    * histogram shuffles O(distinct gap values), each quantile a
    * conditional MIN at ceil(q·n) — percentile_disc semantics, exact
    * cross-engine, no doubles anywhere. */
  def evGapStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val gaps = Tables.load(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .select(col("event_type"),
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"))
    val hist = gaps.groupBy("event_type", "gap_us").agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy("event_type").orderBy("gap_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("event_type")))
    def pick(q: Double) =
      min(when(col("cum") >= ceil(col("n") * lit(q)).cast("bigint"), col("gap_us")))
    h.groupBy("event_type")
      .agg(max(col("n")).as("n_gaps"),
        pick(0.50).as("med_gap_us"), pick(0.90).as("p90_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .transform(Present.sorted("event_type"))
  }

  /** The remaining SQL window-function surface in one face —
    * percent_rank / cume_dist / first_value / nth_value (row_number,
    * ntile, lag/lead and rank already ship in other queries): per
    * nation the top-3 customers by balance annotated with their
    * distribution position and the partition's first/2nd values. The
    * window is per nation (bounded partition); ranks and the two
    * ratios are exact integers / integer-ratio doubles. */
  def qWindowFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("bal"), asc("c_custkey"))
    Tables.load(s, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"),
        dec2("c_acctbal").as("bal"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("top_bal",
        first(col("bal")).over(w).cast("double"))
      .withColumn("second_bal",
        nth_value(col("bal"), 2).over(w).cast("double"))
      .filter(col("rk") <= 3)
      .select(col("c_nationkey"), col("c_custkey"), col("rk"),
        col("bal").cast("double").as("bal"),
        col("pct_rank"), col("cume"), col("top_bal"), col("second_bal"))
      .transform(Present.sorted("c_nationkey", "rk"))
  }

  /** User-set overlap between event types (the audience-overlap matrix
    * product analytics draws as a Venn/chord diagram): per unordered
    * type pair the common-user count and exact Jaccard. Distinct
    * (type, user) activity first (corpus → activity scale), then a
    * self-join keyed on user_id — shuffle hash on the user key, output
    * O(|types|²). */
  def evTypeOverlap(s: SparkSession, dir: String): DataFrame = {
    // persisted (r21): tu fed three branches (sizes + both self-join
    // sides) and each re-ran the events scan + distinct (8 parquet
    // scans in the plan); one activity-scale persisted instance serves
    // all three (guide §5 reuse-don't-recompute)
    val tu = Tables.load(s, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .cachedPersist()
    val sizes = tu.groupBy("event_type").agg(count(lit(1)).as("n"))
    val pairs = tu.select(col("event_type").as("type_a"), col("user_id"))
      .join(tu.select(col("event_type").as("type_b"), col("user_id"))
        .hint("shuffle_hash"), "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("event_type").as("type_a"), col("n").as("n_a"))
        .hint("shuffle_hash"), "type_a")
      .join(sizes.select(col("event_type").as("type_b"), col("n").as("n_b"))
        .hint("shuffle_hash"), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .transform(Present.sorted("type_a", "type_b"))
  }

  /** Gini coefficient of per-user activity (the concentration statistic
    * growth teams track — "do 1% of users generate 90% of events?"):
    * Lorenz math WITHOUT a corpus-wide rank — user counts collapse to a
    * count HISTOGRAM first (O(distinct counts) rows), and the rank-sum
    * 2·Σᵢ i·xᵢ over ascending counts reduces per histogram bucket to
    * c·(2·S_prev·m + m(m+1)) exactly (ties contribute a closed form, so
    * the arbitrary within-tie order never matters); one bounded
    * cumulative window over the histogram, exact DECIMAL(38,0) products
    * (widened before each multiply — see the fold comment), ONE double
    * division at the end. G = (2T − (n+1)·S) / (n·S). */
  def evGini(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(s, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("c"))
    val hist = counts.groupBy("c").agg(count(lit(1)).as("m"))
    val w = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = hist
      .withColumn("cum_m", sum(col("m")).over(w))
      .withColumn("sprev", col("cum_m") - col("m"))
    h.agg(
        sum(col("m")).as("n_users"),
        sum(col("c") * col("m")).as("total_events"),
        // the fold accumulates 2T directly (gini only ever uses 2·T, so
        // folding the 2 in kills the /2 and keeps everything integral);
        // every multiply runs in DECIMAL(38,0) — operands widened BEFORE
        // the product, not just the fold: sprev·m alone passes 2⁶³ at
        // ~3e9 users, so a BIGINT per-row term would fail loudly under
        // ANSI long before the decimal sum helped. The oracle widens the
        // same operands to HUGEINT (128-bit exact).
        sum(col("c").cast("decimal(38,0)")
          * (col("sprev").cast("decimal(38,0)") * col("m") * 2
            + col("m").cast("decimal(38,0)") * (col("m") + 1))).as("t2"))
      .select(col("n_users"), col("total_events"),
        ((col("t2").cast("double")
          - (col("n_users") + 1).cast("double") * col("total_events").cast("double"))
          / (col("n_users").cast("double") * col("total_events").cast("double")))
          .as("gini"))
  }

  /** Lag-1 autocorrelation of the daily event-value total (the
    * persistence statistic next to [[evAnomaly]] — does yesterday
    * predict today?): daily totals are exact decimal aggregates
    * (bounded at #days rows), consecutive pairs come from one lead
    * window over the DAILY relation, and the Pearson formula runs on
    * exact decimal moments cast to double in the [[qCorr]] operand
    * order. One row out. */
  def evAutocorr(s: SparkSession, dir: String): DataFrame = {
    // totals re-narrow to DECIMAL(18,2) (they fit by construction) so the
    // moment products stay inside both engines' 38-digit decimal width
    val daily = Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(dec2("value")).cast("decimal(18,2)").as("x"))
    val w = Window.orderBy("day")
    val pairs = daily
      .withColumn("y", lead(col("x"), 1).over(w))
      .filter(col("y").isNotNull)
    val m = pairs.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val num = n * col("sxy").cast("double") - sx * sy
    val den = sqrt(greatest(n * col("sxx").cast("double") - sx * sx, lit(0.0))) *
      sqrt(greatest(n * col("syy").cast("double") - sy * sy, lit(0.0)))
    m.select(col("n").as("n_pairs"),
      when(den > 0.0, num / den).as("autocorr_lag1"))
  }

  /** RFM segmentation (recency / frequency / monetary — the classic
    * customer-value grid direct-marketing analytics runs on every
    * event log): per user days-since-last-activity against the
    * global-max-date horizon (a 1-row aggregate), event count and
    * exact total cents; each axis splits at its corpus MEDIAN —
    * exact percentile_disc order statistics through the
    * [[evQuantiles]] histogram-cumulative scaffold (O(distinct values)
    * per axis, scale-invariant where absolute thresholds are not) —
    * so the ≤8-cell segment label is deterministic CASE logic against
    * three 1-row median relations. One user-keyed partial-agg pass,
    * per-segment rollup. */
  def evRfm(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val horizon = ev.agg(max(to_date(col("ts"))).as("h_day"))
    // persisted (r21): perUser feeds FOUR branches (three medOf
    // histograms + the final segment rollup) and each re-ran the
    // events scan + user agg + horizon agg — 16 parquet scans in one
    // plan. One persisted user-scale instance serves all four; the
    // events stream is read twice total (agg + horizon), not eight
    // times (guide §5 reuse-don't-recompute).
    val perUser = ev.groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum((dec2("value") * 100).cast("bigint")).as("cents"))
      .crossJoin(horizon)
      .select(col("user_id"),
        datediff(col("h_day"), col("last_day")).cast("bigint").as("rec"),
        col("freq"), col("cents"))
      .cachedPersist()
    // exact median of one measure: conditional MIN at ceil(n/2) over
    // the measure's value histogram (percentile_disc semantics)
    def medOf(c: String): DataFrame = {
      val hist = perUser.groupBy(c).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(c)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
        .agg(min(when(col("cum") >= ceil(col("n") / lit(2.0)).cast("bigint"),
          col(c))).as(s"med_$c"))
    }
    val seg = concat(
      when(col("rec") <= col("med_rec"), lit("R")).otherwise(lit("r")),
      when(col("freq") > col("med_freq"), lit("F")).otherwise(lit("f")),
      when(col("cents") > col("med_cents"), lit("M")).otherwise(lit("m")))
    perUser
      .crossJoin(medOf("rec")).crossJoin(medOf("freq")).crossJoin(medOf("cents"))
      .select(seg.as("segment"), col("rec"), col("freq"), col("cents"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_users"),
        max(col("rec")).as("max_recency"),
        sum(col("freq")).as("total_events"),
        sum(col("cents")).as("total_cents"))
      .transform(Present.sorted("segment"))
  }

  /** Log₂ value histogram per event type (the money-scale distribution
    * dashboard — "are purchases $1 or $1000"): value in exact CENTS,
    * bucket = floor(log₂ cents) computed as `length(bin(n)) − 1` — the
    * exact integer bit length, no floating-point boundary hazard at
    * powers of two (the mm_bytes_hist idiom); one (type, bucket)
    * partial-agg pass, exact decimal sums per bucket. */
  def evValueHist(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .where(col("value").isNotNull)
      .select(col("event_type"),
        (dec2("value") * 100).cast("bigint").as("cents"))
      .where(col("cents") > 0)
      .groupBy(col("event_type"),
        (length(bin(col("cents"))) - 1).cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"),
        sum(col("cents")).as("total_cents"))
      .transform(Present.sorted("event_type", "bucket"))

  /** FULL OUTER join surface — order activity vs shipping activity by
    * day (the reconciliation query that finds days with orders but no
    * shipments and vice versa): two day-keyed partial aggregates meet
    * in a full outer shuffle-hash join; null sides report zero with an
    * explicit presence flag. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val shp = Tables.load(s, dir, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(count(lit(1)).as("n_shipments"))
    ord.join(shp.hint("shuffle_hash"), Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_shipments"), lit(0L)).as("n_shipments"),
        (col("n_orders").isNotNull && col("n_shipments").isNotNull)
          .as("both_active"))
      .orderBy("day")
  }

  /** 7-tap truncated EWMA of the daily value total (exponential
    * smoothing, the forecasting primitive next to [[qMovingAvg]]'s flat
    * window): weights α(1−α)^k at α = ½ are EXACT binary fractions, so
    * the weighted numerator/normalizer are deterministic doubles in one
    * fixed k-ascending operand order (missing leading lags renormalize
    * — the standard adjusted-EWMA start); one lag chain over the
    * bounded daily relation. */
  def evEwma(s: SparkSession, dir: String): DataFrame = {
    val wts = (0 to 6).map(k => 0.5 * math.pow(0.5, k))
    val daily = Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(dec2("value")).cast("decimal(18,2)").as("x"))
    val w = Window.orderBy("day")
    val lags = (0 to 6).map {
      case 0 => col("x")
      case k => lag(col("x"), k).over(w)
    }
    val num = lags.zip(wts).map { case (c, wk) =>
      when(c.isNotNull, lit(wk) * c.cast("double")).otherwise(lit(0.0))
    }.reduce(_ + _)
    val den = lags.zip(wts).map { case (c, wk) =>
      when(c.isNotNull, lit(wk)).otherwise(lit(0.0))
    }.reduce(_ + _)
    daily
      .select(col("day"), col("x").cast("double").as("daily_total"),
        (num / den).as("ewma7"))
      .transform(Present.sorted("day"))
  }

  /** CUSUM change-point scan over the daily value total (Page 1954 —
    * the level-shift detector run after [[evAutocorr]] says the series
    * is persistent): the classic statistic Σ_{i≤d}(xᵢ − mean) rescaled
    * by n so it stays EXACT decimal — n·P_d − d·S (P the decimal prefix
    * sum, S the total) — divided back once per row; peak |cusum| marks
    * the change day. Windows run over the bounded DAILY relation, the
    * prefix sum in exact decimal (immune to windowed-double association
    * differences across engines). */
  def evCusum(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(dec2("value")).cast("decimal(18,2)").as("x"))
    val byDay = Window.orderBy("day")
    val cum = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("d", row_number().over(byDay).cast("bigint"))
      .withColumn("p", sum(col("x")).over(cum))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("stot", sum(col("x")).over(Window.partitionBy()))
      .select(col("day"), col("x").cast("double").as("daily_total"),
        (col("n") * col("p") - col("d") * col("stot")).cast("double")
          .as("cusum_scaled"),
        ((col("n") * col("p") - col("d") * col("stot")).cast("double")
          / col("n").cast("double")).as("cusum"))
      .transform(Present.sorted("day"))
  }

  /** User lifetime histogram (retention's long-tail summary): per user
    * the first→last activity span in days and the distinct active-day
    * count, rolled up to (lifetime_days → user count, active-day mass)
    * — O(observation window) output rows, exact integers only. */
  def evLifetime(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.load(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .groupBy("user_id")
      .agg((datediff(max(col("day")), min(col("day"))) + 1).cast("bigint")
        .as("lifetime_days"),
        count(lit(1)).as("active_days"))
    perUser.groupBy("lifetime_days")
      .agg(count(lit(1)).as("n_users"),
        sum(col("active_days")).as("total_active_days"))
      .transform(Present.sorted("lifetime_days"))
  }

  /** Weekly cohort retention MATRIX — [[evRetention]]'s single-offset
    * check generalized to the full (cohort week × week offset) grid the
    * growth dashboard draws: collapse to distinct (user, week) activity
    * first (corpus → activity scale), derive each user's cohort week as
    * a MIN aggregate over that relation, join activity back on user_id
    * (shuffle hash — both sides user-cardinality, fact-derived, never
    * broadcast), count distinct-by-construction actives per (cohort,
    * offset). Integers only; output O(weeks²). */
  def evCohortMatrix(s: SparkSession, dir: String): DataFrame = {
    // persisted (r21): `weeks` feeds the cohort aggregate AND the join
    // probe; unpersisted, each reference re-ran the events scan +
    // distinct shuffle (guide §5 reuse-don't-recompute)
    val weeks = Tables.load(s, dir, "events")
      .select(col("user_id"),
        floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7).as("week"))
      .distinct()
      .cachedPersist()
    val cohorts = weeks.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    weeks.join(cohorts.hint("shuffle_hash"), "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .transform(Present.sorted("cohort_week", "week_offset"))
  }
}
