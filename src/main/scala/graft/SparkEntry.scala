package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ArrayQueries, Dedup, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relationalQueries ++ ArrayQueries.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ graft.multimodal.Media.queries ++
      operators.Pipeline.queries

  private def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.B relational
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_region_volume" -> (Relational.q5RegionVolume _),
    "q7_nation_volume" -> (Relational.q7NationVolume _),
    "q10_returned_items" -> (Relational.q10ReturnedItems _),
    "q19_disjunctive" -> (Relational.q19Disjunctive _),
    "q4_order_priority" -> (Relational.q4OrderPriority _),
    "q13_custdist" -> (Relational.q13CustDist _),
    "q22_global_sales" -> (Relational.q22GlobalSales _),
    "q21_sole_late" -> (Relational.q21SoleLate _),
    "q20_heavy_parts" -> (Relational.q20HeavyParts _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q8_market_share" -> (Relational.q8MarketShare _),
    "q15_top_supplier" -> (Relational.q15TopSupplier _),
    "q_filter_project" -> (Relational.qFilterProject _),
    "q_topn" -> (Relational.qTopN _),
    "q_distinct_agg" -> (Relational.qDistinctAgg _),
    "q_window_rank" -> (Relational.qWindowRank _),
    "q_semi_anti" -> (Relational.qSemiAnti _),
    "q_rollup" -> (Relational.qRollup _),
    "q_caseagg" -> (Relational.qCaseAgg _),
    "q_min_joinback" -> (Relational.qMinJoinback _),
    "q_outer_histogram" -> (Relational.qOuterHistogram _),
    "q_promo_ratio" -> (Relational.qPromoRatio _),
    "q_notin_brands" -> (Relational.qNotinBrands _),
    "q_big_orders" -> (Relational.qBigOrders _),
    "q_moving_avg" -> (Relational.qMovingAvg _),
    "q_small_qty" -> (Relational.qSmallQty _),
    "q_late_orders" -> (Relational.qLateOrders _),
    "q_string_ops" -> (Relational.qStringOps _),
    "q_approx_sketch" -> (Relational.qApproxSketch _),
    "ev_value_sketch" -> (Relational.evValueSketch _),
    "q_median" -> (Relational.qMedian _),
    "q_cube" -> (Relational.qCube _),
    "q_setops" -> (Relational.qSetops _),
    "q_pivot" -> (Relational.qPivot _),
    // §2.C events
    "ev_hourly" -> (Relational.evHourly _),
    "ev_funnel" -> (Relational.evFunnel _),
    "ev_retention" -> (Relational.evRetention _),
    "ev_sessionize" -> (Relational.evSessionize _),
    "ev_top_users" -> (Relational.evTopUsers _),
    "ev_json" -> (Relational.evJson _),
    "ev_asof_join" -> (Relational.evAsofJoin _),
    "ev_asof_nearest" -> (Relational.evAsofNearest _),
    "ev_asof_tol" -> (Relational.evAsofTol _),
    "ev_top_users_native" -> (Relational.evTopUsersNative _),
    "ev_anomaly" -> (Relational.evAnomaly _),
    "ev_markov" -> (Relational.evMarkov _),
    "q_corr" -> (Relational.qCorr _),
    "q_grouping_sets" -> (Relational.qGroupingSets _),
    "q_percentiles" -> (Relational.qPercentiles _),
    "q_decile_revenue" -> (Relational.qDecileRevenue _),
    "ev_active_users" -> (Relational.evActiveUsers _),
    "ev_wau" -> (Relational.evWau _),
    "ev_stickiness" -> (Relational.evStickiness _),
    "ev_funnel_time" -> (Relational.evFunnelTime _),
    "ev_quantiles" -> (Relational.evQuantiles _),
    "ev_quantiles_cont" -> (Relational.evQuantilesCont _),
    "ev_heavy_hitters" -> (Relational.evHeavyHitters _),
    "ev_session_stats" -> (Relational.evSessionStats _),
    "ev_gap_stats" -> (Relational.evGapStats _),
    "ev_cohort_matrix" -> (Relational.evCohortMatrix _),
    "ev_gini" -> (Relational.evGini _),
    "ev_autocorr" -> (Relational.evAutocorr _),
    "ev_lifetime" -> (Relational.evLifetime _),
    "ev_cusum" -> (Relational.evCusum _),
    "q_window_funcs" -> (Relational.qWindowFuncs _),
    "ev_type_overlap" -> (Relational.evTypeOverlap _),
    "ev_ewma" -> (Relational.evEwma _),
    "ev_value_hist" -> (Relational.evValueHist _),
    "q_full_outer" -> (Relational.qFullOuter _),
    "ev_rfm" -> (Relational.evRfm _),
  )

  private val DISC = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  /** The sketch 62-bit permutation hash, spelled operand-for-operand
    * with [[operators.Relational.permHash62]] (pure exact int64). */
  private def skHashSql(x: String): String =
    operators.Relational.permHash62Sql(x)

  /** DuckDB oracle SQL, column-aliased identically to the Spark results.
    * A `def` evaluated AFTER Verify runs the queries: sim_ivf_trained's
    * entry embeds the centroids the query just trained (the fit is
    * deterministic; only its trained VALUES cross engines). */
  def oracleSql: Map[String, String] =
    relationalOracles ++ ArrayQueries.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ graft.multimodal.Media.oracles ++
      operators.Pipeline.oracles

  private def relationalOracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($DISC) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($DISC * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(SUM($DISC) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_volume" ->
      s"""SELECT n_name, CAST(SUM($DISC) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(SUM($DISC) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, CAST(SUM($DISC) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q19_disjunctive" ->
      s"""SELECT CAST(SUM($DISC) AS DOUBLE) AS revenue, COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 1 AND 15)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
         |       AND l_quantity BETWEEN 10 AND 25)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30
         |       AND l_quantity BETWEEN 20 AND 35)""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q22_global_sales" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
        |  (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_sole_late" ->
      """WITH late AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1 JOIN supplier ON s_suppkey = l1.sk
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.ok AND l2.l_suppkey <> l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.ok = l1.ok AND l3.sk <> l1.sk)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q20_heavy_parts" ->
      """WITH heavy AS (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%a%'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
        |SELECT s_suppkey, s_name,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal
        |FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
        |ORDER BY s_suppkey""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND CAST(l_discount AS DECIMAL(18,2))
        |      BETWEEN CAST('0.05' AS DECIMAL(18,2)) AND CAST('0.07' AS DECIMAL(18,2))
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      s"""WITH j AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN $DISC
         |             ELSE CAST('0' AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
         |    CAST(SUM($DISC) AS DOUBLE) AS total_volume
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  GROUP BY 1)
         |SELECT o_year, nation_volume, total_volume,
         |  nation_volume / total_volume AS mkt_share
         |FROM j ORDER BY o_year""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey, SUM($DISC) AS rev_d FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, CAST(rev_d AS DOUBLE) AS total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE rev_d = (SELECT MAX(rev_d) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-02-01 00:00:00' AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_topn" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_rank" ->
      """SELECT c_nationkey, c_custkey,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal, rk
        |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
        |        ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |          ORDER BY c_acctbal DESC, c_custkey) AS rk
        |      FROM customer) t
        |WHERE rk <= 3 ORDER BY c_nationkey, rk""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_nationkey, 'yes' AS has_orders, COUNT(*) AS n_customers
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1
        |UNION ALL
        |SELECT c_nationkey, 'no' AS has_orders, COUNT(*) AS n_customers
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1
        |ORDER BY c_nationkey, has_orders""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_caseagg" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_totalprice > 200000
        |        THEN CAST(o_totalprice AS DECIMAL(18,2))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_min_joinback" ->
      """WITH mins AS (
        |  SELECT p_brand AS mb, MIN(CAST(p_retailprice AS DECIMAL(18,2))) AS min_price
        |  FROM part GROUP BY 1)
        |SELECT p_brand, p_partkey, CAST(min_price AS DOUBLE) AS min_price
        |FROM part JOIN mins
        |  ON p_brand = mb AND CAST(p_retailprice AS DECIMAL(18,2)) = min_price
        |ORDER BY p_brand, p_partkey""".stripMargin,
    "q_outer_histogram" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1) t
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_promo_ratio" ->
      s"""WITH j AS (
         |  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $DISC
         |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
         |    CAST(SUM($DISC) AS DOUBLE) AS total_revenue
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')
         |SELECT promo_revenue * 100.0 / total_revenue AS promo_pct,
         |  promo_revenue, total_revenue FROM j""".stripMargin,
    "q_notin_brands" ->
      """SELECT p_brand, COUNT(*) AS n_parts FROM part
        |WHERE p_partkey NOT IN (
        |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_d
        |  FROM lineitem GROUP BY 1 HAVING sum_qty_d > 250)
        |SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        |  CAST(sum_qty_d AS DOUBLE) AS sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,
    "ev_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // five exact decimal moments (every unscaled sum < 2^53, so the
    // decimal->double casts are exact in BOTH engines — price² sums
    // overflow that bound and DuckDB's conversion double-rounds),
    // double math replayed operand-for-operand
    "q_corr" ->
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_discount AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_discount AS DECIMAL(18,2))
        |        * CAST(l_discount AS DECIMAL(18,2))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |        * CAST(l_discount AS DECIMAL(18,2))) AS sxy
        |  FROM lineitem GROUP BY 1),
        |d AS (
        |  SELECT l_returnflag, n,
        |    sqrt(greatest(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
        |    * sqrt(greatest(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)) AS den,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num
        |  FROM a)
        |SELECT l_returnflag, n,
        |  CASE WHEN den > 0.0 THEN num / den END AS corr_qty_disc
        |FROM d ORDER BY l_returnflag""".stripMargin,
    // ntile within nation over the deterministic (rev desc, custkey)
    // order: SQL-standard floor split, identical in both engines
    "q_decile_revenue" ->
      """WITH pc AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT c_nationkey, o_custkey, rev FROM pc
        |  JOIN customer ON o_custkey = c_custkey),
        |d AS (
        |  SELECT c_nationkey, rev,
        |    NTILE(10) OVER (PARTITION BY c_nationkey
        |                    ORDER BY rev DESC, o_custkey) AS decile
        |  FROM j)
        |SELECT c_nationkey, CAST(decile AS BIGINT) AS decile,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(rev) AS DOUBLE) AS revenue
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // sliding-window distinct: expand each (day, user) activity by the
    // fixed 7-day horizon, re-distinct, count — integers only
    "ev_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |w AS (
        |  SELECT DISTINCT d.day AS wday, du.user_id
        |  FROM du JOIN days d ON d.day BETWEEN du.day AND du.day + 6)
        |SELECT wday AS day, COUNT(*) AS wau
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-stage conversion delays in exact BIGINT microseconds;
    // quantile_disc == the conditional-MIN-at-ceil(q*n) definition
    "ev_funnel_time" ->
      """WITH v AS (
        |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click,
        |    MIN(v.t_view) AS t_view
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_buy,
        |    MIN(c.t_click) AS t_click
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
        |  GROUP BY 1),
        |d AS (
        |  SELECT 'view_to_click' AS stage,
        |    epoch_us(t_click) - epoch_us(t_view) AS delay_us FROM c
        |  UNION ALL
        |  SELECT 'click_to_purchase' AS stage,
        |    epoch_us(t_buy) - epoch_us(t_click) AS delay_us FROM p)
        |SELECT stage, COUNT(*) AS n_users,
        |  quantile_disc(delay_us, 0.50) AS med_delay_us,
        |  quantile_disc(delay_us, 0.90) AS p90_delay_us
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // DAU over trailing-7-day AU: both counts from the same distinct
    // activity relation; one exact integer-ratio double per day
    "ev_stickiness" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY 1),
        |days AS (SELECT DISTINCT day FROM du),
        |wau AS (
        |  SELECT wday AS day, COUNT(*) AS wau FROM (
        |    SELECT DISTINCT d.day AS wday, du.user_id
        |    FROM du JOIN days d ON d.day BETWEEN du.day AND du.day + 6) w
        |  GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON wau.day = dau.day
        |ORDER BY 1""".stripMargin,
    "ev_active_users" ->
      """WITH du AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT day, COUNT(*) AS dau, CAST(SUM(c) AS BIGINT) AS n_events,
        |  CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS events_per_user
        |FROM du GROUP BY 1 ORDER BY 1""".stripMargin,
    // the sketch is exact here (k-1 = 7 counters >= 5 event types, no
    // evictions), so the plain exact GROUP BY is a legitimate oracle
    "ev_heavy_hitters" ->
      """SELECT event_type, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin,
    // percentile_disc over the continuous value measure: an actual data
    // value comes back, so doubles hash identically cross-engine
    "ev_quantiles" ->
      """SELECT event_type,
        |  quantile_disc(value, 0.50) AS p50,
        |  quantile_disc(value, 0.95) AS p95,
        |  quantile_disc(value, 0.99) AS p99
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // percentile_cont: linear interpolation between the floor/ceil
    // order statistics at h = (n-1)*q — the Spark side replays DuckDB's
    // operand order so the doubles hash identically
    "ev_quantiles_cont" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.50) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  quantile_cont(value, 0.99) AS p99
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // percentile_disc semantics: first value whose cumulative count
    // reaches ceil(q*n) — exact, no interpolation
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.25) AS p25,
        |  quantile_disc(l_quantity, 0.50) AS p50,
        |  quantile_disc(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_markov" ->
      """WITH t AS (
        |  SELECT event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
        |  FROM events)
        |SELECT event_type AS from_type, next_type AS to_type,
        |  COUNT(*) AS n_transitions
        |FROM t WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same double operand order as the Spark z expression:
    // (c - sc/n) / sqrt((scc - sc*sc/n) / n)
    "ev_anomaly" ->
      """WITH h AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT user_id, hour, c,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_hours,
        |    SUM(c) OVER (PARTITION BY user_id) AS sc,
        |    SUM(c * c) OVER (PARTITION BY user_id) AS scc
        |  FROM h),
        |sd AS (
        |  SELECT user_id, hour, c, n_hours, sc,
        |    sqrt((CAST(scc AS DOUBLE)
        |          - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
        |            / CAST(n_hours AS DOUBLE))
        |         / CAST(n_hours AS DOUBLE)) AS sd
        |  FROM st),
        |zs AS (
        |  SELECT user_id, hour, c AS n_events,
        |    CASE WHEN sd > 0.0 THEN
        |      (CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / CAST(n_hours AS DOUBLE)) / sd
        |    END AS z
        |  FROM sd)
        |SELECT user_id, hour, n_events, z FROM zs
        |WHERE z > 2.0 ORDER BY user_id, hour""".stripMargin,
    "ev_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_buy
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
        |  GROUP BY 1)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |  (SELECT COUNT(*) FROM c) AS n_click_after,
        |  (SELECT COUNT(*) FROM p) AS n_purchase_after""".stripMargin,
    "ev_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        |  FROM events),
        |later AS (
        |  SELECT user_id AS uid2, day - INTERVAL 7 DAY AS cohort_day FROM days)
        |SELECT day, COUNT(*) AS n_active,
        |  COUNT(cohort_day) AS n_retained7
        |FROM days LEFT JOIN later
        |  ON user_id = uid2 AND day = cohort_day
        |GROUP BY day ORDER BY day""".stripMargin,
    "ev_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN prev_ts IS NULL
        |        OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_top_users" ->
      """WITH totals AS (
        |  SELECT event_type, user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id, total_value, rk FROM (
        |  SELECT event_type, user_id, total_value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY total_value DESC, user_id) AS rk
        |  FROM totals) t
        |WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin,
    "q_moving_avg" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
        |  FROM orders GROUP BY 1)
        |SELECT day, CAST(rev_d AS DOUBLE) AS daily_rev,
        |  CAST(SUM(rev_d) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE) AS ma7
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    // deterministic KMV distinct + bottom-k quantile sample, replayed
    // exactly: sample membership = k smallest hashes (merge-order
    // invariant), so ORDER BY hash LIMIT k reproduces the engine state;
    // the 62-bit permutation hash is pure exact int64 both sides
    "q_approx_sketch" ->
      s"""WITH hd AS (SELECT DISTINCT l_returnflag,
        |  ${skHashSql(s"l_partkey")} AS h
        |  FROM lineitem),
        |hr AS (SELECT l_returnflag, h,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM hd),
        |hk AS (SELECT l_returnflag, COUNT(*) AS m,
        |  MAX(CASE WHEN rn = ${Relational.SketchK} THEN h END) AS hkth
        |  FROM hr WHERE rn <= ${Relational.SketchK} GROUP BY 1),
        |v AS (SELECT l_returnflag,
        |  ${skHashSql(s"(l_orderkey * 8 + l_linenumber)")} AS h,
        |  l_quantity AS v FROM lineitem),
        |vr AS (SELECT l_returnflag, v,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS rn FROM v),
        |samp AS (SELECT l_returnflag, v FROM vr WHERE rn <= ${Relational.SketchK}),
        |sr AS (SELECT l_returnflag, v,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
        |  COUNT(*) OVER (PARTITION BY l_returnflag) AS m FROM samp),
        |med AS (SELECT l_returnflag,
        |  MAX(CASE WHEN rn = CAST(floor(((m - 1) * 50) / 100.0) AS BIGINT) + 1
        |    THEN v END) AS approx_median_qty
        |  FROM sr GROUP BY 1)
        |SELECT hk.l_returnflag,
        |  CASE WHEN hk.m < ${Relational.SketchK} THEN CAST(hk.m AS DOUBLE)
        |    ELSE CAST('${Relational.SkKmvNumerator}' AS DOUBLE)
        |      / CAST(hk.hkth AS DOUBLE) END AS approx_parts,
        |  med.approx_median_qty
        |FROM hk JOIN med USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "ev_value_sketch" ->
      s"""WITH v AS (SELECT event_type,
        |  ${skHashSql("event_id")} AS h,
        |  value AS v FROM events),
        |vr AS (SELECT event_type, v,
        |  row_number() OVER (PARTITION BY event_type ORDER BY h, v) AS rn FROM v),
        |samp AS (SELECT event_type, v FROM vr WHERE rn <= ${Relational.EvSketchK}),
        |sr AS (SELECT event_type, v,
        |  row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |  COUNT(*) OVER (PARTITION BY event_type) AS m FROM samp),
        |q AS (SELECT event_type, CAST(MAX(m) AS BIGINT) AS m,
        |  MAX(CASE WHEN rn = CAST(floor(((m - 1) * 50) / 100.0) AS BIGINT) + 1 THEN v END) AS est_p50,
        |  MAX(CASE WHEN rn = CAST(floor(((m - 1) * 90) / 100.0) AS BIGINT) + 1 THEN v END) AS est_p90,
        |  MAX(CASE WHEN rn = CAST(floor(((m - 1) * 99) / 100.0) AS BIGINT) + 1 THEN v END) AS est_p99
        |  FROM sr GROUP BY 1),
        |n AS (SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY 1)
        |SELECT n.event_type, n.n_rows, q.m, q.est_p50, q.est_p90, q.est_p99
        |FROM n JOIN q USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q_median" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag, l_quantity AS median_qty, n AS n_rows
        |FROM t WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
        |ORDER BY l_returnflag""".stripMargin,
    "q_small_qty" ->
      """WITH a AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN a ON l_partkey = pk
        |WHERE l_quantity < avg_qty * 0.2""".stripMargin,
    "q_late_orders" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_string_ops" ->
      """SELECT upper(substring(p_name, 1, 2)) AS prefix, COUNT(*) AS n_parts,
        |  CAST(SUM(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END) AS BIGINT) AS n_with_a,
        |  CAST(SUM(length(regexp_replace(p_name, '[aeiou]', '', 'g'))) AS BIGINT) AS total_consonants
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    // non-hierarchical margins — the grouping-sets member of the family
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_setops" ->
      """WITH building AS (
        |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        |big AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
        |SELECT 'except' AS op, COUNT(*) AS n FROM (
        |  SELECT k FROM big EXCEPT SELECT k FROM building) t
        |UNION ALL
        |SELECT 'intersect' AS op, COUNT(*) AS n FROM (
        |  SELECT k FROM big INTERSECT SELECT k FROM building) t
        |ORDER BY op""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_top_users_native" ->
      """WITH totals AS (
        |  SELECT event_type, user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id, total_value FROM (
        |  SELECT event_type, user_id, total_value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY total_value DESC, user_id) AS rk
        |  FROM totals) t
        |WHERE rk <= 3 ORDER BY event_type, total_value DESC, user_id""".stripMargin,
    "ev_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |  WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id, e.ts, p.pts AS last_purchase_ts
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.pts
        |ORDER BY event_id""".stripMargin,
    "ev_json" ->
      """WITH e AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
        |SELECT k % 10 AS k_bucket, COUNT(*) AS n_events, MAX(k) AS max_k
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    // forward + nearest as-of replayed through the same union-interleave
    // windows (equal-ts purchases join both directions; nearest decides
    // on exact microsecond BIGINTs, ties backward)
    // the tolerance cut replayed on the same backward window, decided
    // on exact microsecond BIGINTs (24h = 86400000000 us)
    "ev_asof_tol" ->
      s"""WITH u AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
         |  FROM events WHERE event_type IN ('purchase', 'error')),
         |wi AS (
         |  SELECT user_id, ts, event_id, isp,
         |    MAX(CASE WHEN isp = 1 THEN ts END) OVER (
         |      PARTITION BY user_id ORDER BY ts, isp DESC, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         |    ) AS lp
         |  FROM u)
         |SELECT event_id, user_id, ts,
         |  CASE WHEN epoch_us(ts) - epoch_us(lp) <= ${Relational.AsofTolUs}
         |    THEN lp END AS last_purchase_ts,
         |  CASE WHEN lp IS NOT NULL
         |    THEN epoch_us(ts) - epoch_us(lp) END AS staleness_us
         |FROM wi WHERE isp = 0 ORDER BY event_id""".stripMargin,
    // same 30-min sessionization windows; median via the conditional-
    // MIN-at-ceil(n/2) percentile_disc scaffold over per-user sessions
    "ev_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(CASE WHEN prev_ts IS NULL
        |        OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |        THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM e),
        |d AS (
        |  SELECT user_id, session_id,
        |    MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS dur_us, COUNT(*) AS n_ev
        |  FROM s GROUP BY 1, 2),
        |c AS (
        |  SELECT user_id, session_id, dur_us, n_ev,
        |    COUNT(*) OVER (PARTITION BY user_id ORDER BY dur_us, session_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM d)
        |SELECT user_id, MAX(n) AS n_sessions, CAST(SUM(n_ev) AS BIGINT) AS n_events,
        |  MIN(CASE WHEN cum >= CAST(ceil(n / 2.0) AS BIGINT) THEN dur_us END) AS med_dur_us,
        |  MAX(dur_us) AS max_dur_us
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-(user,type) lag gaps in exact microseconds; the ev_quantiles
    // histogram-cumulative scaffold per type
    "ev_gap_stats" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |g AS (
        |  SELECT event_type, epoch_us(ts) - epoch_us(prev_ts) AS gap_us
        |  FROM e WHERE prev_ts IS NOT NULL),
        |h AS (SELECT event_type, gap_us, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, gap_us, cnt,
        |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM h)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
        |  MIN(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN gap_us END) AS med_gap_us,
        |  MIN(CASE WHEN cum >= CAST(ceil(n * 0.9) AS BIGINT) THEN gap_us END) AS p90_gap_us,
        |  MAX(gap_us) AS max_gap_us
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // Lorenz rank-sum over the count histogram: ties contribute the
    // closed form c·(2·S_prev·m + m(m+1)) (the fold carries 2T so no
    // division exists); HUGEINT mirrors the Spark side's widen-before-
    // every-multiply DECIMAL(38,0) posture
    "ev_gini" ->
      """WITH counts AS (
        |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
        |hist AS (SELECT c, COUNT(*) AS m FROM counts GROUP BY 1),
        |h AS (
        |  SELECT c, m,
        |    SUM(m) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m AS sprev
        |  FROM hist),
        |a AS (
        |  SELECT CAST(SUM(m) AS BIGINT) AS n_users,
        |    CAST(SUM(c * m) AS BIGINT) AS total_events,
        |    SUM(CAST(c AS HUGEINT)
        |        * (CAST(sprev AS HUGEINT) * m * 2
        |           + CAST(m AS HUGEINT) * (m + 1))) AS t2
        |  FROM h)
        |SELECT n_users, total_events,
        |  (CAST(t2 AS DOUBLE)
        |   - CAST(n_users + 1 AS DOUBLE) * CAST(total_events AS DOUBLE))
        |  / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE)) AS gini
        |FROM a""".stripMargin,
    // daily exact-decimal totals, one lead window over the daily
    // relation, the q_corr moment formula operand-for-operand
    "ev_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT x, LEAD(x) OVER (ORDER BY day) AS y FROM daily),
        |m AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        |  FROM p WHERE y IS NOT NULL)
        |SELECT n AS n_pairs,
        |  CASE WHEN sqrt(greatest(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
        |      * sqrt(greatest(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)) > 0.0
        |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (sqrt(greatest(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
        |      * sqrt(greatest(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)))
        |  END AS autocorr_lag1
        |FROM m""".stripMargin,
    // same per-nation window; pct_rank/cume exact integer-ratio doubles,
    // nth_value under the identical default running frame (NULL at rk 1)
    "q_window_funcs" ->
      """WITH c AS (
        |  SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer),
        |w AS (
        |  SELECT c_nationkey, c_custkey, bal,
        |    ROW_NUMBER() OVER win AS rk,
        |    PERCENT_RANK() OVER win AS pct_rank,
        |    CUME_DIST() OVER win AS cume,
        |    FIRST_VALUE(bal) OVER win AS top_bal,
        |    NTH_VALUE(bal, 2) OVER win AS second_bal
        |  FROM c
        |  WINDOW win AS (PARTITION BY c_nationkey ORDER BY bal DESC, c_custkey))
        |SELECT c_nationkey, c_custkey, CAST(rk AS BIGINT) AS rk,
        |  CAST(bal AS DOUBLE) AS bal, pct_rank, cume,
        |  CAST(top_bal AS DOUBLE) AS top_bal,
        |  CAST(second_bal AS DOUBLE) AS second_bal
        |FROM w WHERE rk <= 3 ORDER BY c_nationkey, rk""".stripMargin,
    // distinct (type, user) activity; user-keyed self-join; exact Jaccard
    "ev_type_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |sizes AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    COUNT(*) AS n_common
        |  FROM tu a JOIN tu b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_common,
        |  CAST(n_common AS DOUBLE)
        |    / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON sa.event_type = type_a
        |JOIN sizes sb ON sb.event_type = type_b
        |ORDER BY 1, 2""".stripMargin,
    // per-axis corpus medians via the histogram-cumulative scaffold;
    // deterministic CASE segments against three 1-row median relations
    "ev_rfm" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)),
        |      (SELECT MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) FROM events))
        |      AS BIGINT) AS rec,
        |    COUNT(*) AS freq,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |mr AS (
        |  SELECT MIN(CASE WHEN cum >= CAST(ceil(n / 2.0) AS BIGINT) THEN rec END) AS med_rec
        |  FROM (SELECT rec, SUM(cnt) OVER (ORDER BY rec
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |          SUM(cnt) OVER () AS n
        |        FROM (SELECT rec, COUNT(*) AS cnt FROM pu GROUP BY 1))),
        |mf AS (
        |  SELECT MIN(CASE WHEN cum >= CAST(ceil(n / 2.0) AS BIGINT) THEN freq END) AS med_freq
        |  FROM (SELECT freq, SUM(cnt) OVER (ORDER BY freq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |          SUM(cnt) OVER () AS n
        |        FROM (SELECT freq, COUNT(*) AS cnt FROM pu GROUP BY 1))),
        |mm AS (
        |  SELECT MIN(CASE WHEN cum >= CAST(ceil(n / 2.0) AS BIGINT) THEN cents END) AS med_cents
        |  FROM (SELECT cents, SUM(cnt) OVER (ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |          SUM(cnt) OVER () AS n
        |        FROM (SELECT cents, COUNT(*) AS cnt FROM pu GROUP BY 1))),
        |s AS (
        |  SELECT (CASE WHEN rec <= med_rec THEN 'R' ELSE 'r' END ||
        |          CASE WHEN freq > med_freq THEN 'F' ELSE 'f' END ||
        |          CASE WHEN cents > med_cents THEN 'M' ELSE 'm' END) AS segment,
        |    rec, freq, cents
        |  FROM pu CROSS JOIN mr CROSS JOIN mf CROSS JOIN mm)
        |SELECT segment, COUNT(*) AS n_users,
        |  MAX(rec) AS max_recency,
        |  CAST(SUM(freq) AS BIGINT) AS total_events,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact cents, bit-length buckets (no FP boundary hazard), exact sums
    "ev_value_hist" ->
      """WITH v AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_events, MIN(cents) AS min_cents, MAX(cents) AS max_cents,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM v WHERE cents > 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // two day aggregates in a FULL OUTER join; null sides report zero
    "q_full_outer" ->
      """WITH o AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day, COUNT(*) AS n_shipments
        |  FROM lineitem GROUP BY 1)
        |SELECT COALESCE(o.day, s.day) AS day,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(n_shipments, 0) AS n_shipments,
        |  n_orders IS NOT NULL AND n_shipments IS NOT NULL AS both_active
        |FROM o FULL OUTER JOIN s ON o.day = s.day
        |ORDER BY day""".stripMargin,
    // exact binary-fraction weights, same k-ascending left-assoc chain
    "ev_ewma" -> {
      val wts = (0 to 6).map(k => 0.5 * math.pow(0.5, k))
      def lagCol(k: Int) = if (k == 0) "x" else s"x$k"
      val lagDefs = (1 to 6)
        .map(k => s"LAG(x, $k) OVER (ORDER BY day) AS x$k").mkString(",\n    ")
      val num = (0 to 6).map(k =>
        s"CASE WHEN ${lagCol(k)} IS NOT NULL THEN ${wts(k)} * CAST(${lagCol(k)} AS DOUBLE) ELSE 0.0 END")
        .mkString("\n   + ")
      val den = (0 to 6).map(k =>
        s"CASE WHEN ${lagCol(k)} IS NOT NULL THEN ${wts(k)} ELSE 0.0 END")
        .mkString("\n   + ")
      s"""WITH daily AS (
         |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
         |  FROM events GROUP BY 1),
         |l AS (
         |  SELECT day, x,
         |    $lagDefs
         |  FROM daily)
         |SELECT day, CAST(x AS DOUBLE) AS daily_total,
         |  (($num)
         |   / ($den)) AS ewma7
         |FROM l ORDER BY day""".stripMargin
    },
    // n-scaled exact-decimal CUSUM: n·P_d − d·S, divided back per row
    "ev_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT day, x,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS d,
        |    SUM(x) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |    SUM(x) OVER () AS stot
        |  FROM daily)
        |SELECT day, CAST(x AS DOUBLE) AS daily_total,
        |  CAST(n * p - d * stot AS DOUBLE) AS cusum_scaled,
        |  CAST(n * p - d * stot AS DOUBLE) / CAST(n AS DOUBLE) AS cusum
        |FROM w ORDER BY day""".stripMargin,
    // per-user first->last span + distinct active days, rolled up
    "ev_lifetime" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |pu AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', MIN(day), MAX(day)) + 1 AS BIGINT) AS lifetime_days,
        |    COUNT(*) AS active_days
        |  FROM du GROUP BY 1)
        |SELECT lifetime_days, COUNT(*) AS n_users,
        |  CAST(SUM(active_days) AS BIGINT) AS total_active_days
        |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin,
    // distinct (user, week) activity; cohort = min week per user
    "ev_cohort_matrix" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS week
        |  FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY 1)
        |SELECT cohort_week, week - cohort_week AS week_offset, COUNT(*) AS n_users
        |FROM wk JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_asof_nearest" ->
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |wi AS (
        |  SELECT user_id, ts, event_id, isp,
        |    MAX(CASE WHEN isp = 1 THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, isp DESC, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |    ) AS last_purchase_ts,
        |    MIN(CASE WHEN isp = 1 THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, isp, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
        |    ) AS next_purchase_ts
        |  FROM u)
        |SELECT event_id, user_id, ts, last_purchase_ts, next_purchase_ts,
        |  CASE
        |    WHEN last_purchase_ts IS NULL THEN next_purchase_ts
        |    WHEN next_purchase_ts IS NULL THEN last_purchase_ts
        |    WHEN epoch_us(ts) - epoch_us(last_purchase_ts)
        |       <= epoch_us(next_purchase_ts) - epoch_us(ts)
        |      THEN last_purchase_ts
        |    ELSE next_purchase_ts
        |  END AS nearest_purchase_ts
        |FROM wi WHERE isp = 0 ORDER BY event_id""".stripMargin,
  )
}
