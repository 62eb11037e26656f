package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Joins, Relational}

class JoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join on skewed data") {
    // 10k rows, 90% on one hot key
    val big = spark.range(10000)
      .selectExpr("CASE WHEN id % 10 = 0 THEN id ELSE 7 END AS k", "id AS payload")
    val small = Seq((7L, "hot"), (0L, "zero"), (10L, "ten")).toDF("sk", "name")
    val plain = big.join(small, $"k" === $"sk").select("k", "payload", "name")
    val salted = Joins.saltedJoin(big, small, "k", "sk", 8).select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("skewBound reproduces the exact pair set and bounds per-cell rows under 100x skew") {
    import org.apache.spark.sql.functions.{col, hash}
    // hot-bucket fixture: one key with 700 rows vs 50 keys of 7 rows
    // (100x skew), small cap so the hot key genuinely splits
    val cap = 32
    val rows = ((0 until 700).map(i => ("hot", i.toLong)) ++
      (0 until 350).map(i => (s"k${i % 50}", 1000L + i))).toDF("k", "id")
    val naive = rows.as("a")
      .join(rows.as("b"), col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (s, r) = Joins.skewBound(rows, rows, Seq("k"), Seq("k"),
      hash(col("id")), cap = cap)
    val salted = r.as("a")
      .join(s.as("b"), col("a.k") === col("b.k") &&
        col("a.__split_r") === col("b.__split") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq
    // exactness AND exactly-once: every pair meets in precisely one cell
    assert(salted.toSet == naive.toSet, "pair sets must match")
    assert(salted.length == naive.length, "no pair may be duplicated or lost")
    // bound: no (key, split) reduce cell on the salted side exceeds the
    // cap by more than hash imbalance (3x is generous; expected ~cap)
    val cells = s.groupBy("k", "__split").count().collect()
    assert(cells.map(_.getLong(2)).max <= 3L * cap,
      s"per-cell rows must be bounded by ~cap=$cap")
    // the hot key spreads over exactly ceil(700/32) = 22 cells...
    assert(cells.count(_.getString(0) == "hot") == math.ceil(700.0 / cap).toInt)
    // ...while every non-hot key keeps m = 1 (zero replication cost)
    val nonHotSplits = r.filter(col("k") =!= "hot")
      .groupBy("k").count().collect().map(_.getLong(1))
    assert(nonHotSplits.forall(_ == 7L), "non-hot keys must not replicate")
  }

  test("skewBound falls back to count-relation joins beyond MaxInlineHot keys") {
    import org.apache.spark.sql.functions.{col, hash}
    // 70 hot keys (> MaxInlineHot = 64) of 12 rows each, plus 30 cold
    // singletons: skew too BROAD to inline, so the DataFrame-join
    // fallback (the __skb_ hot relation) must carry the plan.
    val cap = 4
    val rows = ((0 until 70).flatMap(k =>
        (0 until 12).map(i => (s"h$k", (k * 100 + i).toLong))) ++
      (0 until 30).map(i => (s"c$i", 100000L + i))).toDF("k", "id")
    val naive = rows.as("a")
      .join(rows.as("b"), col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (s, r) = Joins.skewBound(rows, rows, Seq("k"), Seq("k"),
      hash(col("id")), cap = cap)
    assert(s.queryExecution.analyzed.toString.contains("__skb_"),
      "70 hot keys must take the count-relation fallback, not the inline path")
    val salted = r.as("a")
      .join(s.as("b"), col("a.k") === col("b.k") &&
        col("a.__split_r") === col("b.__split") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq
    assert(salted.toSet == naive.toSet, "fallback pair sets must match")
    assert(salted.length == naive.length, "no pair duplicated or lost")
    // replication is exact and per-key: hot keys explode to ceil(12/4)=3
    // splits (12 rows -> 36), cold singletons stay unreplicated
    val rCounts = r.groupBy("k").count().collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert((0 until 70).forall(k => rCounts(s"h$k") == 36L))
    assert((0 until 30).forall(i => rCounts(s"c$i") == 1L))
  }

  test("skewBound matches the naive self-join under randomized distributions") {
    import org.apache.spark.sql.functions.{col, hash}
    // random key multiplicities (including heavy skew) x random caps:
    // the pair set must equal the naive join's EXACTLY — no pair lost,
    // none duplicated — and every (key, split) cell must stay bounded.
    // Exercises all three paths (degenerate / inline / fallback shapes
    // vary with the draw because cap and the key histogram do).
    val rnd = new scala.util.Random(20260814L)
    for (caseNo <- 0 until 4) {
      val nKeys = 3 + rnd.nextInt(8)
      var id = 0L
      val rows = (0 until nKeys).flatMap { k =>
        val mult = if (rnd.nextInt(3) == 0) 40 + rnd.nextInt(80) else 1 + rnd.nextInt(6)
        (0 until mult).map { _ => id += 1; (s"k$k", id) }
      }.toDF("k", "id")
      val cap = 1 + rnd.nextInt(24)
      val naive = rows.as("a")
        .join(rows.as("b"), col("a.k") === col("b.k") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val (s, r) = Joins.skewBound(rows, rows, Seq("k"), Seq("k"),
        hash(col("id")), cap = cap)
      val salted = r.as("a")
        .join(s.as("b"), col("a.k") === col("b.k") &&
          col("a.__split_r") === col("b.__split") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"))
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq
      val tag = s"case $caseNo cap=$cap keys=$nKeys rows=$id"
      assert(salted.toSet == naive.toSet, s"$tag pair sets differ")
      assert(salted.length == naive.length, s"$tag pair multiplicity differs")
      // per-cell bound: a cell's rows may exceed cap only by hash
      // imbalance across a key's ceil(n/cap) splits (3x is generous)
      val worst = s.groupBy("k", "__split").count().collect().map(_.getLong(2)).max
      assert(worst <= math.max(3L * cap, 6L), s"$tag cell of $worst rows exceeds ~cap=$cap")
    }
  }

  test("skewBound keeps keys absent from the salted side (left-outer counts)") {
    import org.apache.spark.sql.functions.{col, hash}
    val left = Seq(("a", 1L), ("a", 2L)).toDF("k", "id")
    val right = Seq(("a", 10L), ("zzz", 11L)).toDF("k", "id")
    val (s, r) = Joins.skewBound(left, right, Seq("k"), Seq("k"),
      hash(col("id")), cap = 1)
    // the replicated side keeps its unmatched key (m defaults to 1)...
    assert(r.filter(col("k") === "zzz").count() == 1L)
    // ...and the join still produces exactly the naive pair set
    val pairs = s.as("b").join(r.as("a"),
        col("a.k") === col("b.k") && col("a.__split_r") === col("b.__split"))
      .select(col("b.id"), col("a.id"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(pairs == Set((1L, 10L), (2L, 10L)))
  }

  test("q5 plan broadcasts dimensions and pushes filters to the scan") {
    val plan = Relational.q5RegionVolume(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dimensions should broadcast")
    assert(plan.contains("PushedFilters: [IsNotNull"), "scan should have pushed filters")
  }

  test("q_filter_project prunes columns and pushes predicates") {
    val plan = Relational.qFilterProject(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual"),
      s"expected shipdate pushdown in:\n$plan")
    // scan reads only the 5 needed columns of lineitem's 11
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_shipdate"),
      s"scan should read only needed columns:\n$plan")
    assert(!plan.contains("l_returnflag"), "unused columns must be pruned")
  }

  test("q_topn plans as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.qTopN(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
