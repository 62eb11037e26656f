package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("GraftExtensions registers graft_dot for SQL users") {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(r == 11.0)
    } finally () // shared JVM session registry; leave the session alone
  }

  test("GraftExtensions registers the native text functions for SQL users") {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val grams = s.sql("SELECT graft_word_ngrams('a b c', 2) AS g")
        .head().getSeq[String](0)
      assert(grams == Seq("a b", "b c"))
      val nHashes = s.sql("SELECT size(graft_hash_word_ngrams('a b a b', 2)) AS n")
        .head().getInt(0)
      assert(nHashes == 2) // distinct bigrams: "a b", "b a"
      val maxTok = s.sql("SELECT graft_max_token_count('x y x x') AS m")
        .head().getLong(0)
      assert(maxTok == 3L)
      // the aggregate registers too: exact under capacity, sorted output
      val hh = s.sql(
        """SELECT graft_heavy_hitters(v, 4) AS hh
          |FROM VALUES ('a'), ('a'), ('b') AS t(v)""".stripMargin)
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
      assert(hh == Seq(("a", 2L), ("b", 1L)))
      // non-literal n must be rejected, not silently miscompiled
      val e = intercept[Exception](
        s.sql("SELECT graft_word_ngrams('a b', 1 + 1)").collect())
      assert(e.getMessage.contains("integer literal") ||
        Option(e.getCause).exists(_.getMessage.contains("integer literal")))
      // r17 registrations: chunker, fused repetition stats, set jaccard
      val chunks = s.sql("SELECT graft_cdc_chunks(repeat('abcdef ', 40)) AS c")
        .head().getSeq[String](0)
      assert(chunks.nonEmpty && chunks.mkString == "abcdef " * 40)
      val rep = s.sql("SELECT graft_repetition_stats('x y x x') AS r")
        .head().getSeq[Long](0)
      assert(rep.head == 4L) // n_tok
      val jac = s.sql(
        "SELECT graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
        .head().getDouble(0)
      assert(jac == 0.5)
      // the moments aggregate: gram + sums + count of quantized vectors
      val gb = s.sql(
        """SELECT graft_gram(q, 2) AS gb
          |FROM VALUES (array(1L, 2L)), (array(3L, 4L)) AS t(q)""".stripMargin)
        .head().getSeq[Long](0)
      assert(gb == Seq(10L, 14L, 14L, 20L, 4L, 6L, 2L),
        "row-major gram, then sums, then n")
      // the 128-bit widening: same layout through decimal(38,0)
      val gw = s.sql(
        """SELECT graft_gram_wide(q, 2) AS gb
          |FROM VALUES (array(1L, 2L)), (array(3L, 4L)) AS t(q)""".stripMargin)
        .head().getSeq[java.math.BigDecimal](0)
      assert(gw.map(_.longValueExact()) == Seq(10L, 14L, 14L, 20L, 4L, 6L, 2L),
        "graft_gram_wide matches graft_gram on in-range data")
    } finally ()
  }

  test("TopKPerKey plans as the bounded-heap operator and matches the window form") {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val totals = graft.sources.Tables.load(s, sf, "events")
      .groupBy("event_type", "user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    val custom = org.apache.spark.sql.graftexpr.TopKPerKey
      .perKey(totals, Seq("event_type"),
        Seq(("total_value", false), ("user_id", true)), 3)
      .orderBy("event_type", "user_id")
    // physical nodes print without the Exec suffix
    assert(custom.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "custom strategy should plan the bounded-heap operator")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(desc("total_value"), asc("user_id"))
    val viaWindow = totals.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")
      .orderBy("event_type", "user_id")
    assert(custom.collect().toSeq == viaWindow.collect().toSeq)
  }

  test("Async.prepare computes in the background (doreisa persist analog)") {
    val df = spark.range(1000).toDF("id")
    val fut = Async.prepare(df.selectExpr("sum(id) AS s"))
    val rows = fut.get()
    assert(rows.head.getLong(0) == 499500L)
  }

  test("MisraGries heavy hitters: exact under capacity, bounded under skew") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftexpr.SketchExpressions.heavyHitters
    // skewed synthetic stream: 600 a, 250 b, 100 c, 50 singletons;
    // repartition(7) forces per-partition sketches through merge
    val rows = Seq.fill(600)("a") ++ Seq.fill(250)("b") ++ Seq.fill(100)("c") ++
      (0 until 50).map(i => s"t$i")
    val df = rows.toDF("item").repartition(7)
    val n = rows.length.toLong
    val k = 4
    val got = df.agg(heavyHitters(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.lower_bound"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k - 1, s"state bound violated: $got")
    val truth = rows.groupBy(identity).map { case (i, xs) => i -> xs.length.toLong }
    // every item with true frequency > N/k survives the sketch
    truth.filter(_._2 > n / k).foreach { case (i, c) =>
      assert(got.contains(i), s"heavy item $i ($c > ${n / k}) evicted: $got")
    }
    // every reported count is a lower bound within N/k of the truth
    got.foreach { case (i, lb) =>
      val t = truth(i)
      assert(lb <= t && t - lb <= n / k, s"bound violated for $i: lb=$lb true=$t")
    }
    // under capacity (k-1 >= distinct) the sketch is EXACT and ordered
    val exact = Seq("x", "x", "x", "y", "y", "z").toDF("item").repartition(3)
      .agg(heavyHitters(col("item"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.lower_bound"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(exact == Seq(("x", 3L), ("y", 2L), ("z", 1L)))
  }

  test("as-of join picks the latest purchase at-or-before each error") {
    val sf = "/root/testdata/sf0.001"
    val out = Relational.evAsofJoin(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(!r.getTimestamp(3).after(r.getTimestamp(2)),
        s"purchase ${r.getTimestamp(3)} is after error ${r.getTimestamp(2)}")
    }
    // spot-check one user by hand
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "ts", "event_type")
    val someUser = rows.filter(!_.isNullAt(3)).head.getLong(1)
    val purchases = ev.where(s"user_id = $someUser AND event_type = 'purchase'")
      .select("ts").as[java.sql.Timestamp].collect()
    rows.filter(r => r.getLong(1) == someUser && !r.isNullAt(3)).foreach { r =>
      val expected = purchases.filter(p => !p.after(r.getTimestamp(2))).max
      assert(r.getTimestamp(3) == expected)
    }
  }

  test("as-of nearest: directions, exact-ts matches, backward tie rule") {
    val sf = "/root/testdata/sf0.001"
    val out = Relational.evAsofNearest(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val purchByUser = ev.filter(_._3 == "purchase")
      .groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2) }
    out.foreach { r =>
      val ts = r.getTimestamp(2)
      val ps = purchByUser.getOrElse(r.getLong(1), Array.empty[java.sql.Timestamp])
      // backward = latest at-or-before; forward = earliest at-or-after
      val back = ps.filter(p => !p.after(ts)).sorted.lastOption
      val fwd = ps.filter(p => !p.before(ts)).sorted.headOption
      assert(Option(r.getTimestamp(3)) == back, s"backward at ${r.getLong(0)}")
      assert(Option(r.getTimestamp(4)) == fwd, s"forward at ${r.getLong(0)}")
      // nearest = closer side by micros; ties and equal-ts -> backward
      val want = (back, fwd) match {
        case (None, f) => f
        case (b, None) => b
        case (Some(b), Some(f)) =>
          def us(t: java.sql.Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
          if (us(ts) - us(b) <= us(f) - us(ts)) Some(b) else Some(f)
      }
      assert(Option(r.getTimestamp(5)) == want, s"nearest at ${r.getLong(0)}")
      // an exact-ts purchase must satisfy BOTH directions
      if (ps.contains(ts)) {
        assert(r.getTimestamp(3) == ts && r.getTimestamp(4) == ts)
        assert(r.getTimestamp(5) == ts)
      }
    }
  }
}
