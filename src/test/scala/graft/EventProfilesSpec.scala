package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ArrayQueries, Relational, TextAnalysis}
import graft.sources.Tables

/** Driver-recomputation gates for the round-19 profile faces:
  * ev_session_stats / ev_gap_stats / ev_cohort_matrix over the real
  * sf0.001 event stream, txt_word_stats over the documents corpus and
  * arr_interp over the engine's own flattened rows. Every comparison is
  * exact — integers, or doubles replayed in the identical operand order
  * — so the asserts are `==`, no tolerances. The oracle gate covers the
  * SQL replay; this spec pins the SEMANTICS against straight-line
  * Scala. */
class EventProfilesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  /** (user_id, event_id, event_type, ts_micros) — micros via the same
    * unix_micros the queries use, so no timestamp-precision drift. */
  private lazy val events: Seq[(Long, Long, String, Long)] =
    Tables.load(spark, sf, "events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq

  test("ev_session_stats equals a straight-line sessionization replay") {
    val got = Relational.evSessionStats(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val byUser = events.groupBy(_._1)
    assert(got.keySet == byUser.keySet, "every active user appears")
    byUser.foreach { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._4, e._2)).map(_._4)
      val sessions = scala.collection.mutable.ArrayBuffer[Vector[Long]]()
      ordered.foreach { t =>
        if (sessions.isEmpty || t - sessions.last.last > 1800L * 1000000L)
          sessions += Vector(t)
        else sessions(sessions.size - 1) = sessions.last :+ t
      }
      val durs = sessions.map(ss => ss.last - ss.head).toVector
      val sortedD = durs.sorted
      val med = sortedD(math.ceil(durs.size / 2.0).toInt - 1)
      assert(got(u) ==
        ((durs.size.toLong, ordered.size.toLong, med, durs.max)), s"user $u")
    }
  }

  test("ev_gap_stats equals a straight-line per-(user,type) gap replay") {
    val got = Relational.evGapStats(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val gaps = events.groupBy(e => (e._1, e._3)).toSeq.flatMap { case ((_, t), evs) =>
      val o = evs.sortBy(e => (e._4, e._2)).map(_._4)
      o.zip(o.tail).map { case (a, b) => (t, b - a) }
    }
    val byType = gaps.groupBy(_._1)
    assert(got.keySet == byType.keySet, "every type with >= 2 same-user events")
    byType.foreach { case (t, gs) =>
      val v = gs.map(_._2).sorted
      def pick(q: Double) = v(math.ceil(v.size * q).toInt - 1)
      assert(got(t) == ((v.size.toLong, pick(0.5), pick(0.9), v.max)), s"type $t")
    }
  }

  test("ev_cohort_matrix equals the distinct-(user,week) fold") {
    val got = Relational.evCohortMatrix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // week extraction through the same Spark date functions (calendar
    // semantics stay in one engine); the matrix fold is straight Scala
    val uw = Tables.load(spark, sf, "events")
      .select(col("user_id").cast("long"),
        floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
          .cast("long").as("wk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val exp = uw.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, vs) => k -> vs.size.toLong }
    assert(got == exp)
  }

  test("txt_word_stats equals a straight-line token fold per document") {
    val got = TextAnalysis.txtWordStats(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) assert(!got.contains(r.getLong(0)), s"doc ${r.getLong(0)}")
      else {
        val wc = toks.groupBy(identity).map(_._2.length)
        val nT = toks.length.toLong
        val nD = wc.size.toLong
        val nH = wc.count(_ == 1).toLong
        assert(got(r.getLong(0)) == ((nT, nD, nH, nD.toDouble / nT.toDouble)),
          s"doc ${r.getLong(0)}")
      }
    }
  }

  test("ev_gini: histogram closed form equals the classic sorted Lorenz rank-sum") {
    val r = Relational.evGini(spark, sf).collect().head
    val counts = events.groupBy(_._1).map(_._2.size.toLong).toSeq.sorted
    val n = counts.size.toLong
    val s = counts.sum
    val t = counts.zipWithIndex.map { case (c, i) => BigInt(c) * (i + 1) }.sum
    val gini = (2.0 * t.toDouble - (n + 1).toDouble * s.toDouble) /
      (n.toDouble * s.toDouble)
    assert(r.getLong(0) == n && r.getLong(1) == s)
    assert(r.getDouble(2) == gini, "histogram form == sorted rank-sum form")
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("ev_lifetime conserves users and active days") {
    val got = Relational.evLifetime(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val du = Tables.load(spark, sf, "events")
      .select(col("user_id").cast("long"), to_date(col("ts")).as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val pu = du.groupBy(_._1).toSeq.map { case (_, ds) =>
      val days = ds.map(_._2)
      (java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max) + 1,
        days.size.toLong)
    }
    val exp = pu.groupBy(_._1).map { case (lt, vs) =>
      lt -> ((vs.size.toLong, vs.map(_._2).sum)) }
    assert(got == exp)
    assert(got.values.map(_._1).sum == du.map(_._1).distinct.length.toLong)
  }

  test("ev_autocorr equals a BigDecimal-moment replay of the daily series") {
    val r = Relational.evAutocorr(spark, sf).collect().head
    val daily = Tables.load(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("x"))
      .orderBy("day").collect().map(_.getDecimal(1)).map(BigDecimal(_))
    val pairs = daily.zip(daily.tail)
    val n = pairs.length.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val nd = n.toDouble
    val num = nd * sxy.toDouble - sx.toDouble * sy.toDouble
    val den = math.sqrt(math.max(nd * sxx.toDouble - sx.toDouble * sx.toDouble, 0.0)) *
      math.sqrt(math.max(nd * syy.toDouble - sy.toDouble * sy.toDouble, 0.0))
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == num / den)
    assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-12)
  }

  test("txt_zipf_top: ranks are dense, products exact, head matches a driver count") {
    val got = TextAnalysis.txtZipfTop(spark, sf).collect()
    assert(got.length == 30)
    val freq = Tables.load(spark, sf, "documents").select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, v) => (w, v.length.toLong) }.toSeq
    val top = freq.sortBy { case (w, f) => (-f, w) }.take(30)
    got.zip(top).zipWithIndex.foreach { case ((r, (w, f)), i) =>
      assert(r.getLong(0) == i + 1L, s"rank at $i")
      assert(r.getString(1) == w && r.getLong(2) == f, s"word at $i")
      assert(r.getLong(3) == (i + 1L) * f, s"zipf product at $i")
      assert(r.getDouble(4) == f.toDouble / top.head._2.toDouble, s"rel freq at $i")
    }
  }

  test("arr_trend equals a BigDecimal normal-equation replay per cell") {
    val rows = ArrayQueries.eventsArray1dCached(spark, sf).rowsNd.collect()
      .map(r => (r.getLong(1), r.getLong(0), BigDecimal(r.getDouble(2))))
    val got = ArrayQueries.arrTrend(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val n = vs.length.toLong
      val st = vs.map(_._2).sum
      val stt = vs.map(v => v._2 * v._2).sum
      val sv = vs.map(_._3).sum
      val stv = vs.map(v => v._3 * BigDecimal(v._2)).sum
      val nd = n.toDouble
      val num = nd * stv.toDouble - st.toDouble * sv.toDouble
      val den = nd * stt.toDouble - st.toDouble * st.toDouble
      val (gn, gs, gi) = got(u)
      assert(gn == n, s"cell $u n")
      if (den > 0.0) {
        assert(gs == num / den, s"cell $u slope")
        assert(gi == (sv.toDouble - (num / den) * st.toDouble) / nd, s"cell $u icept")
      }
    }
  }

  test("ev_cusum: telescopes to zero at the end, equals a BigDecimal prefix replay") {
    val got = Relational.evCusum(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val daily = Tables.load(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("x"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, BigDecimal(r.getDecimal(1))))
    val n = daily.length.toLong
    val stot = daily.map(_._2).sum
    var p = BigDecimal(0)
    daily.zip(got).zipWithIndex.foreach { case (((day, x), g), i) =>
      p += x
      val scaled = BigDecimal(n) * p - BigDecimal(i + 1) * stot
      assert(g._1 == day && g._2 == x.toDouble, s"day $day identity")
      assert(g._3 == scaled.toDouble, s"day $day scaled")
      assert(g._4 == scaled.toDouble / n.toDouble, s"day $day cusum")
    }
    // the CUSUM telescopes: at d = n it is exactly n·S − n·S = 0
    assert(got.last._3 == 0.0, "terminal CUSUM is exactly zero")
  }

  test("arr_standardize: per-timestep z-scores have zero mean and unit variance") {
    val got = ArrayQueries.arrStandardize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    val byTs = got.groupBy(_._1)
    assert(byTs.nonEmpty)
    byTs.foreach { case (t, vs) =>
      assert(vs.length == 64, s"timestep $t dense")
      if (!vs.exists(_._3.isNaN)) {
        val zs = vs.map(_._3)
        assert(math.abs(zs.sum) < 1e-9, s"timestep $t zero mean")
        assert(math.abs(zs.map(z => z * z).sum / 64.0 - 1.0) < 1e-9,
          s"timestep $t unit variance")
      }
    }
  }

  test("mm_scene_cuts equals a straight-line frame-delta replay") {
    val got = graft.multimodal.Media.mmSceneCuts(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .filter(_.getLong(0) % 3 == 2)
    assert(got.size == docs.length)
    docs.foreach { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      val sums = bytes.grouped(16).map(_.map(b => (b & 0xff).toLong).sum).toSeq
      val deltas = sums.zip(sums.tail).map { case (a, b) => math.abs(b - a) }
      val exp = (sums.length.toLong,
        deltas.count(_ > graft.multimodal.Media.SceneCutDelta).toLong,
        if (deltas.isEmpty) -1L else deltas.max)
      assert(got(r.getLong(0)) == exp, s"asset ${r.getLong(0)}")
    }
  }

  test("ev_ewma: smoother replays driver-side; a flat series is a fixed point") {
    val got = Relational.evEwma(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2)))
    val daily = Tables.load(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("x"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getDecimal(1).doubleValue()))
    val wts = (0 to 6).map(k => 0.5 * math.pow(0.5, k))
    got.zipWithIndex.foreach { case ((day, x, ew), i) =>
      assert(day == daily(i)._1 && x == daily(i)._2, s"day $day identity")
      val avail = (0 to math.min(6, i))
      val num = avail.map(k => wts(k) * daily(i - k)._2).sum
      val den = avail.map(wts).sum
      // same k-ascending left fold, so the doubles are identical
      assert(ew == num / den, s"day $day ewma")
    }
    // fixed point: EWMA of a constant series is that constant (weights
    // renormalize exactly — binary fractions sum without rounding)
    val const = Seq.fill(10)(42.25)
    (0 until 10).foreach { i =>
      val avail = (0 to math.min(6, i))
      val v = avail.map(k => wts(k) * 42.25).sum / avail.map(wts).sum
      assert(v == 42.25, s"flat fixed point at $i")
    }
  }

  test("arr_histogram2d conserves cells over the parity-day intersect") {
    val got = ArrayQueries.arrHistogram2d(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // driver replay of the parity densify + bucket fold
    val cells = Tables.load(spark, sf, "events")
      .groupBy(datediff(to_date(col("ts")), lit("2024-01-01")).as("t"),
        (col("user_id") % 64).as("u"))
      .agg(
        sum(when(col("event_id") % 2 === 0,
          col("value").cast("decimal(18,2)"))).cast("double").as("ce"),
        sum(when(col("event_id") % 2 === 1,
          col("value").cast("decimal(18,2)"))).cast("double").as("co"))
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)),
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))))
    val eDays = cells.filter(_._2._1.isDefined).map(_._1._1).distinct.toSet
    val oDays = cells.filter(_._2._2.isDefined).map(_._1._1).distinct.toSet
    val days = eDays.intersect(oDays)
    val byKey = cells.toMap
    val exp = (for (d <- days.toSeq; u <- 0L until 64L) yield {
      val (ce, co) = byKey.getOrElse((d, u), (None, None))
      (math.floor(ce.getOrElse(0.0) / 100.0).toLong,
        math.floor(co.getOrElse(0.0) / 100.0).toLong)
    }).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == exp)
    assert(got.values.sum == days.size.toLong * 64L, "cell conservation")
  }

  test("ev_value_hist: bit-length buckets bound their extremes, totals conserve") {
    val got = Relational.evValueHist(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (b, mn, mx) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert((1L << b) <= mn && mn <= mx && mx < (1L << (b + 1)),
        s"bucket $b bounds [$mn, $mx]")
    }
    val totalEvents = Tables.load(spark, sf, "events")
      .where(col("value").isNotNull &&
        (col("value").cast("decimal(18,2)") * 100).cast("bigint") > 0)
      .count()
    assert(got.map(_.getLong(2)).sum == totalEvents, "event conservation")
  }

  test("q_full_outer: day union conserved, flags consistent") {
    val got = Relational.qFullOuter(spark, sf).collect()
      .map(r => (r.getDate(0).toString,
        (r.getLong(1), r.getLong(2), r.getBoolean(3))))
    val oDays = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).cast("string")).collect()
      .map(_.getString(0)).toSet
    val sDays = Tables.load(spark, sf, "lineitem")
      .select(to_date(col("l_shipdate")).cast("string")).collect()
      .map(_.getString(0)).toSet
    assert(got.map(_._1).toSet == oDays.union(sDays), "full outer day union")
    got.foreach { case (d, (no, ns, both)) =>
      assert(both == (oDays.contains(d) && sDays.contains(d)), s"$d flag")
      assert((no > 0) == oDays.contains(d) && (ns > 0) == sDays.contains(d),
        s"$d zero-fill")
    }
  }

  test("arr_cummax is the running max of the dense 2-d rows") {
    val rows = ArrayQueries.eventsArray2dCached(spark, sf).rows2d.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
      .toMap
    val got = ArrayQueries.arrCummax(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
    assert(got.nonEmpty && got.length == rows.size)
    got.groupBy(g => (g._1._1, g._1._2)).foreach { case ((t, i), line) =>
      var run = Double.NegativeInfinity
      line.sortBy(_._1._3).foreach { case ((_, _, j), v) =>
        run = math.max(run, rows((t, i, j)))
        assert(v == run, s"($t, $i, $j) running max")
      }
    }
  }

  test("ev_rfm: segments partition the users at the exact per-axis medians") {
    val got = Relational.evRfm(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // driver replay: per-user triples, medians as the ceil(n/2)-th
    // order statistic, the same threshold CASE
    val pu = events.groupBy(_._1).toSeq.map { case (u, evs) => u -> evs.size.toLong }
    val vals = Tables.load(spark, sf, "events")
      .groupBy(col("user_id").cast("long").as("u"))
      .agg(max(to_date(col("ts"))).as("last"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("bigint")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val horizon = vals.map(_._2).max
    val triples = vals.map { case (u, last, cents) =>
      (u, java.time.temporal.ChronoUnit.DAYS.between(last, horizon),
        pu.toMap.apply(u), cents)
    }
    def med(xs: Seq[Long]): Long = xs.sorted.apply(math.ceil(xs.size / 2.0).toInt - 1)
    val (mr, mf, mm) =
      (med(triples.map(_._2).toSeq), med(triples.map(_._3).toSeq), med(triples.map(_._4).toSeq))
    val exp = triples.groupBy { case (_, r, f, m) =>
      (if (r <= mr) "R" else "r") + (if (f > mf) "F" else "f") +
        (if (m > mm) "M" else "m")
    }.map { case (seg, vs) =>
      seg -> ((vs.size.toLong, vs.map(_._2).max, vs.map(_._3).sum, vs.map(_._4).sum))
    }
    assert(got == exp)
    assert(got.values.map(_._1).sum == triples.size.toLong, "users partitioned")
  }

  test("arr_spectrum_np2 is |X|^2 of the Bluestein transform, one-sided") {
    val x = ArrayQueries.arrFftNp2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    val p = ArrayQueries.arrSpectrumNp2(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(p.nonEmpty && p.forall(_._1._2 <= 24))
    p.foreach { case ((t, u), pow) =>
      val (re, im) = x((t, u))
      assert(pow == re * re + im * im, s"($t, $u)")
    }
    // Parseval across the np2 chain: sum |X|^2 == n * sum x^2 to rounding
    val n = 48
    val byT = x.groupBy(_._1._1)
    val cells = ArrayQueries.eventsArray48Cached(spark, sf).rowsNd.collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    byT.foreach { case (t, bins) =>
      val lhs = bins.values.map { case (re, im) => re * re + im * im }.sum
      val rhs = n.toDouble * cells.filter(_._1 == t).map(v => v._2 * v._2).sum
      assert(math.abs(lhs - rhs) <= 1e-6 * math.max(1.0, rhs), s"Parseval t=$t")
    }
  }

  test("pipe_curriculum: quartile budgets conserve the corpus and order by quality") {
    val got = operators.Pipeline.pipeCurriculum(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // straight-line replay from the oracle-gated quality face
    val sq = TextAnalysis.txtQuality(spark, sf).collect()
      .map(r => (r.getLong(1), math.floor(r.getDouble(4) * 1000).toLong))
    val n = sq.length
    val sorted = sq.map(_._2).sorted
    def cut(p: Double) = sorted(math.ceil(n * p).toInt - 1)
    val (c25, c50, c75) = (cut(0.25), cut(0.50), cut(0.75))
    val exp = sq.groupBy { case (_, s) =>
      if (s > c75) 0L else if (s > c50) 1L else if (s > c25) 2L else 3L
    }.map { case (ph, vs) =>
      ph -> ((vs.size.toLong, vs.map(_._1).sum,
        vs.map(_._2).min, vs.map(_._2).max))
    }
    assert(got == exp)
    // conservation + monotone quality: every doc lands in exactly one
    // phase, and phase k's max quality never exceeds phase k-1's min
    assert(got.values.map(_._1).sum == n.toLong)
    val phases = got.keys.toSeq.sorted
    phases.sliding(2).foreach {
      case Seq(a, b) => assert(got(b)._4 <= got(a)._3,
        s"phase $b quality overlaps phase $a")
      case _ =>
    }
  }

  test("txt_langid_conf: matrix equals the grouped per-doc predictions, rows sum to 1") {
    val per = TextAnalysis.txtLangid(spark, sf).collect()
      .map(r => (r.getString(2), r.getString(1)))
    val exp = per.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = TextAnalysis.txtLangidConf(spark, sf).collect()
    assert(got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap == exp)
    got.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val tot = rows.map(_.getLong(2)).sum
      rows.foreach(r => assert(r.getDouble(3) == r.getLong(2).toDouble / tot.toDouble,
        s"$lang share"))
    }
    assert(got.map(_.getLong(2)).sum == per.length.toLong, "conservation")
  }

  test("sim_sign_hamming equals a driver sign-signature Hamming replay") {
    val embs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => if (v.toDouble > 0.0) 1 else 0).toArray)
    val probes = embs.filter(_._1 < 5)
    val exp = (for ((p, ps) <- probes; (id, s) <- embs if id != p) yield {
      val h = ps.zip(s).map { case (a, b) => math.abs(a - b) }.sum
      (p, (h / 8).toLong, h)
    }).groupBy(t => (t._1, t._2)).map { case (k, v) =>
      k -> ((v.size.toLong, v.map(_._3).min.toLong, v.map(_._3).max.toLong))
    }
    val got = graft.operators.Similarity.simSignHamming(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp)
  }

  test("smp_weighted: acceptance replays through the JVM hash twin, mass bounded") {
    val scores = TextAnalysis.txtQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pp = Relational.SkP.toDouble * Relational.SkP.toDouble
    val exp = docs.groupBy(_._2).map { case (src, ds) =>
      val rows = ds.map { case (id, _) =>
        val sc = scores(id)
        val kept = Relational.permHash62L(id) < math.floor(sc * pp).toLong
        (kept, math.floor(sc * 1000).toLong)
      }
      src -> ((rows.size.toLong, rows.count(_._1).toLong,
        rows.filter(_._1).map(_._2).sum, rows.map(_._2).sum))
    }
    val got = graft.operators.Pipeline.smpWeighted(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp)
    // weighted sampling keeps quality mass at least proportionally:
    // kept fraction of quality mass >= kept fraction of docs (high-score
    // docs are MORE likely kept)
    val (nd, nk, kq, tq) = got.values
      .foldLeft((0L, 0L, 0L, 0L)) { case ((a, b, c, d), (w, x, y, z)) =>
        (a + w, b + x, c + y, d + z) }
    assert(nk > 0 && nk < nd, "non-degenerate sample")
    assert(kq.toDouble / tq.toDouble >= nk.toDouble / nd.toDouble - 0.05,
      "quality mass tracks acceptance probability")
  }

  test("arr_interp equals the lead-pair replay over the engine's own dense rows") {
    val dense = ArrayQueries.eventsArray1dCached(spark, sf).rowsNd.collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
    val got = ArrayQueries.arrInterp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exp: Map[(Long, Double), Double] = dense.groupBy(_._1).flatMap { case (u, vs) =>
      val o = vs.sortBy(_._2)
      o.zip(o.tail).map { case ((_, t0, v0), (_, t1, v1)) =>
        (u, t0.toDouble + (t1 - t0).toDouble * 0.25) -> (v0 + (v1 - v0) * 0.25)
      }
    }
    assert(got == exp)
  }
}
