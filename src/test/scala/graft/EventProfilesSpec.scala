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
