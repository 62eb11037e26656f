package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Joins}

/** VERDICT r15 next-round item 6: empirical scale-claim checks for the
  * dedup/ANN families beyond sf0.1 — adversarially duplicated and
  * hot-keyed fixtures 10-100x the bench corpus, asserting ROW COUNTS
  * per stage (the O(distinct)/output-bounded claims), never wall time.
  * Testdata is read-only and capped at sf0.1; these corpora are
  * spec-local and deterministic. */
class ScaleStressSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  test("minhash LSH compute tracks DISTINCT content under 100x duplication") {
    // 500 distinct documents (disjoint vocabularies), each duplicated
    // 100x -> 50k docs, 100x the sf0.01 corpus. The claim (SURVEY §4):
    // the band self-join runs on distinct signatures; member pairs are
    // expansion-only (output-bound).
    val nDistinct = 500
    val dup = 100
    val docs = spark.range(nDistinct.toLong * dup)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit(s"w${j}_"), (col("id") % nDistinct).cast("string"))): _*)
          .as("text"))
      .withColumn("hs", org.apache.spark.sql.graftexpr.TextExpressions
        .hashWordNgrams(col("text"), 3))
      .select("doc_id", "hs")
    val sigs = Dedup.withReps(docs)
    // stage bound: the signature-group collapse leaves <= nDistinct
    // representatives — the band join's ENTIRE input is reps x bands
    val nReps = sigs.filter(col("doc_id") === col("rep")).count()
    assert(nReps <= nDistinct.toLong, s"$nReps reps for $nDistinct contents")
    // output bound: disjoint vocabularies -> candidates are exactly the
    // within-group pairs; the 2.475M pairs ARE the answer
    val pairs = Dedup.lshCandidates(docs).count()
    val want = nDistinct.toLong * (dup.toLong * (dup - 1) / 2)
    assert(pairs == want, s"pairs $pairs != within-group $want")
  }

  test("simhash histogram is group-product exact under a 5000x hot signature") {
    // one signature duplicated 5000x + 2000 distinct signatures: the
    // pair count at hamming 0 must be C(5000,2) WITHOUT any stage
    // materializing the 12.5M member pairs (output is a histogram; the
    // group relation the band join consumes is 2001 rows)
    val hot = 0x123456789abcdL & ((1L << 60) - 1)
    val rng = spark.range(2000)
      .select((abs(hash(col("id"))).cast("bigint") * 1048583L + col("id"))
        .mod(1L << 60).as("sig"))
      .filter(col("sig") =!= hot)
    val sigs = rng.union(
      spark.range(5000).select(lit(hot).as("sig")))
    val nGroups = sigs.select("sig").distinct().count()
    assert(nGroups <= 2001L)
    val hist = Dedup.simhashHistogram(sigs.select("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val withinHot = 5000L * 4999L / 2
    assert(hist.getOrElse(0L, 0L) >= withinHot,
      s"hamming-0 pairs ${hist.get(0L)} lost the hot group's $withinHot")
    // distinct sigs are pseudo-random 60-bit values: any hamming<=3
    // cross pair would need a ~miracle collision; the histogram's 0-row
    // must be EXACTLY the group products of duplicated signatures
    assert(hist(0L) == withinHot,
      s"hamming-0 ${hist(0L)} != group-product $withinHot")
  }

  test("embedding near-dup pairs are exact under a 1000x hot bucket") {
    // three orthogonal directions x 1000 copies: every direction's
    // copies land in ONE hyperplane bucket (the adversarial crowded
    // cell); within-direction cos = 1, cross-direction cos = 0 (dies at
    // the 0.3 gate). The crowded cells stay exact — output is exactly
    // 3 x C(1000,2) pairs (the skew SPLIT machinery itself is
    // row-bounded in the next test; 1000 rows sits below SkewCap by
    // design, so this asserts the no-split path's correctness under
    // crowding while the split path's spread is asserted separately).
    val dirs = Seq(
      Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    val rows = for (d <- dirs.indices; i <- 0 until 1000)
      yield ((d * 1000 + i).toLong, "L", dirs(d).toSeq)
    val df = rows.toDF("vec_id", "label", "emb")
    val pairs = Dedup.embedNearPairs(df, depth = 2)
    val want = 3L * (1000L * 999L / 2)
    assert(pairs.count() == want)
  }

  test("line-dedup state is O(distinct lines) under 100x duplication") {
    // 200 distinct 5-line documents, each duplicated 100x -> 20k docs /
    // 100k line occurrences but only 1000 distinct normalized lines.
    // Claims (VERDICT r16 #3): the occurrence relation — the family's
    // only corpus-keyed shuffle — is bounded by DISTINCT lines, the
    // keep-first rule keeps exactly one occurrence per duplicated line,
    // and per-doc output rows = #docs regardless of duplication.
    val nDistinct = 200
    val dup = 100
    val docs = spark.range(nDistinct.toLong * dup)
      .select(col("id").as("doc_id"),
        concat_ws("\n", (0 until 5).map(j =>
          concat(lit(s"line $j of doc "), (col("id") % nDistinct).cast("string"))): _*)
          .as("text"))
    val lines = Dedup.lineRelOf(docs)
    val occ = Dedup.lineOccurrences(lines)
    val nOcc = occ.count()
    assert(nOcc == nDistinct.toLong * 5, s"occ rows $nOcc != distinct lines ${nDistinct * 5}")
    // every line occurs exactly dup times; keep-first drops dup-1 each
    val occRows = occ.collect()
    assert(occRows.forall(_.getAs[Long]("n_occ") == dup.toLong))
    // conservation: total occurrences == total lines; dropped = all but
    // one occurrence per distinct line
    val totalLines = lines.count()
    assert(totalLines == nDistinct.toLong * dup * 5)
    val dropped = totalLines - nOcc
    assert(dropped == nDistinct.toLong * 5 * (dup - 1))
  }

  test("GramLong moments: correct at 100k rows, plan has no join/explode (one agg pass)") {
    // the emb_gram posture claim (SURVEY §2.E): wire cost independent
    // of row count — one aggregate, one exchange, no Generate, no Join.
    // 100k deterministic 8-dim integer vectors; the exact reference is
    // computed from the generator's closed form.
    val dim = 8
    val n = 100000L
    val df = spark.range(n).select(
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(lit(0), lit(dim - 1)),
        d => (col("id") + d.cast("bigint")) % 7L).as("q"))
    val agg = df.agg(org.apache.spark.sql.graftexpr.SketchExpressions
      .gramLong(col("q"), dim).as("gb"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"no join in:\n$plan")
    assert(!plan.contains("Generate"), s"no explode in:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"exactly ONE exchange (the partial->final agg):\n$plan")
    val buf = agg.collect().head.getSeq[Long](0)
    assert(buf.length == dim * dim + dim + 1)
    assert(buf.last == n, "count cell")
    // exact reference from the generator
    val ref = Array.ofDim[Long](dim, dim)
    val sums = new Array[Long](dim)
    var id = 0L
    while (id < n) {
      val q = Array.tabulate(dim)(d => (id + d) % 7L)
      var i = 0
      while (i < dim) {
        sums(i) += q(i)
        var j = 0
        while (j < dim) { ref(i)(j) += q(i) * q(j); j += 1 }
        i += 1
      }
      id += 1L
    }
    for (i <- 0 until dim; j <- 0 until dim)
      assert(buf(i * dim + j) == ref(i)(j), s"gram ($i,$j)")
    for (i <- 0 until dim)
      assert(buf(dim * dim + i) == sums(i), s"sum $i")
  }

  test("ExactSubstr state is O(distinct grams) under 100x duplication") {
    // 300 distinct 16-word documents (disjoint vocabularies), each
    // duplicated 100x. Claims: the occurrence aggregate holds one row
    // per DISTINCT gram (9 per distinct doc), every non-first copy is
    // cut whole as ONE span, and the keep-first copy survives intact.
    val nDistinct = 300
    val dup = 100
    val docs = spark.range(nDistinct.toLong * dup)
      .select(col("id").as("doc_id"), lit("s").as("source"),
        concat_ws(" ", (0 until 16).map(j =>
          concat(lit(s"w${j}_"), (col("id") % nDistinct).cast("string"))): _*)
          .as("text"))
    val perDoc = Dedup.substrPerDocOf(Dedup.substrGramRelOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val rows = perDoc.collect()
    assert(rows.length == nDistinct * dup)
    // keep-first (doc_id < nDistinct under id%nDistinct content) intact
    val kept = rows.filter(_.getAs[Long]("rm_words") == 0L)
    val cut = rows.filter(_.getAs[Long]("rm_words") > 0L)
    assert(kept.length == nDistinct, s"${kept.length} untouched keep-firsts")
    assert(kept.forall(_.getAs[Long]("doc_id") < nDistinct.toLong))
    assert(cut.length == nDistinct * (dup - 1))
    assert(cut.forall(r => r.getAs[Long]("n_spans") == 1L &&
      r.getAs[Long]("rm_words") == 16L && r.getAs[Long]("kept_words") == 0L))
  }

  test("token-granularity ExactSubstr spans hold under 100x duplication") {
    // the dd_substr_tok machinery (the word pass parameterized at a
    // different gram size) on a 100x-duplicated token corpus: state is
    // O(distinct grams), keep-first survives, every copy cuts whole —
    // the word-level stress carried to the re-keyed face.
    val nDistinct = 100
    val dup = 100
    val n = 3
    val docs = spark.range(nDistinct.toLong * dup)
      .select(col("id").as("doc_id"), lit("s").as("source"),
        concat_ws(" ", (0 until 8).map(j =>
          concat(lit(s"t${j}_"), (col("id") % nDistinct).cast("string"))): _*)
          .as("text"))
    val rel = docs.select(col("doc_id"), col("source"),
      org.apache.spark.sql.graftexpr.TextExpressions
        .hashWordNgramsSeq(col("text"), n).as("raw"))
      .select(col("doc_id"), col("source"),
        element_at(col("raw"), 1).as("n_words"),
        slice(col("raw"), lit(2), greatest(size(col("raw")) - 1, lit(0))).as("gs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spans = Dedup.substrSpansOf(rel, n)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("s"), r.getAs[Long]("e"))))
    rel.unpersist(blocking = false)
    // exactly one whole-doc span per non-keep-first copy
    assert(spans.length == nDistinct * (dup - 1))
    assert(spans.forall { case (_, (s, e)) => s == 0L && e == 8L })
    assert(spans.forall(_._1 >= nDistinct.toLong), "keep-firsts untouched")
  }

  test("GramWide is exact where GramLong's checked accumulation fails loudly") {
    // VERDICT r17 #3: the documented DECIMAL(38,0) widening, as code.
    // dim=1 vectors of 2^31 -> each product is 2^62; three rows sum to
    // 3*2^62 > Long.MaxValue, so GramLong's addExact must THROW and
    // GramWide must return the exact BigInt sum through decimal(38,0).
    val dim = 1
    val v = 1L << 31
    val n = 3L
    val df = spark.range(n).select(array(lit(v)).as("q"))
    val wide = df.agg(org.apache.spark.sql.graftexpr.SketchExpressions
      .gramWide(col("q"), dim).as("gb")).collect().head
      .getSeq[java.math.BigDecimal](0)
    val ref = BigInt(v) * BigInt(v) * n
    assert(BigInt(wide.head.toBigInteger) == ref, s"gram cell ${wide.head} != $ref")
    assert(BigInt(wide(1).toBigInteger) == BigInt(v) * n, "sum cell")
    assert(BigInt(wide(2).toBigInteger) == BigInt(n), "count cell")
    val thrown = intercept[Exception] {
      df.agg(org.apache.spark.sql.graftexpr.SketchExpressions
        .gramLong(col("q"), dim).as("gb")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(causes(thrown).exists(_.isInstanceOf[ArithmeticException]),
      s"expected a loud ArithmeticException, got $thrown")
  }

  test("GramWide == GramLong on in-range data; NULL component fails loudly in both") {
    val dim = 4
    val df = spark.range(1000).select(
      transform(sequence(lit(0), lit(dim - 1)),
        d => (col("id") * 3 + d.cast("bigint")) % 101L).as("q"))
    val narrow = df.agg(org.apache.spark.sql.graftexpr.SketchExpressions
      .gramLong(col("q"), dim).as("gb")).collect().head.getSeq[Long](0)
    val wide = df.agg(org.apache.spark.sql.graftexpr.SketchExpressions
      .gramWide(col("q"), dim).as("gb")).collect().head
      .getSeq[java.math.BigDecimal](0)
    assert(narrow.length == wide.length)
    narrow.zip(wide).zipWithIndex.foreach { case ((l, d), i) =>
      assert(BigInt(d.toBigInteger) == BigInt(l), s"cell $i: $d != $l")
    }
    // a NULL component (e.g. a null embedding value surviving a cast)
    // must fail loudly, not read as 0 (ADVICE r17 #3)
    val nullDf = spark.range(3).select(
      array(lit(1L), when(col("id") === 1, lit(null).cast("long"))
        .otherwise(lit(2L)), lit(3L), lit(4L)).as("q"))
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    for (agg <- Seq(
        org.apache.spark.sql.graftexpr.SketchExpressions.gramLong(col("q"), dim),
        org.apache.spark.sql.graftexpr.SketchExpressions.gramWide(col("q"), dim))) {
      val t = intercept[Exception] { nullDf.agg(agg.as("gb")).collect() }
      assert(causes(t).exists(c => c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("NULL component")), s"expected loud NULL failure, got $t")
    }
  }

  test("skewBound spreads a 50k-row hot key into ~n/cap bounded cells") {
    val cap = 512
    val hotN = 50000L
    val df = spark.range(hotN).select(lit("HOT").as("k"), col("id"))
      .union(spark.range(1000).select(
        concat(lit("c"), (col("id") % 100).cast("string")).as("k"), col("id")))
    val (s, r) = Joins.skewBound(df, df, Seq("k"), Seq("k"), hash(col("id")), cap = cap)
    val m = math.ceil(hotN.toDouble / cap).toInt
    // the salted side's hot key spreads over exactly m splits...
    val splits = s.filter(col("k") === "HOT").select("__split").distinct().count()
    assert(splits == m.toLong, s"hot key spread over $splits cells, want $m")
    // ...and no (key, split) reduce cell holds more than ~2x cap rows
    // (pmod of a hash is near-uniform, never exact)
    val maxCell = s.groupBy("k", "__split").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxCell <= 2L * cap, s"a reduce cell holds $maxCell rows (cap $cap)")
    // the replicated side mirrors the spread: every hot row appears m
    // times (once per split), non-hot rows once
    val hotRepl = r.filter(col("k") === "HOT").count()
    assert(hotRepl == hotN * m, s"replicated hot rows $hotRepl != ${hotN * m}")
    val coldRepl = r.filter(col("k") =!= "HOT").count()
    assert(coldRepl == 1000L, s"non-hot rows must not replicate: $coldRepl")
  }
}
