package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{hash60, hitCount, shingles, tokens}
import graft.sources.Tables
import graft.operators.Persists.PersistOps

/** SURVEY §2.F/§2.D composite — the end-to-end training-data cleaning
  * pass every LLM corpus pipeline runs before tokenization: per-document
  * quality metrics -> quality gate -> exact dedup (keep the lowest
  * doc_id per content hash) -> per-source yield report. The reference
  * has no single analog; this is the composition its operators exist
  * for, expressed as one declarative plan.
  *
  * Scale posture: metrics are a narrow scan (one pass, no UDFs); the
  * gate is a filter; dedup is an unordered window-min keyed by the
  * 128-bit content hash (partition width = one document's duplicate
  * multiplicity, never corpus-sized) — no corpus broadcast, and one
  * corpus scan instead of the groupBy+join-back's two; the summary is
  * a partial-agg rollup. Everything shuffles O(n) rows at most twice,
  * keyed by hash then by source.
  */
object Pipeline {

  private val STOP_EN = Seq("the", "a", "and", "of", "to", "in", "is")

  def pipeClean(s: SparkSession, dir: String): DataFrame =
    pipeClean(s, dir, classifierGate = false)

  /** The persisted quality-flagged metric relation `(doc_id, source,
    * n_tokens, stop_ratio, mean_tok_len, fp, lowq [, clf_margin])` —
    * ONE corpus tokenize pass shared by [[pipeClean]] and the composite
    * [[pipeE2e]] (CacheManager dedups the entry, so the two faces can
    * never disagree on a document's gate verdict). n_tokens < 5 is
    * checked first so empty documents are low-quality regardless of
    * their NULL ratios (three-valued OR: true wins). Persisted: the
    * relation is narrow (7 scalar columns, no text/token arrays) and
    * feeds several aggregate branches — without the cache boundary each
    * branch re-scans AND re-tokenizes the corpus, and the !lowq gate
    * pushes tokenizer-inlined predicates into the scan (plan-dump
    * verified). */
  private[graft] def qualityFlagged(s: SparkSession, dir: String,
      classifierGate: Boolean = false): DataFrame = {
    val nTok = size(col("tk")).cast("double")
    val stop = hitCount(col("tk"), STOP_EN).cast("double")
    val charSum = org.apache.spark.sql.graftexpr.TextExpressions.tokenCharSum(col("tk"))
    val marginCols: Seq[org.apache.spark.sql.Column] =
      if (!classifierGate) Nil
      else {
        val (w, b) = TextAnalysis.trainedClassifier(s, dir)
        Seq(TextAnalysis.clfMarginCol(w, b, col("tk")).as("clf_margin"))
      }
    val m = Tables.load(s, dir, "documents")
      .withColumn("tk",
        org.apache.spark.sql.graftexpr.TextExpressions.wordNgrams(col("text"), 1))
      .select(Seq(
        col("doc_id"), col("source"),
        size(col("tk")).cast("bigint").as("n_tokens"),
        (stop / nTok).as("stop_ratio"),
        (charSum.cast("double") / nTok).as("mean_tok_len"),
        md5(col("text")).as("fp")) ++ marginCols: _*)
    val heurLowq =
      col("n_tokens") < 5 || col("stop_ratio") > 0.5 || col("mean_tok_len") > 12.0
    m.withColumn("lowq",
      if (classifierGate) heurLowq || col("clf_margin") <= 0L else heurLowq)
      .cachedPersist()
  }

  /** `classifierGate = true` adds the [[TextAnalysis.txtClassifierScore]]
    * trained-model filter beside the heuristics (the production curation
    * posture: rules AND model must both pass) — a document whose margin
    * is <= 0 is low-quality even if every rule passes. The margin is the
    * same narrow integer fold the classifier query ships, computed in
    * the SAME single tokenize pass (no extra scan); the default path is
    * byte-identical to the ungated plan, so the oracle-gated `pipe_clean`
    * face is untouched. Gate composition is spec-gated (ClassifierSpec). */
  def pipeClean(s: SparkSession, dir: String, classifierGate: Boolean): DataFrame = {
    val flagged = qualityFlagged(s, dir, classifierGate)
    val keepers = flagged.filter(!col("lowq"))
    // keep-min-id per content hash via an unordered window min: one scan
    // and one exchange keyed by fp, where a groupBy+join-back would scan
    // (and tokenize) the corpus twice. Partition width = the duplicate
    // multiplicity of ONE document's content, so the window is bounded
    // by dup cardinality, never by corpus size.
    val marked = keepers
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .withColumn("dup", col("doc_id") =!= col("keep_id"))
    val stats = flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("lowq"), 1L).otherwise(0L)).as("n_lowq"))
    val kept = marked.groupBy("source").agg(
      sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup"),
      sum(when(!col("dup"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(!col("dup"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
    stats.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_lowq"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  /** Deterministic stratified sampling: keep a document iff the hex md5
    * of its id sorts below the stratum's threshold — a pure narrow
    * filter (no shuffle, no RNG state), reproducible across engines and
    * across runs, which is what a 100 TB sampling pass needs (Spark's
    * `sample()` is seed-stable per partition but not partition-layout
    * stable). Rates: src0 2/16, src1 4/16, src2 8/16, rest 1/16. */
  def smpStratified(s: SparkSession, dir: String): DataFrame = {
    val threshold = when(col("source") === "src0", "2")
      .when(col("source") === "src1", "4")
      .when(col("source") === "src2", "8")
      .otherwise("1")
    Tables.load(s, dir, "documents")
      .filter(md5(col("doc_id").cast("string")) < threshold)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Tokens per packed training sequence in [[pipePackMap]]. */
  val PackSeqTokens = 2048L

  /** The APPLY-TIME packing map — [[pipeShuffle]]'s companion and the
    * face [[pipePack]]'s sizing report exists for: concatenate the
    * shuffled corpus and cut every [[PackSeqTokens]] tokens (documents
    * span cuts, the standard packing rule), emitting per document its
    * epoch position, global token offset and the first/last training
    * sequence it lands in — exactly what a sequence writer consumes.
    *
    * Scale spelling — the [[pipeShuffle]] bucket discipline extended
    * to the RUNNING SUM: per-bucket TOKEN totals aggregate map-side to
    * B rows, their exclusive prefix is a B-entry driver literal map,
    * and the within-bucket running sum is a window over n/B-row
    * partitions (exclusive frame, coalesced to 0) — the cumsumRows
    * carry posture relationally; no task ever scans the corpus's
    * token stream sequentially. Zero-token documents sit AT their
    * offset with an empty span (first_seq = last_seq = the cut their
    * boundary falls in). */
  def pipePackMap(s: SparkSession, dir: String): DataFrame = {
    val b = ShuffleBuckets
    val toks = tokenizedDocs(s, dir)
      .select(col("doc_id"), size(col("tk")).cast("bigint").as("n_tokens"))
    val docs = toks
      .select(col("doc_id"), col("n_tokens"),
        Relational.permHash62(col("doc_id")).as("h"))
      .withColumn("b", col("h") % lit(b.toLong))
    val sums = docs.groupBy("b").agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0 until b).scanLeft(0L) {
      case (acc, bb) => acc + sums.getOrElse(bb.toLong, 0L)
    }
    val offMap = map((0 until b).flatMap(bb =>
      Seq(lit(bb.toLong), lit(offsets(bb)))): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("b").orderBy("h", "doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val iDiv = org.apache.spark.sql.graftexpr.SketchExpressions.intDiv _
    docs
      .withColumn("tok_start",
        try_element_at(offMap, col("b")) +
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("tok_start"),
        iDiv(col("tok_start"), PackSeqTokens).as("first_seq"),
        when(col("n_tokens") > 0L,
          iDiv(col("tok_start") + col("n_tokens") - 1L, PackSeqTokens))
          .otherwise(iDiv(col("tok_start"), PackSeqTokens)).as("last_seq"))
      .orderBy("doc_id")
  }

  /** How many documents [[smpFixedK]] holds out per source. */
  val FixedKPerSource = 8

  /** Deterministic FIXED-SIZE per-source holdout — the eval-set
    * selection a training pipeline pins before every run: the k
    * documents with the SMALLEST 62-bit permutation row hash per source
    * (the [[graft.operators.Relational.qApproxSketch]] bottom-k-by-hash
    * machinery as a sampling face). Unlike [[smpSplit]]'s
    * threshold-hash split (fixed FRACTION, membership stable under
    * appends), bottom-k gives a fixed COUNT: membership depends only
    * on the corpus SET (merge-order invariant, no RNG, no engine
    * state), so any two runs — or two engines — select the identical
    * holdout.
    *
    * Two-step spelling, exact at ANY id scale: the KMinHash aggregate
    * collects the k smallest DISTINCT hashes per source (one ≤ k-long
    * buffer per source per partition), then the ≤ k·|sources|-row hash
    * set broadcast-joins back to the corpus to recover the EXACT ids —
    * routing ids through a double value channel would silently round
    * past 2⁵³ at true scale. The broadcast is fact-derived but bounded
    * by k·|sources| by construction (PlanShapeSpec-declared); the rank
    * window partitions hold ≤ k rows. Membership semantics under a
    * 62-bit hash COLLISION: the digit-vector hash has no deterministic
    * collision structure over int64 keys (ADVICE r18 — the earlier
    * x-mod-p permutation collided with CERTAINTY for keys a multiple
    * of 2³¹−1 apart, so "uniform" samples biased past ~2³¹ ids), and
    * a random collision involving the k per-source sample WINNERS
    * needs some corpus key to hit one of the k retained hash values:
    * P ≈ k·n/p² — at 10¹² docs and k = 1024 that is ~2×10⁻⁴ (corpus-
    * wide collisions elsewhere shave the KMV distinct count by only
    * ~n²/2⁶³ relative ≈ 10⁻⁷, noise against the 1/√k ≈ 3% bound).
    * If one occurs, every id
    * whose hash lands in the k-smallest-distinct set is admitted
    * (deterministic, possibly k+collisions rows), where the oracle's
    * row_number spelling keeps exactly k — the two coincide absent
    * collisions. */
  def smpFixedK(s: SparkSession, dir: String): DataFrame = {
    val k = FixedKPerSource
    val docs = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        Relational.permHash62(col("doc_id")).as("h"))
    val hs = docs.groupBy("source")
      .agg(org.apache.spark.sql.graftexpr.SketchExpressions
        .kMinHash(col("h"), k).as("hs"))
      .select(col("source"), explode(col("hs")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    docs.join(broadcast(hs), Seq("source", "h"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .select(col("source"), col("rk"), col("doc_id"))
      .orderBy("source", "rk")
  }

  /** Deterministic train/val/test split by hash of the document id —
    * the assignment every training pipeline needs before packing: stable
    * across runs, engines and partition layouts (no RNG state), and a
    * pure narrow map; only the 3-row summary aggregate shuffles. Split
    * fractions come from the first md5 hex digit: 8/16 train, 4/16 val,
    * 4/16 test. */
  def smpSplit(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    Tables.load(s, dir, "documents")
      .withColumn("split",
        when(h < "8", "train").when(h < "c", "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .orderBy("split")
  }

  /** Per-source quota sampling (domain capping, the curation step that
    * stops one crawl domain from dominating the mix): keep at most 15
    * docs per source, chosen by hash order (unbiased, deterministic).
    * Routed through the native bounded-heap [[TopKPerKey]] operator —
    * O(n log k) per partition with a partial pass before the exchange,
    * so the shuffle moves at most k rows per (source, input partition),
    * never the full corpus; the window row_number spelling would sort
    * every source's whole group. */
  def smpSourceCap(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.load(s, dir, "documents")
      .withColumn("hk", md5(col("doc_id").cast("string")))
      .select("doc_id", "source", "hk")
    org.apache.spark.sql.graftexpr.TopKPerKey
      .perKey(scored, Seq("source"), Seq(("hk", true), ("doc_id", true)), 15)
      .select(col("doc_id"), col("source"))
      .orderBy("source", "doc_id")
  }

  /** Deterministic mixture resampling — the domain-reweighting pass that
    * turns a crawled corpus into a target training mixture (src0 30%,
    * src1 15%, src2 10%, the rest sharing 45%): each source keeps
    * `least(1, w·N/n_src)` of its documents (downsampling the
    * overrepresented, keeping all of the underrepresented), selected by
    * a pure hash threshold on the doc id — reproducible across engines,
    * runs and partition layouts, with no RNG state. Scale posture: the
    * per-source keep fraction comes from a dimension-sized aggregate
    * (O(#sources) rows) broadcast onto the corpus scan; the filter is a
    * narrow map, and only the per-source yield rollup shuffles. */
  /** The O(#sources) per-source doc-count relation [[pipeMix]] and
    * [[smpTemperature]] both weight from — persisted (r21): each face
    * referenced it twice in one plan (fracs broadcast + final report)
    * and re-ran the corpus scan + agg per reference, and the two faces
    * build the IDENTICAL plan, so one persisted instance serves all
    * four references across both queries (guide §5
    * reuse-don't-recompute; the relation is dimension-sized). */
  private def sourceCounts(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select("doc_id", "source")
      .groupBy("source").agg(count(lit(1)).as("n_src"))
      .cachedPersist()

  def pipeMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "source")
    val counts = sourceCounts(s, dir)
    val fracs = mixKeepFracs(counts)
    val kept = docs
      .join(broadcast(fracs.select("source", "keep_frac")), Seq("source"))
      .filter(pmod(hash60(col("doc_id").cast("string")), lit(10000L)) <
        floor(lit(10000.0) * col("keep_frac")).cast("bigint"))
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    fracs.select(col("source"), col("n_src").as("n_docs"), col("keep_frac"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("keep_frac"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** The mix recipe's per-source keep fractions over an O(#sources)
    * `(source, n_src)` counts relation — ONE spelling shared by
    * [[pipeMix]] and the e2e composite's re-based mix stage so the
    * weight chain can never drift between them: corpus total AND the
    * unnamed-source count via global windows over the counts relation
    * (a separate .agg would re-run the aggregate subtree), the 45%
    * rest share divided by the ACTUAL number of unnamed sources, and
    * `keep_frac = least(1, w·N/n_src)` (downsampling the
    * overrepresented, keeping all of the underrepresented). */
  private[graft] def mixKeepFracs(counts: DataFrame): DataFrame = {
    val named = col("source").isin("src0", "src1", "src2")
    val everything = org.apache.spark.sql.expressions.Window.partitionBy()
    val w = when(col("source") === "src0", 0.30)
      .when(col("source") === "src1", 0.15)
      .when(col("source") === "src2", 0.10)
      .otherwise(lit(0.45) / col("n_rest").cast("double"))
    counts
      .withColumn("n_total", sum(col("n_src")).over(everything))
      .withColumn("n_rest",
        sum(when(named, 0L).otherwise(1L)).over(everything))
      .withColumn("keep_frac",
        least(lit(1.0), w * col("n_total").cast("double") / col("n_src").cast("double")))
  }

  /** Temperature-scaled source mixing (α = 1/2) — the multinomial
    * mixture-weight recipe of the GPT-3/PaLM data-mixing literature:
    * source s is sampled with weight ∝ n_s^α, flattening the crawl's
    * natural distribution so head sources stop drowning the tail.
    * Cross-engine determinism: α = 1/2 makes the per-source weight a
    * single `sqrt` (correctly rounded IEEE in every engine, unlike
    * `pow`/`ln`), and the weight is quantized to floor(sqrt(n)·1e6)
    * BEFORE normalizing so the cross-source normalizer is an exact,
    * ORDER-FREE integer sum — a double Σ√n would make every weight
    * depend on the engines' summation order. Targeting half the corpus,
    * keep_frac = min(1, tgt·w/n_s) (downsampling heads, keeping tails
    * whole), and the document gate is the [[pipeMix]] posture: the
    * deterministic md5 hash threshold, O(#sources) fracs broadcast onto
    * a narrow corpus scan, one per-source rollup shuffle. */
  def smpTemperature(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "source")
    val counts = sourceCounts(s, dir) // shared persisted counts relation
    val everything = org.apache.spark.sql.expressions.Window.partitionBy()
    val fracs = counts
      .withColumn("q",
        floor(sqrt(col("n_src").cast("double")) * lit(1000000.0)).cast("bigint"))
      .withColumn("q_sum", sum(col("q")).over(everything))
      .withColumn("n_total", sum(col("n_src")).over(everything))
      .withColumn("tgt", floor(lit(0.5) * col("n_total").cast("double")))
      .withColumn("weight", col("q").cast("double") / col("q_sum").cast("double"))
      .withColumn("keep_frac",
        least(lit(1.0),
          col("tgt").cast("double") * col("weight") / col("n_src").cast("double")))
    val kept = docs
      .join(broadcast(fracs.select("source", "keep_frac")), Seq("source"))
      .filter(pmod(hash60(col("doc_id").cast("string")), lit(10000L)) <
        floor(lit(10000.0) * col("keep_frac")).cast("bigint"))
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    fracs.select(col("source"), col("n_src").as("n_docs"),
        col("weight"), col("keep_frac"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("weight"), col("keep_frac"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** Gopher-style repetition metrics: duplicate-trigram fraction and
    * top-token mass per document. Pure per-row array math (narrow scan);
    * the O(distinct·n) token-mode fold is bounded by document length,
    * not corpus size. */
  def txtRepetition(s: SparkSession, dir: String): DataFrame = {
    // One fused native pass per row
    // ([[org.apache.spark.sql.graftexpr.RepetitionStats]]): the prior
    // spelling tokenized every document THREE times (3-gram build,
    // 1-gram size, token-count pass). st = [n_tok, max_count, n_3grams,
    // n_distinct_3grams]; values identical to the oracle's HOF chain
    // (codegen subexpression elimination serves the repeated st refs
    // from one evaluation).
    val st = org.apache.spark.sql.graftexpr.TextExpressions
      .repetitionStats(col("text"))
    val nTok = element_at(col("st"), 1)
    val maxC = element_at(col("st"), 2)
    val n3 = element_at(col("st"), 3)
    val d3 = element_at(col("st"), 4)
    val dup3 = when(n3 > 0,
      lit(1.0) - d3.cast("double") / n3.cast("double")).otherwise(0.0)
    val topTok = when(nTok > 0,
      maxC.cast("double") / nTok.cast("double")).otherwise(0.0)
    Tables.load(s, dir, "documents")
      .transform(Present.spreadSorted("doc_id"))
      .withColumn("st", st)
      .select(col("doc_id"),
        dup3.as("dup3_frac"),
        topTok.as("top_tok_frac"),
        (dup3 > 0.2 || topTok > 0.3).as("is_repetitive"))
      .transform(Present.spreadSortedTail("doc_id"))
  }

  /** Cross-source leakage matrix: distinct 3-grams shared by each source
    * pair. One gram-keyed aggregate collapses each distinct gram to its
    * (tiny, ≤|sources|) source SET; unordered pairs expand from that
    * set, never from a join — no corpus broadcast, no all-pairs of
    * documents; output is O(|sources|²) rows. */
  def ddCrossSource(s: SparkSession, dir: String): DataFrame = {
    // grams travel as 60-bit hashes, not strings: the gram-keyed shuffle
    // moves ~8 bytes per gram instead of ~30-char strings. Collisions are
    // mirrored in the oracle (same md5 scheme both engines), so counts
    // stay hash-exact. Same trick as the dedup signature relation
    // (docShingles). Per-doc distinct (native one-pass gram hashing)
    // shrinks the explode.
    //
    // r21: the old spelling materialized distinct (source, g) [shuffle 1]
    // and self-joined it on g [shuffles 2+3] — three corpus-scale
    // exchanges of the gram relation. collect_set(source) IS the
    // distinct (dedup inside the aggregation buffer, partial-agg
    // map-side), so ONE gram-keyed exchange yields each gram's source
    // set; the ≤|sources|² pair expansion explodes the tiny set twice
    // and partial-aggregates to the O(|sources|²) matrix before the
    // last (tiny) exchange. Pair counts are identical: a pair (a,b)
    // counted per gram ⟺ both sources contain the gram — exactly the
    // old join+filter match set (guide §2.2 shuffle fewer bytes /
    // map-side aggregation).
    val bySrc = Tables.load(s, dir, "documents")
      .select(col("source"), explode(
        org.apache.spark.sql.graftexpr.TextExpressions
          .hashWordNgrams(col("text"), 3)).as("g"))
      .groupBy("g").agg(collect_set(col("source")).as("ss"))
    bySrc
      .select(explode(col("ss")).as("src_a"), col("ss"))
      .select(col("src_a"), explode(col("ss")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
      .transform(Present.sorted("src_a", "src_b"))
  }

  /** Benchmark-contamination check: fraction of each document's 3-grams
    * that appear in the benchmark set (here: the src0 slice). The
    * benchmark gram set is small by definition, so it broadcasts to a
    * left-semi join against the exploded corpus grams — the corpus side
    * stays distributed and is never collected or broadcast. */
  def txtContamination(s: SparkSession, dir: String): DataFrame =
    contamFracs(s, dir).orderBy("doc_id")

  /** [[txtContamination]]'s relation without the presentation order —
    * shared with the composite [[pipeE2e]], which joins `contam_frac`
    * onto its survivor set. */
  private def contamFracs(s: SparkSession, dir: String): DataFrame = {
    // grams stay STRINGS here, unlike ddCrossSource: the corpus side
    // never shuffles them (map-side partial agg after a broadcast join,
    // which hashes its keys natively), so md5-ing every gram costs far
    // more than the long keys would save — measured 6.4s -> 10.6s at
    // sf0.1 when hashed.
    val docs = Tables.load(s, dir, "documents")
      .withColumn("tk3",
        org.apache.spark.sql.graftexpr.TextExpressions.wordNgrams(col("text"), 3))
    val bench = docs.filter(col("source") === "src0")
      .select(explode(col("tk3")).as("g")).distinct()
      .withColumn("hit", lit(1))
    // One tokenize+shingle+hash pass over the rest of the corpus:
    // explode_outer keeps zero-gram documents and n_grams is recovered as
    // count(g) in the rollup — computing size(tk3) alongside the
    // generator would make CollapseProject inline (and re-evaluate) the
    // whole gram chain a second time per document.
    val grams = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), explode_outer(col("tk3")).as("g"))
    grams.join(broadcast(bench), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(col("g")).as("n_grams"), count(col("hit")).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        when(col("n_grams") > 0,
          col("n_contaminated").cast("double") / col("n_grams").cast("double"))
          .otherwise(0.0).as("contam_frac"))
  }

  /** Target documents per packing shard: sets how many hex digits of
    * the shard key [[pipePack]] keeps, so shard COUNT (16^digits) grows
    * with the corpus and the per-shard window never holds more than
    * ~16x this many documents. */
  val PackDocsPerShard = 64L

  /** Hash buckets of [[pipeShuffle]]'s deterministic permutation — a
    * DECLARED constant of the shuffle's identity (part of the order's
    * definition, like the hash constants): at production scale pick B
    * so buckets hold ~10⁷ rows and pin it per dataset release. */
  val ShuffleBuckets = 256

  /** Deterministic GLOBAL shuffle — the pass every training pipeline
    * runs before packing (epoch order must be pseudorandom yet
    * reproducible across reruns, engines and partition layouts): each
    * document's position in the shuffled epoch, defined as the rank
    * under the lexicographic key `(h mod B, h, doc_id)` with h the
    * 62-bit permutation row hash — equally pseudorandom as rank-by-h,
    * and chosen over it because the B-bucket split is DETERMINISTIC
    * (Spark's rangepartition boundaries are SAMPLED — a sort by raw h
    * would yield run-dependent partitioning work; the mod-bucket
    * spelling never samples).
    *
    * Scale spelling — no global window anywhere: per-bucket counts
    * aggregate map-side to B rows, the exclusive prefix over them is
    * a B-entry DRIVER artifact served back as a literal map
    * ([[TextAnalysis]]'s lm literal-map posture, `try_element_at`
    * under ANSI), and the rank window partitions by bucket — B tasks
    * of n/B rows, never one task sorting the corpus. Emits
    * (doc_id, pos, shard), shard = pos div [[PackDocsPerShard]] — the
    * shard files a writer would cut. */
  def pipeShuffle(s: SparkSession, dir: String): DataFrame =
    shuffledPositions(Tables.load(s, dir, "documents").select("doc_id"))
      .orderBy("doc_id")

  /** The deterministic epoch permutation over ANY `(doc_id, ...)`
    * relation — [[pipeShuffle]]'s engine, reused by the composite
    * [[pipeE2e]] chain over its final survivor corpus. */
  private def shuffledPositions(ids: DataFrame): DataFrame = {
    val b = ShuffleBuckets
    val docs = ids
      .select(col("doc_id"), Relational.permHash62(col("doc_id")).as("h"))
      .withColumn("b", col("h") % lit(b.toLong))
    val counts = docs.groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0 until b).scanLeft(0L) {
      case (acc, bb) => acc + counts.getOrElse(bb.toLong, 0L)
    }
    val offMap = map((0 until b).flatMap(bb =>
      Seq(lit(bb.toLong), lit(offsets(bb)))): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("b").orderBy("h", "doc_id")
    docs
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .select(col("doc_id"),
        (try_element_at(offMap, col("b")) + col("rk") - 1L).as("pos"))
      .select(col("doc_id"), col("pos"),
        org.apache.spark.sql.graftexpr.SketchExpressions
          .intDiv(col("pos"), PackDocsPerShard).as("shard"))
  }

  /** The staged relations of the end-to-end composite (shared by the
    * three pipe_e2e faces and the reconciliation spec): each stage's
    * survivor set, drop set and the mix fracs, built over the SAME
    * persisted relations the stage faces own ([[qualityFlagged]],
    * Dedup's verified-pairs / span map, [[contamFracs]]'s plan). */
  private[graft] final case class E2eStages(
      flagged: DataFrame, s1m: DataFrame, s2: DataFrame, losers: DataFrame,
      s3k: DataFrame, s4c: DataFrame, fracs: DataFrame, s5f: DataFrame,
      s6: DataFrame)

  /** Builds the composite chain: quality gate → exact dedup → MinHash
    * near-dedup (restricted to the surviving subgraph) → ExactSubstr
    * token cuts → decontamination vs the src0 benchmark → source mix
    * over the CURRENT survivor counts (VERDICT r19 next-round #2).
    *
    * Scale posture — pure composition of the stage faces' own scale
    * spellings: the quality/dedup relations are the persisted narrow
    * ones, near-dup edges are the persisted verified pairs SEMI-joined
    * to the survivor ids (shuffle-hash, linear), connected components
    * runs on the restricted subgraph only (O(near-dup docs), not
    * corpus), span cuts and contamination join back by doc_id, and the
    * mix fracs are an O(#sources) broadcast. Nothing corpus-wide is
    * collected; every stage shuffles O(survivors) rows at most once. */
  // Memoized per (session, dir) — the connected-components loop is a
  // driver-side iteration CacheManager can never dedup (the ccLabels
  // pattern), and three faces + the spec all read the same chain. The
  // build runs OUTSIDE any lock (it executes jobs); a lost race
  // recomputes once and leaks nothing. The FULL ccLabels freshness
  // discipline applies: entries are keyed by the documents table's
  // CONTENT fingerprint (an in-place refresh rebuilds instead of
  // serving a mixed-vintage chain), stopped-session entries are
  // evicted before a new insert (bench/probe session cycling can't
  // pin dead sessions), and unfingerprintable content never memoizes.
  private val e2eMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (String, E2eStages)]()

  private[graft] def e2eStages(s: SparkSession, dir: String): E2eStages =
    Tables.fingerprint(s, dir, "documents") match {
      case None => buildE2eStages(s, dir)
      case Some(fp) =>
        val k = (s, dir)
        Option(e2eMemo.get(k)) match {
          case Some((`fp`, hit)) => hit
          case _ =>
            val it = e2eMemo.keySet().iterator()
            while (it.hasNext) {
              if (it.next()._1.sparkContext.isStopped) it.remove()
            }
            val built = buildE2eStages(s, dir)
            e2eMemo.put(k, (fp, built))
            built
        }
    }

  private def buildE2eStages(s: SparkSession, dir: String): E2eStages = {
    val W = org.apache.spark.sql.expressions.Window
    val flagged = qualityFlagged(s, dir)
    val s1 = flagged.filter(!col("lowq"))
    // exact dedup among quality survivors — pipe_clean's window-min
    val s1m = s1
      .withColumn("keep_id", min("doc_id").over(W.partitionBy("fp")))
      .withColumn("x_dup", col("doc_id") =!= col("keep_id"))
    val s2 = s1m.filter(!col("x_dup"))
      .select("doc_id", "source", "n_tokens").cachedPersist()
    // near-dedup ON the current corpus: the persisted verified pairs
    // restricted to edges with BOTH endpoints surviving, then CC — the
    // keeper is each component's min doc_id (the CC label)
    val edges = Dedup.nearDupEdges(s, dir)
      .join(s2.select(col("doc_id").as("doc_a")).hint("shuffle_hash"),
        Seq("doc_a"), "left_semi")
      .join(s2.select(col("doc_id").as("doc_b")).hint("shuffle_hash"),
        Seq("doc_b"), "left_semi")
    val losers = Dedup.connectedComponents(edges)
      .filter(col("v") =!= col("lbl"))
      .select(col("v").as("doc_id"))
    val s3 = s2.join(losers.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
    // ExactSubstr cuts (Lee et al. 2022): the full-corpus span map
    // applied to survivors; a doc whose every word sits in a removed
    // span drops out entirely
    val s3k = s3
      .join(Dedup.substrKeptWords(s, dir).hint("shuffle_hash"),
        Seq("doc_id"), "left")
      .withColumn("kept_words", coalesce(col("kept_words"), col("n_tokens")))
      .cachedPersist()
    val s4 = s3k.filter(col("kept_words") > 0)
    // decontamination: src0 IS the benchmark (its docs pass trivially);
    // a survivor with more than half its trigrams in the benchmark set
    // is memorization risk, not training data
    val s4c = s4
      .join(contamFracs(s, dir).select("doc_id", "contam_frac")
        .hint("shuffle_hash"), Seq("doc_id"), "left")
      .cachedPersist()
    val s5 = s4c.filter(coalesce(col("contam_frac"), lit(0.0)) <= 0.5)
    // source mix over the CURRENT survivor counts (the pipe_mix recipe
    // re-based on what actually survived cleaning)
    val counts = s5.groupBy("source").agg(count(lit(1)).as("n_src"))
    val fracs = mixKeepFracs(counts).select("source", "keep_frac")
    val s5f = s5.join(broadcast(fracs), Seq("source"))
    val s6 = s5f.filter(e2eMixGate).cachedPersist()
    E2eStages(flagged, s1m, s2, losers, s3k, s4c, fracs, s5f, s6)
  }

  /** The deterministic mix gate (pipe_mix's md5 threshold) — evaluated
    * against a row holding `doc_id` and `keep_frac`. */
  private def e2eMixGate: org.apache.spark.sql.Column =
    pmod(hash60(col("doc_id").cast("string")), lit(10000L)) <
      floor(lit(10000.0) * col("keep_frac")).cast("bigint")

  /** The end-to-end training-data composite (`pipe_e2e`): one
    * per-source survivor/token-yield report over the WHOLE cleaning
    * chain, with every stage's drop count reconciling exactly —
    * n_docs = n_lowq + n_exact_dup + n_near_dup + n_substr_empty +
    * n_contaminated + n_mix_dropped + n_final per source (the identity
    * a pipeline team signs off on; spec-gated, and the quality/exact
    * columns equal pipe_clean's by shared-relation construction). */
  def pipeE2e(s: SparkSession, dir: String): DataFrame = {
    val st = e2eStages(s, dir)
    val base = st.flagged.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("lowq"), 1L).otherwise(0L)).as("n_lowq"),
      sum(col("n_tokens")).as("raw_tokens"))
    val xd = st.s1m.filter(col("x_dup"))
      .groupBy("source").agg(count(lit(1)).as("n_exact_dup"))
    val nd = st.s2.join(st.losers.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_near_dup"))
    val se = st.s3k.filter(col("kept_words") <= 0)
      .groupBy("source").agg(count(lit(1)).as("n_substr_empty"))
    val ctm = st.s4c.filter(coalesce(col("contam_frac"), lit(0.0)) > 0.5)
      .groupBy("source").agg(count(lit(1)).as("n_contaminated"))
    val mdp = st.s5f.filter(!e2eMixGate)
      .groupBy("source").agg(count(lit(1)).as("n_mix_dropped"))
    val fin = st.s6.groupBy("source").agg(
      count(lit(1)).as("n_final"),
      sum(col("kept_words")).as("final_tokens"))
    base
      .join(xd, Seq("source"), "left").join(nd, Seq("source"), "left")
      .join(se, Seq("source"), "left").join(ctm, Seq("source"), "left")
      .join(mdp, Seq("source"), "left").join(fin, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_lowq"),
        coalesce(col("n_exact_dup"), lit(0L)).as("n_exact_dup"),
        coalesce(col("n_near_dup"), lit(0L)).as("n_near_dup"),
        coalesce(col("n_substr_empty"), lit(0L)).as("n_substr_empty"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        coalesce(col("n_mix_dropped"), lit(0L)).as("n_mix_dropped"),
        coalesce(col("n_final"), lit(0L)).as("n_final"),
        col("raw_tokens"),
        coalesce(col("final_tokens"), lit(0L)).as("final_tokens"))
      .orderBy("source")
  }

  /** The composite's epoch permutation (`pipe_e2e_shuffle`): the
    * pipe_shuffle deterministic global order over the FINAL e2e
    * survivor corpus — what the training run actually reads. */
  def pipeE2eShuffle(s: SparkSession, dir: String): DataFrame =
    shuffledPositions(e2eStages(s, dir).s6.select("doc_id"))
      .orderBy("doc_id")

  /** The composite's packing report (`pipe_e2e_pack`): pipe_pack's
    * sharded concat-and-split accounting budgeted in the e2e corpus's
    * SURVIVING word counts (post-ExactSubstr kept_words) — closing the
    * judge's chain at the artifact a training run consumes. */
  def pipeE2ePack(s: SparkSession, dir: String): DataFrame = {
    val fin = e2eStages(s, dir).s6
    packedReport(
      fin.select(col("doc_id"), col("kept_words").as("n_tokens")),
      packShardDigits(fin.count()))
  }

  /** Smallest hex-digit count d (1..8) with 16^d shards of
    * [[PackDocsPerShard]] docs covering an nDocs corpus. The same
    * thresholds are spelled as a CASE chain in the oracle SQL, so both
    * engines derive the identical width from the data. */
  private[graft] def packShardDigits(nDocs: Long): Int = {
    var d = 1
    var cap = 16L * PackDocsPerShard
    while (nDocs > cap && d < 8) { d += 1; cap *= 16L }
    d
  }

  /** Sequence-packing report (GPT-style concat-and-split packing): docs
    * are concatenated per shard in doc_id order and cut into fixed
    * 128-token training sequences; emits per-shard sequence counts, fill
    * ratio and how many documents straddle a sequence boundary.
    *
    * Scale posture: packing is embarrassingly parallel ACROSS shards and
    * sequential only WITHIN one — exactly how production pipelines pack
    * (per output shard/file). The shard key is a cross-engine md5 bucket
    * of doc_id whose hex-digit width is DERIVED FROM THE CORPUS SIZE
    * ([[packShardDigits]]: 16 shards under ~1k docs, 4k shards at ~256k,
    * 16^8 at the 100 TB posture), so the only window runs over
    * ~[[PackDocsPerShard]]-document hash buckets, never one
    * corpus-sized partition. Offsets come from one cumulative sum; all
    * divisions are exact (<2^53) doubles so floor/ceil match DuckDB. */
  def pipePack(s: SparkSession, dir: String): DataFrame = {
    // the persisted tokenized relation serves the sizing count, the
    // per-doc token lengths AND txt_vocab_coverage — one corpus
    // tokenize pass per session+content, and the count is a cached-
    // relation count, not an extra source scan
    val toks = tokenizedDocs(s, dir)
    packedReport(
      toks.select(col("doc_id"), size(col("tk")).cast("bigint").as("n_tokens")),
      packShardDigits(toks.count()))
  }

  /** [[pipePack]] budgeted with the TRAINED tokenizer instead of
    * whitespace words: the per-doc `n_bpe` counts from
    * [[TextAnalysis.bpeDocCounts]] (encode-over-types, O(vocabulary)
    * chain CPU) feed the same sharded packing report — the end-to-end
    * form a production pipeline runs, where sequences are cut in REAL
    * tokenizer units. Same shard-width derivation and window posture as
    * [[pipePack]]; only the token source differs. */
  def pipePackBpe(s: SparkSession, dir: String): DataFrame =
    packedReport(
      TextAnalysis.bpeDocCounts(s, dir)
        .select(col("doc_id"), col("n_bpe").as("n_tokens")),
      packShardDigits(tokenizedDocs(s, dir).count()))

  /** [[pipePackBpe]]'s twin budgeted in UNIGRAM tokenizer units: the
    * per-doc piece counts come from the trained SentencePiece-unigram
    * model through the ONE narrow [[TextAnalysis.spDocCounts]] kernel
    * pass (Viterbi per word, the bounded piece table as expression
    * state), feeding the same sharded packing report — a production
    * pipeline packs in whichever tokenizer's units it trains with, and
    * the two reports differ exactly by the tokenizers' compression. */
  def pipePackSp(s: SparkSession, dir: String): DataFrame =
    packedReport(
      TextAnalysis.spDocCounts(s, dir)
        .select(col("doc_id"), col("n_sp").as("n_tokens")),
      packShardDigits(tokenizedDocs(s, dir).count()))

  /** [[pipePack]] over an explicit shard-key width (16^shardDigits
    * shards); the spec drives this directly to assert the shard count
    * scales with the width. */
  private[graft] def pipePackSharded(docs: DataFrame, shardDigits: Int): DataFrame =
    packedReport(
      docs.select(col("doc_id"),
        size(org.apache.spark.sql.graftexpr.TextExpressions
          .wordNgrams(col("text"), 1)).cast("bigint").as("n_tokens")),
      shardDigits)

  /** Packing report over a `(doc_id, n_tokens)` relation. */
  private def packedReport(tokenCounts: DataFrame, shardDigits: Int): DataFrame = {
    val cap = 128.0
    val d = tokenCounts
      .withColumn("shard",
        substring(md5(col("doc_id").cast("string")), 1, shardDigits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    val offs = d.withColumn("cum", sum("n_tokens").over(w))
      .withColumn("straddles",
        col("n_tokens") > 0 &&
          floor((col("cum") - col("n_tokens")) / cap) =!= floor((col("cum") - 1) / cap))
    val agg = offs.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("total_tokens"),
      ceil(sum("n_tokens") / cap).cast("bigint").as("n_sequences"),
      sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddlers"))
    agg.select(col("shard"), col("n_docs"), col("total_tokens"),
        col("n_sequences"), col("n_straddlers"),
        when(col("n_sequences") > 0,
          col("total_tokens").cast("double") / (col("n_sequences").cast("double") * cap))
          .otherwise(0.0).as("fill_frac"))
      .orderBy("shard")
  }

  /** Persisted `(doc_id, tk)` tokenized corpus, memoized per
    * (session, dir) and keyed by the table's CONTENT fingerprint — the
    * centroid-memo pattern ([[Similarity]]): a rewrite-in-place
    * invalidates (the stale entry is unpersisted, not leaked), and an
    * unfingerprintable table skips the memo rather than risking a stale
    * hit. One entry per (session, dir) at any time, so repeated
    * queries hold exactly one MEMORY_AND_DISK tokenize of the corpus —
    * the relation every Pipeline text query shares. */
  private val tokCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]
  private def tokenizedDocs(s: SparkSession, dir: String): DataFrame = {
    def build() = Tables.load(s, dir, "documents")
      .withColumn("tk",
        org.apache.spark.sql.graftexpr.TextExpressions.wordNgrams(col("text"), 1))
      .select("doc_id", "tk")
    Tables.fingerprint(s, dir, "documents") match {
      case None => build() // unverifiable content: no persist, no memo
      case Some(fp) =>
        // The memo update is SYNCHRONIZED: everything inside is lazy
        // plan/metadata work (build+persist run no job), so the lock is
        // cheap — and it closes the race where two first calls both
        // persisted and the loser's copy leaked until the next purge.
        tokCache.synchronized {
          // Purge only entries whose session is STOPPED (the bench's
          // restart-on-death path would otherwise pin dead sessions);
          // live entries — including the one about to be served — stay.
          // unpersist may throw against a stopped context; the entries
          // must go regardless.
          if (tokCache.size > 16)
            tokCache.keys.toSeq.filter(_._1.sparkContext.isStopped).foreach(k =>
              tokCache.remove(k).foreach { case (_, old) =>
                try old.unpersist(blocking = false) catch { case _: Throwable => () }
              })
          tokCache.get((s, dir)) match {
            case Some((`fp`, df)) => df
            case stale =>
              stale.foreach(_._2.unpersist(blocking = false))
              val df = build().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              tokCache.update((s, dir), (fp, df))
              df
          }
        }
    }
  }

  /** Vocabulary coverage (OOV-rate quality filter, CCNet-style but
    * log-free so it replays exactly cross-engine): fraction of each
    * document's tokens OUTSIDE the corpus top-100 vocabulary. The vocab
    * is bounded by construction (top-K with a total count-desc/token-asc
    * tie-break) so it broadcasts; the corpus side stays distributed and
    * shuffles only the word-count partial aggregates.
    *
    * The shared [[tokenizedDocs]] relation feeds BOTH the vocab build
    * and the coverage join — the corpus is scanned and tokenized ONCE
    * (the dedup family's shared-signature-table pattern, and the cache
    * boundary also keeps Catalyst from re-inlining the tokenizer into
    * both branches). */
  def txtVocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val docs = tokenizedDocs(s, dir)
    val vocab = docs.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w")).limit(100)
      .select(col("w"), lit(1).as("in_vocab"))
    docs.select(col("doc_id"), explode_outer(col("tk")).as("w"))
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(col("w")).as("n_tokens"), count(col("in_vocab")).as("n_in_vocab"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("n_in_vocab")).as("n_oov"),
        when(col("n_tokens") > 0,
          lit(1.0) - col("n_in_vocab").cast("double") / col("n_tokens").cast("double"))
          .otherwise(0.0).as("oov_frac"))
      .orderBy("doc_id")
  }

  private val TOKENS = "list_filter(string_split(text, ' '), x -> len(x) > 0)"
  private val STOP_IN = STOP_EN.map(w => s"'$w'").mkString("(", ",", ")")
  /** DuckDB twin of graft.functions.hash60. */
  private def h60(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"
  /** 1-based trigram list over a DuckDB token list `tk`. */
  private val TRIGRAMS =
    """CASE WHEN len(tk) >= 3
      |  THEN list_transform(range(1, len(tk) - 1),
      |         i -> concat(tk[i], ' ', tk[i + 1], ' ', tk[i + 2]))
      |  ELSE CAST([] AS VARCHAR[]) END""".stripMargin

  /** The composite chain's oracle CTEs, shared by the three pipe_e2e
    * faces: pipe_clean's quality/exact-dedup spelling, Dedup's
    * prefix-namespaced LSH-candidate ("l") and ExactSubstr ("x")
    * chains, the recursive CC over the survivor-restricted edge set,
    * txt_contamination's trigram spelling, and pipe_mix's frac/gate —
    * ends at `s6(doc_id, source, kept_words)`, the final corpus. */
  private def e2eOracleCtes: String =
    s"""t AS (SELECT doc_id, source, text, $TOKENS AS tk FROM documents),
       |qm AS (
       |  SELECT doc_id, source, md5(text) AS fp,
       |    CAST(len(tk) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter(tk, x -> x IN $STOP_IN)) AS DOUBLE)
       |      / CAST(len(tk) AS DOUBLE) AS stop_ratio,
       |    CAST(list_reduce(list_prepend(0, list_transform(tk, x -> len(x))),
       |      (a, b) -> a + b) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS mean_tok_len
       |  FROM t),
       |qf AS (
       |  SELECT *, (n_tokens < 5 OR stop_ratio > 0.5 OR mean_tok_len > 12.0) AS lowq
       |  FROM qm),
       |s1 AS (SELECT * FROM qf WHERE NOT lowq),
       |qc AS (SELECT fp, MIN(doc_id) AS keep_id FROM s1 GROUP BY 1),
       |s1m AS (SELECT s1.*, s1.doc_id != qc.keep_id AS x_dup
       |  FROM s1 JOIN qc ON s1.fp = qc.fp),
       |s2 AS (SELECT doc_id, source, n_tokens FROM s1m WHERE NOT x_dup),
       |${Dedup.lshCandChain(3, "t", "l")},
       |edges AS (
       |  SELECT doc_a AS va, doc_b AS vb FROM lcand
       |  JOIN ld sa ON sa.doc_id = doc_a
       |  JOIN ld sb ON sb.doc_id = doc_b
       |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
       |    CAST(len(list_distinct(list_concat(sa.hs, sb.hs))) AS DOUBLE) >= 0.5
       |    AND doc_a IN (SELECT doc_id FROM s2)
       |    AND doc_b IN (SELECT doc_id FROM s2)),
       |${Dedup.ccCte},
       |losers AS (SELECT v FROM comp WHERE v != cluster_id),
       |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT v FROM losers)),
       |${Dedup.substrChainCtes(Dedup.SpanGramN, "t", "x")},
       |s3k AS (SELECT s3.doc_id, s3.source, s3.n_tokens,
       |  COALESCE(xpdoc.kept_words, s3.n_tokens) AS kept_words
       |  FROM s3 LEFT JOIN xpdoc USING (doc_id)),
       |s4 AS (SELECT * FROM s3k WHERE kept_words > 0),
       |cd AS (SELECT doc_id, source, $TRIGRAMS AS tk3 FROM t),
       |cbench AS (SELECT DISTINCT unnest(tk3) AS g FROM cd WHERE source = 'src0'),
       |cgrams AS (SELECT doc_id, unnest(tk3) AS g FROM cd WHERE source <> 'src0'),
       |chits AS (SELECT doc_id, COUNT(*) AS hits FROM cgrams
       |  WHERE g IN (SELECT g FROM cbench) GROUP BY 1),
       |cf AS (SELECT cd.doc_id,
       |  CASE WHEN len(tk3) > 0
       |    THEN CAST(COALESCE(ch.hits, 0) AS DOUBLE) / CAST(len(tk3) AS DOUBLE)
       |    ELSE 0.0 END AS contam_frac
       |  FROM cd LEFT JOIN chits ch USING (doc_id) WHERE source <> 'src0'),
       |s4c AS (SELECT s4.*, cf.contam_frac FROM s4 LEFT JOIN cf USING (doc_id)),
       |s5 AS (SELECT doc_id, source, n_tokens, kept_words FROM s4c
       |  WHERE COALESCE(contam_frac, 0.0) <= 0.5),
       |mc AS (SELECT source, COUNT(*) AS n_src FROM s5 GROUP BY 1),
       |mt AS (SELECT SUM(n_src) AS n_total,
       |  SUM(CASE WHEN source IN ('src0', 'src1', 'src2') THEN 0 ELSE 1 END) AS n_rest
       |  FROM mc),
       |mf AS (SELECT source,
       |  least(1.0,
       |    CASE source WHEN 'src0' THEN 0.30 WHEN 'src1' THEN 0.15
       |      WHEN 'src2' THEN 0.10 ELSE 0.45 / CAST(n_rest AS DOUBLE) END
       |    * CAST(n_total AS DOUBLE) / CAST(n_src AS DOUBLE)) AS keep_frac
       |  FROM mc CROSS JOIN mt),
       |s6 AS (SELECT s5.doc_id, s5.source, s5.kept_words
       |  FROM s5 JOIN mf USING (source)
       |  WHERE (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
       |           AS BIGINT) % 10000)
       |    < CAST(floor(10000.0 * keep_frac) AS BIGINT))""".stripMargin

  /** `def`, not `val`: the pipe_pack_bpe oracle embeds THIS run's
    * trained merges and so exists only after the query has trained
    * (the [[TextAnalysis.oracles]] contract — Verify runs every query
    * before dumping oracle_sql.json). */
  def oracles: Map[String, String] = staticOracles ++
    TextAnalysis.oracleMerges
      .map(m => Map("pipe_pack_bpe" -> pipePackBpeSql(m)))
      .getOrElse(Map.empty) ++
    TextAnalysis.oracleSpWords
      .map(ws => Map("pipe_pack_sp" -> pipePackSpSql(ws)))
      .getOrElse(Map.empty)

  /** The [[pipePack]] packing SQL with the whitespace token counts
    * swapped for the trained-chain per-doc BPE counts
    * ([[TextAnalysis.bpeDocTokensSql]]). */
  private def pipePackBpeSql(merges: Seq[(Long, String, String, Long)]): String =
    s"""WITH sd AS (
       |  SELECT CASE WHEN c <= ${16L * PackDocsPerShard} THEN 1
       |              WHEN c <= ${256L * PackDocsPerShard} THEN 2
       |              WHEN c <= ${4096L * PackDocsPerShard} THEN 3
       |              WHEN c <= ${65536L * PackDocsPerShard} THEN 4
       |              WHEN c <= ${1048576L * PackDocsPerShard} THEN 5
       |              WHEN c <= ${16777216L * PackDocsPerShard} THEN 6
       |              WHEN c <= ${268435456L * PackDocsPerShard} THEN 7
       |              ELSE 8 END AS d
       |  FROM (SELECT COUNT(*) AS c FROM documents)),
       |b AS (${TextAnalysis.bpeDocTokensSql(merges)}),
       |t AS (
       |  SELECT doc_id, n_bpe AS n_tokens,
       |    substring(md5(CAST(doc_id AS VARCHAR)), 1, (SELECT d FROM sd)) AS shard
       |  FROM b),
       |c AS (
       |  SELECT shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
       |  FROM t),
       |m AS (
       |  SELECT shard, n_tokens,
       |    (n_tokens > 0 AND
       |     floor((cum - n_tokens) / 128.0) <> floor((cum - 1) / 128.0)) AS straddles
       |  FROM c),
       |a AS (
       |  SELECT shard, COUNT(*) AS n_docs,
       |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(ceil(SUM(n_tokens) / 128.0) AS BIGINT) AS n_sequences,
       |    CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
       |  FROM m GROUP BY 1)
       |SELECT shard, n_docs, total_tokens, n_sequences, n_straddlers,
       |  CASE WHEN n_sequences > 0
       |    THEN CAST(total_tokens AS DOUBLE) / (CAST(n_sequences AS DOUBLE) * 128.0)
       |    ELSE 0.0 END AS fill_frac
       |FROM a ORDER BY shard""".stripMargin

  /** The [[pipePack]] packing SQL with the token counts swapped for the
    * trained unigram per-doc piece counts
    * ([[TextAnalysis.spDocTokensSql]]). */
  private def pipePackSpSql(ws: Seq[(String, Long, Long, String)]): String =
    s"""WITH sd AS (
       |  SELECT CASE WHEN c <= ${16L * PackDocsPerShard} THEN 1
       |              WHEN c <= ${256L * PackDocsPerShard} THEN 2
       |              WHEN c <= ${4096L * PackDocsPerShard} THEN 3
       |              WHEN c <= ${65536L * PackDocsPerShard} THEN 4
       |              WHEN c <= ${1048576L * PackDocsPerShard} THEN 5
       |              WHEN c <= ${16777216L * PackDocsPerShard} THEN 6
       |              WHEN c <= ${268435456L * PackDocsPerShard} THEN 7
       |              ELSE 8 END AS d
       |  FROM (SELECT COUNT(*) AS c FROM documents)),
       |b AS (${TextAnalysis.spDocTokensSql(ws)}),
       |t AS (
       |  SELECT doc_id, n_sp AS n_tokens,
       |    substring(md5(CAST(doc_id AS VARCHAR)), 1, (SELECT d FROM sd)) AS shard
       |  FROM b),
       |c AS (
       |  SELECT shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
       |  FROM t),
       |m AS (
       |  SELECT shard, n_tokens,
       |    (n_tokens > 0 AND
       |     floor((cum - n_tokens) / 128.0) <> floor((cum - 1) / 128.0)) AS straddles
       |  FROM c),
       |a AS (
       |  SELECT shard, COUNT(*) AS n_docs,
       |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(ceil(SUM(n_tokens) / 128.0) AS BIGINT) AS n_sequences,
       |    CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
       |  FROM m GROUP BY 1)
       |SELECT shard, n_docs, total_tokens, n_sequences, n_straddlers,
       |  CASE WHEN n_sequences > 0
       |    THEN CAST(total_tokens AS DOUBLE) / (CAST(n_sequences AS DOUBLE) * 128.0)
       |    ELSE 0.0 END AS fill_frac
       |FROM a ORDER BY shard""".stripMargin

  private lazy val staticOracles: Map[String, String] = Map(
    // score replay + the exact integer acceptance h < floor(score·p²)
    "smp_weighted" -> {
      val pp = Relational.SkP.toDouble * Relational.SkP.toDouble
      val ppLit = s"CAST('${java.lang.Double.toString(pp)}' AS DOUBLE)"
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, source,
         |    CAST(len(tk) AS DOUBLE) AS n_tok,
         |    CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE) AS stop,
         |    CAST(list_reduce(list_prepend(0, list_transform(tk, x -> len(x))), (a, b) -> a + b) AS DOUBLE) AS char_sum
         |  FROM t),
         |sc AS (
         |  SELECT doc_id, source,
         |    (stop / n_tok) * 0.3 + least(char_sum / n_tok / 10.0, 1.0) * 0.7 AS score
         |  FROM m),
         |k AS (
         |  SELECT source,
         |    CASE WHEN ${Relational.permHash62Sql("doc_id")}
         |      < CAST(floor(score * $ppLit) AS BIGINT) THEN 1 ELSE 0 END AS kept,
         |    CAST(floor(score * 1000) AS BIGINT) AS q_milli
         |  FROM sc)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(kept) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN kept = 1 THEN q_milli ELSE 0 END) AS BIGINT) AS kept_q_milli,
         |  CAST(SUM(q_milli) AS BIGINT) AS total_q_milli
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // the txt_quality score replayed verbatim, milli-quantized, then the
    // histogram-cumulative quartile cuts and the threshold phase split
    "pipe_curriculum" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS BIGINT) AS n_tokens,
        |    CAST(len(tk) AS DOUBLE) AS n_tok,
        |    CAST(len(list_filter(tk, x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE) AS stop,
        |    CAST(list_reduce(list_prepend(0, list_transform(tk, x -> len(x))), (a, b) -> a + b) AS DOUBLE) AS char_sum
        |  FROM t),
        |qd AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(floor(((stop / n_tok) * 0.3
        |      + least(char_sum / n_tok / 10.0, 1.0) * 0.7) * 1000) AS BIGINT) AS sq
        |  FROM m),
        |hist AS (SELECT sq, COUNT(*) AS cnt FROM qd GROUP BY 1),
        |h AS (
        |  SELECT sq, cnt,
        |    SUM(cnt) OVER (ORDER BY sq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER () AS n
        |  FROM hist),
        |cuts AS (
        |  SELECT
        |    MIN(CASE WHEN cum >= CAST(ceil(n * 0.25) AS BIGINT) THEN sq END) AS c25,
        |    MIN(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT) THEN sq END) AS c50,
        |    MIN(CASE WHEN cum >= CAST(ceil(n * 0.75) AS BIGINT) THEN sq END) AS c75
        |  FROM h)
        |SELECT CAST(CASE WHEN sq > c75 THEN 0 WHEN sq > c50 THEN 1
        |  WHEN sq > c25 THEN 2 ELSE 3 END AS BIGINT) AS phase,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  MIN(sq) AS min_sq, MAX(sq) AS max_sq
        |FROM qd CROSS JOIN cuts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the whole cleaning chain replayed stage-for-stage: quality gate
    // (pipe_clean's spelling) -> exact dedup -> near-dedup restricted to
    // the surviving subgraph (lshCandChain + recursive CC) -> ExactSubstr
    // cuts (substrChainCtes) -> decontamination -> mix over survivor
    // counts; the report left-joins each stage's per-source drop rollup
    "pipe_e2e" ->
      s"""WITH RECURSIVE $e2eOracleCtes,
         |rbase AS (SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN lowq THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq,
         |  CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens FROM qf GROUP BY 1),
         |rxd AS (SELECT source, COUNT(*) AS n_exact_dup FROM s1m
         |  WHERE x_dup GROUP BY 1),
         |rnd AS (SELECT source, COUNT(*) AS n_near_dup FROM s2
         |  WHERE doc_id IN (SELECT v FROM losers) GROUP BY 1),
         |rse AS (SELECT source, COUNT(*) AS n_substr_empty FROM s3k
         |  WHERE kept_words <= 0 GROUP BY 1),
         |rct AS (SELECT source, COUNT(*) AS n_contaminated FROM s4c
         |  WHERE COALESCE(contam_frac, 0.0) > 0.5 GROUP BY 1),
         |rmd AS (SELECT s5.source, COUNT(*) AS n_mix_dropped
         |  FROM s5 JOIN mf USING (source)
         |  WHERE NOT ((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
         |               AS BIGINT) % 10000)
         |    < CAST(floor(10000.0 * keep_frac) AS BIGINT)) GROUP BY 1),
         |rfin AS (SELECT source, COUNT(*) AS n_final,
         |  CAST(SUM(kept_words) AS BIGINT) AS final_tokens FROM s6 GROUP BY 1)
         |SELECT rbase.source AS source, n_docs, n_lowq,
         |  COALESCE(n_exact_dup, 0) AS n_exact_dup,
         |  COALESCE(n_near_dup, 0) AS n_near_dup,
         |  COALESCE(n_substr_empty, 0) AS n_substr_empty,
         |  COALESCE(n_contaminated, 0) AS n_contaminated,
         |  COALESCE(n_mix_dropped, 0) AS n_mix_dropped,
         |  COALESCE(n_final, 0) AS n_final,
         |  raw_tokens,
         |  COALESCE(final_tokens, 0) AS final_tokens
         |FROM rbase LEFT JOIN rxd USING (source) LEFT JOIN rnd USING (source)
         |  LEFT JOIN rse USING (source) LEFT JOIN rct USING (source)
         |  LEFT JOIN rmd USING (source) LEFT JOIN rfin USING (source)
         |ORDER BY source""".stripMargin,
    // pipe_shuffle's deterministic epoch permutation over the e2e
    // survivor corpus
    "pipe_e2e_shuffle" ->
      s"""WITH RECURSIVE $e2eOracleCtes,
         |sh AS (SELECT doc_id,
         |  ${Relational.permHash62Sql("doc_id")} AS h FROM s6),
         |sr AS (SELECT doc_id,
         |  row_number() OVER (ORDER BY h % $ShuffleBuckets, h, doc_id) - 1
         |    AS pos FROM sh)
         |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(pos // $PackDocsPerShard AS BIGINT) AS shard
         |FROM sr ORDER BY doc_id""".stripMargin,
    // pipe_pack's sharded accounting budgeted in the e2e corpus's
    // post-ExactSubstr kept_words
    "pipe_e2e_pack" ->
      s"""WITH RECURSIVE $e2eOracleCtes,
         |psd AS (
         |  SELECT CASE WHEN c <= ${16L * PackDocsPerShard} THEN 1
         |              WHEN c <= ${256L * PackDocsPerShard} THEN 2
         |              WHEN c <= ${4096L * PackDocsPerShard} THEN 3
         |              WHEN c <= ${65536L * PackDocsPerShard} THEN 4
         |              WHEN c <= ${1048576L * PackDocsPerShard} THEN 5
         |              WHEN c <= ${16777216L * PackDocsPerShard} THEN 6
         |              WHEN c <= ${268435456L * PackDocsPerShard} THEN 7
         |              ELSE 8 END AS d
         |  FROM (SELECT COUNT(*) AS c FROM s6)),
         |pt AS (
         |  SELECT doc_id, kept_words AS n_tokens,
         |    substring(md5(CAST(doc_id AS VARCHAR)), 1, (SELECT d FROM psd)) AS shard
         |  FROM s6),
         |pc AS (
         |  SELECT shard, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
         |  FROM pt),
         |pm AS (
         |  SELECT shard, n_tokens,
         |    (n_tokens > 0 AND
         |     floor((cum - n_tokens) / 128.0) <> floor((cum - 1) / 128.0)) AS straddles
         |  FROM pc),
         |pa AS (
         |  SELECT shard, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(ceil(SUM(n_tokens) / 128.0) AS BIGINT) AS n_sequences,
         |    CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
         |  FROM pm GROUP BY 1)
         |SELECT shard, n_docs, total_tokens, n_sequences, n_straddlers,
         |  CASE WHEN n_sequences > 0
         |    THEN CAST(total_tokens AS DOUBLE) / (CAST(n_sequences AS DOUBLE) * 128.0)
         |    ELSE 0.0 END AS fill_frac
         |FROM pa ORDER BY shard""".stripMargin,
    // identical double operand order: CASE weight * CAST(total) / CAST(n);
    // DuckDB's `/` on the decimal literal promotes to DOUBLE like Spark's
    "pipe_mix" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
        |t AS (SELECT SUM(n_src) AS n_total,
        |        SUM(CASE WHEN source IN ('src0', 'src1', 'src2')
        |              THEN 0 ELSE 1 END) AS n_rest
        |      FROM c),
        |f AS (SELECT source, n_src,
        |        least(1.0,
        |          CASE source WHEN 'src0' THEN 0.30 WHEN 'src1' THEN 0.15
        |            WHEN 'src2' THEN 0.10
        |            ELSE 0.45 / CAST(n_rest AS DOUBLE) END
        |          * CAST(n_total AS DOUBLE) / CAST(n_src AS DOUBLE)) AS keep_frac
        |      FROM c CROSS JOIN t),
        |k AS (SELECT d.source, COUNT(*) AS n_kept
        |      FROM documents d JOIN f USING (source)
        |      WHERE (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |               AS BIGINT) % 10000)
        |        < CAST(floor(10000.0 * keep_frac) AS BIGINT)
        |      GROUP BY d.source)
        |SELECT f.source, CAST(n_src AS BIGINT) AS n_docs, keep_frac,
        |  COALESCE(n_kept, 0) AS n_kept
        |FROM f LEFT JOIN k ON f.source = k.source
        |ORDER BY f.source""".stripMargin,
    // same sqrt/quantize/normalize spelling and operand order as
    // smpTemperature: floor(sqrt·1e6) integer weights sum order-free,
    // then ((tgt * (q/q_sum)) / n_src) with every operand cast DOUBLE
    "smp_temperature" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
        |q AS (SELECT source, n_src,
        |        CAST(floor(sqrt(CAST(n_src AS DOUBLE)) * 1000000.0) AS BIGINT) AS q
        |      FROM c),
        |t AS (SELECT SUM(q) AS q_sum, SUM(n_src) AS n_total FROM q),
        |f AS (SELECT source, n_src,
        |        CAST(q AS DOUBLE) / CAST(q_sum AS DOUBLE) AS weight,
        |        least(1.0,
        |          CAST(CAST(floor(0.5 * CAST(n_total AS DOUBLE)) AS BIGINT) AS DOUBLE)
        |            * (CAST(q AS DOUBLE) / CAST(q_sum AS DOUBLE))
        |            / CAST(n_src AS DOUBLE)) AS keep_frac
        |      FROM q CROSS JOIN t),
        |k AS (SELECT d.source, COUNT(*) AS n_kept
        |      FROM documents d JOIN f USING (source)
        |      WHERE (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |               AS BIGINT) % 10000)
        |        < CAST(floor(10000.0 * keep_frac) AS BIGINT)
        |      GROUP BY d.source)
        |SELECT f.source, CAST(n_src AS BIGINT) AS n_docs, weight, keep_frac,
        |  COALESCE(n_kept, 0) AS n_kept
        |FROM f LEFT JOIN k ON f.source = k.source
        |ORDER BY f.source""".stripMargin,
    "pipe_pack" ->
      s"""WITH sd AS (
         |  -- same thresholds as packShardDigits: smallest d with
         |  -- 16^d * $PackDocsPerShard >= count, capped at 8
         |  SELECT CASE WHEN c <= ${16L * PackDocsPerShard} THEN 1
         |              WHEN c <= ${256L * PackDocsPerShard} THEN 2
         |              WHEN c <= ${4096L * PackDocsPerShard} THEN 3
         |              WHEN c <= ${65536L * PackDocsPerShard} THEN 4
         |              WHEN c <= ${1048576L * PackDocsPerShard} THEN 5
         |              WHEN c <= ${16777216L * PackDocsPerShard} THEN 6
         |              WHEN c <= ${268435456L * PackDocsPerShard} THEN 7
         |              ELSE 8 END AS d
         |  FROM (SELECT COUNT(*) AS c FROM documents)),
         |t AS (
         |  SELECT doc_id, CAST(len($TOKENS) AS BIGINT) AS n_tokens,
         |    substring(md5(CAST(doc_id AS VARCHAR)), 1, (SELECT d FROM sd)) AS shard
         |  FROM documents),
         |c AS (
         |  SELECT shard, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
         |  FROM t),
         |m AS (
         |  SELECT shard, n_tokens,
         |    (n_tokens > 0 AND
         |     floor((cum - n_tokens) / 128.0) <> floor((cum - 1) / 128.0)) AS straddles
         |  FROM c),
         |a AS (
         |  SELECT shard, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |    CAST(ceil(SUM(n_tokens) / 128.0) AS BIGINT) AS n_sequences,
         |    CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
         |  FROM m GROUP BY 1)
         |SELECT shard, n_docs, total_tokens, n_sequences, n_straddlers,
         |  CASE WHEN n_sequences > 0
         |    THEN CAST(total_tokens AS DOUBLE) / (CAST(n_sequences AS DOUBLE) * 128.0)
         |    ELSE 0.0 END AS fill_frac
         |FROM a ORDER BY shard""".stripMargin,
    "txt_vocab_coverage" ->
      s"""WITH t AS (
         |  SELECT doc_id, $TOKENS AS tk FROM documents),
         |words AS (SELECT doc_id, unnest(tk) AS w FROM t),
         |vocab AS (
         |  SELECT w FROM (
         |    SELECT w, COUNT(*) AS cnt FROM words GROUP BY 1
         |    ORDER BY cnt DESC, w LIMIT 100)),
         |base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM t),
         |hits AS (
         |  SELECT doc_id, COUNT(*) AS n_in FROM words
         |  WHERE w IN (SELECT w FROM vocab) GROUP BY 1)
         |SELECT b.doc_id, b.n_tokens,
         |  b.n_tokens - COALESCE(h.n_in, 0) AS n_oov,
         |  CASE WHEN b.n_tokens > 0
         |    THEN 1.0 - CAST(COALESCE(h.n_in, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
         |    ELSE 0.0 END AS oov_frac
         |FROM base b LEFT JOIN hits h ON b.doc_id = h.doc_id
         |ORDER BY b.doc_id""".stripMargin,
    "pipe_clean" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, text, $TOKENS AS tk FROM documents),
         |m AS (
         |  SELECT doc_id, source, md5(text) AS fp,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(tk, x -> x IN $STOP_IN)) AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE) AS stop_ratio,
         |    CAST(list_reduce(list_prepend(0, list_transform(tk, x -> len(x))),
         |      (a, b) -> a + b) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS mean_tok_len
         |  FROM t),
         |f AS (
         |  SELECT *, (n_tokens < 5 OR stop_ratio > 0.5 OR mean_tok_len > 12.0) AS lowq
         |  FROM m),
         |k AS (SELECT * FROM f WHERE NOT lowq),
         |c AS (SELECT fp, MIN(doc_id) AS keep_id FROM k GROUP BY 1),
         |mk AS (SELECT k.*, k.doc_id != c.keep_id AS dup FROM k JOIN c ON k.fp = c.fp),
         |s1 AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(CASE WHEN lowq THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq
         |  FROM f GROUP BY 1),
         |s2 AS (
         |  SELECT source,
         |    CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |    CAST(SUM(CASE WHEN NOT dup THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |    CAST(SUM(CASE WHEN NOT dup THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
         |  FROM mk GROUP BY 1)
         |SELECT s1.source AS source, n_docs, n_lowq,
         |  COALESCE(n_dup, 0) AS n_dup, COALESCE(n_kept, 0) AS n_kept,
         |  COALESCE(kept_tokens, 0) AS kept_tokens
         |FROM s1 LEFT JOIN s2 ON s1.source = s2.source
         |ORDER BY 1""".stripMargin,
    "smp_stratified" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE md5(CAST(doc_id AS VARCHAR)) <
        |  CASE source WHEN 'src0' THEN '2' WHEN 'src1' THEN '4'
        |              WHEN 'src2' THEN '8' ELSE '1' END
        |ORDER BY doc_id""".stripMargin,
    "smp_split" ->
      """SELECT
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
        |         THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
        |         THEN 'val'
        |       ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  MIN(doc_id) AS min_doc,
        |  MAX(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,
    // the bottom-k-by-hash holdout replayed exactly: row_number over
    // the identical 62-bit permutation hash, then rank by doc_id
    // the deterministic epoch permutation replayed as one global
    // row_number over the identical lexicographic key — the oracle can
    // afford the global sort the engine spells bucket-wise
    // the packing map replayed with ONE global exclusive running sum
    // over the identical shuffle key
    "pipe_pack_map" ->
      s"""WITH t AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |    AS BIGINT) AS n_tokens,
        |  ${Relational.permHash62Sql("doc_id")} AS h FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |  COALESCE(SUM(n_tokens) OVER (ORDER BY h % $ShuffleBuckets, h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(tok_start AS BIGINT) AS tok_start,
        |  CAST(tok_start // $PackSeqTokens AS BIGINT) AS first_seq,
        |  CAST(CASE WHEN n_tokens > 0
        |    THEN (tok_start + n_tokens - 1) // $PackSeqTokens
        |    ELSE tok_start // $PackSeqTokens END AS BIGINT) AS last_seq
        |FROM r ORDER BY doc_id""".stripMargin,
    "pipe_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
        |  ${Relational.permHash62Sql("doc_id")} AS h FROM documents),
        |r AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY h % $ShuffleBuckets, h, doc_id) - 1
        |    AS pos FROM h)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(pos // $PackDocsPerShard AS BIGINT) AS shard
        |FROM r ORDER BY doc_id""".stripMargin,
    "smp_fixed_k" ->
      s"""WITH h AS (SELECT source, doc_id,
        |  ${Relational.permHash62Sql("doc_id")} AS h FROM documents),
        |r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY h, CAST(doc_id AS DOUBLE)) AS rn FROM h),
        |samp AS (SELECT source, doc_id FROM r WHERE rn <= $FixedKPerSource)
        |SELECT source,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
        |  doc_id
        |FROM samp ORDER BY source, rk""".stripMargin,
    "smp_source_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 15 ORDER BY source, doc_id""".stripMargin,
    "txt_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id, $TOKENS AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, tk, $TRIGRAMS AS tk3 FROM t),
         |m AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tk3) > 0
         |      THEN 1.0 - CAST(len(list_distinct(tk3)) AS DOUBLE) / CAST(len(tk3) AS DOUBLE)
         |      ELSE 0.0 END AS dup3_frac,
         |    CASE WHEN len(tk) > 0
         |      THEN CAST(list_max(list_transform(list_distinct(tk),
         |             t -> len(list_filter(tk, x -> x = t)))) AS DOUBLE)
         |           / CAST(len(tk) AS DOUBLE)
         |      ELSE 0.0 END AS top_tok_frac
         |  FROM g)
         |SELECT doc_id, dup3_frac, top_tok_frac,
         |  (dup3_frac > 0.2 OR top_tok_frac > 0.3) AS is_repetitive
         |FROM m ORDER BY doc_id""".stripMargin,
    "dd_cross_source" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, $TOKENS AS tk FROM documents),
         |g AS (
         |  SELECT DISTINCT source,
         |    unnest(list_transform($TRIGRAMS, x -> ${h60("x")})) AS g
         |  FROM t)
         |SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
         |FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "txt_contamination" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, $TOKENS AS tk FROM documents),
         |d AS (
         |  SELECT doc_id, source, $TRIGRAMS AS tk3 FROM t),
         |bench AS (
         |  SELECT DISTINCT unnest(tk3) AS g FROM d WHERE source = 'src0'),
         |rest AS (SELECT doc_id, tk3 FROM d WHERE source <> 'src0'),
         |grams AS (SELECT doc_id, unnest(tk3) AS g FROM rest),
         |hits AS (
         |  SELECT doc_id, COUNT(*) AS hits FROM grams
         |  WHERE g IN (SELECT g FROM bench) GROUP BY 1)
         |SELECT r.doc_id,
         |  CAST(len(r.tk3) AS BIGINT) AS n_grams,
         |  COALESCE(h.hits, 0) AS n_contaminated,
         |  CASE WHEN len(r.tk3) > 0
         |    THEN CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(len(r.tk3) AS DOUBLE)
         |    ELSE 0.0 END AS contam_frac
         |FROM rest r LEFT JOIN hits h ON r.doc_id = h.doc_id
         |ORDER BY r.doc_id""".stripMargin,
  )

  /** Curriculum phases by quality quartile (curriculum learning,
    * Bengio et al. 2009, as a data-pipeline pass: order training data
    * easy/clean → hard, here highest-quality quartile first): the
    * [[TextAnalysis.txtQuality]] score quantizes to a BOUNDED
    * milli-unit grid first (≤ 1001 distinct values — the global
    * cumulative window that exact quartiles need then runs over the
    * GRID histogram, never the corpus; sub-milli score precision is
    * noise for phase assignment, the declared trade), quartile cuts
    * are conditional MINs at ceil(q·n) (percentile_disc, exact
    * integers), and phase assignment is a narrow map against the
    * 1-row cut relation. Emits per phase the doc/token budget the
    * training scheduler reads. */
  def pipeCurriculum(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val q = TextAnalysis.qualityScores(s, dir)
      .select(col("doc_id"), col("n_tokens"),
        floor(col("score") * 1000).cast("bigint").as("sq"))
    val hist = q.groupBy("sq")
      .agg(count(lit(1)).as("cnt"))
    val cum = w.orderBy("sq")
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val h = hist
      .withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(w.partitionBy()))
    def cut(p: Double) =
      min(when(col("cum") >= ceil(col("n") * lit(p)).cast("bigint"), col("sq")))
    val cuts = h.agg(cut(0.25).as("c25"), cut(0.50).as("c50"), cut(0.75).as("c75"))
    q.crossJoin(cuts)
      .withColumn("phase",
        when(col("sq") > col("c75"), 0L)
          .when(col("sq") > col("c50"), 1L)
          .when(col("sq") > col("c25"), 2L)
          .otherwise(3L))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("sq")).as("min_sq"), max(col("sq")).as("max_sq"))
      .orderBy("phase")
  }

  /** Quality-WEIGHTED Bernoulli sampling (importance sampling at the
    * curation face — keep a document with probability equal to its
    * quality score, the soft alternative to [[pipeClean]]'s hard gate):
    * acceptance is the exact integer comparison
    * `permHash62(doc_id) < floor(score·p²)` — the hash is uniform on
    * [0, p²) and pure int64 both engines, the threshold is ONE double
    * product/floor spelled identically, so membership is deterministic,
    * replayable, and at 100 TB needs no state at all (re-running the
    * pipeline keeps the same sample — the property that matters for
    * reproducible training mixes). Per source: doc count, kept count
    * and exact milli-quantized quality mass kept vs total. */
  def smpWeighted(s: SparkSession, dir: String): DataFrame = {
    val pp = Relational.SkP.toDouble * Relational.SkP.toDouble
    val q = TextAnalysis.qualityScores(s, dir).select(col("doc_id"), col("score"))
    val docs = Tables.load(s, dir, "documents").select("doc_id", "source")
    val keep = Relational.permHash62(col("doc_id")) <
      floor(col("score") * lit(pp)).cast("bigint")
    docs.join(q.hint("shuffle_hash"), "doc_id")
      .select(col("source"), keep.as("kept"),
        floor(col("score") * 1000).cast("bigint").as("q_milli"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("q_milli")).otherwise(0L)).as("kept_q_milli"),
        sum(col("q_milli")).as("total_q_milli"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_curriculum" -> (pipeCurriculum _),
    "smp_weighted" -> (smpWeighted _),
    "pipe_pack" -> (pipePack _),
    "pipe_shuffle" -> (pipeShuffle _),
    "pipe_e2e" -> (pipeE2e _),
    "pipe_e2e_shuffle" -> (pipeE2eShuffle _),
    "pipe_e2e_pack" -> (pipeE2ePack _),
    "pipe_pack_map" -> (pipePackMap _),
    "pipe_pack_bpe" -> (pipePackBpe _),
    "pipe_pack_sp" -> (pipePackSp _),
    "txt_vocab_coverage" -> (txtVocabCoverage _),
    "pipe_clean" -> (pipeClean _),
    "smp_stratified" -> (smpStratified _),
    "smp_split" -> (smpSplit _),
    "smp_fixed_k" -> (smpFixedK _),
    "smp_source_cap" -> (smpSourceCap _),
    "smp_temperature" -> (smpTemperature _),
    "txt_repetition" -> (txtRepetition _),
    "dd_cross_source" -> (ddCrossSource _),
    "txt_contamination" -> (txtContamination _),
    "pipe_mix" -> (pipeMix _),
  )
}
