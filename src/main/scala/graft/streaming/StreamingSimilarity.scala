package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Stream-time face of the similarity family — the one family that had
  * batch-only coverage (dedup, text, events and arrays all have
  * streaming twins; ref doreisa's whole point is per-timestep analytics
  * on ARRIVING data, `window_api.py:38-119`).
  *
  * An embedding stream (new documents' vectors, as an ingest pipeline
  * emits them) is scored against a FIXED trained IVFADC index: the
  * model (coarse centroids + residual codebooks and every derived ADC
  * constant) rides the plan as literals — the trained-model hand-off
  * posture of [[StreamingVocab.oovDrift]]'s vocabulary and the BPE
  * merge tables: only trained VALUES cross the boundary — while the
  * encoded corpus (`vec_id`, `cluster`, M one-byte codes, rn2 — the
  * bounded-bytes serving relation from
  * [[graft.operators.Similarity.encodeIvfpq]]) joins stream-static.
  *
  * Scale posture: scoring is STATELESS — coarse routing is a narrow
  * argmin over centroid literals, the ADC tables are computed per
  * arriving row, and the stream-static equi-join on the cluster key
  * touches only the probe's own inverted list (the IVF cut, per
  * microbatch). The ONLY stateful operator is the per-(window, probe)
  * top-k aggregate, and its state is k-bounded everywhere: the
  * [[org.apache.spark.sql.graftexpr.TopKSortedMerge]] buffer holds at
  * most k (score, vec_id) pairs per open (window, probe) group,
  * watermark-bounded — never the candidate stream (a collect_list
  * buffer would grow with list sizes). Append-mode rows per closed
  * window.
  */
object StreamingSimilarity {

  /** Windowed ANN hits of the arriving vectors against the fixed index:
    * for every (window, probe) the top-`k` same-list neighbors by ADC
    * cosine, `(win_start, probe_id, rk, vec_id, approx_cos)` — presence
    * here IS the near-duplicate flag an ingest gate consumes (pass
    * `minCos` to pre-filter candidates below the dedup threshold before
    * they reach the aggregate).
    *
    * `stream` needs event-time `ts`, `probe_id`, `emb: array<double>`;
    * `enc` is the batch-encoded corpus ([[Similarity.encodeIvfpq]]);
    * `cents`/`codebook` the trained model values. Scoring replays the
    * batch [[Similarity.ivfpqSearch]] expressions exactly (same
    * routing, same ADC tables, same score), so a vector scores
    * identically on both paths — spec-gated stream ≡ batch on a shared
    * fixture. Ordering ties break to the lower vec_id, the batch
    * rankTopK rule, via the exact (-cos, vec_id) ascending merge. */
  def annFlags(
      stream: DataFrame,
      enc: DataFrame,
      cents: IndexedSeq[IndexedSeq[Double]],
      codebook: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      k: Int = 5,
      minCos: Double = Double.NegativeInfinity,
      delay: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame = {
    val probes = stream
      .withWatermark("ts", delay)
      .withColumn("cluster", Similarity.trainedAssignCol(cents))
      .select(Seq(col("ts"), col("probe_id"), col("cluster").as("pc")) ++
        Similarity.probeAdcCols(cents, codebook): _*)
    val scored = probes
      .join(enc, col("pc") === col("cluster") && col("probe_id") =!= col("vec_id"))
      .select(col("ts"), col("probe_id"), col("vec_id"),
        Similarity.adcScore.as("approx_cos"))
      .filter(col("approx_cos") >= minCos)
    // per-(window, probe) top-k through the k-bounded sorted merge:
    // each candidate is a 1-element sorted block; (-cos, vec_id)
    // ascending == cos descending with ties to the lower vec_id (double
    // negation is exact; -0.0/0.0 ties fall through to vec_id)
    val blk = array(struct((-col("approx_cos")).as("nv"), col("vec_id").as("gidx")))
    scored
      .groupBy(window(col("ts"), windowLen), col("probe_id"))
      .agg(org.apache.spark.sql.graftexpr.SketchExpressions
        .topkSortedMerge(blk, k).as("top"))
      .select(col("window.start").as("win_start"), col("probe_id"),
        posexplode(col("top")).as(Seq("r", "s")))
      .select(col("win_start"), col("probe_id"),
        (col("r") + 1).cast("bigint").as("rk"),
        col("s.gidx").as("vec_id"), (-col("s.nv")).as("approx_cos"))
  }
}
