package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Per-gram dedup state: this gram has been seen (keep-first already
  * assigned) inside the memory horizon. */
private case class GramSeen(lastMs: Long)

/** One document's live ExactSubstr accounting — the stream twin of
  * `dd_substr_remove`'s row. */
case class SubstrStats(
    doc_id: Long, n_words: Long, n_spans: Long, rm_words: Long, kept_words: Long)

/** Stream-time face of the ExactSubstr removal family
  * ([[graft.operators.Dedup]] `dd_substr_remove`): as documents arrive,
  * each word-n-gram occurrence is flagged removable iff its gram was
  * already seen — earlier in the stream inside the memory horizon, or
  * by a lexicographically smaller (doc_id, pos) occurrence in the SAME
  * micro-batch (so a single-batch replay reproduces the batch
  * keep-first rule EXACTLY; across batches the keep rule is
  * first-ARRIVAL, the [[StreamingLines]] honest difference, documented)
  * — then the document's removable start positions merge into maximal
  * spans with the batch island rule (gap ≤ n ⇒ same span) and one
  * stats row emits per document IN ITS ARRIVAL BATCH.
  *
  * Plan shape: the positional-gram kernel runs BEFORE any exchange
  * (gram text never shuffles — only 60-bit hashes); the ONE stateful
  * stage is gram-keyed and holds a ~16-byte row per DISTINCT gram
  * inside the horizon (never per occurrence — the StreamingDedup
  * bounded-state contract), expired by event-time timeout. The
  * per-document reassembly runs BATCH-LOCALLY in foreachBatch — a
  * document is one input row, so all its flagged grams materialize in
  * the same micro-batch and the island fold is an ordinary Catalyst
  * aggregate over that batch (bounded by document length); no second
  * stateful operator exists, so Spark's global-watermark correctness
  * gate stays ON (a flatMapGroupsWithState feeding another stateful op
  * trips it — by design we emit stats the moment the doc arrives
  * instead of waiting out an emission window). */
object StreamingSubstr {

  /** Stage 1: per-occurrence removable flags, gram-keyed state only.
    * Columns: `(ts, doc_id, nw, pos, rm)` — pos = −1 marks the
    * passthrough row of a sub-n-word (gram-less) document. */
  def flagged(
      docs: DataFrame,
      delay: String = "10 minutes",
      memoryMs: Long = 3600L * 1000L,
      n: Int = graft.operators.Dedup.SpanGramN): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col("ts"), col("doc_id"),
        org.apache.spark.sql.graftexpr.TextExpressions
          .hashWordNgramsSeq(col("text"), n).as("raw"))
      .select(col("ts"), col("doc_id"),
        element_at(col("raw"), 1).as("nw"),
        posexplode_outer(slice(col("raw"), lit(2),
          greatest(size(col("raw")) - 1, lit(0)))).as(Seq("pos", "g")))
      .withWatermark("ts", delay)
      .as[(Timestamp, Long, Long, Option[Int], Option[Long])]
      .groupByKey(_._5)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (gram: Option[Long], it: Iterator[(Timestamp, Long, Long, Option[Int], Option[Long])],
            state: GroupState[GramSeen]) => {
          val rows = it.toList
          if (state.hasTimedOut) {
            // horizon passed with no fresh occurrence: forget the gram
            state.remove()
            Iterator.empty
          } else if (gram.isEmpty) {
            // the gram-less (sub-n-word) documents' passthrough rows
            rows.iterator.map(r => (r._1, r._2, r._3, -1, false))
          } else {
            val seen = state.exists
            // keep-first within the batch: lexicographic (doc_id, pos)
            val keep = if (seen) None else Some(rows.map(r => (r._2, r._4.get)).min)
            val out = rows.map { r =>
              val rm = seen || keep.exists(_ != ((r._2, r._4.get)))
              (r._1, r._2, r._3, r._4.get, rm)
            }
            // monotone memory horizon: a LATE in-horizon occurrence must
            // not shorten the gram's memory (overwriting lastMs with an
            // older batch max would re-arm the timeout earlier and let a
            // later occurrence wrongly pass as fresh keep-first — ADVICE
            // r18), so the stored watermark only ever advances
            val maxMs = math.max(rows.map(_._1.getTime).max,
              state.getOption.map(_.lastMs).getOrElse(Long.MinValue))
            state.update(GramSeen(maxMs))
            state.setTimeoutTimestamp(maxMs + memoryMs)
            out.iterator
          }
        })
      .toDF("ts", "doc_id", "nw", "pos", "rm")
  }

  /** The per-document island merge over one micro-batch of [[flagged]]
    * rows — the batch `dd_substr_remove` fold as a Catalyst expression
    * (removable positions sorted; gap ≤ n ⇒ same span), bounded by
    * document length. A plain BATCH aggregate: every document's rows
    * live in its arrival batch. */
  def perDocStats(batch: DataFrame,
      n: Int = graft.operators.Dedup.SpanGramN): Dataset[SubstrStats] = {
    import batch.sparkSession.implicits._
    val sortedRm = sort_array(filter(collect_list(
      when(col("rm"), col("pos"))), p => p.isNotNull))
    val acc0 = struct(lit(0L).as("spans"), lit(0L).as("rmw"),
      lit(-1L).as("s"), lit(-1L).as("prev"))
    val fold = aggregate(sortedRm, acc0,
      (a, p) => {
        val pL = p.cast("long")
        val newIsland = a.getField("prev") < lit(0L) ||
          pL - a.getField("prev") > lit(n.toLong)
        struct(
          when(newIsland, a.getField("spans") + 1L)
            .otherwise(a.getField("spans")).as("spans"),
          when(newIsland,
            a.getField("rmw") +
              when(a.getField("s") >= 0L,
                a.getField("prev") + lit(n.toLong) - a.getField("s"))
                .otherwise(lit(0L)))
            .otherwise(a.getField("rmw")).as("rmw"),
          when(newIsland, pL).otherwise(a.getField("s")).as("s"),
          pL.as("prev"))
      },
      // close the last open island
      a => struct(a.getField("spans").as("spans"),
        (a.getField("rmw") +
          when(a.getField("s") >= 0L,
            a.getField("prev") + lit(n.toLong) - a.getField("s"))
            .otherwise(lit(0L))).as("rmw")))
    batch
      .groupBy(col("doc_id"))
      .agg(max(col("nw")).as("n_words"), fold.as("f"))
      .select(col("doc_id"), col("n_words"),
        col("f").getField("spans").as("n_spans"),
        col("f").getField("rmw").as("rm_words"),
        (col("n_words") - col("f").getField("rmw")).as("kept_words"))
      .as[SubstrStats]
  }

  /** Wire the live pass end-to-end: per micro-batch, flagged grams
    * reassemble into per-doc stats and `onStats` receives them (write
    * to a sink, join back to slice text, feed a dashboard). */
  def run(
      docs: DataFrame,
      onStats: Dataset[SubstrStats] => Unit,
      delay: String = "10 minutes",
      memoryMs: Long = 3600L * 1000L,
      n: Int = graft.operators.Dedup.SpanGramN,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    flagged(docs, delay, memoryMs, n)
      .writeStream
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onStats(perDocStats(batch, n))
      }
      .start()
}
