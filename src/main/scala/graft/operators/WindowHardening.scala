package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §4 WW#3, as code (VERDICT r17 #7): `ev_markov` and
  * `ev_sessionize` window over one user's FULL event history — the
  * standard posture, whose partition width is bounded by the hottest
  * single user. If a pathological bot user bites at 100 TB, these are
  * the salt-split + boundary-merge second-pass spellings: the user's
  * history splits into deterministic TIME SLICES (the only salt that
  * preserves the window's order contract — a hash salt would shear
  * consecutive events apart), the sequential pass runs per (user,
  * slice) with partitions bounded by rate × slice width, and a second
  * pass over the O(slices)- or O(sessions)-scale relation stitches the
  * boundaries. Results are EXACTLY equal to the naive window
  * (WindowHardeningSpec gates a synthetic 100×-hot user), so flipping a
  * query to the hardened spelling is a pure plan change.
  *
  * Residual exposure, stated: the sessionize second pass windows over a
  * user's merged-session spans — an adversary emitting exactly
  * gap-spaced events forever makes sessions ≈ events and no
  * partitioning of a genuinely sequential chain can help; for every
  * real profile (bursty bots included — a continuous burst is ONE
  * span) the span relation is orders of magnitude smaller than the
  * event relation. */
object WindowHardening {

  /** Default slice width: one day — at 100 TB a slice partition holds
    * rate × 1 day events of ONE user, and the boundary relation is
    * O(active user-days), both far below any single-user history. */
  val DefaultSliceUs: Long = 24L * 3600L * 1000000L

  private def sliced(events: DataFrame, sliceUs: Long): DataFrame =
    events.withColumn("__slice",
      floor(unix_micros(col("ts")) / lit(sliceUs)).cast("long"))

  /** [[Relational.evMarkov]]'s transition counts with the per-user
    * window split by time slice: within-slice lag pairs window over
    * (user, slice); boundary pairs come from a SECOND lag over the
    * per-(user, slice) first/last event structs — an O(active
    * user-slices) relation, never events. Exactly equal to the naive
    * full-history window (spec-gated). */
  def markovTransitions(events: DataFrame,
      sliceUs: Long = DefaultSliceUs): DataFrame = {
    val ev = sliced(events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
      sliceUs)
    val wIn = Window.partitionBy("user_id", "__slice").orderBy("ts", "event_id")
    val within = ev
      .withColumn("next_type", lead(col("event_type"), 1).over(wIn))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
    // slice endpoints: min/max (ts, event_id, type) structs — ordering
    // matches the window's (ts, event_id) sort because the struct
    // comparison is lexicographic on exactly those leading fields
    val ends = ev
      .groupBy("user_id", "__slice")
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("first"),
        max(struct(col("ts"), col("event_id"), col("event_type"))).as("last"))
    val wB = Window.partitionBy("user_id").orderBy("__slice")
    val boundary = ends
      .withColumn("prev_last_type",
        lag(col("last").getField("event_type"), 1).over(wB))
      .filter(col("prev_last_type").isNotNull)
      .select(col("prev_last_type").as("from_type"),
        col("first").getField("event_type").as("to_type"))
    within.unionByName(boundary)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_type", "to_type")
  }

  /** [[Relational.evSessionize]]'s per-user session/event counts with
    * the same split: within-slice sessionization produces SPAN rows
    * (start, end, n_events) — one per within-slice session — and the
    * boundary merge is the identical gaps-and-islands pass over spans
    * ordered by start time (time slices make spans of one user totally
    * ordered across slices, so a span merges with its predecessor iff
    * the gap is within the threshold — associativity of the merge rule
    * means two-level merging equals one-level). The second window's
    * partition is O(user's within-slice sessions), not events. */
  def sessionize(events: DataFrame, gapUs: Long = 1800L * 1000000L,
      sliceUs: Long = DefaultSliceUs): DataFrame = {
    val ev = sliced(events.select(col("user_id"), col("ts"), col("event_id")), sliceUs)
    val wIn = Window.partitionBy("user_id", "__slice").orderBy("ts", "event_id")
    val spans = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(wIn))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_session")).over(
        wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "__slice", "sid")
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_ev"))
    val wSpan = Window.partitionBy("user_id").orderBy("start_ts", "end_ts")
    spans
      .withColumn("prev_end", lag(col("end_ts"), 1).over(wSpan))
      .withColumn("new_merged",
        when(col("prev_end").isNull ||
          unix_micros(col("start_ts")) - unix_micros(col("prev_end")) > gapUs, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(sum(col("new_merged")).as("n_sessions"), sum(col("n_ev")).as("n_events"))
      .orderBy("user_id")
  }
}
