package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-time face of the batch heavy-hitters pass
  * ([[graft.operators.Relational]] `ev_heavy_hitters`): per-window
  * frequent items through the same native Misra-Gries
  * TypedImperativeAggregate
  * ([[org.apache.spark.sql.graftexpr.MisraGries]]).
  *
  * The sketch is what makes this shape stream-safe: the windowed
  * aggregate's state per open window is ONE serialized sketch of at
  * most k-1 counters — bounded by k, not by the window's item
  * cardinality — and batches fold into it through the aggregate's
  * merge (the mergeable-summaries combine), so a window's state never
  * grows with the traffic it saw. Same guarantees as the batch face:
  * counts are lower bounds within N/k, items above N/k always
  * survive, and a window whose distinct cardinality fits in k-1
  * counters reports exact counts. */
object StreamingHeavyHitters {

  /** Windowed frequent items. Input needs event-time `ts` and an
    * `event_type` column; emits one append-mode row per (closed
    * window, surviving item), counts in (lower-bound, item) order. */
  def windowedHeavyHitters(
      events: DataFrame,
      k: Int,
      delay: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen))
      .agg(org.apache.spark.sql.graftexpr.SketchExpressions
        .heavyHitters(col("event_type"), k).as("hh"))
      .select(col("window.start").as("win_start"), explode(col("hh")).as("e"))
      .select(col("win_start"), col("e.item").as("event_type"),
        col("e.lower_bound").as("n_events"))
}
