package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the capability class the stateful-operator twins
  * (sessionize, transitions, spikes, templates) don't cover: two LIVE
  * streams correlated on key + time bounds, with watermarks letting the
  * engine discard join state it can no longer need.
  */
object StreamJoins {

  /** Continuous attribution-candidate stream: every (purchase, view) pair
    * for the same user with the view inside the trailing window — the
    * streaming form of [[graft.operators.EventFlows.clickAttribution]].
    *
    * The interval condition (`vts BETWEEN ts - window AND ts`) plus the
    * two watermarks bound the join state: a buffered view older than
    * watermark + window can never match a future purchase and is evicted
    * by the engine. Left-outer, so an unattributed purchase still emits
    * (with NULL view columns) once its watermark passes — the engine can
    * only then prove no matching view is still coming.
    *
    * Emits CANDIDATES, not the batch operator's single last-touch pick:
    * top-1-per-purchase needs a rank over a completed group, which
    * append-mode stream joins cannot express — downstream picks (or the
    * batch path of record recomputes) the winner. Both forms agree on
    * WHICH views are eligible; the spec drives that equivalence.
    *
    * Inputs are streaming DataFrames with the events schema; both get
    * `delayThreshold`-late tolerance.
    */
  def attributionCandidates(purchases: DataFrame, views: DataFrame,
      windowHours: Int = 1, delayThreshold: String = "10 minutes"): DataFrame = {
    val p = purchases
      .where(col("event_type") === "purchase" && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      .withWatermark("ts", delayThreshold)
    val v = views
      .where(col("event_type") === "view" && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("vts"))
      .withWatermark("vts", delayThreshold)
    p.join(v,
      col("user_id") === col("v_user_id") &&
        col("vts") >= col("ts") - expr(s"INTERVAL $windowHours HOURS") &&
        col("vts") <= col("ts"),
      "leftOuter")
      .select(col("purchase_id"), col("user_id"), col("ts"),
        col("view_id"), col("vts"))
  }
}
