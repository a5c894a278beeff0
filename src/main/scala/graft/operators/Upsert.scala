package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Keyed merge (MERGE INTO shape) — the engine twin of the reference's
  * per-entry feedback persistence: the RCA detail page upserts a vote and
  * comment onto a history entry and rewrites the store
  * (/root/reference/src/dashboard/app.py:92-95,105-121).
  *
  * At 100 TB a point-update is a key-partitioned merge, not a rewrite:
  * both sides shuffle once on the key (or zero times if the base is
  * bucketed on it), matched rows take the update's non-null values,
  * unmatched base rows pass through, unmatched update rows insert.
  */
object Upsert {

  /** Generic keyed merge. `updates` must carry the key columns plus any
    * subset of base's non-key columns; for those, the update value wins
    * when non-null. Update-only keys become inserts (base-only columns
    * absent from `updates` are null on inserted rows).
    */
  def mergeByKey(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val updCols = updates.columns.toSet -- keys
    require(updCols.subsetOf(base.columns.toSet -- keys),
      s"update columns ${updCols -- base.columns.toSet} not present in base")
    val b = base.as("b")
    val u = updates.as("u")
    val cond = keys.map(k => col(s"b.$k") <=> col(s"u.$k")).reduce(_ && _)
    val merged = b.join(u, cond, "full_outer")
    val outKeys = keys.map(k => coalesce(col(s"u.$k"), col(s"b.$k")).as(k))
    val outRest = base.columns.filterNot(keys.contains).map { c =>
      if (updCols(c)) coalesce(col(s"u.$c"), col(s"b.$c")).as(c)
      else col(s"b.$c").as(c)
    }
    merged.select(outKeys ++ outRest: _*)
  }

  /** feedback_upsert query: the history table is the ingest-shaped error
    * log (entry_id, ts, message) with default vote/comment; the feedback
    * batch votes on every 7th entry (alternating confirm/noise). The merge
    * itself is [[mergeByKey]] — one equi-join on entry_id. */
  def feedbackUpsert(spark: SparkSession, dir: String): DataFrame = {
    val tsUs = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val history = Tables.events(spark, dir)
      .where(col("event_type") === "error")
      .select(col("event_id").as("entry_id"),
        date_format(col("ts"), tsUs).as("ts_us"),
        col("props").as("message"),
        lit(0L).as("vote"), lit("").as("comment"))
    val feedback = history
      .where(pmod(col("entry_id"), lit(7)) === 0)
      .select(col("entry_id"),
        when(pmod(col("entry_id"), lit(14)) === 0, 1L).otherwise(-1L).as("vote"),
        when(pmod(col("entry_id"), lit(14)) === 0, lit("confirmed"))
          .otherwise(lit("noise")).as("comment"))
    mergeByKey(history, feedback, Seq("entry_id"))
  }
}
