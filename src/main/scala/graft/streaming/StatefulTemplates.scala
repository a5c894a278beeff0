package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, date_format}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ALL fields Option (the SessEvent nullability note): a primitive Long
  * event_id would NPE at encoding time on a NULL id row — the TransEvent
  * lesson — while the DuckDB oracle's min(event_id) just ignores it. */
case class TemplEvent(level: Option[String], template: Option[String],
    event_id: Option[Long], day: Option[String])

/** STATE-SCHEMA COMPATIBILITY: widening firstId from Long to
  * Option[Long] (the r8 NULL-id hardening) changed the
  * flatMapGroupsWithState state encoder schema — a streaming query
  * restarted from a checkpoint written by a pre-r8 build will fail (or
  * misread state) against this class. Fresh deployments are unaffected;
  * an upgrade of a running query needs a new checkpoint directory (the
  * store is re-derivable by replaying the log topic). */
case class TemplState(firstId: Option[Long], firstDay: Option[String])

case class TemplOut(level: Option[String], template: Option[String],
    first_event_id: Option[Long], first_day: Option[String])

/** Continuous first-seen template detection — the streaming form of the
  * "new error shape" trigger ([[graft.operators.LogOps.templateNovelty]]
  * is the two-period batch form): the FIRST time a (level, template)
  * shape appears on the log bus, emit one alert row; every later
  * occurrence is silent. Completes the incident-trigger trilogy's
  * streaming side next to [[StatefulSpikes]] (rate) and the batch
  * trending rank.
  *
  * State is one (first_event_id, first_day) record per DISTINCT template
  * shape — bounded by template cardinality, which is the entire premise
  * of template mining (shapes are few; occurrences are many), so
  * NoTimeout retention is deliberate: a shape must stay known forever or
  * it would re-alert. The alert pins the first ARRIVING exemplar; batch
  * mode sees each group whole, so it pins the global minimum event id —
  * which is how the DuckDB oracle checks this operator value-for-value
  * (the sessionize / sessionize_stateful pairing).
  */
object StatefulTemplates {

  def fromEvents(events: DataFrame): Dataset[TemplEvent] = {
    import events.sparkSession.implicits._
    events.select(
      col("event_type").as("level"),
      graft.operators.LogOps.templateCol(col("props")).as("template"),
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd").as("day")).as[TemplEvent]
  }

  def apply(events: Dataset[TemplEvent]): Dataset[TemplOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.level, e.template))
      .flatMapGroupsWithState[TemplState, TemplOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Option[String], Option[String]), it: Iterator[TemplEvent],
            state: GroupState[TemplState]) =>
          if (state.exists) {
            it.foreach(_ => ()) // known shape: drain, stay silent
            Iterator.empty
          } else {
            // first batch carrying this shape: alert with its earliest row.
            // NULL ids rank LAST (min-over-defined, the oracle's
            // NULL-ignoring min) — a bare Option minBy would rank None
            // FIRST and pin a NULL exemplar over a real one
            val first = it.minBy(e =>
              (e.event_id.isEmpty, e.event_id.getOrElse(Long.MaxValue)))
            state.update(TemplState(first.event_id, first.day))
            Iterator.single(TemplOut(key._1, key._2, first.event_id, first.day))
          }
      }
  }
}
