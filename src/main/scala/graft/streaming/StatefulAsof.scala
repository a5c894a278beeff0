package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One tagged event of an as-of request group: `horizon` is the request's
  * time bound (the feed is pre-filtered to ts ≤ horizon — the events the
  * cache would have seen by then). Nullable columns ride as Option (the
  * encoder NOT_NULL rule every streaming twin here follows); NULL-ts rows
  * are off the timeline (the shared sessionizer rule) and must be
  * filtered before the encoder. */
case class AsofEvent(user_id: Option[Long], horizon: String, ts: Timestamp,
    event_id: Option[Long], event_type: Option[String], value: Option[Double])

/** The serving-cache record: the winning row's total-order key plus its
  * carried payload — one small record per (user, horizon) group. */
case class AsofState(ts_us: Long, event_id: Option[Long],
    event_type: Option[String], value: Option[Double])

case class AsofOut(user_id: Option[Long], horizon: String, asof_us: Long,
    event_type: Option[String], value: Option[Double])

/** Continuous latest-state-per-user cache — the streaming twin of
  * [[graft.operators.Relational.eventsAsofServedFrom]] (the
  * sessionize/scd2 batch↔streaming pairing applied to the point-serve):
  * each group keeps ONE [[AsofState]] record, the row that wins the
  * serve's pinned total order (ts DESC, then event_id / event_type DESC
  * NULLS LAST — None orders below Some, exactly NULLS LAST under DESC),
  * and emits the current winner each trigger (Update mode — the cache
  * row is replaced, never appended). Batch mode sees each group whole
  * and emits the final winner once, which makes batch output identical
  * to the z-store serve and checkable against the SAME raw-table as-of
  * oracle.
  *
  * Unlike the SCD2/sessionize twins, out-of-order delivery is HARMLESS
  * here: max over a total order is order-insensitive, so a late event
  * either wins (and updates the cache) or loses (and is a no-op) — no
  * late-arrival guard, no corruption mode. NoTimeout is deliberate: a
  * serving cache's entry for a silent user is still that user's latest
  * state; expiring it would serve "no answer" for a user who has one.
  * State is one record per group — bounded by user cardinality, the
  * dimension size a serving cache holds anyway. */
object StatefulAsof {
  import StatefulSessionize.tsToUs

  /** The serve's total order as a comparable key: Scala's Option
    * ordering (None < Some) IS "DESC NULLS LAST" when taking the max. */
  private val ord: Ordering[(Long, Option[Long], Option[String])] =
    Ordering.Tuple3(Ordering.Long, Ordering.Option(Ordering.Long),
      Ordering.Option(Ordering.String))

  def apply(events: Dataset[AsofEvent]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.horizon))
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Option[Long], String), it: Iterator[AsofEvent],
            state: GroupState[AsofState]) =>
          val (uid, horizon) = key
          var cur = state.getOption
          it.foreach { e =>
            val k = (tsToUs(e.ts), e.event_id, e.event_type)
            // strict gt: an exact duplicate of the winner is a no-op
            if (cur.forall(s =>
                ord.gt(k, (s.ts_us, s.event_id, s.event_type))))
              cur = Some(AsofState(k._1, e.event_id, e.event_type, e.value))
          }
          cur.foreach(state.update)
          cur.map(s =>
            AsofOut(uid, horizon, s.ts_us, s.event_type, s.value)).iterator
      }
  }
}
