package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** user_id / event_id / event_type are Option (nullable columns — the
  * encoder's NOT_NULL assert fires on the first NULL row otherwise);
  * NULL user_ids form one history, matching PARTITION BY semantics, and
  * a NULL state is a real state whose runs collapse like any other. */
case class Scd2Event(user_id: Option[Long], ts: Timestamp,
    event_id: Option[Long], event_type: Option[String])

case class Scd2State(island: Long, state: Option[String], fromUs: Long,
    n: Long)

case class Scd2Out(user_id: Option[Long], state_seq: Long,
    state: Option[String], valid_from: Timestamp,
    valid_to: Option[Timestamp], n_events: Long)

/** Continuous SCD type-2 history build — the streaming twin of
  * [[graft.operators.EventFlows.scd2Intervals]]: each user's current
  * state run rides one [[Scd2State]] (island ordinal, state, open
  * timestamp, run length); a state CHANGE closes the run and emits the
  * finished validity interval with `valid_to` = the new run's
  * `valid_from` — exactly the batch lead(valid_from) chain, produced
  * incrementally.
  *
  * NoTimeout is deliberate (the StatefulTransitions argument): an SCD2
  * run has no natural expiry — a user silent for a month is still IN
  * their last state, and expiring it would fabricate a spurious new
  * interval on return. State is one small record per user, bounded by
  * user cardinality (the dimension size — exactly what a warehouse's
  * current-state table holds anyway).
  *
  * Late/out-of-order arrival (streaming only): events WITHIN a trigger
  * sort before folding, but an event older than the open run's
  * valid_from arriving in a LATER trigger is dropped — intervals before
  * the open run have already emitted (Append mode is immutable output),
  * so the only alternatives are a corrupt valid_to < valid_from interval
  * or a retraction the mode cannot express. Cross-trigger order within
  * each user is therefore the streaming delivery contract; the batch
  * twin (the declared path of record) is order-insensitive.
  *
  * Streaming emits CLOSED intervals only (Append mode: the open run may
  * still extend); batch mode sees each user whole and additionally
  * emits the open interval with valid_to NULL at end-of-group, making
  * batch output identical to the window-function twin — one DuckDB
  * oracle checks both. The per-trigger local sort buffers one group
  * (the sessionize_stateful caveat): the window twin is the batch path
  * of record.
  */
object StatefulScd2 {
  import StatefulSessionize.{tsToUs, usToTs}

  private def sortKey(e: Scd2Event): (Long, Long) =
    (tsToUs(e.ts), e.event_id.getOrElse(Long.MinValue))

  def apply(events: Dataset[Scd2Event]): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Option[Long], it: Iterator[Scd2Event],
            state: GroupState[Scd2State]) =>
          val out = ArrayBuffer.empty[Scd2Out]
          var cur = state.getOption
          it.toSeq.sortBy(sortKey).foreach { e =>
            // STREAMING late-arrival guard: an event older than the open
            // run's valid_from (delivered in a later trigger) cannot be
            // retro-inserted into an island chain whose earlier intervals
            // already emitted — treating it as a state change at its own
            // timestamp would emit valid_to < valid_from and corrupt the
            // chain. Drop it: the batch path (the declared path of
            // record) sees each history whole and orders it correctly,
            // so the guard never fires there.
            if (streaming && cur.exists(_.fromUs > tsToUs(e.ts))) ()
            else cur match {
              case Some(s) if s.state == e.event_type =>
                cur = Some(s.copy(n = s.n + 1))
              case Some(s) =>
                out += Scd2Out(uid, s.island, s.state, usToTs(s.fromUs),
                  Some(e.ts), s.n)
                cur = Some(Scd2State(s.island + 1, e.event_type,
                  tsToUs(e.ts), 1L))
              case None =>
                cur = Some(Scd2State(1L, e.event_type, tsToUs(e.ts), 1L))
            }
          }
          cur.foreach(state.update)
          // batch sees the whole history: the open run IS the current
          // interval (valid_to NULL). A stream must keep it in state —
          // it may extend on the next trigger.
          if (!streaming)
            cur.foreach(s => out += Scd2Out(uid, s.island, s.state,
              usToTs(s.fromUs), None, s.n))
          out.iterator
      }
  }
}
