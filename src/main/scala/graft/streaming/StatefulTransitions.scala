package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Caller contract: rows are pre-filtered to non-NULL user_id/event_type
  * (the batch twin [[graft.operators.EventFlows.eventTransitions]] applies
  * the same predicate). ts and event_id stay Options: the batch window
  * ORDERS BY them but does not filter them, so a NULL-ts row must form
  * pairs here too — it sorts FIRST (the pinned NULLS FIRST order of the
  * window plan and the oracle), via the Long.MinValue sentinel. */
case class TransEvent(user_id: Long, ts: Option[Timestamp],
    event_id: Option[Long], event_type: String)

case class TransState(lastUs: Long, lastId: Long, lastType: String)

case class TransPair(user_id: Long, from_type: String, to_type: String)

/** Continuous transition-pair extraction — the streaming form of
  * [[graft.operators.EventFlows.eventTransitions]]'s lead() window: each
  * arriving event pairs with the user's previous event, so the Markov
  * counts downstream stay live as the stream flows.
  *
  * State is one (ts, event_id, event_type) record per user — the LAST
  * event only, bounded by concurrent user cardinality. NoTimeout is
  * deliberate (the StatefulTemplates argument): a user returning after
  * any silence still forms a pair with their previous event; expiring the
  * state would silently drop that edge. Within a trigger, events sort
  * locally by (ts, event_id) with NULLs first — the same total order the
  * batch window uses — so intra-trigger pairs agree with lead();
  * cross-trigger pairs ride the carried state. Late events older than the
  * carried state cannot be re-ordered retroactively (the
  * stateful-sessionize caveat): the window plan is the batch path of
  * record, and batch mode here sees each user whole so it reproduces
  * lead() exactly — which is how the SAME DuckDB oracle checks both
  * twins value-for-value.
  */
object StatefulTransitions {
  import StatefulSessionize.tsToUs

  /** NULLS FIRST as a sort key: a NULL ts/event_id sorts before every
    * real value, exactly like the batch window's default ascending order
    * (and the oracle's pinned NULLS FIRST). */
  private def sortKey(e: TransEvent): (Long, Long) =
    (e.ts.map(tsToUs).getOrElse(Long.MinValue),
      e.event_id.getOrElse(Long.MinValue))

  def apply(events: Dataset[TransEvent]): Dataset[TransPair] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TransEvent], state: GroupState[TransState]) =>
          val out = ArrayBuffer.empty[TransPair]
          var cur = state.getOption
          it.toSeq.sortBy(sortKey).foreach { e =>
            val (us, id) = sortKey(e)
            cur.foreach(s => out += TransPair(uid, s.lastType, e.event_type))
            cur = Some(TransState(us, id, e.event_type))
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
