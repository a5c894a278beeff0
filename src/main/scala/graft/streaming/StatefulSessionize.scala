package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** `user_id` and `value` are Option: both columns are nullable in the
  * events table, and a non-nullable field here fails the encoder's
  * NOT_NULL assert at runtime on the first NULL row. NULL user_ids form
  * one session group, matching SQL window PARTITION BY semantics. */
case class SessEvent(user_id: Option[Long], ts: Timestamp, value: Option[Double])

case class SessBuf(startUs: Long, lastUs: Long, n: Int, sum: Double,
    hasVal: Boolean)

case class SessionOut(user_id: Option[Long], session_start: Timestamp,
    session_end: Timestamp, n_events: Int, session_value: Option[Double])

/** Continuous gap-based sessionization via `flatMapGroupsWithState` —
  * custom per-key state the built-in windowed aggregations can't express
  * (sessions have data-dependent extents).
  *
  * State per user is a single [[SessBuf]] (32 bytes), bounded by the
  * event-time timeout: once the watermark passes `lastUs + gap`, the
  * session closes, emits, and the state is freed — state size tracks the
  * number of *concurrently active* users, not history. Batch mode runs the
  * identical function (timeouts never fire; open sessions close at
  * end-of-group), which is how the oracle cross-checks it against the
  * window-function sessionizer (Relational.sessionize).
  *
  * Batch-mode caveat: the per-trigger local sort (`it.toSeq.sortBy`
  * below) buffers one group in memory. In streaming that group is one
  * trigger's slice of one user — bounded by the trigger. In batch it is
  * the user's ENTIRE history, so a pathological single key can exceed
  * executor memory. `Relational.sessionize` (window lag + running sum,
  * spillable sort) is therefore the batch path of record; run this
  * operator over batch data only to cross-check the streaming semantics
  * at test scale.
  */
object StatefulSessionize {
  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000

  /** µs-precision round trip (Timestamp.getTime alone is ms-truncated). */
  def tsToUs(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
  def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000 * 1000)
    t.setNanos((us % 1000000).toInt * 1000)
    t
  }

  def apply(events: Dataset[SessEvent], gapUs: Long = DefaultGapUs,
      watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    // the sessionizer contract, enforced where the operator lives (not
    // just at registry call sites): an event without a timestamp has no
    // place in a session — and would NPE tsToUs below. The streaming
    // watermark drops such rows anyway; batch must match.
    val timed = events.filter((e: SessEvent) => e.ts != null)
    val src = if (streaming) timed.withWatermark("ts", watermark) else timed
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessBuf, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Option[Long], it: Iterator[SessEvent], state: GroupState[SessBuf]) =>
          // SQL-sum semantics: NULLs are skipped; an all-NULL session sums
          // to NULL (not 0.0), matching the oracle's round(sum(value), 2)
          def close(s: SessBuf): SessionOut =
            SessionOut(uid, usToTs(s.startUs), usToTs(s.lastUs), s.n,
              if (s.hasVal) Some(s.sum) else None)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val out = ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            // events within one trigger arrive unordered; sort locally
            it.toSeq.sortBy(e => (tsToUs(e.ts), e.value.getOrElse(0.0))).foreach { e =>
              val t = tsToUs(e.ts)
              val v = e.value.getOrElse(0.0)
              val has = e.value.isDefined
              cur match {
                case Some(s) if t - s.lastUs <= gapUs =>
                  cur = Some(SessBuf(s.startUs, math.max(s.lastUs, t),
                    s.n + 1, s.sum + v, s.hasVal || has))
                case Some(s) =>
                  out += close(s)
                  cur = Some(SessBuf(t, t, 1, v, has))
                case None =>
                  cur = Some(SessBuf(t, t, 1, v, has))
              }
            }
            cur.foreach { s =>
              if (streaming) {
                state.update(s)
                state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000)
              } else {
                // batch: no more data will come; close the open session
                out += close(s)
              }
            }
            out.iterator
          }
      }
  }
}
