package graft.streaming

import java.sql.Timestamp
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** level/ts are Option: both columns are nullable (see SessEvent's note —
  * a non-Option field NOT_NULL-asserts on the first NULL row). */
case class SpikeEvent(level: Option[String], ts: Option[Timestamp])

/** Per-level state: counts of days not yet closed by the watermark, the
  * trailing ≤7 closed-day counts (the baseline window), and the most
  * recent closed day — flatMapGroupsWithState does NOT auto-drop
  * late rows, so an event for an already-closed day must be discarded
  * here or it would re-open the day and emit a duplicate verdict with a
  * partial count. */
case class SpikeState(open: Map[String, Long], baseline: List[Long],
    lastClosed: String)

case class SpikeOut(level: Option[String], day: Option[String],
    n_events: Long, base_avg: Option[Double], base_std: Option[Double],
    base_n: Long, is_spike: Boolean)

/** Continuous incident-rate spike detection via `flatMapGroupsWithState` —
  * the streaming twin of `LogOps.anomalySpikes`, for the deployment where
  * the detector watches the log bus instead of re-scanning history every
  * run. Per-level state is a handful of open-day counters plus the ≤7
  * trailing closed-day counts (the baseline) — FIXED size per level, no
  * history accumulation. A day's verdict emits once the watermark closes
  * the day; its count then retires into the baseline for the days after
  * it.
  *
  * Batch mode runs the identical function (no watermark — every day
  * closes at end-of-group, in day order), reproducing the batch
  * operator's trailing-7-OBSERVED-rows frame exactly: that is how the
  * DuckDB oracle cross-checks this operator value-for-value against the
  * same SQL as `anomaly_spikes` (the sessionize / sessionize_stateful
  * pairing, applied to the detector). Same batch-mode caveat as
  * StatefulSessionize: one group (one level's events) buffers in memory,
  * so `LogOps.anomalySpikes` stays the batch path of record.
  *
  * NULL-day rows (NULL ts) sort first and enter later days' baselines —
  * the SQL window's asc-nulls-first ROWS frame does the same. In
  * streaming, NULL-ts rows never pass the watermark and are absent; at
  * day grain a late event for an already-closed day is dropped with the
  * same watermark contract as every late row.
  */
object StatefulSpikes {
  private val DayFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)
  private val DayMs = 86400000L

  def dayOf(ts: Timestamp): String = DayFmt.format(Instant.ofEpochMilli(ts.getTime))

  /** Spark round(x, 4) semantics (HALF_UP on BigDecimal). */
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def verdict(level: Option[String], day: Option[String], n: Long,
      baseline: List[Long], sigma: Double): SpikeOut = {
    val bn = baseline.size
    if (bn == 0) SpikeOut(level, day, n, None, None, 0L, is_spike = false)
    else {
      val mean = baseline.sum.toDouble / bn
      val std =
        if (bn < 2) None
        else Some(math.sqrt(baseline.map(x => { val d = x - mean; d * d }).sum / (bn - 1)))
      val spike = bn >= 3 && std.exists(s => n > mean + sigma * s)
      SpikeOut(level, day, n, Some(r4(mean)), std.map(r4), bn.toLong, spike)
    }
  }

  def fromEvents(events: DataFrame): Dataset[SpikeEvent] = {
    import events.sparkSession.implicits._
    events.select(col("event_type").as("level"), col("ts")).as[SpikeEvent]
  }

  def apply(events: Dataset[SpikeEvent], sigma: Double = 3.0,
      watermark: String = "1 day"): Dataset[SpikeOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermark) else events

    src.groupByKey(_.level)
      .flatMapGroupsWithState[SpikeState, SpikeOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (level: Option[String], it: Iterator[SpikeEvent], state: GroupState[SpikeState]) =>
          // close every open day strictly before `horizonDay` (None = all),
          // in day order, retiring each count into the trailing baseline
          def closeUpTo(s: SpikeState, horizonDay: Option[String]): (SpikeState, Seq[SpikeOut]) = {
            val (toClose, stillOpen) = horizonDay match {
              case Some(h) => s.open.partition(_._1 < h)
              case None    => (s.open, Map.empty[String, Long])
            }
            val out = ArrayBuffer.empty[SpikeOut]
            var base = s.baseline
            var last = s.lastClosed
            toClose.toSeq.sortBy(_._1).foreach { case (d, n) =>
              out += verdict(level, Some(d), n, base, sigma)
              base = (base :+ n).takeRight(7)
              last = if (d > last) d else last
            }
            (SpikeState(stillOpen, base, last), out.toSeq)
          }

          if (state.hasTimedOut) {
            val wmDay = DayFmt.format(
              Instant.ofEpochMilli(state.getCurrentWatermarkMs()))
            val (next, out) = closeUpTo(state.get, Some(wmDay))
            if (next.open.isEmpty && next.baseline.isEmpty) state.remove()
            else state.update(next)
            if (next.open.nonEmpty) state.setTimeoutTimestamp(
              state.getCurrentWatermarkMs() + DayMs)
            out.iterator
          } else if (!streaming) {
            // batch: one call with the whole group. NULL-ts rows form the
            // None day, ordered FIRST (the SQL frame's nulls-first): its
            // verdict emits before any real day and its count seeds the
            // baseline.
            val counts = it.toSeq.groupBy(_.ts.map(dayOf)).view.mapValues(_.size.toLong)
            val out = ArrayBuffer.empty[SpikeOut]
            var base = List.empty[Long]
            counts.toSeq.sortBy(_._1).foreach { case (d, n) =>
              out += verdict(level, d, n, base, sigma)
              base = (base :+ n).takeRight(7)
            }
            out.iterator
          } else {
            val s0 = state.getOption.getOrElse(SpikeState(Map.empty, Nil, ""))
            val newOpen = it.foldLeft(s0.open) { (m, e) =>
              e.ts.map(dayOf) match {
                // a row for an already-closed day is LATE beyond the
                // watermark contract: drop it (re-opening would emit the
                // day twice, the second time with a partial count)
                case Some(d) if d > s0.lastClosed =>
                  m.updated(d, m.getOrElse(d, 0L) + 1L)
                case _ => m // late day, or no event time at all
              }
            }
            val s1 = SpikeState(newOpen, s0.baseline, s0.lastClosed)
            // close what the watermark already passed, then arm the next
            // timeout one day past the watermark
            val wm = state.getCurrentWatermarkMs()
            val wmDay = if (wm > 0) Some(DayFmt.format(Instant.ofEpochMilli(wm))) else None
            val (next, out) = wmDay match {
              case Some(_) => closeUpTo(s1, wmDay)
              case None    => (s1, Seq.empty)
            }
            state.update(next)
            if (next.open.nonEmpty) state.setTimeoutTimestamp(math.max(wm, 0L) + DayMs)
            out.iterator
          }
      }
  }
}
