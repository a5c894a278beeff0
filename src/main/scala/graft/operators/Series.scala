package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Time-series statistics over the event timeline — the robust-
  * statistics / smoothing / cross-correlation trio next to
  * [[LogOps.anomalySpikes]]'s trailing mean-σ detector (the reference
  * charts exactly this daily-count axis, app.py:20-27; these are the
  * statistics an analyst derives FROM that chart).
  *
  * Shared scale shape: the only corpus-sized work in each operator is
  * ONE map-side-combined groupBy of the fact table onto the
  * (level|type) × day grid — a vocabulary × timeline relation, KBs at
  * any corpus size. Every subsequent step (medians, folds, pair
  * products) runs on that aggregated relation; where an operator
  * consumes it from several branches it sits behind a lazy
  * localCheckpoint lineage cut so the fact table is scanned exactly
  * once (the dedup_spans pattern, Corpus.scala).
  *
  * Determinism contract: integer counts everywhere; medians are
  * EXPLICIT sorted-array arithmetic (odd → middle, even → the two
  * middles averaged in one pinned op order) rather than engine
  * percentile calls, EWMA is a pinned left fold over the day-ordered
  * prefix, and Pearson r is computed from exact integer sums in one
  * fixed-order double expression. Rounding happens once, at the output.
  */
object Series {

  // ----------------------------------------------------------------
  // Robust anomaly detection (median / MAD)
  // ----------------------------------------------------------------

  /** Median-absolute-deviation spike detection per (level, day) — the
    * robust twin of [[LogOps.anomalySpikes]]: one planted 100× day
    * shifts a trailing MEAN baseline enough to mask its neighbors, but
    * moves the median and MAD of the level's history not at all
    * (breakdown point 50% vs 0%). A day is anomalous when
    * |n − median| > k·MAD, with the MAD = 0 degenerate case (over half
    * the days identical) falling back to "any deviation flags".
    *
    * The per-level day vector is collected into ONE aggregation row
    * (bounded by the timeline length — the [[LogOps.metricsMovingAvg]]
    * day-axis argument) and both medians are computed in-row from the
    * sorted array, so the whole operator is one corpus aggregation plus
    * one vocabulary-sized aggregation — no joins, no second scan, and
    * no reliance on engine percentile interpolation semantics. */
  def anomalyMad(spark: SparkSession, dir: String, k: Double = 3.0): DataFrame =
    anomalyMadFrom(Tables.events(spark, dir), k)

  /** Exact median of a sorted numeric array in one pinned op order:
    * odd length → the middle element; even → the two middles averaged
    * as (a + b) / 2.0 in doubles. On integer counts (and on the
    * half-integer deviations they produce) every step is exact. */
  private def medianOfSorted(vals: Column): Column = {
    val sz = size(vals)
    // Column '/' is double division — truncate back for the 1-based index
    val mid = ((sz + 1) / 2).cast("int")
    val lo = (sz / 2).cast("int")
    when(sz % 2 === 1, element_at(vals, mid).cast("double"))
      .otherwise((element_at(vals, lo).cast("double") +
        element_at(vals, lo + 1).cast("double")) / lit(2.0))
  }

  private[graft] def anomalyMadFrom(events: DataFrame, k: Double): DataFrame = {
    val daily = events
      .groupBy(col("event_type").as("level"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
    val per = daily
      .groupBy(col("level"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("arr"))
      .withColumn("med", medianOfSorted(
        array_sort(transform(col("arr"), e => e.getField("n")))))
      .withColumn("mad", medianOfSorted(
        array_sort(transform(col("arr"),
          e => abs(e.getField("n").cast("double") - col("med"))))))
    per.select(col("level"), col("med"), col("mad"),
        explode(col("arr")).as("e"))
      .select(col("level"), col("e.day").as("day"),
        col("e.n").as("n_events"),
        // med/mad are exact multiples of 0.25 — rounding is cosmetic
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        when(col("mad") > 0,
          abs(col("e.n").cast("double") - col("med")) > lit(k) * col("mad"))
          .otherwise(col("e.n").cast("double") =!= col("med"))
          .as("is_anomaly"))
  }

  // ----------------------------------------------------------------
  // Exponential smoothing
  // ----------------------------------------------------------------

  /** Exponentially weighted moving average of the gap-filled incident
    * timeline — the trend line whose memory never hard-expires, next to
    * [[LogOps.metricsMovingAvg]]'s k-day box window. s₁ = x₁,
    * sᵢ = α·xᵢ + (1−α)·sᵢ₋₁, evaluated as a pinned left fold over the
    * day-ordered prefix (the fold both engines replay op-for-op;
    * α = 0.25 is exact binary so the coefficients carry no literal
    * noise). Gap-filling FIRST matters exactly as it does for the
    * moving average: a zero day must decay the smoothed level.
    *
    * The unpartitioned ordered window is safe here and only here: it
    * runs on the already-aggregated day-cardinality relation (the
    * metricsMovingAvg argument), never on raw events; the expanding
    * prefix list it carries is bounded by the timeline length. */
  def metricsEwma(spark: SparkSession, dir: String,
      alpha: Double = 0.25): DataFrame =
    metricsEwmaFrom(Tables.events(spark, dir), alpha)

  private[graft] def metricsEwmaFrom(events: DataFrame,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0,1]: $alpha")
    // bounded: runs on the filled day GRID (one row per calendar day)
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    LogOps.metricsTimelineFilledFrom(events)
      .withColumn("pre",
        collect_list(col("n_incidents").cast("double")).over(w))
      .select(col("day"), col("n_incidents"),
        round(aggregate(
          slice(col("pre"), lit(2), greatest(size(col("pre")) - 1, lit(0))),
          element_at(col("pre"), 1),
          (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc), 6)
          .as("ewma"))
  }

  /** Trailing 7-day rolling MEDIAN of each level's zero-filled daily
    * counts — the robust trend line next to [[LogOps.metricsMovingAvg]]'s
    * box mean and [[metricsEwma]]'s exponential decay: one planted 100×
    * day bends a 7-day mean for a week but leaves the rolling median
    * untouched in every window where normal days hold the majority.
    * Same explicit sorted-array median arithmetic as [[anomalyMad]]
    * (never engine percentile semantics); the window runs over the
    * zero-filled level × day GRID (a gap day is a 0 in the window, and
    * the grid sidesteps the NULL-day ordering divergence a raw trailing
    * window would hit — Spark sorts NULLS FIRST, the oracle engine
    * last). Short leading windows take the median of what's there.
    * One events aggregation behind a lazy cut; everything after is
    * grid-sized. */
  def metricsRollingMedian(spark: SparkSession, dir: String,
      days: Int = 7): DataFrame =
    metricsRollingMedianFrom(Tables.events(spark, dir), days)

  private[graft] def metricsRollingMedianFrom(events: DataFrame,
      days: Int): DataFrame = {
    require(days >= 1, s"window must span at least one day: $days")
    val daily = events
      .where(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type").as("level"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(false) // levels + domain + grid: one events scan
    val domain = daily
      .agg(min(to_date(col("day"))).as("d0"), max(to_date(col("day"))).as("d1"))
      .where(col("d0").isNotNull)
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"))
    val grid = daily.select(col("level")).distinct()
      .crossJoin(broadcast(domain))
    val w = Window.partitionBy(col("level")).orderBy(col("day"))
      .rowsBetween(-(days - 1), Window.currentRow)
    grid.join(daily, Seq("level", "day"), "left")
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("arr", collect_list(col("n_events")).over(w))
      .select(col("level"), col("day"), col("n_events"),
        medianOfSorted(array_sort(col("arr"))).as(s"med_${days}d"))
  }

  // ----------------------------------------------------------------
  // Forward-fill imputation (LOCF)
  // ----------------------------------------------------------------

  /** Last-observation-carried-forward imputation of each event type's
    * daily value total over the shared gap-filled day grid — the
    * imputation leg of the timeline-repair family (gap-fill surfaces
    * the hole as a 0-count day, [[metricsEwma]] smooths through it;
    * LOCF answers "what was the level's last known reading" for
    * dashboards that must not draw a dip where there was no data).
    *
    * A day is MISSING (and filled) in two equivalent ways: absent from
    * the grid entirely, or present with no summable values (all
    * NULL/non-finite under the [[LogOps.metricsByService]] try_cast
    * contract) — both surface v_obs = NULL and inherit the last
    * observation; leading missing days stay NULL (nothing to carry).
    *
    * Scale shape: one events aggregation (decimal sums — double
    * summation is shuffle-order dependent) behind a lazy lineage cut
    * feeds the level set and the grid join; the fill window partitions
    * by level over the day axis — the aggregated grid, never raw
    * events. */
  def metricsLocf(spark: SparkSession, dir: String): DataFrame =
    metricsLocfFrom(Tables.events(spark, dir))

  private[graft] def metricsLocfFrom(events: DataFrame): DataFrame = {
    val v = expr("try_cast(value AS DECIMAL(12,2))")
    val daily = events
      .where(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type").as("level"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(v).cast("double").as("v_obs"))
      .localCheckpoint(false) // levels + domain + grid: one events scan
    val domain = daily
      .agg(min(to_date(col("day"))).as("d0"), max(to_date(col("day"))).as("d1"))
      .where(col("d0").isNotNull)
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"))
    val grid = daily.select(col("level")).distinct()
      .crossJoin(broadcast(domain))
    val w = Window.partitionBy(col("level")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("level", "day"), "left")
      .withColumn("v_filled", last(col("v_obs"), ignoreNulls = true).over(w))
      .select(col("level"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("v_obs"), col("v_filled"))
  }

  // ----------------------------------------------------------------
  // Cross-series Pearson correlation
  // ----------------------------------------------------------------

  /** Pearson correlation between every pair of event types' daily count
    * series over the shared (gap-filled) day axis — "which metrics move
    * together", the first cross-series question asked of any incident
    * dashboard. NOT the engines' streaming corr() aggregate (whose
    * merge order is undefined): r is assembled from exact integer sums
    *   n, Σx, Σy, Σxy, Σx², Σy²
    * in ONE fixed-order double expression, so the result is a pure
    * function of the data. Zero-filled days contribute 0 to every sum,
    * which means the sums need no materialized grid: Σx/Σx² aggregate
    * the per-type rows directly and Σxy only needs days where BOTH
    * types occur (the day-keyed self-join of the aggregated relation);
    * only n — the shared day-domain length — references the timeline
    * bounds. Products accumulate as DECIMAL (exact at any corpus size;
    * the oracle's HUGEINT mirrors it — both round the same integer to
    * the same double).
    *
    * Scale: one events aggregation behind a lazy lineage cut feeds all
    * three sum relations; everything after is |types| × days and
    * |types|² sized. A constant series has zero variance → r is NULL
    * (undefined), never a division by zero. */
  def corrPairs(spark: SparkSession, dir: String): DataFrame =
    corrPairsFrom(Tables.events(spark, dir))

  private[graft] def corrPairsFrom(events: DataFrame): DataFrame = {
    // one corpus aggregation; NULL-type rows have no series and
    // NULL-ts rows no day — both excluded by contract
    val daily = events
      .where(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type").as("t"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(false) // three consumers, one events scan
    val nDays = daily
      .agg(min(to_date(col("day"))).as("d0"), max(to_date(col("day"))).as("d1"))
      .where(col("d0").isNotNull)
      .select((datediff(col("d1"), col("d0")) + 1).cast("long").as("n_days"))
    val dec = (c: Column) => c.cast("decimal(18,0)")
    val sums = daily.groupBy(col("t"))
      .agg(sum(col("n")).cast("long").as("sx"),
        sum(dec(col("n")) * dec(col("n"))).as("sxx"))
    val sxy = daily.as("a")
      .join(daily.as("b"),
        col("a.day") === col("b.day") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(sum(dec(col("a.n")) * dec(col("b.n"))).as("sxy"))
    val pairs = sums.select(col("t").as("ta"), col("sx").as("sxa"),
        col("sxx").as("sxxa"))
      .join(sums.select(col("t").as("tb"), col("sx").as("sxb"),
        col("sxx").as("sxxb")), col("ta") < col("tb"))
    val d = (c: Column) => c.cast("double")
    val nd = d(col("n_days"))
    val cov = nd * d(coalesce(col("sxy"), lit(0L))) - d(col("sxa")) * d(col("sxb"))
    val vx = nd * d(col("sxxa")) - d(col("sxa")) * d(col("sxa"))
    val vy = nd * d(col("sxxb")) - d(col("sxb")) * d(col("sxb"))
    pairs
      .join(broadcast(sxy), Seq("ta", "tb"), "left")
      .crossJoin(broadcast(nDays))
      .select(col("ta").as("type_a"), col("tb").as("type_b"), col("n_days"),
        when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6)).as("r"))
  }
}
