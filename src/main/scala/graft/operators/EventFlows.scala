package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** User-journey analytics over the event stream: funnels, retention
  * cohorts, and transition structure — the aggregate views an incident
  * dashboard grows into once "what broke" (templates, spikes) expands to
  * "what were users DOING when it broke" (the reference keeps user_id and
  * event on every log row for exactly this join,
  * /root/reference/src/ingestion/new_relic_fetcher.py:70-79).
  *
  * All three operators reduce the fact table along user_id — groupBys and
  * joins co-partition on the same key, so at 100 TB each is a handful of
  * linear user-keyed shuffles of an already filter-reduced relation, never
  * a pairwise blowup. Outputs are user- or type-cardinality relations.
  */
object EventFlows {

  /** SCD type-2 state history — the gaps-and-islands warehouse staple:
    * collapse each user's event stream into validity intervals
    * [valid_from, valid_to) of CONSECUTIVE same-state runs (state =
    * event_type), the dimension-history build every warehouse runs to
    * answer "what was this entity's state AT time t" with an as-of join.
    * Differs from sessionize (islands break on state CHANGE, not time
    * gaps) and from event_transitions (full run-length intervals, not
    * adjacent pairs).
    *
    * One user-keyed shuffle; the change-flag lag, the island running sum,
    * and the closing lead(valid_from) are all partition-local, and the
    * lead runs over the INTERVAL relation (≈ |events| / run length).
    * Contracts: NULL-ts events have no place on a timeline (the shared
    * sessionizer rule); a NULL state is a real state — runs of NULL
    * collapse like any other (null-safe change test) and surface with
    * state NULL; the current (open) interval has valid_to NULL. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame =
    scd2IntervalsFrom(Tables.events(spark, dir))

  private[graft] def scd2IntervalsFrom(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = events.where(col("ts").isNotNull)
      .withColumn("prev_state", lag(col("event_type"), 1).over(byUser))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("chg", when(col("rn") === 1 ||
        !(col("event_type") <=> col("prev_state")), 1).otherwise(0))
      .withColumn("island", sum("chg").over(run).cast("long"))
    val iv = st.groupBy(col("user_id"), col("island"))
      // the state is constant within an island (that's its definition);
      // min() extracts it and yields NULL for all-NULL islands
      .agg(min(col("event_type")).as("state"),
        count(lit(1)).as("n_events"),
        min(col("ts")).as("from_ts"))
    val byIsland = Window.partitionBy("user_id").orderBy(col("island"))
    iv.withColumn("to_ts", lead(col("from_ts"), 1).over(byIsland))
      .select(col("user_id"), col("island").as("state_seq"), col("state"),
        date_format(col("from_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
        date_format(col("to_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
        col("n_events"))
  }

  /** Ordered conversion funnel: per user, the furthest stage reached with
    * strictly increasing timestamps (a click before the first view does
    * NOT count — the stage sequence must actually happen in order).
    * Output: one row per user who entered stage 1, with the earliest
    * valid per-stage times and the reached stage.
    *
    * Three conditional min-aggregations, each joined to the previous
    * stage's earliest time — all keyed on user_id, so the shuffles
    * co-partition; the per-stage relations are user-cardinality. The
    * two-phase "min-then-filter-then-min" form is engine-portable (the
    * same CTE chain runs in DuckDB), unlike a per-user sorted scan.
    */
  def funnelSteps(spark: SparkSession, dir: String,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      withinDays: Int = 0): DataFrame =
    funnelStepsFrom(Tables.events(spark, dir), stages, withinDays)

  private[graft] def funnelStepsFrom(events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      withinDays: Int = 0): DataFrame = {
    require(stages.length == 3, "funnelSteps models a 3-stage funnel")
    // `withinDays` > 0 bounds each hop: the next stage must land within
    // that window of the previous stage's time (the product form of a
    // funnel — "converted within a day", not "converted ever")
    def hopOk(prev: Column): Column = {
      val after = col("ts") > prev
      if (withinDays <= 0) after
      else after && col("ts") <= prev + expr(s"INTERVAL $withinDays DAYS")
    }
    val ev = events
      .where(col("user_id").isNotNull && col("event_type").isin(stages: _*))
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.where(col("event_type") === stages(0))
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.where(col("event_type") === stages(1))
      .join(s1, "user_id").where(hopOk(col("t1")))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.where(col("event_type") === stages(2))
      .join(s2, "user_id").where(hopOk(col("t2")))
      .groupBy("user_id").agg(min("ts").as("t3"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .otherwise(1L).as("stage"))
  }

  /** Day-granularity retention cohorts: users cohorted by their first
    * active day; for each (cohort_day, day_offset), how many cohort
    * members were active and what fraction of the cohort that is.
    *
    * The cohort relation is user-cardinality and joins the fact table on
    * user_id (co-partitioned with the distinct that follows); the cohort
    * size joins back on cohort_day over a |days|-sized relation. The
    * retention rate divides exact integers, rounded on both engines.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame =
    retentionCohortsFrom(Tables.events(spark, dir))

  private[graft] def retentionCohortsFrom(events: DataFrame): DataFrame = {
    val ev = events
      .where(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val active = ev.join(cohort, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"),
        col("user_id"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
    val sizes = active.where(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    active.join(sizes, "cohort_day")
      // the day is a STRING in the output (the metrics_timeline
      // convention): Spark date vs DuckDB date land as different pandas
      // types in the driver's hasher even when every value matches
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_users"), col("cohort_size"),
        round(col("n_users").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
  }

  /** First-order transition structure of the event stream: counts and
    * conditional probabilities of consecutive (from → to) event types per
    * user, ordered by (ts, event_id) — the Markov view that makes "error
    * follows purchase 3× more than baseline" visible.
    *
    * One user-partitioned lead() window over the scan (the sessionize
    * shuffle), then a map-side-combined groupBy onto a |types|²-sized
    * relation; the row-probability denominator is a window over that tiny
    * relation. Linear at any corpus size.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    eventTransitionsFrom(Tables.events(spark, dir))

  /** The (from_type, to_type) adjacency pairs of consecutive events per
    * user — ONE definition shared by the transition probabilities here
    * and the [[Graphs.pagerank]] edge aggregation, so the two operators
    * can never disagree on what a transition is. */
  private[graft] def transitionPairs(events: DataFrame): DataFrame = {
    // asc_nulls_first is Spark's default; spelled out because the oracle
    // pins NULLS FIRST and the stateful twin mirrors it with a sentinel
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(asc_nulls_first("ts"), asc_nulls_first("event_id"))
    events
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(byUser).as("to_type"))
      .where(col("to_type").isNotNull)
  }

  private[graft] def eventTransitionsFrom(events: DataFrame): DataFrame =
    transitionProbabilities(transitionPairs(events))

  /** Last-touch attribution: each purchase attributed to the user's most
    * recent view within a trailing window — the classic marketing/
    * conversion join, and the batch path of record for the streaming
    * interval join ([[graft.streaming.StreamJoins.attributionCandidates]]
    * emits the same pairs continuously). One row per purchase; a purchase
    * with no in-window view keeps NULL attribution columns.
    *
    * Spark-first shape: [[JoinOps.asofJoin]] (one user-keyed shuffle +
    * partition-local sort, no range join) finds the latest view at or
    * before each purchase; the window bound then nulls out a too-old
    * match. Sound because views further back than the LATEST are older
    * still: if the asof match is outside the window, every view is.
    * Views are pre-aggregated unique per (user, ts) — asofJoin's tie
    * contract — keeping the largest event_id, the same deterministic
    * pick the oracle's rank makes. */
  def clickAttribution(spark: SparkSession, dir: String,
      windowHours: Int = 1): DataFrame =
    clickAttributionFrom(Tables.events(spark, dir), windowHours)

  /** Minutes-granularity window — the oracle parameter point where the
    * window predicate bites hard (at 5 minutes most purchases lose their
    * asof match and take the NULL branch). */
  def clickAttributionMinutes(spark: SparkSession, dir: String,
      windowMinutes: Int): DataFrame =
    attributionCore(Tables.events(spark, dir), windowMinutes * 60L * 1000000L)

  private[graft] def clickAttributionFrom(events: DataFrame,
      windowHours: Int = 1): DataFrame =
    attributionCore(events, windowHours.toLong * 3600L * 1000000L)

  private def attributionCore(events: DataFrame, windowUs: Long): DataFrame = {
    val tsUs = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    // Attribution is per purchase ENTITY, not per delivered row. An
    // at-least-once stream can redeliver a purchase byte-identical OR
    // mutated (same purchase_id, drifted ts/user from a producer retry);
    // the oracle (rank per purchase_id) and the streaming twin (winner
    // store keyed by purchase_id) both collapse either kind, so the
    // batch side ranks per purchase_id AFTER the asof match — latest
    // matched view wins across all delivered variants, the exact rule
    // the winner store applies — instead of a pre-join distinct() that
    // only collapses byte-identical rows. One purchase-keyed shuffle
    // either way (rank here vs distinct before), purchases are the
    // small side, so the plan cost is unchanged.
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val v = events.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    val gapUs = unix_micros(col("ts")) - unix_micros(col("attr.ts"))
    val within = gapUs <= lit(windowUs)
    val candidates = JoinOps.asofJoin(p, v, "user_id", "ts", "ts", "attr")
      .select(col("purchase_id"), col("user_id"), col("ts"),
        when(within, col("attr.view_id")).as("vid"),
        when(within, col("attr.ts")).as("vts"),
        when(within, gapUs).as("gap_us"))
    // Same ordering as StreamJoins.mergeBatch's winner rank, extended
    // with (ts, user_id) so a dead tie between mutated variants is still
    // deterministic; byte-identical redeliveries produce identical
    // candidate rows and collapse here too.
    val best = Window.partitionBy(col("purchase_id"))
      .orderBy(col("vts").desc_nulls_last, col("vid").desc_nulls_last,
        col("ts").desc_nulls_last, col("user_id").desc_nulls_last)
    candidates
      .withColumn("rk", row_number().over(best))
      .where(col("rk") === 1)
      .select(col("purchase_id"), col("user_id"),
        date_format(col("ts"), tsUs).as("purchase_ts"),
        col("vid").as("view_id"),
        date_format(col("vts"), tsUs).as("view_ts"),
        col("gap_us"))
  }

  /** (from_type, to_type) pairs → counts + conditional probabilities.
    * Shared by the window plan above and the stateful twin's entry
    * (SparkEntry `event_transitions_stateful`): both twins answer to ONE
    * oracle, so the aggregation they share must be one piece of code. */
  private[graft] def transitionProbabilities(pairs: DataFrame): DataFrame =
    pairs
      .groupBy("from_type", "to_type").agg(count("*").as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum("n").over(Window.partitionBy(col("from_type"))).cast("double"), 6))

  /** Frequent event-type TRIGRAMS across user journeys — order-3
    * sequential patterns past [[eventTransitions]]' bigram adjacency
    * (the "view→click→purchase vs view→click→view" question bigram
    * probabilities can't answer: second-order structure). Same window
    * shape as [[transitionPairs]] with a second lead — still ONE
    * user-keyed shuffle (the sessionize cost) collapsing onto a
    * ≤|types|³-sized relation, map-side combined; `share` normalizes by
    * the global trigram total via a window over that tiny relation only.
    * The NULL contract is transitionPairs': NULL-user/NULL-type rows
    * have no place in a journey, NULL-ts rows order first (pinned). */
  def eventTrigrams(spark: SparkSession, dir: String): DataFrame =
    eventTrigramsFrom(Tables.events(spark, dir))

  private[graft] def eventTrigramsFrom(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(asc_nulls_first("ts"), asc_nulls_first("event_id"))
    events
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("event_type").as("t1"),
        lead(col("event_type"), 1).over(byUser).as("t2"),
        lead(col("event_type"), 2).over(byUser).as("t3"))
      .where(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).cast("long").as("n"))
      // bounded: the global sum runs on the trigram AGGREGATE (≤ distinct
      // event-type³ rows), never on events
      .withColumn("share", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy()).cast("double"), 6))
  }
}
