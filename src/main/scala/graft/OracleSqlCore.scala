package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Oracle SQL map, core chunk (see [[OracleHelpersA]]). */
trait OracleSqlCore { this: OracleHelpersA with OracleHelpersB =>
  private[graft] def oracleSqlCore: Map[String, String] = Map(
    "bpe_train" -> bpeTrainSql(12),
    "bpe_encode" -> bpeEncodeSql(12),
    "bpe_fertility" -> bpeFertilitySql(12),
    // Gopher rules: integer counts + one IEEE division per fraction; the
    // stopword count filters the NEEDLE list via list_contains (engine-
    // portable distinct semantics); NULL text → NULL rules, is_kept FALSE
    "quality_gopher" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |         regexp_split_to_array(text, '\n') AS lns
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
        |         CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS mwl,
        |         CAST(len(regexp_extract_all(text, '(#|\.\.\.|…)')) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS sym,
        |         CAST(len(list_filter(lns, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE)
        |           / CAST(len(lns) AS DOUBLE) AS bul,
        |         CAST(len(list_filter(lns, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS DOUBLE)
        |           / CAST(len(lns) AS DOUBLE) AS ell,
        |         CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS alp,
        |         len(list_filter(['the','a','an','and','or','of','to','in','is','it'],
        |             s -> list_contains(toks, s))) AS nstops
        |  FROM t)
        |SELECT doc_id, n_words, round(mwl, 4) AS mean_word_len,
        |       n_words >= 50 AND n_words <= 100000 AS ok_word_count,
        |       mwl >= 3.0 AND mwl <= 10.0 AS ok_mean_word_len,
        |       sym <= 0.1 AS ok_symbol_ratio,
        |       bul <= 0.9 AS ok_bullet_lines,
        |       ell <= 0.3 AS ok_ellipsis_lines,
        |       alp >= 0.8 AS ok_alpha_words,
        |       nstops >= 2 AS ok_stopwords,
        |       COALESCE(n_words >= 50 AND n_words <= 100000
        |         AND mwl >= 3.0 AND mwl <= 10.0 AND sym <= 0.1
        |         AND bul <= 0.9 AND ell <= 0.3 AND alp >= 0.8
        |         AND nstops >= 2, FALSE) AS is_kept
        |FROM r""".stripMargin,
    "dsir_weights" -> dsirWeightsSql("en"),
    "dsir_weights_de" -> dsirWeightsSql("de"),
    "dedup_spans" -> dedupSpansSql(15),
    "dedup_spans_n8" -> dedupSpansSql(8),
    "dedup_spans_removal" -> dedupSpansRemovalSql(15),
    "dedup_spans_removal_n8" -> dedupSpansRemovalSql(8),
    // UniMax water-filling: capacity-sorted prefix sums (window order
    // pinned NULLS FIRST to Spark's ascending default), the level is one
    // IEEE division of exact integers, the chosen segment is the first
    // rank whose candidate fits under its own capacity (scalar subquery
    // over the MATERIALIZED multi-referenced CTE)
    "budget_waterfill" ->
      """WITH caps AS (
        |  SELECT source,
        |         CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS cap
        |  FROM documents WHERE text IS NOT NULL GROUP BY source),
        |l AS MATERIALIZED (
        |  SELECT source, cap,
        |         CAST(row_number() OVER (ORDER BY cap, source NULLS FIRST) AS BIGINT) AS rk,
        |         CAST(count(*) OVER () AS BIGINT) AS m,
        |         (CAST(26000 AS DOUBLE) -
        |          CAST(coalesce(sum(cap) OVER (ORDER BY cap, source NULLS FIRST
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE))
        |           / CAST(m - rk + 1 AS DOUBLE) AS lvl
        |  FROM caps),
        |sel AS (SELECT (SELECT lvl FROM l WHERE lvl <= CAST(cap AS DOUBLE)
        |                ORDER BY rk LIMIT 1) AS level)
        |SELECT source, cap AS cap_tokens,
        |       round(CASE WHEN sel.level IS NULL THEN CAST(cap AS DOUBLE)
        |                  ELSE least(CAST(cap AS DOUBLE), sel.level) END, 6) AS alloc_tokens,
        |       round(sel.level, 6) AS level,
        |       (sel.level IS NULL OR CAST(cap AS DOUBLE) <= sel.level) AS is_saturated
        |FROM l CROSS JOIN sel""".stripMargin,
    "ingest_errors" -> ingestErrorsSql(
      "2024-01-02 00:00:00", "2024-01-29 00:00:00", "%1%", 500),
    "ingest_errors_window" -> ingestErrorsSql(
      "2024-01-10 00:00:00", "2024-01-20 00:00:00", "%3%", 100),

    "search_entries" -> searchEntriesSql(
      "error", "%2%", "7", "2024-01-01 00:00:00", 200),
    "search_entries_purchase" -> searchEntriesSql(
      "purchase", "%3%", "3", "2024-01-05 00:00:00", 100),
    "search_entries_none" -> searchEntriesSql(
      "error", "%2%", "graftnope", "2024-01-01 00:00:00", 200),
    "search_entries_ns" -> searchEntriesSql(
      "error", "%2%", "7", "2024-01-01 00:00:00", 200, namespace = "9"),

    "search_all" -> searchAllSql("7b"),
    "search_all_msg" -> searchAllSql("\"k\": 12"),
    "search_all_none" -> searchAllSql("graftnope"),

    "feedback_upsert" ->
      """WITH history AS (
        |  SELECT event_id AS entry_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
        |         props AS message, CAST(0 AS BIGINT) AS vote, '' AS comment
        |  FROM events WHERE event_type = 'error'),
        |feedback AS (
        |  SELECT entry_id,
        |         CAST(CASE WHEN entry_id % 14 = 0 THEN 1 ELSE -1 END AS BIGINT) AS vote,
        |         CASE WHEN entry_id % 14 = 0 THEN 'confirmed' ELSE 'noise' END AS comment
        |  FROM history WHERE entry_id % 7 = 0)
        |SELECT coalesce(f.entry_id, h.entry_id) AS entry_id, h.ts_us, h.message,
        |       coalesce(f.vote, h.vote) AS vote,
        |       coalesce(f.comment, h.comment) AS comment
        |FROM history h FULL OUTER JOIN feedback f ON h.entry_id = f.entry_id""".stripMargin,

    "preprocess_redact" ->
      """SELECT doc_id,
        |       regexp_replace(
        |         regexp_replace(text, '[\w.-]+@[\w.-]+', '[REDACTED_EMAIL]', 'g'),
        |         '\b(?:\d[ -]*?){13,16}\b', '[REDACTED_CARD]', 'g') AS clean_text
        |FROM documents""".stripMargin,

    "preprocess_dedup" ->
      """SELECT props, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
        |       min(event_id) AS first_event_id, count(*) AS n_dups
        |FROM events
        |GROUP BY props, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')""".stripMargin,

    "redact_secrets" ->
      """SELECT doc_id,
        |       regexp_replace(
        |         regexp_replace(
        |           regexp_replace(text, '[\w.-]+@[\w.-]+', '[REDACTED_EMAIL]', 'g'),
        |           '(?i)api[_-]?key\s*[:=]\s*\w+', 'api_key=[REDACTED]', 'g'),
        |         '(?i)token\s*[:=]\s*\w+', 'token=[REDACTED]', 'g') AS safe_text
        |FROM documents""".stripMargin,

    "metrics_timeline" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_incidents
        |FROM events GROUP BY 1""".stripMargin,

    "template_trending" ->
      """WITH t AS (
        |  SELECT event_type AS level, ts,
        |         regexp_replace(regexp_replace(props, '[0-9a-f]{8,}', '<hex>', 'g'),
        |                        '[0-9]+', '<num>', 'g') AS template
        |  FROM events),
        |r AS (
        |  SELECT level, template, count(*) AS n_recent FROM t
        |  WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' GROUP BY 1, 2),
        |b AS (
        |  SELECT level, template, count(*) AS n_baseline FROM t
        |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00' GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(r.level, b.level) AS level,
        |         coalesce(r.template, b.template) AS template,
        |         coalesce(r.n_recent, 0) AS n_recent,
        |         coalesce(b.n_baseline, 0) AS n_baseline
        |  FROM r FULL JOIN b
        |    ON r.level IS NOT DISTINCT FROM b.level
        |   AND r.template IS NOT DISTINCT FROM b.template)
        |SELECT level, template, n_recent, n_baseline,
        |       round((n_recent + 1.0) / (n_baseline + 1.0), 6) AS trend
        |FROM j
        |ORDER BY trend DESC, level ASC NULLS FIRST, template ASC NULLS FIRST
        |LIMIT 20""".stripMargin,

    "template_novelty" ->
      """WITH t AS (
        |  SELECT event_type AS level, event_id, ts,
        |         regexp_replace(regexp_replace(props, '[0-9a-f]{8,}', '<hex>', 'g'),
        |                        '[0-9]+', '<num>', 'g') AS template
        |  FROM events),
        |r AS (
        |  SELECT level, template, count(*) AS n_events,
        |         min(event_id) AS first_event_id
        |  FROM t WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' GROUP BY 1, 2),
        |b AS (
        |  SELECT DISTINCT level, template FROM t
        |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
        |SELECT r.* FROM r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM b
        |  WHERE b.level IS NOT DISTINCT FROM r.level
        |    AND b.template IS NOT DISTINCT FROM r.template)""".stripMargin,

    // hex BEFORE num (hex runs contain digits); 'g' = replace-all, which
    // is Spark regexp_replace's default
    "log_templates" ->
      """SELECT event_type AS level,
        |       regexp_replace(regexp_replace(props, '[0-9a-f]{8,}', '<hex>', 'g'),
        |                      '[0-9]+', '<num>', 'g') AS template,
        |       count(*) AS n_events, min(event_id) AS first_event_id
        |FROM events GROUP BY 1, 2""".stripMargin,

    // first_day is fetched by joining back on the unique min event id —
    // NOT arg_min, whose NULL-argument semantics differ from Spark's
    // min-struct under the NULL probe
    "template_first_seen" ->
      """WITH t AS (
        |  SELECT event_type AS level, event_id, strftime(ts, '%Y-%m-%d') AS day,
        |         regexp_replace(regexp_replace(props, '[0-9a-f]{8,}', '<hex>', 'g'),
        |                        '[0-9]+', '<num>', 'g') AS template
        |  FROM events),
        |g AS (SELECT level, template, min(event_id) AS first_event_id
        |      FROM t GROUP BY 1, 2)
        |SELECT g.level, g.template, g.first_event_id, t.day AS first_day
        |FROM g JOIN t ON t.event_id = g.first_event_id""".stripMargin,

    // NULLS FIRST pins DuckDB's window order to Spark's asc-nulls-first;
    // the ROWS frame makes "trailing 7 observed days" identical on both.
    // The stateful twin reproduces the same frame from per-level state,
    // so it checks against the SAME oracle (the sessionize pairing).
    "anomaly_spikes" -> anomalySpikesOracle,
    "anomaly_spikes_stateful" -> anomalySpikesOracle,
    "anomaly_spikes_s15" -> anomalySpikesSql(1.5),

    "metrics_timeline_filled" ->
      """WITH c AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_incidents
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events),
        |d AS (
        |  SELECT strftime(unnest(generate_series(d0, d1, INTERVAL 1 DAY)),
        |                  '%Y-%m-%d') AS day
        |  FROM b WHERE d0 IS NOT NULL)
        |SELECT d.day, coalesce(c.n_incidents, 0) AS n_incidents
        |FROM d LEFT JOIN c USING (day)""".stripMargin,

    // grouping inputs pre-coalesced to 'unknown' on both sides, so a
    // NULL after ROLLUP can only be a subtotal marker -> 'ALL'. HAVING
    // pins the EMPTY-input contract to Spark's grouping-sets semantics
    // (0 rows): standard SQL ROLLUP emits a grand-total-zero row on an
    // empty table, Spark's Expand+aggregate emits nothing — the filter
    // only ever bites that one row (every non-empty group counts >= 1)
    "metrics_rollup" ->
      """WITH e AS (
        |  SELECT coalesce(strftime(ts, '%Y-%m-%d'), 'unknown') AS day,
        |         coalesce(event_type, 'unknown') AS level
        |  FROM events)
        |SELECT coalesce(day, 'ALL') AS day, coalesce(level, 'ALL') AS level,
        |       count(*) AS n_events
        |FROM e GROUP BY ROLLUP(day, level)
        |HAVING count(*) > 0""".stripMargin,

    "events_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE coalesce(event_type, 'unknown') = 'click')    AS n_click,
        |  count(*) FILTER (WHERE coalesce(event_type, 'unknown') = 'error')    AS n_error,
        |  count(*) FILTER (WHERE coalesce(event_type, 'unknown') = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE coalesce(event_type, 'unknown') = 'signup')   AS n_signup,
        |  count(*) FILTER (WHERE coalesce(event_type, 'unknown') = 'view')     AS n_view,
        |  count(*) FILTER (WHERE coalesce(event_type, 'unknown') = 'unknown')  AS n_unknown
        |FROM events WHERE ts IS NOT NULL GROUP BY 1""".stripMargin,

    // the filled-timeline CTE chain (metrics_timeline_filled) + one
    // trailing-7-row window; avg of BIGINT is DOUBLE in both engines
    "metrics_moving_avg" ->
      """WITH c AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_incidents
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events),
        |d AS (
        |  SELECT strftime(unnest(generate_series(d0, d1, INTERVAL 1 DAY)),
        |                  '%Y-%m-%d') AS day
        |  FROM b WHERE d0 IS NOT NULL),
        |f AS (
        |  SELECT d.day, coalesce(c.n_incidents, 0) AS n_incidents
        |  FROM d LEFT JOIN c USING (day))
        |SELECT day, n_incidents,
        |       round(avg(n_incidents) OVER (
        |         ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
        |         AS avg_7d
        |FROM f""".stripMargin,

    "metrics_by_service" ->
      """SELECT user_id AS service_id, count(*) AS n_events,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1""".stripMargin,

    // missing level/namespace -> the "unknown" bucket, mirroring the
    // reference's Counter(e.get(attr, "unknown")) (app.py:28-33)
    "metrics_by_level" ->
      """SELECT coalesce(event_type, 'unknown') AS level, count(*) AS n_events,
        |       CASE WHEN coalesce(event_type, 'unknown') = 'error' THEN 3
        |            WHEN coalesce(event_type, 'unknown') = 'purchase' THEN 2
        |            WHEN coalesce(event_type, 'unknown') = 'signup' THEN 1
        |            ELSE 0 END AS severity
        |FROM events GROUP BY 1""".stripMargin,

    "metrics_by_namespace" ->
      """SELECT coalesce(source, 'unknown') AS namespace, count(*) AS n_docs,
        |       round(avg(n_chars), 4) AS avg_chars
        |FROM documents GROUP BY 1""".stripMargin,

    "search_keyword" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE lang = 'en' AND contains(lower(text), 'spark')""".stripMargin,

    "props_parse" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(avg(CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS BIGINT)), 4) AS avg_k,
        |       min(CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS BIGINT)) AS min_k,
        |       max(CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,

    "distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // Deterministic HLL (Sketches.scala): register index = md5 % 4096,
    // rho = 51 - bitlen(salted md5 % 2^50) via bin() string length (no
    // floating log2), harmonic sum as an EXACT integer scaled by 2^51.
    // The only float steps — the alpha*m^2*2^51 constant, one division,
    // and the linear-counting ln — are written in the same literal order
    // as the Spark side. Float literals carry e0: a bare 0.7213 is
    // DECIMAL in this engine and would change the arithmetic.
    "approx_distinct" -> approxDistinctSql,
    // the streaming twin's batch mode produces the identical registers
    // and estimate (one group invocation = the whole corpus) -> the
    // same oracle checks both (the sessionize_stateful pairing)
    "approx_distinct_stateful" -> approxDistinctSql,

    // z-store pruning-bound calibration: replays the cutpoint sample
    // (the layout_zorder CTEs), the bucket maps, the morton grid, and
    // the geometry worst-case bounds, then scores each predicate
    // family's pruned-file counts — all integer arithmetic except the
    // one round(avg, 6)
    "zorder_calibration" -> {
      val zexpr = (0 until 4).map(i =>
        s"((ub >> $i) & 1) * ${1L << (2 * i + 1)} + " +
          s"((db >> $i) & 1) * ${1L << (2 * i)}").mkString(" + ")
      def day(s: String): Long = java.time.LocalDate.parse(s).toEpochDay
      s"""WITH ev AS (
         |  SELECT event_id, user_id,
         |         (epoch_us(ts) - ((epoch_us(ts) % 86400000000)
         |            + 86400000000) % 86400000000) // 86400000000 AS day_idx
         |  FROM events),
         |nn AS (
         |  SELECT *, md5_number_lower('sample:' || CAST(event_id AS VARCHAR))
         |            % 2305843009213693951 AS hk
         |  FROM ev WHERE user_id IS NOT NULL AND day_idx IS NOT NULL),
         |samp AS (
         |  SELECT user_id, day_idx, event_id FROM (
         |    SELECT user_id, day_idx, event_id,
         |           row_number() OVER (ORDER BY hk, event_id) AS srk
         |    FROM nn) WHERE srk <= 4096),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_s FROM samp),
         |ru AS (SELECT user_id AS v,
         |              row_number() OVER (ORDER BY user_id, event_id) AS rn
         |       FROM samp),
         |rd AS (SELECT day_idx AS v,
         |              row_number() OVER (ORDER BY day_idx, event_id) AS rn
         |       FROM samp),
         |cu AS (
         |  SELECT list(v ORDER BY j) AS cuts_u FROM (
         |    SELECT j, max(CASE WHEN rn = greatest(1,
         |             CAST(floor(CAST(j * n_s AS DOUBLE) / 16.0) AS BIGINT))
         |           THEN v END) AS v
         |    FROM ru CROSS JOIN ns CROSS JOIN range(1, 16) t(j)
         |    GROUP BY j)),
         |cd AS (
         |  SELECT list(v ORDER BY j) AS cuts_d FROM (
         |    SELECT j, max(CASE WHEN rn = greatest(1,
         |             CAST(floor(CAST(j * n_s AS DOUBLE) / 16.0) AS BIGINT))
         |           THEN v END) AS v
         |    FROM rd CROSS JOIN ns CROSS JOIN range(1, 16) t(j)
         |    GROUP BY j)),
         |grid AS (SELECT CAST(a.i AS BIGINT) AS ub, CAST(b.j AS BIGINT) AS db
         |         FROM range(0, 16) a(i) CROSS JOIN range(0, 16) b(j)),
         |gfid AS (SELECT ub, db, ($zexpr) // 8 AS f FROM grid),
         |bu AS (SELECT CAST(max(nf) AS BIGINT) AS b FROM (
         |         SELECT ub, count(DISTINCT f) AS nf FROM gfid GROUP BY 1)),
         |bd AS (SELECT CAST(max(nf) AS BIGINT) AS b FROM (
         |         SELECT db, count(DISTINCT f) AS nf FROM gfid GROUP BY 1)),
         |usr AS (
         |  SELECT DISTINCT user_id FROM events
         |  WHERE user_id IS NOT NULL
         |    AND md5_number_lower('cal:' || CAST(user_id AS VARCHAR)) % 4 = 0),
         |ub0 AS (SELECT user_id,
         |          CAST(len(list_filter(cuts_u, c -> c <= user_id)) AS BIGINT) AS ub
         |        FROM usr CROSS JOIN cu),
         |dwin AS (SELECT
         |  CAST(len(list_filter(cuts_d, c -> c <= ${day("2024-01-01")})) AS BIGINT) AS m_lo,
         |  CAST(len(list_filter(cuts_d, c -> c <= ${day("2024-01-31")})) AS BIGINT) AS m_hi,
         |  CAST(len(list_filter(cuts_d, c -> c <= ${day("2024-01-08")})) AS BIGINT) AS w_lo,
         |  CAST(len(list_filter(cuts_d, c -> c <= ${day("2024-01-14")})) AS BIGINT) AS w_hi
         |  FROM cd),
         |uh AS (SELECT u.user_id, count(DISTINCT g.f) AS nf
         |       FROM ub0 u JOIN gfid g ON g.ub = u.ub GROUP BY 1),
         |um AS (SELECT u.user_id, count(DISTINCT g.f) AS nf
         |       FROM ub0 u CROSS JOIN dwin w JOIN gfid g
         |         ON g.ub = u.ub AND g.db BETWEEN w.m_lo AND w.m_hi
         |       GROUP BY 1),
         |uw AS (SELECT u.user_id, count(DISTINCT g.f) AS nf
         |       FROM ub0 u CROSS JOIN dwin w JOIN gfid g
         |         ON g.ub = u.ub AND g.db BETWEEN w.w_lo AND w.w_hi
         |       GROUP BY 1),
         |dys AS (SELECT DISTINCT day_idx FROM ev WHERE day_idx IS NOT NULL),
         |db0 AS (SELECT day_idx,
         |          CAST(len(list_filter(cuts_d, c -> c <= day_idx)) AS BIGINT) AS db
         |        FROM dys CROSS JOIN cd),
         |dp AS (SELECT d.day_idx, count(DISTINCT g.f) AS nf
         |       FROM db0 d JOIN gfid g ON g.db = d.db GROUP BY 1)
         |SELECT 'user_history' AS family, count(*) AS n_queries,
         |       CAST(max(nf) AS BIGINT) AS files_max,
         |       round(CAST(sum(nf) AS DOUBLE) / count(*), 6) AS files_avg,
         |       (SELECT b FROM bu) AS bound,
         |       max(nf) <= (SELECT b FROM bu) AS within_bound
         |FROM uh
         |UNION ALL
         |SELECT 'user_month', count(*), CAST(max(nf) AS BIGINT),
         |       round(CAST(sum(nf) AS DOUBLE) / count(*), 6),
         |       (SELECT b FROM bu), max(nf) <= (SELECT b FROM bu)
         |FROM um
         |UNION ALL
         |SELECT 'user_week', count(*), CAST(max(nf) AS BIGINT),
         |       round(CAST(sum(nf) AS DOUBLE) / count(*), 6),
         |       (SELECT b FROM bu), max(nf) <= (SELECT b FROM bu)
         |FROM uw
         |UNION ALL
         |SELECT 'day_point', count(*), CAST(max(nf) AS BIGINT),
         |       round(CAST(sum(nf) AS DOUBLE) / count(*), 6),
         |       (SELECT b FROM bd), max(nf) <= (SELECT b FROM bd)
         |FROM dp""".stripMargin
    },
  )
}
