package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Oracle SQL map, chunk A (see [[OracleHelpersA]]). */
trait OracleSqlRestA { this: OracleHelpersA with OracleHelpersB =>
  private[graft] def oracleSqlRestA: Map[String, String] = Map(
    // Deterministic CMS (depth 4 x width 2048, md5 family with the row
    // index as a literal salt) + the HLL key estimate (padded 5% UP) in
    // the threshold denominator. Counters and estimates are exact
    // integers, so only the threshold compare touches doubles.
    "heavy_hitters_approx" ->
      """WITH v AS (SELECT CAST(user_id AS VARCHAR) AS s FROM events WHERE user_id IS NOT NULL),
        |tot AS (SELECT count(*) AS total FROM v),
        |reg AS (
        |  SELECT md5_number_lower(s) % 4096 AS b,
        |         max(CASE WHEN md5_number_lower('rho:' || s) % 1125899906842624 = 0 THEN 51
        |              ELSE 51 - length(bin(md5_number_lower('rho:' || s) % 1125899906842624)) END) AS mx
        |  FROM v GROUP BY 1),
        |gz AS (
        |  -- HUGEINT + final DOUBLE: this UNGROUPED aggregate emits a row
        |  -- even for an empty corpus, where count(*)=0 makes the
        |  -- empty-register term 4096*2^51 = 2^63 — one past INT64. The
        |  -- Spark twin never evaluates that row (empty input => empty
        |  -- group-by), and for every non-empty corpus z2 < 2^63 converts
        |  -- to the same double either way.
        |  SELECT CAST(COALESCE(SUM(CAST(1 AS BIGINT) << CAST(51 - mx AS INT)), 0)
        |              + (4096 - count(*)) * CAST(2251799813685248 AS HUGEINT) AS DOUBLE) AS z2,
        |         4096 - count(*) AS vz
        |  FROM reg),
        |kest AS (
        |  SELECT CAST(floor(CASE WHEN vz > 0 AND 0.7213e0/(1.0e0 + 1.079e0/4096.0e0)*4096.0e0*4096.0e0*2251799813685248.0e0/z2 <= 10240.0e0
        |          THEN 4096.0e0 * ln(4096.0e0 / CAST(vz AS DOUBLE))
        |          ELSE 0.7213e0/(1.0e0 + 1.079e0/4096.0e0)*4096.0e0*4096.0e0*2251799813685248.0e0/z2 END) AS BIGINT) AS k
        |  FROM gz),
        |sk AS (
        |  SELECT r.i, md5_number_lower('cms' || CAST(r.i AS VARCHAR) || ':' || s) % 2048 AS h,
        |         count(*) AS c
        |  FROM v CROSS JOIN range(4) r(i) GROUP BY 1, 2),
        |keys AS (SELECT DISTINCT s FROM v),
        |est AS (
        |  SELECT keys.s, min(sk.c) AS est
        |  FROM keys CROSS JOIN range(4) r(i)
        |  JOIN sk ON sk.i = r.i
        |         AND sk.h = md5_number_lower('cms' || CAST(r.i AS VARCHAR) || ':' || keys.s) % 2048
        |  GROUP BY 1)
        |SELECT CAST(est.s AS BIGINT) AS user_id, est.est AS n_events_est
        |FROM est, tot, kest
        |WHERE est.est > 1.15e0 * CAST(total AS DOUBLE) / (CAST(k AS DOUBLE) * 1.05e0)""".stripMargin,

    "sessionize_stateful" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events WHERE ts IS NOT NULL),
        |s AS (
        |  SELECT user_id, ts, value,
        |         CAST(sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |                       THEN 1 ELSE 0 END)
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(count(*) AS INT) AS n_events,
        |       round(sum(value), 2) AS session_value,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "incident_report" -> incidentReportSql(1000),
    "incident_report_cap" -> incidentReportSql(25),

    "slack_message" ->
      """WITH b AS (
        |  SELECT event_id,
        |         printf('- %s | user_%d | %s | %s',
        |                strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), user_id, event_type,
        |                regexp_replace(
        |                  regexp_replace(
        |                    regexp_replace(props, '[\w.-]+@[\w.-]+', '[REDACTED_EMAIL]', 'g'),
        |                    '(?i)api[_-]?key\s*[:=]\s*\w+', 'api_key=[REDACTED]', 'g'),
        |                  '(?i)token\s*[:=]\s*\w+', 'token=[REDACTED]', 'g')) AS line
        |  FROM events
        |  WHERE event_type = 'error' AND ts IS NOT NULL
        |  ORDER BY ts, event_id
        |  LIMIT 5),
        |a AS (
        |  SELECT count(*) AS n_logs,
        |         string_agg(line, chr(10) ORDER BY event_id) AS logs_txt
        |  FROM b)
        |SELECT '*AI RCA & Fix Suggestion:*' || chr(10) || '*Logs:*' || chr(10) ||
        |       logs_txt || chr(10) || '*RCA & Fix:*' || chr(10) ||
        |       printf('RCA pending for %d incidents (batch digest %s)', n_logs, md5(logs_txt))
        |         AS message
        |FROM a""".stripMargin,

    // the app.py share variant: namespace segment between level and message
    // when the entry has one (app.py:139-141); CASE gives '' for a missing
    // field, and the trailing `|| redacted` NULL-propagates a NULL props
    // exactly like the Spark when-guard
    "slack_message_ns" ->
      """WITH b AS (
        |  SELECT event_id,
        |         printf('- %s | user_%d | %s',
        |                strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), user_id, event_type) ||
        |         CASE WHEN CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END IS NOT NULL
        |                   AND CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END != ''
        |              THEN ' | ' || CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END ELSE '' END ||
        |         ' | ' ||
        |         regexp_replace(
        |           regexp_replace(
        |             regexp_replace(props, '[\w.-]+@[\w.-]+', '[REDACTED_EMAIL]', 'g'),
        |             '(?i)api[_-]?key\s*[:=]\s*\w+', 'api_key=[REDACTED]', 'g'),
        |           '(?i)token\s*[:=]\s*\w+', 'token=[REDACTED]', 'g') AS line
        |  FROM events
        |  WHERE event_type = 'error' AND ts IS NOT NULL
        |  ORDER BY ts, event_id
        |  LIMIT 5),
        |a AS (
        |  SELECT count(*) AS n_logs,
        |         string_agg(line, chr(10) ORDER BY event_id) AS logs_txt
        |  FROM b)
        |SELECT '*AI RCA & Fix Suggestion:*' || chr(10) || '*Logs:*' || chr(10) ||
        |       logs_txt || chr(10) || '*RCA & Fix:*' || chr(10) ||
        |       printf('RCA pending for %d incidents (batch digest %s)', n_logs, md5(logs_txt))
        |         AS message
        |FROM a""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |       (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |       (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |       (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |            (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name AS region, n_name AS nation,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |            (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lineitems
        |FROM lineitem, orders, supplier, nation, region
        |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    // one oracle, two engines-side plans: the window-function sessionizer
    // and the native session_window aggregation must produce identical
    // sessions (the stateful twin checks the same sessions minus the
    // ordinal id — its own entry below)
    "sessionize" -> sessionizeOracle,
    "sessionize_native" -> sessionizeOracle,

    // NULL-ts rows sit outside the ASOF entirely (a timeless event has no
    // "most recent earlier" anything, and a timeless error can never be
    // one) — matches the Spark asofJoin's NULL-time contract. UNION ALL,
    // not a join-back: one output row per event with NO assumption that
    // event_id is unique or non-NULL
    "asof_prev_error" ->
      """WITH errs AS (
        |  SELECT user_id, ts, max(event_id) AS prev_error_id
        |  FROM events
        |  WHERE event_type = 'error' AND ts IS NOT NULL
        |  GROUP BY user_id, ts)
        |SELECT e.event_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
        |       e.user_id, r.prev_error_id,
        |       strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS prev_error_ts_us
        |FROM (SELECT event_id, user_id, ts FROM events WHERE ts IS NOT NULL) e
        |ASOF LEFT JOIN errs r
        |  ON e.user_id = r.user_id AND e.ts > r.ts
        |UNION ALL
        |SELECT event_id, CAST(NULL AS VARCHAR) AS ts_us, user_id,
        |       CAST(NULL AS BIGINT) AS prev_error_id,
        |       CAST(NULL AS VARCHAR) AS prev_error_ts_us
        |FROM events WHERE ts IS NULL""".stripMargin,

    // bounded-window rank formulation ≡ the Spark side's asof + window
    // null-out: the latest view overall is the latest in-window view
    // whenever any view is in-window
    "click_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, ts AS vts, max(event_id) AS view_id FROM events
        |  WHERE event_type = 'view' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT p.purchase_id, p.user_id, p.ts, v.view_id, v.vts,
        |         row_number() OVER (PARTITION BY p.purchase_id
        |                            ORDER BY v.vts DESC NULLS LAST,
        |                              v.view_id DESC NULLS LAST,
        |                              p.ts DESC NULLS LAST,
        |                              p.user_id DESC NULLS LAST) AS rk
        |  FROM p LEFT JOIN v
        |    ON p.user_id = v.user_id AND v.vts <= p.ts
        |   AND v.vts >= p.ts - INTERVAL 1 HOUR)
        |SELECT purchase_id, user_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |       view_id,
        |       strftime(vts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
        |       CAST(epoch_us(ts) - epoch_us(vts) AS BIGINT) AS gap_us
        |FROM j WHERE rk = 1""".stripMargin,

    "click_attribution_w5m" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, ts AS vts, max(event_id) AS view_id FROM events
        |  WHERE event_type = 'view' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT p.purchase_id, p.user_id, p.ts, v.view_id, v.vts,
        |         row_number() OVER (PARTITION BY p.purchase_id
        |                            ORDER BY v.vts DESC NULLS LAST,
        |                              v.view_id DESC NULLS LAST,
        |                              p.ts DESC NULLS LAST,
        |                              p.user_id DESC NULLS LAST) AS rk
        |  FROM p LEFT JOIN v
        |    ON p.user_id = v.user_id AND v.vts <= p.ts
        |   AND v.vts >= p.ts - INTERVAL 5 MINUTE)
        |SELECT purchase_id, user_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |       view_id,
        |       strftime(vts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
        |       CAST(epoch_us(ts) - epoch_us(vts) AS BIGINT) AS gap_us
        |FROM j WHERE rk = 1""".stripMargin,

    "top_events_per_user" ->
      """SELECT user_id, rk, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
        |  FROM events) t
        |WHERE rk <= 3""".stripMargin,

    "heavy_hitters" ->
      """WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1)
        |SELECT user_id, n_events FROM c
        |WHERE n_events > (SELECT avg(n_events) * 1.15 FROM c)""".stripMargin,

    // NULLS FIRST on the key tie-break pins DuckDB's default (NULLS LAST
    // for ASC) to Spark's (nulls first) — a NULL key CAN reach the top-N
    "skew_profile" ->
      """WITH k AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_rows
        |  FROM events GROUP BY 1),
        |g AS (SELECT count(*) AS n_keys, CAST(sum(n_rows) AS BIGINT) AS total_rows FROM k)
        |SELECT key, n_rows, n_keys, total_rows,
        |       round(CAST(n_rows AS DOUBLE) * n_keys / total_rows, 4) AS skew
        |FROM k, g
        |ORDER BY n_rows DESC, key ASC NULLS FIRST
        |LIMIT 5""".stripMargin,

    // bottom-k-by-md5 uniform sample (deterministic, mergeable), then
    // DuckDB's native quantile_cont over the sample — Spark's
    // rank-interpolation matches it exactly (proven by the exact twin).
    // The sample filter (finite, non-NULL) must run BEFORE the rank cut
    // or the two engines pick different rows.
    // equi-depth bucketing: the same deterministic bottom-k sample,
    // cutpoints at exact integer sample ranks, assignment = |cuts ≤ v|;
    // NULL / non-finite / no-finite-type → NULL bucket
    "equidepth_buckets" -> equidepthBucketsSql(10, 4096),

    "value_percentiles_sampled" ->
      """WITH nn AS (
        |  SELECT event_type, value, event_id,
        |         md5_number_lower('sample:' || CAST(event_id AS VARCHAR)) % 2305843009213693951 AS hk
        |  FROM events WHERE value IS NOT NULL AND isfinite(value)),
        |samp AS (
        |  SELECT event_type, value FROM (
        |    SELECT event_type, value,
        |           row_number() OVER (PARTITION BY event_type ORDER BY hk, event_id) AS srk
        |    FROM nn) WHERE srk <= 4096),
        |q AS (
        |  SELECT event_type AS q_type,
        |         round(quantile_cont(value, 0.5), 4) AS p50_sample,
        |         round(quantile_cont(value, 0.9), 4) AS p90_sample,
        |         round(quantile_cont(value, 0.99), 4) AS p99_sample,
        |         count(*) AS n_sample
        |  FROM samp GROUP BY 1),
        |base AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY 1)
        |SELECT b.event_type, p50_sample, p90_sample, p99_sample,
        |       COALESCE(n_sample, 0) AS n_sample, b.n_events
        |FROM base b LEFT JOIN q ON q.q_type IS NOT DISTINCT FROM b.event_type""".stripMargin,

    "value_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(CASE WHEN isfinite(value) THEN value END, 0.5), 4) AS p50,
        |       round(quantile_cont(CASE WHEN isfinite(value) THEN value END, 0.9), 4) AS p90,
        |       round(quantile_cont(CASE WHEN isfinite(value) THEN value END, 0.99), 4) AS p99,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value,
        |       count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "stream_windowed_counts" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |       event_type, count(*) AS n_events,
        |       round(sum(value), 2) AS total_value
        |FROM events WHERE ts IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "build_vocab" ->
      """SELECT token, freq, token_id FROM (
        |  SELECT token, freq,
        |         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS token_id
        |  FROM (
        |    SELECT token, count(*) AS freq FROM (
        |      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |      FROM documents) t
        |    WHERE length(token) > 0
        |    GROUP BY token HAVING count(*) >= 2) c) r
        |WHERE token_id <= 1000""".stripMargin,

    "encode_tokens" ->
      """WITH vocab AS (
        |  SELECT token, token_id FROM (
        |    SELECT token, CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS token_id
        |    FROM (
        |      SELECT token, count(*) AS freq FROM (
        |        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |        FROM documents) t
        |      WHERE length(token) > 0
        |      GROUP BY token HAVING count(*) >= 2) c) r
        |  WHERE token_id <= 1000),
        |toks AS (
        |  SELECT doc_id, generate_subscripts(ts, 1) AS pos, unnest(ts) AS token
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |        FROM documents) d)
        |SELECT t.doc_id,
        |       string_agg(CAST(coalesce(v.token_id, 0) AS VARCHAR), ',' ORDER BY t.pos) AS token_ids_csv,
        |       count(*) AS n_tokens,
        |       CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |FROM toks t LEFT JOIN vocab v USING (token)
        |GROUP BY t.doc_id""".stripMargin,

    "chunk_documents" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |         greatest(1, CAST(ceil((len(toks) - 8) / 56.0) AS BIGINT)) AS n_chunks
        |  FROM d),
        |u AS (
        |  SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS i FROM c)
        |SELECT doc_id, i AS chunk_idx,
        |       array_to_string(toks[CAST(i*56+1 AS BIGINT) : CAST(least(i*56+64, n) AS BIGINT)], ' ') AS chunk_text,
        |       least(64, n - i*56) AS n_chunk_tokens
        |FROM u""".stripMargin,

    "decontaminate" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(t[CAST(i+1 AS BIGINT) : CAST(least(i+8, n) AS BIGINT)], ' ') AS g
        |  FROM (
        |    SELECT doc_id, t, len(t) AS n,
        |           unnest(range(0, greatest(1, len(t) - 7))) AS i
        |    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |          FROM documents))),
        |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 0),
        |sh AS (
        |  SELECT g.doc_id, count(*) AS n_shared
        |  FROM g JOIN ev USING (g)
        |  WHERE g.doc_id % 10 != 0
        |  GROUP BY 1)
        |SELECT d.doc_id, coalesce(sh.n_shared, 0) AS n_shared_ngrams,
        |       coalesce(sh.n_shared, 0) > 0 AS is_contaminated
        |FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id
        |WHERE d.doc_id % 10 != 0""".stripMargin,

    // the pure-sketch maybe-set: j-salted md5 draws mod m (UNSIGNED %,
    // DuckDB's native UBIGINT semantics ≡ the kernel's
    // remainderUnsigned); a train gram flags iff ALL k draws' positions
    // are set — counting set DRAWS, so an intra-gram position collision
    // needs no special case on either engine
    "decontaminate_bloom" ->
      s"""WITH g AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(t[CAST(i+1 AS BIGINT) : CAST(least(i+8, n) AS BIGINT)], ' ') AS g
        |  FROM (
        |    SELECT doc_id, t, len(t) AS n,
        |           unnest(range(0, greatest(1, len(t) - 7))) AS i
        |    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        |          FROM documents))),
        |js AS (SELECT unnest(range(0, ${graft.operators.Corpus.DecontBloomHashes})) AS j),
        |bits AS (
        |  SELECT DISTINCT
        |         md5_number_lower('b' || CAST(j AS VARCHAR) || ':' || g)
        |           % ${graft.operators.Corpus.DecontBloomBits} AS bit
        |  FROM (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 0) CROSS JOIN js),
        |hit AS (
        |  SELECT tp.doc_id, tp.g
        |  FROM (SELECT doc_id, g,
        |               md5_number_lower('b' || CAST(j AS VARCHAR) || ':' || g)
        |                 % ${graft.operators.Corpus.DecontBloomBits} AS bit
        |        FROM g CROSS JOIN js WHERE doc_id % 10 != 0) tp
        |  JOIN bits USING (bit)
        |  GROUP BY 1, 2
        |  HAVING count(*) = ${graft.operators.Corpus.DecontBloomHashes}),
        |sh AS (SELECT doc_id, count(*) AS n FROM hit GROUP BY 1)
        |SELECT d.doc_id, coalesce(sh.n, 0) AS n_maybe_ngrams,
        |       coalesce(sh.n, 0) > 0 AS is_flagged
        |FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id
        |WHERE d.doc_id % 10 != 0""".stripMargin,

    // exact semantic decontamination: the normalize-then-dot kernel
    // mirror (see the ann_cosine_topk comment); best match per train
    // vector via rank-1, rendered as a left join so an empty eval split
    // keeps every train verdict
    "decontaminate_semantic_exact" ->
      s"""WITH c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = ${graft.operators.Embeddings.EmbeddingDim}
        |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0),
        |n AS (
        |  SELECT vec_id, CASE WHEN list_dot_product(e, e) = 0 THEN e
        |         ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e))) END AS e
        |  FROM c),
        |ev AS (
        |  SELECT vec_id AS eval_id, e AS er FROM n
        |  WHERE vec_id % 10 = 0 ORDER BY eval_id LIMIT 65536),
        |s AS (
        |  SELECT n.vec_id, ev.eval_id, round(list_dot_product(n.e, ev.er), 6) AS sim
        |  FROM n, ev WHERE n.vec_id % 10 <> 0),
        |r AS (
        |  SELECT vec_id, eval_id, sim,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, eval_id) AS rk
        |  FROM s)
        |SELECT t.vec_id, r.eval_id, r.sim AS eval_sim,
        |       coalesce(r.sim >= 0.95, FALSE) AS is_contaminated
        |FROM (SELECT vec_id FROM c WHERE vec_id % 10 <> 0) t
        |LEFT JOIN r ON t.vec_id = r.vec_id AND r.rk = 1""".stripMargin,

    // interpolated bigram perplexity: smoothed probabilities are single
    // divisions of exact integers, λ constants emitted as round-trip
    // doubles, per-doc means under round(·,4) (the unigram contract)
    "quality_perplexity_bigram" -> perplexityBigramSql(0.7),

    "quality_perplexity" ->
      """WITH vocab AS (
        |  SELECT token, freq FROM (
        |    SELECT token, freq,
        |           CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS token_id
        |    FROM (
        |      SELECT token, count(*) AS freq FROM (
        |        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |        FROM documents) t
        |      WHERE length(token) > 0
        |      GROUP BY token HAVING count(*) >= 2) c) r
        |  WHERE token_id <= 1000),
        |stats AS (SELECT sum(freq) + count(*) + 1 AS denom FROM vocab),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |scored AS (
        |  SELECT t.doc_id,
        |         ln((coalesce(v.freq, 0) + 1) / (SELECT denom FROM stats)) AS logp,
        |         CASE WHEN v.freq IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM toks t LEFT JOIN vocab v USING (token)
        |  WHERE length(t.token) > 0)
        |SELECT doc_id, round(exp(-avg(logp)), 4) AS perplexity,
        |       count(*) AS n_tokens,
        |       CAST(sum(oov) AS BIGINT) AS n_oov
        |FROM scored GROUP BY doc_id""".stripMargin,

    // quality_perplexity's scoring chain + the sampled tercile cutpoints
    // per lang (exact integer sample ranks over the ROUNDED perplexity);
    // NULL lang is a real stratum (IS NOT DISTINCT FROM join)
    "ccnet_buckets" ->
      """WITH vocab AS (
        |  SELECT token, freq FROM (
        |    SELECT token, freq,
        |           CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS token_id
        |    FROM (
        |      SELECT token, count(*) AS freq FROM (
        |        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |        FROM documents) t
        |      WHERE length(token) > 0
        |      GROUP BY token HAVING count(*) >= 2) c) r
        |  WHERE token_id <= 1000),
        |stats AS (SELECT sum(freq) + count(*) + 1 AS denom FROM vocab),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |sc AS (
        |  SELECT t.doc_id,
        |         ln((coalesce(v.freq, 0) + 1) / (SELECT denom FROM stats)) AS logp
        |  FROM toks t LEFT JOIN vocab v USING (token)
        |  WHERE length(t.token) > 0),
        |pp AS (SELECT doc_id, round(exp(-avg(logp)), 4) AS perplexity
        |       FROM sc GROUP BY doc_id),
        |dl AS (SELECT DISTINCT doc_id, lang FROM documents),
        |j AS (SELECT dl.doc_id, dl.lang, pp.perplexity
        |      FROM pp JOIN dl USING (doc_id)),
        |samp AS (
        |  SELECT lang, perplexity, doc_id FROM (
        |    SELECT lang, perplexity, doc_id,
        |           row_number() OVER (PARTITION BY lang ORDER BY
        |             md5_number_lower('ccnet:' || CAST(doc_id AS VARCHAR))
        |               % 2305843009213693951, doc_id) AS srk
        |    FROM j) WHERE srk <= 4096),
        |rk AS (
        |  SELECT lang, perplexity,
        |         CAST(row_number() OVER (PARTITION BY lang
        |           ORDER BY perplexity, doc_id) AS BIGINT) AS rn,
        |         CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_s
        |  FROM samp),
        |cuts AS (
        |  SELECT lang AS c_lang, list(v ORDER BY jj) AS cuts FROM (
        |    SELECT lang, jj, max(CASE WHEN rn = greatest(1,
        |             CAST(floor(CAST(jj * n_s AS DOUBLE) / 3.0) AS BIGINT))
        |           THEN perplexity END) AS v
        |    FROM rk CROSS JOIN range(1, 3) t(jj)
        |    GROUP BY lang, jj) GROUP BY lang)
        |SELECT dl.doc_id, dl.lang, pp.perplexity,
        |       CASE WHEN pp.perplexity IS NOT NULL AND cuts IS NOT NULL
        |            THEN ['head', 'middle', 'tail'][
        |              len(list_filter(cuts, c -> c <= pp.perplexity)) + 1]
        |       END AS bucket
        |FROM dl
        |LEFT JOIN pp USING (doc_id)
        |LEFT JOIN cuts ON dl.lang IS NOT DISTINCT FROM cuts.c_lang""".stripMargin,

    // NULL day/type are real quasi-id groups; the sensitive bucket is
    // NULL for non-finite values (count DISTINCT skips it in both
    // engines); width-10 bucket = one exact IEEE division + floor
    "k_anonymity" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |       count(*) AS n_rows,
        |       count(DISTINCT user_id) AS n_subjects,
        |       count(DISTINCT CASE WHEN value IS NOT NULL
        |                            AND NOT isnan(value) AND abs(value) < 1e10
        |                      THEN CAST(floor(value / 10.0) AS BIGINT)
        |                      END) AS l_diversity,
        |       count(DISTINCT user_id) >= 5 AS k_anonymous,
        |       count(DISTINCT CASE WHEN value IS NOT NULL
        |                            AND NOT isnan(value) AND abs(value) < 1e10
        |                      THEN CAST(floor(value / 10.0) AS BIGINT)
        |                      END) >= 3 AS l_diverse
        |FROM events GROUP BY 1, 2""".stripMargin,

    "lang_id" ->
      """WITH s AS (
        |  SELECT doc_id, lang, text,
        |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) / length(text) AS cjk,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|it|you|that|for)\b')) AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|de|et|un|une|est|pour|que)\b')) AS s_fr,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|y|es|para|por|con|del|una)\b')) AS s_es,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|von|zu|mit|ein|nicht)\b')) AS s_de
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN text IS NULL THEN NULL
        |       WHEN cjk > 0.3 THEN 'zh'
        |       WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
        |       WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
        |       WHEN s_es >= s_de THEN 'es'
        |       ELSE 'de' END AS pred_lang,
        |  lang AS labeled_lang
        |FROM s""".stripMargin,

    // τ-sampling: the apportionment (sqrt-chain weights, pinned-fold
    // normalizer, floor + largest-remainder ranks) replayed in-plan;
    // the salted two-phase pick ≡ one plain per-stratum row_number
    "sample_temperature" -> sampleTemperatureSql(2, 60),
    "sample_temperature_t4" -> sampleTemperatureSql(4, 60),

    "sample_mixture" ->
      """SELECT doc_id, source, rk FROM (
        |  SELECT doc_id, source,
        |         CAST(row_number() OVER (
        |           PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2')) t
        |WHERE rk <= CASE source WHEN 'src0' THEN 20
        |                        WHEN 'src1' THEN 12
        |                        WHEN 'src2' THEN 8 END""".stripMargin,

    "sample_exact_stratified" ->
      """SELECT event_id, ts_us, user_id, event_type, value, rk FROM (
        |  SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
        |         user_id, event_type, value,
        |         CAST(row_number() OVER (
        |           PARTITION BY event_type
        |           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS BIGINT) AS rk
        |  FROM events) t
        |WHERE rk <= 100""".stripMargin,

    // seeded hash order is engine-portable (md5 hex on both sides); pos
    // is per-shard so the window key has 16^shardChars values, never one
    "corpus_shuffle" ->
      """WITH s AS (
        |  SELECT doc_id, md5('graft:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shuffle_key, substr(shuffle_key, 1, 2) AS shard,
        |       CAST(row_number() OVER (
        |         PARTITION BY substr(shuffle_key, 1, 2)
        |         ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
        |FROM s""".stripMargin,

    // sums CAST to BIGINT (DuckDB sum() returns HUGEINT → float in the
    // driver's hasher — the skew_profile lesson)
    "length_buckets" ->
      """WITH d AS (
        |  SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (
        |  SELECT CAST(floor(n_tokens / 32) AS BIGINT) AS bucket,
        |         count(*) AS n_docs,
        |         CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |         CAST(max(n_tokens) AS BIGINT) AS max_tokens,
        |         CAST(sum(n_tokens) AS BIGINT) AS s
        |  FROM d GROUP BY 1)
        |SELECT bucket, n_docs, min_tokens, max_tokens,
        |       CAST(n_docs * max_tokens - s AS BIGINT) AS waste_tokens,
        |       CASE WHEN n_docs * max_tokens > 0
        |            THEN round(CAST(n_docs * max_tokens - s AS DOUBLE)
        |                       / (n_docs * max_tokens), 6)
        |            ELSE 0.0 END AS waste_frac
        |FROM b""".stripMargin,

    // each doc zipped with its own tail; numeric struct index because
    // list_zip yields an unnamed struct. Deterministic total order under
    // the LIMIT so boundary ties match Spark's
    "bigram_counts" ->
      """WITH t AS (
        |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (
        |  SELECT unnest(list_zip(toks[1:greatest(len(toks)-1, 0)],
        |                         toks[2:len(toks)])) AS bg
        |  FROM t)
        |SELECT bg[1] AS w1, bg[2] AS w2, count(*) AS n
        |FROM p GROUP BY 1, 2
        |ORDER BY n DESC, w1, w2
        |LIMIT 500""".stripMargin,

    // avg derived from the exact integer sum (not avg()) so both engines
    // divide the same integers; sums CAST to BIGINT (HUGEINT lesson)
    "corpus_stats" ->
      """WITH d AS (
        |  SELECT source, lang,
        |         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |         length(text) AS n_chars
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |         CAST(min(n_chars) AS BIGINT) AS min_chars,
        |         CAST(max(n_chars) AS BIGINT) AS max_chars
        |  FROM d GROUP BY 1, 2)
        |SELECT source, lang, n_docs, total_tokens,
        |       round(CAST(total_tokens AS DOUBLE) / n_docs, 4) AS avg_tokens,
        |       min_chars, max_chars
        |FROM g""".stripMargin,

    "dedup_exact" -> dedupExactOracle,
    // batch mode of the stateful twin folds each fingerprint group
    // whole → same oracle (the sessionize / sessionize_stateful pairing)
    "dedup_exact_stateful" -> dedupExactOracle,

    // The exact vector scans ARE SQL-expressible: both engines cast the
    // float embeddings to double and run the same sequential per-element
    // sums (VecDot/VecL2Normalize here, list_dot_product/list_transform
    // there), so the doubles are bit-identical and round(·,6) hashes
    // match. The CASE in every normalize CTE mirrors VecL2Normalize's
    // nrm>0 branch: an all-zero vector stays zero (sim 0.0) instead of
    // DuckDB's 0/0 = NaN, which would sort ABOVE every real sim and
    // fabricate matches. vector_knn's squared-L2 mirrors the kernel's (a−b)² op order
    // exactly (zip−subtract−dot), NOT the expanded a·a − 2a·b + b·b form,
    // to keep the same floating-point evaluation order.
    "ann_cosine_topk" ->
      s"""WITH c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = ${graft.operators.Embeddings.EmbeddingDim}
        |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0),
        |n AS (
        |  SELECT vec_id, CASE WHEN list_dot_product(e, e) = 0 THEN e
        |         ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e))) END AS e
        |  FROM c),
        |q AS (SELECT vec_id AS qid, e AS qe FROM n WHERE vec_id < 100),
        |s AS (
        |  SELECT q.qid, n.vec_id, round(list_dot_product(n.e, q.qe), 6) AS sim
        |  FROM n, q WHERE n.vec_id >= 100),
        |r AS (
        |  SELECT qid, vec_id, sim,
        |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
        |  FROM s)
        |SELECT qid, rk, vec_id, sim FROM r WHERE rk <= 10""".stripMargin,

    // blocked LSH paths, hash-green (r12): the hyperplanes are shared
    // driver constants, so the banding geometry is fully SQL-expressible
    "ann_lsh" -> annLshSql(hammingProbes = 0),
    "ann_lsh_multiprobe" -> annLshSql(hammingProbes = 8),

    // the seeded-quantizer IVF paths, hash-green (r13): centroids are a
    // deterministic md5-ordered corpus sample, so the ENTIRE pipeline —
    // seed choice, argmin assignment, probe selection, hot-bucket cap,
    // in-bucket cosine rank — replays in SQL (the k-means paths stay
    // rows-only by nature; this is the same machinery on verifiable
    // centroids)
    // the pair-flag dedup over the seeded quantizer: best same-bucket
    // neighbor by rounded cosine (capped candidates, tie to smaller id),
    // NULL-propagating is_dup for candidate-less vectors (left join) —
    // the dedupEmbeddingOn scaffold replayed value-for-value
    "dedup_embedding_seeded" ->
      s"""WITH $seededAssignCte,
        |capped AS (
        |  SELECT bucket, nn_id, er FROM (
        |    SELECT bucket, vec_id AS nn_id, e AS er,
        |           row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
        |    FROM assign) WHERE bn <= 1024),
        |s1 AS (
        |  SELECT a.vec_id, c.nn_id, round(${cosSql("a.e", "c.er")}, 6) AS sim
        |  FROM assign a JOIN capped c USING (bucket) WHERE a.vec_id <> c.nn_id),
        |best AS (
        |  SELECT vec_id, nn_id, sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rk
        |    FROM s1) WHERE rk = 1)
        |SELECT a.vec_id, a.bucket, b.nn_id, b.sim AS nn_sim,
        |       b.sim >= 0.95 AS is_dup
        |FROM assign a LEFT JOIN best b USING (vec_id)""".stripMargin,

    // outliers over the seeded quantizer: dist = sqrt of the assignment's
    // own argmin distance; the bucket normalizer runs on µ-quantized
    // INTEGER distances (di·n/Σdi) so no float aggregation order can
    // shift a rank — the Spark side computes the identical quantity
    "embedding_outliers_seeded" ->
      s"""WITH $seededAssignCte,
        |d AS (
        |  SELECT vec_id, bucket, sqrt(cdist) AS dist,
        |         CAST(round(sqrt(cdist) * 1.0e6) AS BIGINT) AS di
        |  FROM assign),
        |b AS (
        |  SELECT vec_id, bucket, dist, di,
        |         sum(di) OVER (PARTITION BY bucket) AS sum_di,
        |         count(*) OVER (PARTITION BY bucket) AS nb
        |  FROM d),
        |r AS (
        |  SELECT vec_id, bucket, round(dist, 6) AS dist,
        |         CASE WHEN nb > 1 AND sum_di > 0
        |              THEN round(CAST(di * nb AS DOUBLE) / CAST(sum_di AS DOUBLE), 6)
        |              ELSE 0.0e0 END AS outlier_ratio,
        |         nb = 1 AS singleton
        |  FROM b)
        |SELECT vec_id, bucket, dist, outlier_ratio, singleton
        |FROM r ORDER BY singleton DESC, outlier_ratio DESC, vec_id
        |LIMIT 100""".stripMargin,

    "ann_ivf_seeded" -> seededIvfSql(),

    // the erased store IS the same seeded geometry minus the subjects:
    // centroids/probes unchanged (erase the vectors, keep the
    // quantizer), the candidate side filtered BEFORE the per-bucket cap
    // — erased vectors neither surface nor hold cap slots
    "ann_ivf_erased" -> seededIvfSql(" WHERE NOT (vec_id % 13 = 2)"),

    // PQ replayed end-to-end: seeded codebook (md5 sample), per-subspace
    // first-min argmin codes, per-query LUT, fixed-order ADC sums
    // (explicit left-associative t0+..+t7 chain = the kernel's ascending-s
    // accumulation, bit-identical doubles), top-50 ADC survivors, exact
    // cosine re-rank
    "ann_pq" -> annPqSql,
    "ann_ivfpq" -> annIvfPqSql,

    // SemDeDup clusters: seeded blocking + pair scoring + recursive
    // label propagation (the dedup_clusters oracle pattern in embedding
    // space)
    "dedup_semantic_clusters" ->
      s"""WITH RECURSIVE $seededAssignCte,
        |capped AS (
        |  SELECT vec_id, e, bucket FROM (
        |    SELECT vec_id, e, bucket, row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
        |    FROM assign) WHERE bn <= 1024),
        |prs AS (
        |  SELECT l.vec_id AS src, r.vec_id AS dst
        |  FROM capped l JOIN capped r
        |    ON l.bucket = r.bucket AND l.vec_id < r.vec_id
        |  WHERE round(${cosSql("l.e", "r.e")}, 6) >= 0.95),
        |edges AS (SELECT src, dst FROM prs UNION ALL SELECT dst, src FROM prs),
        |reach AS (
        |  SELECT vec_id AS id, vec_id AS lbl FROM assign
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
        |lab AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY 1),
        |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1)
        |SELECT l.id AS vec_id, l.cluster AS cluster_id, s.cluster_size,
        |       l.id = l.cluster AS is_canonical
        |FROM lab l JOIN sz s ON s.cluster = l.cluster""".stripMargin,

    "decontaminate_semantic" ->
      s"""WITH $seededAssignCte,
        |evr AS (
        |  SELECT eval_id, er, bucket FROM (
        |    SELECT vec_id AS eval_id, e AS er, bucket,
        |           row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
        |    FROM assign WHERE vec_id % 10 = 0) WHERE bn <= 1024),
        |tr AS (SELECT vec_id, e, bucket FROM assign WHERE vec_id % 10 <> 0),
        |s1 AS (
        |  SELECT t.vec_id, ev.eval_id, round(${cosSql("t.e", "ev.er")}, 6) AS sim
        |  FROM tr t JOIN evr ev USING (bucket) WHERE t.vec_id <> ev.eval_id),
        |best AS (
        |  SELECT vec_id, eval_id, sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, eval_id) AS rk
        |    FROM s1) WHERE rk = 1)
        |SELECT t.vec_id, t.bucket, b.eval_id, b.sim AS eval_sim,
        |       coalesce(b.sim >= 0.95, false) AS is_contaminated
        |FROM tr t LEFT JOIN best b USING (vec_id)""".stripMargin,

    "vector_knn" ->
      s"""WITH c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = ${graft.operators.Embeddings.EmbeddingDim}
        |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0),
        |q AS (SELECT vec_id AS qid, e AS qe FROM c WHERE vec_id < 32),
        |s AS (
        |  SELECT q.qid, c.vec_id, c.label,
        |         round(list_dot_product(
        |             list_transform(list_zip(c.e, q.qe), x -> x[1] - x[2]),
        |             list_transform(list_zip(c.e, q.qe), x -> x[1] - x[2])), 6) AS distance
        |  FROM c, q),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY distance, vec_id) AS rk
        |  FROM s)
        |SELECT qid, rk, vec_id, distance, label FROM r WHERE rk <= 5""".stripMargin,

    "knn_label_vote" ->
      s"""WITH c0 AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = ${graft.operators.Embeddings.EmbeddingDim}
        |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0),
        |n AS (
        |  SELECT vec_id, CASE WHEN list_dot_product(e, e) = 0 THEN e
        |         ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e))) END AS e,
        |         label
        |  FROM c0),
        |q AS (SELECT vec_id AS qid, e AS qe, label AS true_label FROM n WHERE vec_id % 10 = 0),
        |s AS (
        |  SELECT q.qid, q.true_label, n.vec_id, n.label,
        |         list_dot_product(n.e, q.qe) AS sim
        |  FROM n, q WHERE n.vec_id % 10 <> 0),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
        |  FROM s),
        |v AS (
        |  SELECT qid, true_label, label, count(*) AS n_votes
        |  FROM r WHERE rk <= 10 GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY n_votes DESC, label) AS vrk
        |  FROM v)
        |SELECT qid, true_label, label AS predicted_label, n_votes FROM w WHERE vrk = 1""".stripMargin,

    "rag_context" -> ragContextSql,
    "rag_prompt" -> ragPromptSql,

    // the full LSH near-dup family replayed in SQL (md5 + mod-(2^61-1)
    // min-wise family, same coefficients as the kernel — see SigUtil)
    "dedup_minhash" -> lshSummarySql(word3ShingleCte,
      rowsPerBand = 4, keyPerms = 128, thr = "0.8"),
    "ngram_jaccard" -> lshSummarySql(char5ShingleCte,
      rowsPerBand = 8, keyPerms = 64, thr = "0.7"),
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_clusters" -> dedupClustersSql,
    "minhash_calibration" -> minhashCalibrationSql,
    // same recursive label CTEs; survivor = (n_chars DESC NULLS LAST,
    // doc_id) per cluster, evidence from the joined member relation
    "golden_records" ->
      s"""WITH RECURSIVE $word3LabelCtes,
         |docs AS (SELECT DISTINCT doc_id, n_chars, source FROM documents),
         |j AS (SELECT l.cluster, d.doc_id, d.n_chars, d.source
         |      FROM lab l JOIN docs d ON d.doc_id = l.id),
         |rep AS (
         |  SELECT cluster, doc_id AS rep_doc_id, n_chars AS rep_n_chars,
         |         row_number() OVER (PARTITION BY cluster
         |           ORDER BY n_chars DESC NULLS LAST, doc_id) AS rk
         |  FROM j),
         |agg AS (
         |  SELECT cluster, count(*) AS n_members,
         |         count(DISTINCT source) AS n_sources
         |  FROM j GROUP BY 1)
         |SELECT r.cluster AS cluster_id, r.rep_doc_id, r.rep_n_chars,
         |       a.n_members, a.n_sources
         |FROM rep r JOIN agg a USING (cluster) WHERE rk = 1""".stripMargin,
    "dedup_incremental" -> dedupIncrementalSql(),
    // the erased index IS the corpus split minus the subjects: same
    // derivation, index side restricted before matched/hot — proving the
    // tombstone anti-join lands exactly where a rebuild would
    "dedup_incremental_erased" ->
      dedupIncrementalSql(" AND NOT (doc_id % 9 = 8)"),
    "train_test_split" -> trainTestSplitSql,
    "doc_fingerprint" -> docFingerprintSql,

    // multimodal family, hash-green (r12): byte-exact header-parse +
    // FNV-stub twins over hex(payload) — see multimodalCtes
    "multimodal_meta" -> (multimodalCtes + """
      |SELECT media_id, kind, n_bytes, width, height, duration_ms, n_frames
      |FROM mm""".stripMargin),

    "multimodal_frames" -> (multimodalCtes + """,
      |fx AS (
      |  SELECT media_id, kind, duration_ms, n_frames,
      |         unnest(range(0, n_frames)) AS frame_idx
      |  FROM mm WHERE n_frames > 0)
      |SELECT media_id, kind, frame_idx::INT AS frame_idx,
      |       CASE WHEN n_frames > 1
      |            THEN trunc((frame_idx * duration_ms) / (n_frames - 1))::BIGINT
      |            ELSE 0::BIGINT END AS offset_ms
      |FROM fx""".stripMargin),

    // resizeStub arithmetic: Java int division on positive values = //;
    // an empty payload truncates to Arrays.copyOf(payload, 1) = one NUL
    // byte, hence the '00' hex fallback
    "multimodal_resize" -> (multimodalCtes + """,
      |rz AS (
      |  SELECT media_id, kind, n_bytes, hx,
      |         width AS w0, height AS h0,
      |         greatest(1, greatest(width, height) // 256) AS scale
      |  FROM mm),
      |rz2 AS (
      |  SELECT media_id, kind, w0, h0, hx, scale,
      |         greatest(1, n_bytes // (scale * scale)) AS keep,
      |         n_bytes AS orig_n
      |  FROM rz)
      |SELECT media_id, kind,
      |       greatest(1, w0 // scale)::INT AS width,
      |       greatest(1, h0 // scale)::INT AS height,
      |       keep AS n_bytes,
      |       md5(CASE WHEN orig_n = 0 THEN '00'
      |                ELSE substr(hx, 1, (keep * 2)::INT) END) AS thumb_sig
      |FROM rz2""".stripMargin),

    // the perceptual pipeline replayed end to end in SQL: byte histogram
    // from the hex rendering, pinned md5 bin-vote signs, 32 signature
    // bits, 4x8-bit band keys with the kn>=2..<=64 cap, exact integer
    // cross-L1 verify, and the (sim DESC, other DESC) best-match rank —
    // every step integer-exact except the single mirrored float division
    "dedup_media_perceptual" -> (multimodalCtes + """,
      |pbl AS (
      |  SELECT media_id, n,
      |         list_transform(range(0, n::INT),
      |           i -> CAST('0x' || substr(hx, (i*2+1)::INT, 2) AS BIGINT)) AS bytes
      |  FROM b WHERE n > 0),
      |pcnt AS (
      |  SELECT media_id, n,
      |         list_transform(range(0, 64),
      |           j -> len(list_filter(bytes, x -> x % 64 = j))::BIGINT) AS counts
      |  FROM pbl),
      |phh AS (
      |  SELECT list_transform(range(0, 64),
      |           j -> md5_number_lower('ph:' || j)) AS hs),
      |pbits AS (
      |  SELECT media_id, t,
      |         CASE WHEN list_sum(list_transform(range(0, 64),
      |           j -> counts[(j+1)::INT] *
      |                (CAST((hs[(j+1)::INT] >> t::INT) & 1 AS BIGINT) * 2 - 1)))
      |           >= 0 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM pcnt CROSS JOIN phh CROSS JOIN (SELECT unnest(range(0, 32)) AS t)),
      |psig AS (
      |  SELECT media_id, sum(bit * (1::BIGINT << t::INT))::BIGINT AS sig
      |  FROM pbits GROUP BY 1),
      |pkeys AS (
      |  SELECT media_id,
      |         CAST(c AS VARCHAR) || '|' ||
      |         CAST((sig >> (8 * c)::INT) & 255 AS VARCHAR) AS key
      |  FROM psig CROSS JOIN (SELECT unnest(range(0, 4)) AS c)),
      |pkc AS (SELECT key, count(*) AS kn FROM pkeys GROUP BY 1),
      |pek AS (SELECT k.media_id, k.key FROM pkeys k JOIN pkc USING (key)
      |        WHERE kn >= 2 AND kn <= 64),
      |pprs AS (SELECT DISTINCT l.media_id AS id_a, r.media_id AS id_b
      |         FROM pek l JOIN pek r ON l.key = r.key AND l.media_id < r.media_id),
      |psims AS (
      |  SELECT p.id_a, p.id_b,
      |         round(CAST(1 AS DOUBLE) -
      |           list_sum(list_transform(range(0, 64),
      |             j -> abs(a.counts[(j+1)::INT] * b2.n
      |                      - b2.counts[(j+1)::INT] * a.n)))
      |           / (CAST(2 AS DOUBLE) * a.n * b2.n), 6) AS sim
      |  FROM pprs p JOIN pcnt a ON a.media_id = p.id_a
      |              JOIN pcnt b2 ON b2.media_id = p.id_b),
      |pdirs AS (SELECT id_a AS id, id_b AS other, sim FROM psims
      |          UNION ALL SELECT id_b, id_a, sim FROM psims),
      |pbest AS (SELECT id, other, sim,
      |                 row_number() OVER (PARTITION BY id
      |                   ORDER BY sim DESC, other DESC) AS rk,
      |                 count(*) OVER (PARTITION BY id) AS nc FROM pdirs)
      |SELECT m.media_id, COALESCE(pb.nc, 0) AS n_candidates,
      |       pb.other AS best_match_id, pb.sim AS best_sim,
      |       COALESCE(pb.sim >= CAST('0.98' AS DOUBLE), false) AS is_dup
      |FROM m LEFT JOIN (SELECT * FROM pbest WHERE rk = 1) pb
      |  ON pb.id = m.media_id""".stripMargin),

    "multimodal_features" -> (multimodalCtes + """,
      |bl AS (
      |  SELECT media_id, kind,
      |         list_transform(range(0, n::INT),
      |           i -> CAST('0x' || substr(hx, (i*2+1)::INT, 2) AS BIGINT)) AS bytes
      |  FROM b),
      |cnt AS (
      |  SELECT media_id, kind,
      |         list_transform(range(0, 64),
      |           j -> len(list_filter(bytes, x -> x % 64 = j))::BIGINT) AS counts
      |  FROM bl)
      |SELECT media_id, kind,
      |       len(list_filter(counts, c -> c > 0))::BIGINT AS n_nonzero_bins,
      |       (list_position(counts, list_max(counts)) - 1)::BIGINT AS top_bin,
      |       md5(array_to_string(counts, ',')) AS feat_sig
      |FROM cnt""".stripMargin),
    "sample_stratified" -> sampleStratifiedSql,

    // greedy first-fit replayed in SQL: packing is blocked by 32-doc id
    // ranges, so the recursion steps through per-block row numbers
    // (depth <= 32) with every block advancing in parallel per iteration.
    // NOTE doc_id >= 0 is the id contract (DuckDB // truncates, Spark
    // shiftright floors — they agree on the non-negative domain).
    "pack_sequences" ->
      """WITH RECURSIVE t AS (
        |  SELECT DISTINCT doc_id, doc_id // 32 AS grp,
        |         CAST(COALESCE(len(regexp_split_to_array(trim(text), '\s+')), 0) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn FROM t),
        |packed AS (
        |  SELECT grp, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS bin, n_tokens AS fill
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.grp, r.rn, r.doc_id, r.n_tokens,
        |         CASE WHEN p.fill > 0 AND p.fill + r.n_tokens > 512 THEN p.bin + 1 ELSE p.bin END,
        |         CASE WHEN p.fill > 0 AND p.fill + r.n_tokens > 512 THEN r.n_tokens ELSE p.fill + r.n_tokens END
        |  FROM packed p JOIN r ON r.grp = p.grp AND r.rn = p.rn + 1)
        |SELECT doc_id, n_tokens, grp * 64 + bin AS bin_id FROM packed""".stripMargin,

    // the embedding itself, rebuilt token-for-token in SQL: slot/sign come
    // from DuckDB's own md5_number halves (the Spark kernel pins the same
    // bytes — Kernels.featureHashCounts), the count vector is
    // integer-exact, and the only float step (Σ|c|/√Σc²) is mirrored
    // one-for-one, so l1_mass and the md5 signature are hash-exact twins
    "embed_text" ->
      """WITH docs AS (SELECT DISTINCT doc_id, text, source FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(concat_ws(' ', text, source))), '\s+')) AS tok
        |  FROM docs),
        |contrib AS (
        |  SELECT doc_id,
        |         CAST(md5_number_lower(tok) % 64 AS BIGINT) AS slot,
        |         CASE WHEN (md5_number_upper(tok) & 1) = 0 THEN 1 ELSE -1 END AS sgn
        |  FROM toks WHERE length(tok) > 0),
        |slots AS (SELECT doc_id, slot, CAST(sum(sgn) AS BIGINT) AS c FROM contrib GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.doc_id, g.slot, COALESCE(s.c, 0) AS c
        |  FROM (SELECT doc_id FROM docs) d
        |  CROSS JOIN (SELECT unnest(range(64)) AS slot) g
        |  LEFT JOIN slots s ON s.doc_id = d.doc_id AND s.slot = g.slot)
        |SELECT doc_id,
        |       CAST(64 AS INTEGER) AS dim,
        |       CASE WHEN sum(c*c) > 0
        |            THEN round(CAST(sum(abs(c)) AS DOUBLE) / sqrt(CAST(sum(c*c) AS DOUBLE)), 6)
        |            ELSE 0.0 END AS l1_mass,
        |       md5(string_agg(CAST(c AS VARCHAR), ',' ORDER BY slot)) AS emb_sig
        |FROM grid GROUP BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |       len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
        |       length(text) AS n_chars_m
        |FROM documents""".stripMargin,

    "text_repetition" ->
      """SELECT doc_id,
        |       CAST(len(str_split(text, chr(10))) AS BIGINT) AS n_lines,
        |       round(1.0 - len(list_distinct(str_split(text, chr(10))))
        |             / len(str_split(text, chr(10))), 4) AS dup_line_ratio,
        |       round(1.0 - len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')))
        |             / len(regexp_split_to_array(trim(lower(text)), '\s+')), 4) AS dup_token_ratio
        |FROM documents""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |       round(len(regexp_extract_all(text, '[A-Za-z]')) / length(text), 4) AS alpha_ratio,
        |       round(len(regexp_extract_all(text, '[A-Z]')) / length(text), 4) AS upper_ratio,
        |       round(len(regexp_extract_all(text, '[0-9]')) / length(text), 4) AS digit_ratio,
        |       round(len(regexp_extract_all(text, '\s')) / length(text), 4) AS space_ratio,
        |       round(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b'))
        |             / len(regexp_split_to_array(trim(text), '\s+')), 4) AS stop_ratio,
        |       round(length(text) / len(regexp_split_to_array(trim(text), '\s+')), 4) AS avg_token_len,
        |       round(0.4 * (len(regexp_extract_all(text, '[A-Za-z]')) / length(text))
        |           + 0.3 * least(1.0, len(regexp_split_to_array(trim(text), '\s+')) / 50.0)
        |           + 0.3 * (len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b'))
        |                    / len(regexp_split_to_array(trim(text), '\s+'))), 4) AS quality_score
        |FROM documents""".stripMargin,

    // DuckDB's array_to_string([]) is NULL where Spark's array_join is ''
    // — the CASE + coalesce pins both to: NULL text -> NULL, zero kept
    // lines -> empty string
    "clean_c4" ->
      """WITH k AS (
        |  SELECT doc_id, text,
        |         list_filter(str_split(text, chr(10)), l ->
        |           len(regexp_split_to_array(trim(l), '\s+')) >= 40) AS kept
        |  FROM documents)
        |SELECT doc_id,
        |       len(str_split(text, chr(10))) AS n_lines_raw,
        |       len(kept) AS n_lines_kept,
        |       CASE WHEN text IS NOT NULL
        |            THEN coalesce(array_to_string(kept, chr(10)), '') END AS clean_text,
        |       coalesce(len(kept) >= 1
        |                AND NOT contains(lower(text), 'lorem ipsum')
        |                AND NOT contains(text, '{'), false) AS is_kept
        |FROM k""".stripMargin,

    // df via a count-over-term window on the SAME tf relation (no
    // vocab-sized join side); ranking on the ROUNDED score so the tie
    // order is engine-invariant; score op order mirrors the Spark plan
    // exactly: tf · ln(1.0 + N/df), division first
    "search_bm25"      -> searchBm25Sql("spark join window customer", 10),
    "retrieval_eval"   -> retrievalEvalSql(
      graft.operators.Corpus.RetrievalEvalQueries, 10),
    // same ranked/rel CTE chain as retrieval_eval; pos = first relevant
    // rank, neg = top-5 non-relevant ranks, per-role rank over the
    // unique rk order
    "mine_hard_negatives" ->
      (retrievalRankRelCtes(
        graft.operators.Corpus.MineQueries, 30) + "," + s"""
        |tagged AS (
        |  SELECT r.qid, r.doc_id, r.score, r.rk,
        |         rel.doc_id IS NOT NULL AS isrel,
        |         CAST(row_number() OVER (PARTITION BY r.qid,
        |           rel.doc_id IS NOT NULL ORDER BY r.rk) AS BIGINT)
        |           AS role_rank
        |  FROM ranked r
        |  LEFT JOIN rel ON r.qid = rel.qid AND r.doc_id = rel.doc_id)
        |SELECT qid, CASE WHEN isrel THEN 'pos' ELSE 'neg' END AS role,
        |       role_rank, doc_id, score, rk
        |FROM tagged
        |WHERE (isrel AND role_rank = 1)
        |   OR (NOT isrel AND role_rank <= 5)""".stripMargin),
    "search_bm25_k3"   -> searchBm25Sql("data stream sort", 3),
    "search_bm25_none" -> searchBm25Sql("zqxjkv", 10),
    // the durable-index serving path is bit-identical to the scan path
    // by construction (shared Corpus.bm25Rank tail), so the SAME oracle
    // verifies it — on a DIFFERENT query/k point so the two entries
    // aren't one result checked twice
    "search_bm25_served" -> searchBm25Sql("customer window order part", 5),
    // the erased corpus IS documents minus the subject set: the SAME
    // from-scratch derivation, restricted — proving the tombstone
    // anti-join AND the negative stats increment compose to exactly a
    // rebuild without the subjects (idf/avgdl included)
    "search_bm25_erased" -> searchBm25Sql("customer window order part", 5,
      docsWhere = " AND NOT (doc_id % 7 = 3)"),
    "search_bm25_batch" -> searchBm25BatchSql(
      Seq(1L -> "spark join window customer", 2L -> "data stream sort",
        3L -> "zqxjkv"), 5),
    "search_hybrid_rrf" ->
      searchHybridRrfSql("spark join window customer", 7, 50, 10, 60),
    "search_hybrid_rrf_served" ->
      searchHybridRrfSql("data stream sort", 11, 50, 10, 60),

    // Efraimidis–Spirakis weighted sample: the md5-family uniform and the
    // exponential-race key replayed op-for-op; rank on the RAW key (raw
    // doubles are bit-identical; a re-rounded rank key is not), doc_id ties
    "sample_weighted" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        |         (0.0 - ln((CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
        |                          % 2305843009213693951 AS DOUBLE) + 1.0)
        |                   / CAST(2305843009213693953 AS DOUBLE)))
        |         / CAST(n_chars AS DOUBLE) AS k0
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        |SELECT doc_id, weight, round(k0, 6) AS draw_key,
        |       CAST(row_number() OVER (ORDER BY k0, doc_id) AS BIGINT) AS rk
        |FROM d
        |ORDER BY k0, doc_id
        |LIMIT 100""".stripMargin,

    // per-source token budget: the oracle runs the STRAIGHT per-source
    // prefix window; the Spark side's two-phase bucket decomposition is
    // exactly equal on integer sums. NULL source is a real group.
    "corpus_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |           AS n_tokens,
        |         md5_number_lower(CAST(doc_id AS VARCHAR))
        |           % 2305843009213693951 AS mk
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |         CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
        |         CAST(row_number() OVER w AS BIGINT) AS rk
        |  FROM d
        |  WINDOW w AS (PARTITION BY source ORDER BY mk, doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT doc_id, source, n_tokens, cum_tokens, rk
        |FROM c WHERE cum_tokens <= 800""".stripMargin,

    // Zipf fit: every regression sum is a rank-ordered list_reduce —
    // the pinned-order fold twin of the Spark side's sorted-array
    // aggregate() — so the only cross-engine float wobble is the ln
    // kernel (StrictMath vs libm, ≤ 1 ulp), absorbed by round(·,6) on
    // both sides. r² NULL when y-variance is 0 (all frequencies
    // equal), guarded on both engines.
    "token_zipf" ->
      """WITH toks AS (
        |  SELECT source,
        |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT source, token, count(*) AS freq
        |  FROM toks WHERE length(token) > 0
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |r AS (
        |  SELECT source, freq,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY freq DESC, token) AS BIGINT) AS rank
        |  FROM c QUALIFY rank <= 200),
        |p AS (
        |  SELECT source, rank,
        |         ln(CAST(rank AS DOUBLE)) AS lx,
        |         ln(CAST(freq AS DOUBLE)) AS ly
        |  FROM r),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
        |         list(lx ORDER BY rank) AS xs,
        |         list(ly ORDER BY rank) AS ys,
        |         list(lx * lx ORDER BY rank) AS xxs,
        |         list(lx * ly ORDER BY rank) AS xys,
        |         list(ly * ly ORDER BY rank) AS yys
        |  FROM p GROUP BY source HAVING count(*) >= 3),
        |s AS (
        |  SELECT source, n_ranks, CAST(n_ranks AS DOUBLE) AS n,
        |         list_reduce(xs, (a, b) -> a + b) AS sx,
        |         list_reduce(ys, (a, b) -> a + b) AS sy,
        |         list_reduce(xxs, (a, b) -> a + b) AS sxx,
        |         list_reduce(xys, (a, b) -> a + b) AS sxy,
        |         list_reduce(yys, (a, b) -> a + b) AS syy
        |  FROM g)
        |SELECT source, n_ranks,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
        |             6) AS intercept,
        |       round(CASE WHEN n * syy - sy * sy <> 0.0
        |                  THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |                       ((n * sxx - sx * sx) * (n * syy - sy * sy))
        |             END, 6) AS r2
        |FROM s""".stripMargin,

  )
}
