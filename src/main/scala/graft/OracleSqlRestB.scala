package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Oracle SQL map, chunk B (see [[OracleHelpersA]]). */
trait OracleSqlRestB { this: OracleHelpersA with OracleHelpersB =>
  private[graft] def oracleSqlRestB: Map[String, String] = Map(
    // pairwise source JSD: Laplace-smoothed probabilities from identical
    // integers, per-pair term sums as token-ordered list_reduce (the
    // token_zipf pinned-fold twin), log2 wobble absorbed by round(·,6).
    // The NULL-source group profiles but never pairs (strict < on
    // source), identically on both engines.
    "source_jsd" ->
      """WITH vocab AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS freq FROM (
        |      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |      FROM documents WHERE text IS NOT NULL) t
        |    WHERE length(token) > 0
        |    GROUP BY token HAVING count(*) >= 2
        |    ORDER BY freq DESC, token LIMIT 1000) v),
        |cnt AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT source,
        |           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |    FROM documents WHERE text IS NOT NULL) t
        |  WHERE token IN (SELECT token FROM vocab)
        |  GROUP BY 1, 2),
        |srcs AS (SELECT DISTINCT source FROM documents WHERE text IS NOT NULL),
        |grid AS (
        |  SELECT s.source, v.token, COALESCE(c.cnt, 0) AS cnt
        |  FROM srcs s CROSS JOIN vocab v
        |  LEFT JOIN cnt c ON s.source IS NOT DISTINCT FROM c.source
        |                 AND v.token = c.token),
        |tot AS (
        |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_s
        |  FROM grid GROUP BY source),
        |probs AS (
        |  SELECT g.source, g.token,
        |         (CAST(g.cnt AS DOUBLE) + 1.0) /
        |         (CAST(t.n_s AS DOUBLE) +
        |          CAST((SELECT count(*) FROM vocab) AS DOUBLE)) AS p
        |  FROM grid g JOIN tot t ON g.source IS NOT DISTINCT FROM t.source),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b, a.token,
        |         0.5 * (a.p * log2(a.p / ((a.p + b.p) / 2.0))) +
        |         0.5 * (b.p * log2(b.p / ((a.p + b.p) / 2.0))) AS term
        |  FROM probs a JOIN probs b
        |    ON a.token = b.token AND a.source < b.source)
        |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_tokens,
        |       round(list_reduce(list(term ORDER BY token), (x, y) -> x + y),
        |             6) AS jsd_bits
        |FROM pairs GROUP BY source_a, source_b""".stripMargin,

    "tfidf_keywords" ->
      """WITH terms AS (
        |  SELECT doc_id,
        |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM terms WHERE length(term) > 0 GROUP BY 1, 2),
        |w AS (
        |  SELECT doc_id, term, tf,
        |         CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
        |         (SELECT count(*) FROM documents WHERE text IS NOT NULL) AS n_docs
        |  FROM tf),
        |s AS (
        |  SELECT doc_id, term, tf, df,
        |         round(CAST(tf AS DOUBLE) *
        |               ln(1.0 + CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
        |  FROM w)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, df, score,
        |       CAST(rk AS BIGINT) AS rk
        |FROM (
        |  SELECT doc_id, term, tf, df, score,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, term) AS rk
        |  FROM s) r
        |WHERE rk <= 5""".stripMargin,

    // marginals in bigram space via windows over the distinct-pair
    // relation (the Spark plan's shape); grand total as a scalar
    // subquery; PMI op order mirrors the plan: (n12·t)/(n1·n2) then ln;
    // window sums CAST to BIGINT (HUGEINT lesson)
    "bigram_pmi" ->
      """WITH t AS (
        |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (
        |  SELECT unnest(list_zip(toks[1:greatest(len(toks)-1, 0)],
        |                         toks[2:len(toks)])) AS bg
        |  FROM t),
        |c AS (
        |  SELECT bg[1] AS w1, bg[2] AS w2, count(*) AS n12 FROM p GROUP BY 1, 2),
        |m AS (
        |  SELECT w1, w2, n12,
        |         CAST(sum(n12) OVER (PARTITION BY w1) AS BIGINT) AS n1,
        |         CAST(sum(n12) OVER (PARTITION BY w2) AS BIGINT) AS n2,
        |         CAST((SELECT sum(n12) FROM c) AS BIGINT) AS t
        |  FROM c)
        |SELECT w1, w2, CAST(n12 AS BIGINT) AS n12, n1, n2,
        |       round(ln((CAST(n12 AS DOUBLE) * CAST(t AS DOUBLE)) /
        |                (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))), 6) AS pmi
        |FROM m WHERE n12 >= 5
        |ORDER BY pmi DESC, w1, w2
        |LIMIT 200""".stripMargin,

    // byte-identical RE2 patterns (preprocessor.py:10-11,
    // llm_processor.py:108-109); zero counts on the synthetic corpus by
    // design — the zero relation still hash-compares; sums CAST to
    // BIGINT (HUGEINT lesson)
    "pii_scan" ->
      """WITH h AS (
        |  SELECT source,
        |         len(regexp_extract_all(text, '[\w.-]+@[\w.-]+')) AS n_email,
        |         len(regexp_extract_all(text, '\b(?:\d[ -]*?){13,16}\b')) AS n_card,
        |         len(regexp_extract_all(text, '(?i)api[_-]?key\s*[:=]\s*\w+')) AS n_api_key,
        |         len(regexp_extract_all(text, '(?i)token\s*[:=]\s*\w+')) AS n_token
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN n_email + n_card + n_api_key + n_token > 0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_pii,
        |       CAST(sum(n_email) AS BIGINT) AS n_email,
        |       CAST(sum(n_card) AS BIGINT) AS n_card,
        |       CAST(sum(n_api_key) AS BIGINT) AS n_api_key,
        |       CAST(sum(n_token) AS BIGINT) AS n_token
        |FROM h GROUP BY source""".stripMargin,

    // EMPTY on the synthetic corpus by design (no cross-source exact
    // dups) — the empty relation is hash-compared (template_novelty
    // pattern); a spec plants cross-source dups
    "dedup_cross_source" ->
      """SELECT md5(text) AS fp, min(doc_id) AS first_doc_id,
        |       count(*) AS n_copies,
        |       count(DISTINCT source) AS n_sources,
        |       array_to_string(list_sort(list_distinct(list(source))), ',') AS sources
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY md5(text)
        |HAVING count(DISTINCT source) > 1""".stripMargin,

    // corpus-level boilerplate removal: a trimmed line in > 2 distinct
    // docs is removed everywhere; empty lines are structure and survive;
    // ordered reassembly via string_agg ORDER BY = sort_array(collect)
    "dedup_lines" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |l AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, chr(10))) AS line,
        |         generate_subscripts(string_split(text, chr(10)), 1) AS idx
        |  FROM d),
        |lk AS (SELECT doc_id, idx, line, trim(line) AS key FROM l),
        |boiler AS (
        |  SELECT key FROM (
        |    SELECT key, count(DISTINCT doc_id) AS nd FROM lk
        |    WHERE key <> '' GROUP BY 1)
        |  WHERE nd > 2),
        |kept AS (
        |  SELECT doc_id, idx, line FROM lk
        |  WHERE key = '' OR key NOT IN (SELECT key FROM boiler)),
        |r AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |         string_agg(line, chr(10) ORDER BY idx) AS clean_text
        |  FROM kept GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines_raw,
        |       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
        |       coalesce(r.clean_text, '') AS clean_text
        |FROM d LEFT JOIN r USING (doc_id)""".stripMargin,

    // maxDocs=1 point: same pipeline, nd > 1 boilerplate threshold
    "dedup_lines_md1" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |l AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, chr(10))) AS line,
        |         generate_subscripts(string_split(text, chr(10)), 1) AS idx
        |  FROM d),
        |lk AS (SELECT doc_id, idx, line, trim(line) AS key FROM l),
        |boiler AS (
        |  SELECT key FROM (
        |    SELECT key, count(DISTINCT doc_id) AS nd FROM lk
        |    WHERE key <> '' GROUP BY 1)
        |  WHERE nd > 1),
        |kept AS (
        |  SELECT doc_id, idx, line FROM lk
        |  WHERE key = '' OR key NOT IN (SELECT key FROM boiler)),
        |r AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |         string_agg(line, chr(10) ORDER BY idx) AS clean_text
        |  FROM kept GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines_raw,
        |       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
        |       coalesce(r.clean_text, '') AS clean_text
        |FROM d LEFT JOIN r USING (doc_id)""".stripMargin,

    // min-then-filter-then-min CTE chain, the engine-portable form of
    // "earliest strictly-ordered stage times"; left joins keep partial
    // funnels
    "funnel_steps" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts FROM events
        |  WHERE user_id IS NOT NULL
        |    AND event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3,
        |       CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |                 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,

    // the 1-day-per-hop parameter point (stage split 90/35/25 at sf0.01)
    "funnel_steps_1d" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts FROM events
        |  WHERE user_id IS NOT NULL
        |    AND event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts > t1
        |         AND ts <= t1 + INTERVAL 1 DAY GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts > t2
        |         AND ts <= t2 + INTERVAL 1 DAY GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3,
        |       CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |                 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,

    // retention divides exact integers, rounded both sides; counts CAST
    // to BIGINT (HUGEINT lesson)
    "retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE user_id IS NOT NULL),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
        |a AS (
        |  SELECT cohort_day,
        |         CAST(datediff('day', cohort_day, day) AS BIGINT) AS day_offset,
        |         CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |  FROM e JOIN c USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort_day, n_users AS cohort_size FROM a WHERE day_offset = 0)
        |SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
        |       day_offset, n_users, cohort_size,
        |       round(CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6)
        |         AS retention
        |FROM a JOIN s USING (cohort_day)""".stripMargin,

    // (ts, event_id) is a unique order within a user, so lead() agrees
    // across engines; the probability denominator is a window over the
    // |types|² relation, CAST to BIGINT before the double divide
    "event_transitions" -> transitionsOracle,
    // batch mode of the stateful twin reproduces lead() exactly → same
    // oracle (the sessionize / sessionize_stateful pairing)
    "event_transitions_stateful" -> transitionsOracle,
    // fixed-budget PageRank: the iteration chain is UNROLLED as
    // MATERIALIZED CTEs (it{k} is read twice per step — inlining would
    // blow up exponentially, the BPE-oracle lesson); every float sum is
    // a pinned-order list_reduce and the damping constants are emitted
    // as exact round-trip doubles, mirroring the engine's op order
    // token-for-token — see Graphs.pagerankOnEdges
    "pagerank" -> pagerankOracle(graft.operators.Graphs.DefaultIters),
    "pagerank_i3" -> pagerankOracle(3),
    // the distributed loop is byte-identical to the driver path (spec'd)
    "pagerank_dist" -> pagerankOracle(graft.operators.Graphs.DefaultIters),
    // label propagation: unrolled-CTE round chain, all integers/strings
    "label_propagation" -> lpaOracle(graft.operators.Graphs.LpaRounds),
    "label_propagation_dist" -> lpaOracle(graft.operators.Graphs.LpaRounds),
    "source_communities" ->
      sourceCommunitiesOracle(graft.operators.Graphs.LpaRounds),
    // triangle counting: degree-ordered orientation, each triangle
    // enumerated once; clustering = 2T / (d(d-1)) in one fixed op order
    "graph_triangles" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts NULLS FIRST,
        |                                         event_id NULLS FIRST) AS to_type
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |e0 AS MATERIALIZED (
        |  SELECT DISTINCT least(from_type, to_type) AS u,
        |                  greatest(from_type, to_type) AS v
        |  FROM p WHERE to_type IS NOT NULL AND from_type <> to_type),
        |deg AS MATERIALIZED (
        |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1),
        |o AS MATERIALIZED (
        |  SELECT CASE WHEN da.degree < db.degree
        |              OR (da.degree = db.degree AND u < v)
        |              THEN u ELSE v END AS a,
        |         CASE WHEN da.degree < db.degree
        |              OR (da.degree = db.degree AND u < v)
        |              THEN v ELSE u END AS b
        |  FROM e0 JOIN deg da ON da.node = e0.u
        |          JOIN deg db ON db.node = e0.v),
        |tri AS MATERIALIZED (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM o e1 JOIN o e2 ON e2.a = e1.b
        |            JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tn AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
        |    SELECT x AS node FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY 1)
        |SELECT d.node, d.degree, coalesce(tn.t, 0) AS triangles,
        |       CASE WHEN d.degree >= 2
        |            THEN round((CAST(2.0 AS DOUBLE) *
        |                        CAST(coalesce(tn.t, 0) AS DOUBLE)) /
        |                       CAST(d.degree * (d.degree - 1) AS DOUBLE), 6)
        |            ELSE CAST(0.0 AS DOUBLE) END AS clustering
        |FROM deg d LEFT JOIN tn ON tn.node = d.node""".stripMargin,

    // median/MAD per level over the daily grid; medians are explicit
    // sorted-list arithmetic (odd -> middle, even -> two middles averaged
    // in one pinned op order), identical to the Spark in-row formula
    "anomaly_mad" -> anomalyMadSql(3.0),
    // a tighter-k sensitivity point (flags more days at sf0.01)
    "anomaly_mad_k2" -> anomalyMadSql(2.0),
    // the filled-timeline chain + a day-ordered prefix list folded with
    // s1 = x1, s_i = a*x_i + (1-a)*s_{i-1} (list_reduce seeds the fold
    // with the first element — exactly the Spark init)
    "metrics_ewma" -> ewmaSql(0.25),
    // a faster-decay point; 0.5 is exact binary like 0.25
    "metrics_ewma_a5" -> ewmaSql(0.5),

    // Pearson r from exact integer sums over the zero-filled day axis:
    // sums need no grid (zero days add 0 to every sum), only n_days
    // references the timeline bounds; HUGEINT products mirror Spark's
    // DECIMAL — both round the same exact integer to the same double
    "corr_pairs" ->
      """WITH daily AS (
        |  SELECT event_type AS t, strftime(ts, '%Y-%m-%d') AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT min(CAST(day AS DATE)) AS d0,
        |             max(CAST(day AS DATE)) AS d1 FROM daily),
        |nn AS (SELECT CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS n_days
        |       FROM b WHERE d0 IS NOT NULL),
        |s AS (SELECT t, CAST(sum(n) AS BIGINT) AS sx,
        |             sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS sxx
        |      FROM daily GROUP BY 1),
        |xy AS (SELECT a.t AS ta, b.t AS tb,
        |              sum(CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)) AS sxy
        |       FROM daily a JOIN daily b ON a.day = b.day AND a.t < b.t
        |       GROUP BY 1, 2),
        |pr AS (SELECT a.t AS ta, a.sx AS sxa, a.sxx AS sxxa,
        |              b.t AS tb, b.sx AS sxb, b.sxx AS sxxb
        |       FROM s a JOIN s b ON a.t < b.t)
        |SELECT ta AS type_a, tb AS type_b, n_days,
        |       CASE WHEN vx > 0 AND vy > 0
        |            THEN round(cov / sqrt(vx * vy), 6) END AS r
        |FROM (
        |  SELECT pr.ta, pr.tb, nn.n_days,
        |    CAST(nn.n_days AS DOUBLE) * CAST(coalesce(xy.sxy, 0) AS DOUBLE)
        |      - CAST(pr.sxa AS DOUBLE) * CAST(pr.sxb AS DOUBLE) AS cov,
        |    CAST(nn.n_days AS DOUBLE) * CAST(pr.sxxa AS DOUBLE)
        |      - CAST(pr.sxa AS DOUBLE) * CAST(pr.sxa AS DOUBLE) AS vx,
        |    CAST(nn.n_days AS DOUBLE) * CAST(pr.sxxb AS DOUBLE)
        |      - CAST(pr.sxb AS DOUBLE) * CAST(pr.sxb AS DOUBLE) AS vy
        |  FROM pr CROSS JOIN nn
        |  LEFT JOIN xy ON xy.ta = pr.ta AND xy.tb = pr.tb)""".stripMargin,

    // source-pair Jaccard over hashed word-3-shingle sets: the same
    // word3 shingle semantics as the minhash family, grams hashed with
    // the pinned md5 family on BOTH engines
    "source_overlap" ->
      """WITH t AS (
        |  SELECT source, text FROM documents
        |  WHERE source IS NOT NULL AND text IS NOT NULL),
        |tok AS (
        |  SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |  FROM t),
        |sh AS (
        |  SELECT DISTINCT source,
        |         md5_number_lower(shingle) % 2305843009213693951 AS gh
        |  FROM (
        |    SELECT source,
        |           CASE WHEN len(ts) < 3 THEN array_to_string(ts, ' ')
        |                ELSE ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        |           END AS shingle
        |    FROM (SELECT source, ts,
        |                 unnest(range(1, greatest(len(ts)-1, 2))) AS i
        |          FROM tok))),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |       FROM sh GROUP BY 1),
        |iv AS (SELECT a.source AS source_a, b.source AS source_b,
        |              CAST(count(*) AS BIGINT) AS shared
        |       FROM sh a JOIN sh b ON a.gh = b.gh AND a.source < b.source
        |       GROUP BY 1, 2),
        |pr AS (SELECT a.source AS source_a, a.n AS grams_a,
        |              b.source AS source_b, b.n AS grams_b
        |       FROM sz a JOIN sz b ON a.source < b.source)
        |SELECT pr.source_a, pr.source_b, pr.grams_a, pr.grams_b,
        |       coalesce(iv.shared, 0) AS n_shared,
        |       round(CAST(coalesce(iv.shared, 0) AS DOUBLE) /
        |             CAST(pr.grams_a + pr.grams_b - coalesce(iv.shared, 0)
        |                  AS DOUBLE), 6) AS jaccard
        |FROM pr LEFT JOIN iv
        |  ON iv.source_a = pr.source_a AND iv.source_b = pr.source_b""".stripMargin,

    // char entropy per DISTINCT text joined back per row (duplicate rows
    // emit duplicate outputs, as the per-row Spark plan does); fold over
    // char-ascending terms, list_reduce's first-element seed == the
    // Spark fold's 0.0 init exactly
    "text_entropy" ->
      """WITH b AS (
        |  SELECT DISTINCT text FROM documents WHERE text IS NOT NULL),
        |ch AS (
        |  SELECT text, unnest(regexp_extract_all(lower(text), '[a-z0-9 ]')) AS c
        |  FROM b),
        |cnt AS (
        |  SELECT text, c, CAST(count(*) AS BIGINT) AS k FROM ch GROUP BY 1, 2),
        |tot AS (
        |  SELECT text, CAST(sum(k) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS nd
        |  FROM cnt GROUP BY 1),
        |ent AS (
        |  SELECT cnt.text,
        |         list_reduce(
        |           list(-((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |                  ln(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)))
        |                ORDER BY c),
        |           (a, x) -> a + x) AS h
        |  FROM cnt JOIN tot USING (text) GROUP BY 1)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NOT NULL THEN coalesce(tot.n, 0) END AS n_ascii,
        |  CASE WHEN d.text IS NOT NULL THEN coalesce(tot.nd, 0) END AS n_distinct,
        |  CASE WHEN d.text IS NOT NULL AND coalesce(tot.n, 0) > 0
        |       THEN round(ent.h / CAST(0.6931471805599453 AS DOUBLE)
        |                  + CAST(0.0 AS DOUBLE), 4)
        |  END AS entropy_bits
        |FROM documents d
        |LEFT JOIN tot ON tot.text = d.text
        |LEFT JOIN ent ON ent.text = d.text""".stripMargin,

    // the transitionPairs window with a second lead; share normalizes
    // by the global trigram total over the aggregated relation
    "event_trigrams" ->
      """WITH p AS (
        |  SELECT event_type AS t1,
        |         lead(event_type, 1) OVER w AS t2,
        |         lead(event_type, 2) OVER w AS t3
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
        |c AS (
        |  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n FROM p
        |  WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT t1, t2, t3, n,
        |       round(CAST(n AS DOUBLE) /
        |             CAST(CAST(sum(n) OVER () AS BIGINT) AS DOUBLE), 6)
        |         AS share
        |FROM c""".stripMargin,

    // the NAIVE single-reducer form — a global ordered window — which
    // is fine on the single-node oracle engine and is exactly what the
    // Spark side decomposes into the count-of-counts histogram:
    // rank()-1 counts strictly-smaller users because ties share a rank
    "user_percentiles" ->
      """WITH c AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT user_id, n_events,
        |         CAST(rank() OVER (ORDER BY n_events) - 1 AS BIGINT)
        |           AS n_below,
        |         CAST(count(*) OVER () AS BIGINT) AS total
        |  FROM c)
        |SELECT user_id, n_events, n_below,
        |       CASE WHEN total > 1
        |            THEN round(CAST(n_below AS DOUBLE) /
        |                       CAST(total - 1 AS DOUBLE), 6)
        |       END AS pct_rank
        |FROM r""".stripMargin,

    // LOCF over the level x filled-day grid; the decimal-sum guard is
    // the metrics_by_service contract verbatim
    "metrics_locf" ->
      """WITH daily AS (
        |  SELECT event_type AS level, strftime(ts, '%Y-%m-%d') AS day,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
        |                                ELSE value END AS DECIMAL(12,2)))
        |              AS DOUBLE) AS v_obs
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT min(CAST(day AS DATE)) AS d0,
        |             max(CAST(day AS DATE)) AS d1 FROM daily),
        |d AS (SELECT strftime(unnest(generate_series(d0, d1, INTERVAL 1 DAY)),
        |                      '%Y-%m-%d') AS day
        |      FROM b WHERE d0 IS NOT NULL),
        |g AS (SELECT l.level, d.day
        |      FROM (SELECT DISTINCT level FROM daily) l CROSS JOIN d)
        |SELECT g.level, g.day, coalesce(dd.n_events, 0) AS n_events,
        |       dd.v_obs,
        |       last_value(dd.v_obs IGNORE NULLS) OVER (
        |         PARTITION BY g.level ORDER BY g.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS v_filled
        |FROM g LEFT JOIN daily dd
        |  ON dd.level = g.level AND dd.day = g.day""".stripMargin,

    // trailing-7 rolling median over the zero-filled grid; the same
    // explicit sorted-list median arithmetic as anomaly_mad
    "metrics_rolling_median" -> rollingMedianSql(7),
    // a tighter window (more reactive, still majority-robust over 3)
    "metrics_rolling_median_3d" -> rollingMedianSql(3),

    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |            CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lineitems
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= CAST(0.05 AS DOUBLE)
        |  AND l_discount <= CAST(0.07 AS DOUBLE)
        |  AND l_quantity < 24""".stripMargin,

    "q10_top_returns" ->
      """SELECT c_custkey, c_name, n_name AS nation,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |            (CAST(1.00 AS DECIMAL(3,2)) -
        |             CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_returned
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND c_nationkey = n_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // the NB replay: Gopher verdict inline per ROW (a join to a label
    // relation would square duplicate-row docs), vocab = the shared
    // top-1000 chain, smoothed log-probs from exact integer counts,
    // per-doc token-ordered folds (terms strictly negative — no -0.0)
    "quality_nb" ->
      """WITH tk0 AS (
        |  SELECT doc_id,
        |    COALESCE(
        |      len(toks) >= 50 AND len(toks) <= 100000
        |      AND CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |          / CAST(len(toks) AS DOUBLE) >= 3.0
        |      AND CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |          / CAST(len(toks) AS DOUBLE) <= 10.0
        |      AND CAST(len(regexp_extract_all(text, '(#|\.\.\.|…)')) AS DOUBLE)
        |          / CAST(len(toks) AS DOUBLE) <= 0.1
        |      AND CAST(len(list_filter(lns, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE)
        |          / CAST(len(lns) AS DOUBLE) <= 0.9
        |      AND CAST(len(list_filter(lns, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS DOUBLE)
        |          / CAST(len(lns) AS DOUBLE) <= 0.3
        |      AND CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
        |          / CAST(len(toks) AS DOUBLE) >= 0.8
        |      AND len(list_filter(['the','a','an','and','or','of','to','in','is','it'],
        |          s -> list_contains(toks, s))) >= 2, FALSE) AS kept,
        |    unnest(toks) AS token
        |  FROM (SELECT doc_id, text,
        |               regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
        |               regexp_split_to_array(text, '\n') AS lns
        |        FROM documents WHERE text IS NOT NULL)),
        |tkc AS MATERIALIZED (
        |  SELECT doc_id, kept, token, CAST(count(*) AS BIGINT) AS c
        |  FROM tk0 GROUP BY 1, 2, 3),
        |db AS MATERIALIZED (SELECT DISTINCT doc_id, kept FROM tkc),
        |vocab AS MATERIALIZED (
        |  SELECT token FROM (
        |    SELECT token, freq,
        |           CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS token_id
        |    FROM (
        |      SELECT token, count(*) AS freq FROM (
        |        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |        FROM documents) t
        |      WHERE length(token) > 0
        |      GROUP BY token HAVING count(*) >= 2) c) r
        |  WHERE token_id <= 1000),
        |cc AS MATERIALIZED (
        |  SELECT t.token, t.kept, CAST(sum(t.c) AS BIGINT) AS ck
        |  FROM tkc t JOIN vocab v ON v.token = t.token GROUP BY 1, 2),
        |tots AS (
        |  SELECT CAST(coalesce((SELECT sum(ck) FROM cc WHERE kept), 0) AS BIGINT) AS tot_t,
        |         CAST(coalesce((SELECT sum(ck) FROM cc WHERE NOT kept), 0) AS BIGINT) AS tot_f,
        |         CAST((SELECT count(*) FROM vocab) AS BIGINT) AS v),
        |lpw AS MATERIALIZED (
        |  SELECT vocab.token,
        |         ln((CAST(coalesce(ct.ck, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |            (CAST(tot_t AS DOUBLE) + CAST(v AS DOUBLE))) AS lp_t,
        |         ln((CAST(coalesce(cf.ck, 0) AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |            (CAST(tot_f AS DOUBLE) + CAST(v AS DOUBLE))) AS lp_f
        |  FROM vocab CROSS JOIN tots
        |  LEFT JOIN (SELECT token, ck FROM cc WHERE kept) ct ON ct.token = vocab.token
        |  LEFT JOIN (SELECT token, ck FROM cc WHERE NOT kept) cf ON cf.token = vocab.token),
        |pri AS (
        |  SELECT ln((CAST(nk AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |            (CAST(nd AS DOUBLE) + CAST(2.0 AS DOUBLE))) AS pri_t,
        |         ln((CAST(nd - nk AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |            (CAST(nd AS DOUBLE) + CAST(2.0 AS DOUBLE))) AS pri_f
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS nd,
        |               CAST(coalesce(sum(CASE WHEN kept THEN 1 ELSE 0 END), 0)
        |                    AS BIGINT) AS nk FROM db)),
        |sc AS MATERIALIZED (
        |  SELECT t.doc_id, CAST(sum(t.c) AS BIGINT) AS n_vocab_tokens,
        |         list_reduce(list(CAST(t.c AS DOUBLE) * l.lp_t ORDER BY t.token),
        |                     (a, x) -> a + x) AS s_t,
        |         list_reduce(list(CAST(t.c AS DOUBLE) * l.lp_f ORDER BY t.token),
        |                     (a, x) -> a + x) AS s_f
        |  FROM tkc t JOIN lpw l ON l.token = t.token GROUP BY 1)
        |SELECT d.doc_id, db.kept AS label,
        |  coalesce(sc.n_vocab_tokens,
        |           CASE WHEN db.kept IS NOT NULL THEN 0 END) AS n_vocab_tokens,
        |  CASE WHEN db.kept IS NOT NULL
        |       THEN round(pri.pri_t + coalesce(sc.s_t, CAST(0.0 AS DOUBLE)), 4)
        |  END AS lp_keep,
        |  CASE WHEN db.kept IS NOT NULL
        |       THEN round(pri.pri_f + coalesce(sc.s_f, CAST(0.0 AS DOUBLE)), 4)
        |  END AS lp_drop,
        |  CASE WHEN db.kept IS NOT NULL
        |       THEN pri.pri_t + coalesce(sc.s_t, CAST(0.0 AS DOUBLE)) >=
        |            pri.pri_f + coalesce(sc.s_f, CAST(0.0 AS DOUBLE))
        |  END AS pred_keep
        |FROM documents d
        |LEFT JOIN db ON db.doc_id = d.doc_id
        |LEFT JOIN sc ON sc.doc_id = d.doc_id
        |CROSS JOIN pri""".stripMargin,

    // one stats row per column via UNION ALL of per-column aggregates
    // (the single-pass Expand plan is Spark's side of the contract; the
    // VALUES are engine-independent integers either way)
    "profile_events" -> profileSql("events",
      Seq("event_id", "ts", "user_id", "event_type", "value", "props")),
    "profile_documents" -> profileSql("documents",
      Seq("doc_id", "text", "lang", "source", "n_chars")),

    // the oracle states interval containment DIRECTLY (BETWEEN join) —
    // the bin decomposition is Spark's side of the contract only; window
    // bounds ride raw timestamps until the output formatting
    "interval_join" ->
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
        |  FROM g),
        |sess AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |         min(ts) AS t0, max(ts) AS t1,
        |         strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start
        |  FROM s GROUP BY user_id, session_id),
        |win AS (
        |  SELECT user_id AS window_user,
        |         t0 - INTERVAL 5 MINUTE AS w0,
        |         t1 + INTERVAL 5 MINUTE AS w1
        |  FROM sess
        |  ORDER BY n_events DESC, user_id, session_start
        |  LIMIT 20)
        |SELECT window_user,
        |       strftime(w0, '%Y-%m-%d %H:%M:%S.%f') AS window_start,
        |       strftime(w1, '%Y-%m-%d %H:%M:%S.%f') AS window_end,
        |       count(*) AS n_events,
        |       count(DISTINCT e.user_id) AS n_users,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(e.value) THEN NULL
        |                              ELSE e.value END AS DECIMAL(12,2)))
        |            AS DOUBLE) AS total_value
        |FROM win JOIN events e ON e.ts >= win.w0 AND e.ts <= win.w1
        |GROUP BY 1, 2, 3""".stripMargin,

    // one CTE pair per probed join; NULL keys drop at the count-join
    // (= never equi-join) but stay in left/right_rows; hot key = struct
    // max over (pairs, key) — keys unique per join relation, total order
    "join_size_probe" -> {
      def one(name: String, lt: String, lk: String, rt: String,
          rk: String): String =
        s"""SELECT '$name' AS join_name,
           |  (SELECT count(*) FROM $lt) AS left_rows,
           |  (SELECT count(*) FROM $rt) AS right_rows,
           |  count(*) AS n_join_keys,
           |  CAST(coalesce(sum(pairs), 0) AS BIGINT) AS pairs,
           |  max(struct_pack(p := pairs, k := key)).p AS max_key_pairs,
           |  max(struct_pack(p := pairs, k := key)).k AS hot_key,
           |  CASE WHEN (SELECT count(*) FROM $lt) > 0 THEN
           |    round(CAST(coalesce(sum(pairs), 0) AS DOUBLE) /
           |          (SELECT count(*) FROM $lt), 6)
           |  END AS amplification
           |FROM (
           |  SELECT lc.key, lc.cl * rc.cr AS pairs
           |  FROM (SELECT CAST($lk AS VARCHAR) AS key, count(*) AS cl
           |        FROM $lt WHERE $lk IS NOT NULL GROUP BY 1) lc
           |  JOIN (SELECT CAST($rk AS VARCHAR) AS key, count(*) AS cr
           |        FROM $rt WHERE $rk IS NOT NULL GROUP BY 1) rc
           |  ON lc.key = rc.key) j""".stripMargin
      one("events_self_user", "events", "user_id", "events", "user_id") +
        "\nUNION ALL\n" +
        one("lineitem_orders", "lineitem", "l_orderkey", "orders",
          "o_orderkey") +
        "\nUNION ALL\n" +
        one("orders_customer", "orders", "o_custkey", "customer",
          "c_custkey")
    },

    // same sample (md5 bottom-k), same exact integer cut ranks, same
    // bit arithmetic: the Morton key is pure integer math both engines
    // share; NULL-dim rows form the NULL file_id group
    "layout_zorder" -> {
      val zexpr = (0 until 4).map(i =>
        s"((ub >> $i) & 1) * ${1L << (2 * i + 1)} + " +
          s"((db >> $i) & 1) * ${1L << (2 * i)}").mkString(" + ")
      s"""WITH ev AS (
         |  -- FLOOR day index (remainder-subtract form, exact integers):
         |  -- mirrors the Spark write path; // alone truncates pre-1970
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
         |z AS (
         |  SELECT CASE WHEN user_id IS NOT NULL THEN
         |           CAST(len(list_filter(cuts_u, c -> c <= user_id)) AS BIGINT)
         |         END AS ub,
         |         CASE WHEN day_idx IS NOT NULL THEN
         |           CAST(len(list_filter(cuts_d, c -> c <= day_idx)) AS BIGINT)
         |         END AS db
         |  FROM ev CROSS JOIN cu CROSS JOIN cd),
         |zz AS (SELECT ub, db, $zexpr AS z FROM z)
         |SELECT z // 8 AS file_id, count(*) AS n_rows,
         |       count(DISTINCT ub) AS n_user_buckets,
         |       count(DISTINCT db) AS n_day_buckets,
         |       min(z) AS z_min, max(z) AS z_max
         |FROM zz GROUP BY 1""".stripMargin
    },

    // the UNPRUNED join — the identity contract: the Bloom may only
    // remove rows the join would discard anyway
    "bloom_pruned_join" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |            (CAST(1.00 AS DECIMAL(3,2)) -
        |             CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1""".stripMargin,

    // the streaming twin reproduces the window build exactly in batch
    // mode — one oracle checks both
    "scd2_stateful" -> scd2Oracle,

    // the raw filter over the UNION corpus: the append path (stored-cuts
    // assignment + per-file promote + replayed-increment ledger no-op)
    // must be invisible in the answer
    "events_2d_appended" ->
      """SELECT CAST(5 AS BIGINT) AS user_id, count(*) AS n_events,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
        |                              ELSE value END AS DECIMAL(12,2)))
        |            AS DOUBLE) AS total_value,
        |       count(DISTINCT event_type) AS n_types
        |FROM events
        |WHERE user_id = 5
        |  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts <  TIMESTAMP '2024-02-21 00:00:00'""".stripMargin,

    // compaction (two-phase per-dir tmp+swap rewrite) must be invisible
    "events_2d_compacted" ->
      """SELECT CAST(7 AS BIGINT) AS user_id, count(*) AS n_events,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
        |                              ELSE value END AS DECIMAL(12,2)))
        |            AS DOUBLE) AS total_value,
        |       count(DISTINCT event_type) AS n_types
        |FROM events
        |WHERE user_id = 7
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-03-02 00:00:00'""".stripMargin,

    // the erased corpus IS events minus the subject: the subject-3 leg
    // aggregates over the empty remainder (count 0 / NULL sum / 0
    // distinct — exactly what the store serves through the tombstone
    // anti-join), the subject-5 leg must be untouched
    "events_2d_erasure" ->
      """SELECT CAST(3 AS BIGINT) AS user_id, count(*) AS n_events,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
        |                              ELSE value END AS DECIMAL(12,2)))
        |            AS DOUBLE) AS total_value,
        |       count(DISTINCT event_type) AS n_types
        |FROM events
        |WHERE NOT (user_id IS NOT DISTINCT FROM 3)
        |  AND user_id = 3
        |  AND ts >= TIMESTAMP '2024-01-03 00:00:00'
        |  AND ts <  TIMESTAMP '2024-02-16 00:00:00'
        |UNION ALL
        |SELECT CAST(5 AS BIGINT) AS user_id, count(*) AS n_events,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
        |                              ELSE value END AS DECIMAL(12,2)))
        |            AS DOUBLE) AS total_value,
        |       count(DISTINCT event_type) AS n_types
        |FROM events
        |WHERE NOT (user_id IS NOT DISTINCT FROM 3)
        |  AND user_id = 5
        |  AND ts >= TIMESTAMP '2024-01-03 00:00:00'
        |  AND ts <  TIMESTAMP '2024-02-16 00:00:00'""".stripMargin,

    // the batch request erased exactly {3, 9, 11}; 5 is untouched
    "events_2d_erasure_batch" -> Seq(3, 9, 11, 5).map(u =>
      s"""SELECT CAST($u AS BIGINT) AS user_id, count(*) AS n_events,
         |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
         |                              ELSE value END AS DECIMAL(12,2)))
         |            AS DOUBLE) AS total_value,
         |       count(DISTINCT event_type) AS n_types
         |FROM events
         |WHERE user_id NOT IN (3, 9, 11)
         |  AND user_id = $u
         |  AND ts >= TIMESTAMP '2024-01-03 00:00:00'
         |  AND ts <  TIMESTAMP '2024-02-16 00:00:00'""".stripMargin)
      .mkString("\nUNION ALL\n"),

    // the raw-table filter per request: one pruned scan + broadcast join
    // must be invisible in the answers
    "events_2d_batch_served" -> Seq(
        (3, "2024-01-03", "2024-02-15"), (5, "2024-01-10", "2024-03-01"),
        (7, "2024-02-01", "2024-02-10"), (11, "2024-01-05", "2024-01-06"))
      .map { case (u, lo, hi) =>
        val hiX = java.time.LocalDate.parse(hi).plusDays(1)
        s"""SELECT CAST($u AS BIGINT) AS user_id, '$lo' AS win_lo,
           |       '$hi' AS win_hi, count(*) AS n_events,
           |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
           |                              ELSE value END AS DECIMAL(12,2)))
           |            AS DOUBLE) AS total_value,
           |       count(DISTINCT event_type) AS n_types
           |FROM events
           |WHERE user_id = $u
           |  AND ts >= TIMESTAMP '$lo 00:00:00'
           |  AND ts <  TIMESTAMP '$hiX 00:00:00'""".stripMargin }
      .mkString("\nUNION ALL\n"),

    // the relation-shaped batch serve: the oracle answers the DISTINCT
    // request set (the planted duplicate answers once — the relation
    // contract), each as the raw-table filter
    "events_2d_batch_rel" -> Seq(
        (2, "2024-01-01", "2024-01-10"), (5, "2024-01-05", "2024-02-20"),
        (7, "2024-01-15", "2024-02-01"), (11, "2024-02-01", "2024-03-01"))
      .map { case (u, lo, hi) =>
        val hiX = java.time.LocalDate.parse(hi).plusDays(1)
        s"""SELECT CAST($u AS BIGINT) AS user_id, '$lo' AS win_lo,
           |       '$hi' AS win_hi, count(*) AS n_events,
           |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
           |                              ELSE value END AS DECIMAL(12,2)))
           |            AS DOUBLE) AS total_value,
           |       count(DISTINCT event_type) AS n_types
           |FROM events
           |WHERE user_id = $u
           |  AND ts >= TIMESTAMP '$lo 00:00:00'
           |  AND ts <  TIMESTAMP '$hiX 00:00:00'""".stripMargin }
      .mkString("\nUNION ALL\n"),

    // the DSAR evidence relation, every number independently re-derived
    // from the raw tables: zorder = event rows of the subjects; lex =
    // indexed docs (text NOT NULL) owned via the pmod-20 ownership rule;
    // ivf = valid embeddings owned; sig = distinct owned docs; hll = the
    // exact estimator delta (the approx_distinct machinery, users only,
    // with and without the subjects). subject_rows_after is the CONTRACT
    // zero — the Spark side measures it physically from each store.
    "dsar_execute" ->
      """WITH hv0 AS (
        |  SELECT event_type AS g, CAST(user_id AS VARCHAR) AS s
        |  FROM events WHERE user_id IS NOT NULL),
        |hr0 AS (
        |  SELECT g, md5_number_lower(s) % 4096 AS b,
        |         max(CASE WHEN md5_number_lower('rho:' || s) % 1125899906842624 = 0 THEN 51
        |              ELSE 51 - length(bin(md5_number_lower('rho:' || s) % 1125899906842624)) END) AS mx
        |  FROM hv0 GROUP BY 1, 2),
        |hg0 AS (
        |  SELECT g,
        |         CAST(SUM(CAST(1 AS BIGINT) << CAST(51 - mx AS INT))
        |              + (4096 - count(*)) * 2251799813685248 AS BIGINT) AS z2,
        |         4096 - count(*) AS vz
        |  FROM hr0 GROUP BY 1),
        |he0 AS (
        |  SELECT g,
        |    CAST(floor(CASE WHEN vz > 0 AND 0.7213e0/(1.0e0 + 1.079e0/4096.0e0)*4096.0e0*4096.0e0*2251799813685248.0e0/CAST(z2 AS DOUBLE) <= 10240.0e0
        |          THEN 4096.0e0 * ln(4096.0e0 / CAST(vz AS DOUBLE))
        |          ELSE 0.7213e0/(1.0e0 + 1.079e0/4096.0e0)*4096.0e0*4096.0e0*2251799813685248.0e0/CAST(z2 AS DOUBLE) END) AS BIGINT) AS est
        |  FROM hg0),
        |hs0 AS (SELECT CAST(COALESCE(sum(est), 0) AS BIGINT) AS e FROM he0),
        |hv1 AS (
        |  SELECT event_type AS g, CAST(user_id AS VARCHAR) AS s
        |  FROM events WHERE user_id IS NOT NULL AND user_id NOT IN (3, 9)),
        |hr1 AS (
        |  SELECT g, md5_number_lower(s) % 4096 AS b,
        |         max(CASE WHEN md5_number_lower('rho:' || s) % 1125899906842624 = 0 THEN 51
        |              ELSE 51 - length(bin(md5_number_lower('rho:' || s) % 1125899906842624)) END) AS mx
        |  FROM hv1 GROUP BY 1, 2),
        |hg1 AS (
        |  SELECT g,
        |         CAST(SUM(CAST(1 AS BIGINT) << CAST(51 - mx AS INT))
        |              + (4096 - count(*)) * 2251799813685248 AS BIGINT) AS z2,
        |         4096 - count(*) AS vz
        |  FROM hr1 GROUP BY 1),
        |he1 AS (
        |  SELECT g,
        |    CAST(floor(CASE WHEN vz > 0 AND 0.7213e0/(1.0e0 + 1.079e0/4096.0e0)*4096.0e0*4096.0e0*2251799813685248.0e0/CAST(z2 AS DOUBLE) <= 10240.0e0
        |          THEN 4096.0e0 * ln(4096.0e0 / CAST(vz AS DOUBLE))
        |          ELSE 0.7213e0/(1.0e0 + 1.079e0/4096.0e0)*4096.0e0*4096.0e0*2251799813685248.0e0/CAST(z2 AS DOUBLE) END) AS BIGINT) AS est
        |  FROM hg1),
        |hs1 AS (SELECT CAST(COALESCE(sum(est), 0) AS BIGINT) AS e FROM he1),
        |vvalid AS (
        |  SELECT DISTINCT vec_id FROM embeddings
        |  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
        |    AND len(embedding) = 64
        |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0)
        |SELECT 'zorder' AS store,
        |       (SELECT count(*) FROM events WHERE user_id IN (3, 9)) AS entities_removed,
        |       CAST(0 AS BIGINT) AS subject_rows_after,
        |       (SELECT count(*) FROM events)
        |         - (SELECT count(*) FROM events WHERE user_id IN (3, 9)) AS entities_after
        |UNION ALL
        |SELECT 'lex',
        |       (SELECT count(*) FROM documents WHERE text IS NOT NULL AND doc_id % 20 IN (3, 9)),
        |       CAST(0 AS BIGINT),
        |       (SELECT count(*) FROM documents WHERE text IS NOT NULL)
        |         - (SELECT count(*) FROM documents WHERE text IS NOT NULL AND doc_id % 20 IN (3, 9))
        |UNION ALL
        |SELECT 'ivf',
        |       (SELECT count(*) FROM vvalid WHERE vec_id % 20 IN (3, 9)),
        |       CAST(0 AS BIGINT),
        |       (SELECT count(*) FROM vvalid)
        |         - (SELECT count(*) FROM vvalid WHERE vec_id % 20 IN (3, 9))
        |UNION ALL
        |SELECT 'sig',
        |       (SELECT count(DISTINCT doc_id) FROM documents WHERE doc_id % 20 IN (3, 9)),
        |       CAST(0 AS BIGINT),
        |       (SELECT count(DISTINCT doc_id) FROM documents)
        |         - (SELECT count(DISTINCT doc_id) FROM documents WHERE doc_id % 20 IN (3, 9))
        |UNION ALL
        |SELECT 'hll',
        |       (SELECT e FROM hs0) - (SELECT e FROM hs1),
        |       CAST(0 AS BIGINT),
        |       (SELECT e FROM hs1)""".stripMargin,

    // the streaming cache's batch mode must equal the raw-table as-of —
    // the same LIMIT-1 oracle the z-store serve answers to
    "events_2d_asof_stateful" -> Seq((3, "2024-01-20 00:00:00"),
        (5, "2024-02-10 12:00:00")).map { case (u, t) =>
      s"""(SELECT CAST($u AS BIGINT) AS user_id, '$t' AS horizon,
         |        epoch_us(ts) AS asof_us, event_type,
         |        CAST(value AS DOUBLE) AS value
         | FROM events
         | WHERE user_id = $u AND ts <= TIMESTAMP '$t'
         | ORDER BY ts DESC, event_id DESC NULLS LAST,
         |          event_type DESC NULLS LAST
         | LIMIT 1)""".stripMargin }
      .mkString("\nUNION ALL\n"),

    // relation-shaped batch as-of: LIMIT-1 per DISTINCT request
    "events_2d_asof_rel" -> Seq((2, "2024-02-01 00:00:00"),
        (5, "2024-01-15 18:00:00"), (11, "2024-02-20 00:00:00"))
      .map { case (u, t) =>
      s"""(SELECT CAST($u AS BIGINT) AS user_id, '$t' AS horizon,
         |        epoch_us(ts) AS asof_us, event_type,
         |        CAST(value AS DOUBLE) AS value
         | FROM events
         | WHERE user_id = $u AND ts <= TIMESTAMP '$t'
         | ORDER BY ts DESC, event_id DESC NULLS LAST,
         |          event_type DESC NULLS LAST
         | LIMIT 1)""".stripMargin }
      .mkString("\nUNION ALL\n"),

    // the batch as-of: per request, the same LIMIT-1 raw as-of with the
    // horizon echoed as a disambiguating column; the pre-corpus horizon
    // contributes no row on either engine
    "events_2d_asof_batch" -> Seq((3, "2024-01-20 00:00:00"),
        (5, "2024-02-10 12:00:00"), (5, "2024-01-08 06:00:00"),
        (7, "1999-01-01 00:00:00")).map { case (u, t) =>
      s"""(SELECT CAST($u AS BIGINT) AS user_id, '$t' AS horizon,
         |        epoch_us(ts) AS asof_us, event_type,
         |        CAST(value AS DOUBLE) AS value
         | FROM events
         | WHERE user_id = $u AND ts <= TIMESTAMP '$t'
         | ORDER BY ts DESC, event_id DESC NULLS LAST,
         |          event_type DESC NULLS LAST
         | LIMIT 1)""".stripMargin }
      .mkString("\nUNION ALL\n"),

    // the raw-table as-of: the latest row per (user, horizon) under the
    // pinned total order — z-pruning must be invisible in the answer
    "events_2d_asof" -> Seq((3, "2024-01-20 00:00:00"),
        (5, "2024-02-10 12:00:00")).map { case (u, t) =>
      s"""(SELECT CAST($u AS BIGINT) AS user_id, epoch_us(ts) AS asof_us,
         |        event_type, CAST(value AS DOUBLE) AS value
         | FROM events
         | WHERE user_id = $u AND ts <= TIMESTAMP '$t'
         | ORDER BY ts DESC, event_id DESC NULLS LAST,
         |          event_type DESC NULLS LAST
         | LIMIT 1)""".stripMargin }
      .mkString("\nUNION ALL\n"),

    // the raw-table filter: z-pruning must be invisible in the answer
    "events_2d_served" ->
      """SELECT CAST(3 AS BIGINT) AS user_id, count(*) AS n_events,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
        |                              ELSE value END AS DECIMAL(12,2)))
        |            AS DOUBLE) AS total_value,
        |       count(DISTINCT event_type) AS n_types
        |FROM events
        |WHERE user_id = 3
        |  AND ts >= TIMESTAMP '2024-01-03 00:00:00'
        |  AND ts <  TIMESTAMP '2024-02-16 00:00:00'""".stripMargin,

    // islands break on IS DISTINCT FROM state change; the closing lead
    // runs over the interval relation; NULL-ts rows stay off the timeline
    "scd2_intervals" -> scd2Oracle,

    // group = exclusive prefix sum DIV target over the day grid; NULL
    // day files group as 'unknown' (engines disagree on NULL sort order)
    "compaction_plan" ->
      """WITH d AS (
        |  SELECT coalesce(strftime(ts, '%Y-%m-%d'), 'unknown') AS day,
        |         count(*) AS n_rows
        |  FROM events GROUP BY 1)
        |SELECT day, n_rows,
        |       CAST(coalesce(sum(n_rows) OVER (ORDER BY day
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS BIGINT) AS cum_before,
        |       CAST(coalesce(sum(n_rows) OVER (ORDER BY day
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS BIGINT) // 2000 AS group_id
        |FROM d""".stripMargin,

    // RI via NOT EXISTS (NULL FKs are not orphans); duplicate surplus =
    // count minus distinct non-null ids (a NULL id is a violation — a
    // row without identity can't be deduplicated or upserted)
    "dq_checks" ->
      """SELECT 'lineitem_fk_orderkey' AS check, count(*) AS n_checked,
        |       count(*) FILTER (WHERE l_orderkey IS NOT NULL AND NOT EXISTS
        |         (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS n_violations,
        |       count(*) FILTER (WHERE l_orderkey IS NOT NULL AND NOT EXISTS
        |         (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) = 0 AS ok
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_fk_custkey', count(*),
        |       count(*) FILTER (WHERE o_custkey IS NOT NULL AND NOT EXISTS
        |         (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
        |       count(*) FILTER (WHERE o_custkey IS NOT NULL AND NOT EXISTS
        |         (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) = 0
        |FROM orders
        |UNION ALL
        |SELECT 'customer_fk_nationkey', count(*),
        |       count(*) FILTER (WHERE c_nationkey IS NOT NULL AND NOT EXISTS
        |         (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)),
        |       count(*) FILTER (WHERE c_nationkey IS NOT NULL AND NOT EXISTS
        |         (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)) = 0
        |FROM customer
        |UNION ALL
        |SELECT 'events_unique_event_id', count(*),
        |       count(*) - count(DISTINCT event_id),
        |       count(*) - count(DISTINCT event_id) = 0
        |FROM events
        |UNION ALL
        |SELECT 'events_ts_not_null', count(*),
        |       count(*) FILTER (WHERE ts IS NULL),
        |       count(*) FILTER (WHERE ts IS NULL) = 0
        |FROM events
        |UNION ALL
        |SELECT 'documents_text_not_null', count(*),
        |       count(*) FILTER (WHERE text IS NULL),
        |       count(*) FILTER (WHERE text IS NULL) = 0
        |FROM documents""".stripMargin,

    // the lang_id CASE verbatim, then the confusion matrix; NULL cells
    // are real (IS NOT DISTINCT FROM for `correct`, null-safe grouping)
    "lang_id_eval" ->
      """WITH s AS (
        |  SELECT doc_id, lang, text,
        |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) / length(text) AS cjk,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|it|you|that|for)\b')) AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|de|et|un|une|est|pour|que)\b')) AS s_fr,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|y|es|para|por|con|del|una)\b')) AS s_es,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|von|zu|mit|ein|nicht)\b')) AS s_de
        |  FROM documents),
        |p AS (
        |  SELECT lang AS labeled_lang,
        |    CASE WHEN text IS NULL THEN NULL
        |         WHEN cjk > 0.3 THEN 'zh'
        |         WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
        |         WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
        |         WHEN s_es >= s_de THEN 'es'
        |         ELSE 'de' END AS pred_lang
        |  FROM s),
        |m AS (
        |  SELECT labeled_lang, pred_lang, count(*) AS n_docs
        |  FROM p GROUP BY 1, 2)
        |SELECT labeled_lang, pred_lang, n_docs,
        |       CAST(sum(n_docs) OVER (PARTITION BY labeled_lang) AS BIGINT)
        |         AS labeled_total,
        |       labeled_lang IS NOT DISTINCT FROM pred_lang AS correct,
        |       round(CAST(n_docs AS DOUBLE) /
        |             CAST(sum(n_docs) OVER (PARTITION BY labeled_lang) AS DOUBLE),
        |             6) AS share
        |FROM m""".stripMargin,

    // the classic correlated form: min balance per part, then min
    // suppkey among tied balances — independently derives the window
    // plan's (s_acctbal, l_suppkey) rank-1 selection
    "q2_min_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |j AS (SELECT l_partkey, l_suppkey, s_acctbal, s_name
        |      FROM ps JOIN supplier ON s_suppkey = l_suppkey),
        |m AS (
        |  SELECT * FROM j a
        |  WHERE s_acctbal = (SELECT min(s_acctbal) FROM j b
        |                     WHERE b.l_partkey = a.l_partkey)
        |    AND l_suppkey = (SELECT min(l_suppkey) FROM j c
        |                     WHERE c.l_partkey = a.l_partkey
        |                       AND c.s_acctbal = a.s_acctbal))
        |SELECT p_partkey, p_name, l_suppkey AS s_suppkey, s_name, s_acctbal
        |FROM m JOIN part ON p_partkey = l_partkey
        |ORDER BY s_acctbal DESC, p_partkey
        |LIMIT 50""".stripMargin,

    "dsar_report" ->
      """SELECT user_id, count(*) AS n_events,
        |       count(DISTINCT event_type) AS n_event_types,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_seen,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_seen,
        |       CAST(sum(TRY_CAST(CASE WHEN isnan(value) THEN NULL
        |                              ELSE value END AS DECIMAL(12,2)))
        |            AS DOUBLE) AS total_value
        |FROM events
        |WHERE user_id IS NOT NULL
        |  AND md5_number_lower('dsar:' || CAST(user_id AS VARCHAR)) % 20 = 0
        |GROUP BY 1""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       o_totalprice, CAST(q.total_qty AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |             sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
        |      FROM lineitem GROUP BY 1
        |      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 180) q
        |  ON o_orderkey = q.l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    // the media entity universe (distinct non-NULL payloads), digest
    // groups with keeper/min-id, copy count, and kind spread
    "dedup_media" ->
      """WITH m AS (
        |  SELECT DISTINCT doc_id, text FROM documents WHERE text IS NOT NULL)
        |SELECT md5(text) AS payload_digest,
        |       min(doc_id) AS keeper_media_id,
        |       count(*) AS n_copies,
        |       count(DISTINCT (['image', 'audio', 'video'])[(doc_id % 3) + 1])
        |         AS n_kinds,
        |       count(*) > 1 AS is_dup
        |FROM m GROUP BY 1""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate
        |                AND l_quantity >= 40)
        |GROUP BY 1""".stripMargin,

    // the classic Q13 form (LEFT JOIN, then count the non-NULL keys) —
    // an independent derivation of the Spark side's pre-aggregated
    // outer join; the ON-clause filter must NOT move to a WHERE
    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS n_custs FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1) d
        |GROUP BY 1""".stripMargin,

    // scalar average as an exact decimal sum over one double division —
    // never avg(double), whose merge order the engines don't share
    "q22_dormant_customers" ->
      """WITH ab AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) /
        |         count(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_custs,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_acctbal
        |FROM customer, ab
        |WHERE c_acctbal > ab.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY 1""".stripMargin,

    "q14_promo_share" ->
      """WITH j AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS month, p_type,
        |         CAST(l_extendedprice AS DECIMAL(12,2)) *
        |         (CAST(1.00 AS DECIMAL(3,2)) -
        |          CAST(l_discount AS DECIMAL(4,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |a AS (
        |  SELECT month,
        |         CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
        |                       ELSE CAST(0 AS DECIMAL(12,2)) END)
        |              AS DOUBLE) AS promo_revenue,
        |         CAST(sum(rev) AS DOUBLE) AS total_revenue,
        |         count(*) AS n_lineitems
        |  FROM j GROUP BY 1)
        |SELECT month, promo_revenue, total_revenue, n_lineitems,
        |       CASE WHEN total_revenue <> CAST(0.0 AS DOUBLE)
        |            THEN round(CAST(100.0 AS DOUBLE) * promo_revenue /
        |                       total_revenue, 6) END AS promo_share
        |FROM a""".stripMargin
  )
}
