package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Second helper chunk of the oracle layer (see [[OracleHelpersA]]). */
trait OracleHelpersB {
  private[graft] def approxDistinctSql: String =
      """WITH v AS (
        |  SELECT event_type AS g, 'u' AS tag, CAST(user_id AS VARCHAR) AS s
        |  FROM events WHERE user_id IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, 'p', props FROM events WHERE props IS NOT NULL),
        |reg AS (
        |  SELECT g, tag, md5_number_lower(s) % 4096 AS b,
        |         max(CASE WHEN md5_number_lower('rho:' || s) % 1125899906842624 = 0 THEN 51
        |              ELSE 51 - length(bin(md5_number_lower('rho:' || s) % 1125899906842624)) END) AS mx
        |  FROM v GROUP BY 1, 2, 3),
        |gz AS (
        |  SELECT g, tag,
        |         CAST(SUM(CAST(1 AS BIGINT) << CAST(51 - mx AS INT))
        |              + (4096 - count(*)) * 2251799813685248 AS BIGINT) AS z2,
        |         4096 - count(*) AS vz
        |  FROM reg GROUP BY 1, 2),
        |est AS (
        |  SELECT g, tag,
        |    CAST(floor(CASE WHEN vz > 0 AND 0.7213e0/(1.0e0 + 1.079e0/4096.0e0)*4096.0e0*4096.0e0*2251799813685248.0e0/CAST(z2 AS DOUBLE) <= 10240.0e0
        |          THEN 4096.0e0 * ln(4096.0e0 / CAST(vz AS DOUBLE))
        |          ELSE 0.7213e0/(1.0e0 + 1.079e0/4096.0e0)*4096.0e0*4096.0e0*2251799813685248.0e0/CAST(z2 AS DOUBLE) END) AS BIGINT) AS est
        |  FROM gz),
        |base AS (SELECT event_type AS g, count(*) AS n_events FROM events GROUP BY 1)
        |SELECT b.g AS event_type,
        |       COALESCE(u.est, 0) AS n_users_approx,
        |       COALESCE(p.est, 0) AS n_props_approx,
        |       b.n_events
        |FROM base b
        |LEFT JOIN est u ON u.tag = 'u' AND u.g IS NOT DISTINCT FROM b.g
        |LEFT JOIN est p ON p.tag = 'p' AND p.g IS NOT DISTINCT FROM b.g""".stripMargin


  /** The unrolled label-propagation round chain over CTEs `sym`
    * (u, v, w) and `l0` (node, label) — shared by the transition-graph
    * LPA oracle and the source-communities oracle. */
  private[graft] def lpaStepCtes(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""b$i AS MATERIALIZED (
         |  SELECT u AS node, nl AS best FROM (
         |    SELECT u, nl,
         |           row_number() OVER (PARTITION BY u
         |             ORDER BY sc DESC, nl) AS rk
         |    FROM (SELECT s.u, l.label AS nl, CAST(sum(s.w) AS BIGINT) AS sc
         |          FROM sym s JOIN l${i - 1} l ON l.node = s.v
         |          GROUP BY 1, 2))
         |  WHERE rk = 1),
         |l$i AS MATERIALIZED (
         |  SELECT l.node, coalesce(b$i.best, l.label) AS label
         |  FROM l${i - 1} l LEFT JOIN b$i USING (node))""".stripMargin
    }.mkString(",\n")

  /** Generated unrolled-CTE label-propagation oracle. */
  private[graft] def lpaOracle(rounds: Int): String = {
    val steps = lpaStepCtes(rounds)
    s"""WITH p AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts NULLS FIRST,
       |                                         event_id NULLS FIRST) AS to_type
       |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |e AS MATERIALIZED (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |sym AS MATERIALIZED (
       |  SELECT u, v, CAST(sum(n) AS BIGINT) AS w FROM (
       |    SELECT from_type AS u, to_type AS v, n FROM e
       |    WHERE from_type <> to_type
       |    UNION ALL
       |    SELECT to_type AS u, from_type AS v, n FROM e
       |    WHERE from_type <> to_type)
       |  GROUP BY 1, 2),
       |nd AS MATERIALIZED (
       |  SELECT from_type AS node FROM e UNION SELECT to_type FROM e),
       |l0 AS MATERIALIZED (SELECT node, node AS label FROM nd),
       |$steps
       |SELECT node, label FROM l$rounds""".stripMargin
  }

  /** Generated source-communities oracle: the source_overlap gram CTEs
    * feeding an edge set (exact-integer Jaccard-≥-1/10 test:
    * 10·shared ≥ union — no float boundary) into an unrolled MIN-LABEL
    * round chain (components, not weighted LPA — see the operator
    * scaladoc for why); isolated sources keep their own name. */
  private[graft] def sourceCommunitiesOracle(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""b$i AS MATERIALIZED (
         |  SELECT s.u AS node, min(l.label) AS best
         |  FROM sym s JOIN l${i - 1} l ON l.node = s.v
         |  GROUP BY 1),
         |l$i AS MATERIALIZED (
         |  SELECT l.node,
         |         least(l.label, coalesce(b$i.best, l.label)) AS label
         |  FROM l${i - 1} l LEFT JOIN b$i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT source, text FROM documents
       |  WHERE source IS NOT NULL AND text IS NOT NULL),
       |tok AS (
       |  SELECT source, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
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
       |sz AS MATERIALIZED (SELECT source, CAST(count(*) AS BIGINT) AS n
       |      FROM sh GROUP BY 1),
       |iv AS (SELECT a.source AS sa, b.source AS sb,
       |              CAST(count(*) AS BIGINT) AS shared
       |       FROM sh a JOIN sh b ON a.gh = b.gh AND a.source < b.source
       |       GROUP BY 1, 2),
       |e AS MATERIALIZED (
       |  SELECT iv.sa AS u0, iv.sb AS v0
       |  FROM iv JOIN sz a ON a.source = iv.sa
       |          JOIN sz b ON b.source = iv.sb
       |  WHERE 10 * iv.shared >= a.n + b.n - iv.shared),
       |sym AS MATERIALIZED (
       |  SELECT DISTINCT u, v FROM (
       |    SELECT u0 AS u, v0 AS v FROM e
       |    UNION ALL
       |    SELECT v0 AS u, u0 AS v FROM e)),
       |nd AS MATERIALIZED (
       |  SELECT u0 AS node FROM e UNION SELECT v0 FROM e),
       |l0 AS MATERIALIZED (SELECT node, node AS label FROM nd),
       |$steps
       |SELECT sz.source, coalesce(l.label, sz.source) AS community
       |FROM sz LEFT JOIN l$rounds l ON l.node = sz.source""".stripMargin
  }

  /** Generated per-column profile oracle (see "profile_events"). */
  private[graft] def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Generated median/MAD anomaly oracle at sensitivity k (see the
    * "anomaly_mad" entry). */
  private[graft] def anomalyMadSql(k: Double): String =
    s"""WITH daily AS (
       |  SELECT event_type AS level, strftime(ts, '%Y-%m-%d') AS day,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |per AS (
       |  SELECT level, list(n ORDER BY n) AS vals,
       |         CAST(count(*) AS BIGINT) AS sz
       |  FROM daily GROUP BY 1),
       |m AS (
       |  SELECT level,
       |         CASE WHEN sz % 2 = 1 THEN CAST(vals[(sz+1)//2] AS DOUBLE)
       |              ELSE (CAST(vals[sz//2] AS DOUBLE) +
       |                    CAST(vals[sz//2+1] AS DOUBLE)) /
       |                   CAST(2.0 AS DOUBLE) END AS med
       |  FROM per),
       |dv AS (
       |  SELECT d.level, d.day, d.n, m.med,
       |         abs(CAST(d.n AS DOUBLE) - m.med) AS dev
       |  FROM daily d JOIN m ON d.level IS NOT DISTINCT FROM m.level),
       |p2 AS (
       |  SELECT level, list(dev ORDER BY dev) AS dvals,
       |         CAST(count(*) AS BIGINT) AS sz
       |  FROM dv GROUP BY 1),
       |m2 AS (
       |  SELECT level,
       |         CASE WHEN sz % 2 = 1 THEN dvals[(sz+1)//2]
       |              ELSE (dvals[sz//2] + dvals[sz//2+1]) /
       |                   CAST(2.0 AS DOUBLE) END AS mad
       |  FROM p2)
       |SELECT dv.level, dv.day, dv.n AS n_events,
       |       round(dv.med, 4) AS med, round(m2.mad, 4) AS mad,
       |       CASE WHEN m2.mad > 0
       |            THEN abs(CAST(dv.n AS DOUBLE) - dv.med) >
       |                 CAST($k AS DOUBLE) * m2.mad
       |            ELSE CAST(dv.n AS DOUBLE) <> dv.med END AS is_anomaly
       |FROM dv JOIN m2 ON dv.level IS NOT DISTINCT FROM m2.level""".stripMargin

  /** Generated EWMA oracle at smoothing alpha (exact-binary alphas only
    * — 0.25, 0.5 — so the coefficient literals carry no noise). */
  private[graft] def ewmaSql(alpha: Double): String =
    s"""WITH c AS (
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
       |  FROM d LEFT JOIN c USING (day)),
       |l AS (
       |  SELECT day, n_incidents,
       |         list(CAST(n_incidents AS DOUBLE)) OVER (
       |           ORDER BY day
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
       |  FROM f)
       |SELECT day, n_incidents,
       |       round(list_reduce(pre,
       |         (acc, x) -> CAST($alpha AS DOUBLE) * x +
       |                     CAST(${1.0 - alpha} AS DOUBLE) * acc), 6) AS ewma
       |FROM l""".stripMargin

  /** Generated rolling-median oracle over a trailing `days` window. */
  private[graft] def rollingMedianSql(days: Int): String =
    s"""WITH daily AS (
       |  SELECT event_type AS level, strftime(ts, '%Y-%m-%d') AS day,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events
       |  WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
       |b AS (SELECT min(CAST(day AS DATE)) AS d0,
       |             max(CAST(day AS DATE)) AS d1 FROM daily),
       |d AS (SELECT strftime(unnest(generate_series(d0, d1, INTERVAL 1 DAY)),
       |                      '%Y-%m-%d') AS day
       |      FROM b WHERE d0 IS NOT NULL),
       |g AS (SELECT l.level, d.day
       |      FROM (SELECT DISTINCT level FROM daily) l CROSS JOIN d),
       |f AS (SELECT g.level, g.day, coalesce(dd.n, 0) AS n_events
       |      FROM g LEFT JOIN daily dd
       |        ON dd.level = g.level AND dd.day = g.day),
       |l AS (SELECT level, day, n_events,
       |             list_sort(list(n_events) OVER (
       |               PARTITION BY level ORDER BY day
       |               ROWS BETWEEN ${days - 1} PRECEDING AND CURRENT ROW)) AS arr
       |      FROM f)
       |SELECT level, day, n_events,
       |       CASE WHEN len(arr) % 2 = 1
       |            THEN CAST(arr[(len(arr)+1)//2] AS DOUBLE)
       |            ELSE (CAST(arr[len(arr)//2] AS DOUBLE) +
       |                  CAST(arr[len(arr)//2+1] AS DOUBLE)) /
       |                 CAST(2.0 AS DOUBLE) END AS med_${days}d
       |FROM l""".stripMargin

  /** Generated unrolled-CTE PageRank oracle (see the "pagerank" entry). */
  private[graft] def pagerankOracle(iters: Int): String = {
    val d = s"CAST(${graft.operators.Graphs.Damping} AS DOUBLE)"
    val tele = s"CAST(${1.0 - graft.operators.Graphs.Damping} AS DOUBLE)"
    val zero = "CAST(0.0 AS DOUBLE)"
    val steps = (1 to iters).map { i =>
      s"""dg$i AS MATERIALIZED (
         |  SELECT CASE WHEN count(*) > 0
         |              THEN list_reduce(list(rank ORDER BY node),
         |                               (a, b) -> a + b)
         |              ELSE $zero END AS s
         |  FROM it${i - 1} WHERE node NOT IN (SELECT from_type FROM e)),
         |it$i AS MATERIALIZED (
         |  SELECT nd.node,
         |         $tele / nn.n + $d *
         |           (dg$i.s / nn.n + coalesce(c.inc, $zero)) AS rank
         |  FROM nd CROSS JOIN nn CROSS JOIN dg$i
         |  LEFT JOIN (SELECT w.to_type AS node,
         |                    list_reduce(list(r.rank * w.w
         |                                     ORDER BY w.from_type),
         |                                (a, b) -> a + b) AS inc
         |             FROM w JOIN it${i - 1} r ON r.node = w.from_type
         |             GROUP BY w.to_type) c USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts NULLS FIRST,
       |                                         event_id NULLS FIRST) AS to_type
       |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |e AS MATERIALIZED (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |w AS MATERIALIZED (
       |  SELECT from_type, to_type,
       |         CAST(n AS DOUBLE) /
       |         CAST(CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
       |              AS DOUBLE) AS w
       |  FROM e),
       |nd AS MATERIALIZED (
       |  SELECT from_type AS node FROM e UNION SELECT to_type FROM e),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nd),
       |it0 AS MATERIALIZED (
       |  SELECT nd.node, CAST(1.0 AS DOUBLE) / nn.n AS rank
       |  FROM nd CROSS JOIN nn),
       |$steps
       |SELECT node, round(rank, 6) AS rank FROM it$iters""".stripMargin
  }

  /** Generated interpolated-bigram-perplexity oracle (see the
    * "quality_perplexity_bigram" entry). */
  private[graft] def perplexityBigramSql(lambda: Double): String = {
    val lam = s"CAST(${lambda} AS DOUBLE)"
    val oml = s"CAST(${1.0 - lambda} AS DOUBLE)"
    s"""WITH vocab AS (
       |  SELECT token, freq FROM (
       |    SELECT token, freq,
       |           CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS token_id
       |    FROM (
       |      SELECT token, count(*) AS freq FROM (
       |        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
       |        FROM documents) t
       |      WHERE length(token) > 0
       |      GROUP BY token HAVING count(*) >= 2) c) r
       |  WHERE token_id <= 1000),
       |stats AS (SELECT sum(freq) + count(*) + 1 AS denom FROM vocab),
       |bstats AS (SELECT count(*) + 1 AS bdenom FROM vocab),
       |p0 AS (
       |  SELECT doc_id, t[CAST(i + 1 AS BIGINT)] AS w1,
       |         t[CAST(i + 2 AS BIGINT)] AS w2
       |  FROM (SELECT doc_id, t, unnest(range(0, greatest(0, len(t) - 1))) AS i
       |        FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |              FROM documents WHERE text IS NOT NULL))),
       |pairs AS (
       |  SELECT doc_id, w1, w2 FROM p0
       |  WHERE length(w1) > 0 AND length(w2) > 0),
       |bi AS (
       |  SELECT p.w1, p.w2, CAST(count(*) AS BIGINT) AS c12
       |  FROM pairs p
       |  JOIN vocab v1 ON v1.token = p.w1
       |  JOIN vocab v2 ON v2.token = p.w2
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT p.doc_id,
       |         ln($lam * ((coalesce(b.c12, 0) + 1)
       |                    / (coalesce(v1.freq, 0) + (SELECT bdenom FROM bstats)))
       |            + $oml * ((coalesce(v2.freq, 0) + 1)
       |                      / (SELECT denom FROM stats))) AS logp,
       |         CASE WHEN b.c12 IS NULL THEN 1 ELSE 0 END AS unseen
       |  FROM pairs p
       |  LEFT JOIN vocab v1 ON v1.token = p.w1
       |  LEFT JOIN vocab v2 ON v2.token = p.w2
       |  LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2)
       |SELECT doc_id, round(exp(-avg(logp)), 4) AS perplexity_bi,
       |       count(*) AS n_bigrams,
       |       CAST(sum(unseen) AS BIGINT) AS n_unseen
       |FROM scored GROUP BY doc_id""".stripMargin
  }

  /** Generated equi-depth bucketing oracle (see "equidepth_buckets"). */
  private[graft] def equidepthBucketsSql(buckets: Int, k: Int): String = {
    val cutExprs = (1 until buckets).map { j =>
      s"""max(CASE WHEN rn = greatest(1, CAST(floor(
         |           CAST($j * n_s AS DOUBLE) / ${buckets.toDouble}) AS BIGINT))
         |         THEN value END)""".stripMargin
    }.mkString(",\n       |    ")
    s"""WITH nn AS (
       |  SELECT event_type, value, event_id,
       |         md5_number_lower('sample:' || CAST(event_id AS VARCHAR)) % 2305843009213693951 AS hk
       |  FROM events WHERE value IS NOT NULL AND isfinite(value)),
       |samp AS (
       |  SELECT event_type, value FROM (
       |    SELECT event_type, value,
       |           row_number() OVER (PARTITION BY event_type ORDER BY hk, event_id) AS srk
       |    FROM nn) WHERE srk <= $k),
       |r AS (
       |  SELECT event_type, value,
       |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS rn,
       |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_s
       |  FROM samp),
       |c AS (
       |  SELECT event_type AS c_type,
       |    [$cutExprs] AS cuts
       |  FROM r GROUP BY 1)
       |SELECT e.event_id, e.event_type, e.value,
       |       CASE WHEN e.value IS NOT NULL AND isfinite(e.value)
       |                 AND cuts IS NOT NULL
       |            THEN CAST(len(list_filter(cuts, x -> x <= e.value)) AS BIGINT)
       |       END AS bucket
       |FROM events e LEFT JOIN c ON e.event_type IS NOT DISTINCT FROM c.c_type""".stripMargin
  }

  /** Generated τ-sampling oracle (see the "sample_temperature" entry). */
  private[graft] def sampleTemperatureSql(tau: Int, total: Int): String = {
    val w = if (tau == 2) "sqrt(CAST(cnt AS DOUBLE))"
      else "sqrt(sqrt(CAST(cnt AS DOUBLE)))"
    s"""WITH d AS (
       |  SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL),
       |c AS (
       |  SELECT source,
       |         CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\\s+')))
       |              AS BIGINT) AS cnt
       |  FROM d GROUP BY source),
       |w AS (SELECT source, $w AS w FROM c),
       |ws AS (
       |  SELECT list_reduce(list(w ORDER BY (source IS NULL), source),
       |                     (a, b) -> a + b) AS wsum FROM w),
       |f AS (
       |  SELECT source, exact, CAST(floor(exact) AS BIGINT) AS fl
       |  FROM (SELECT source, (w / wsum) * CAST($total AS DOUBLE) AS exact
       |        FROM w CROSS JOIN ws)),
       |t AS (
       |  SELECT source,
       |         fl + CASE WHEN CAST(row_number() OVER (
       |                ORDER BY exact - CAST(fl AS DOUBLE) DESC,
       |                         (source IS NULL), source) AS BIGINT)
       |              <= CAST($total AS BIGINT)
       |                 - CAST((SELECT sum(fl) FROM f) AS BIGINT)
       |              THEN 1 ELSE 0 END AS target
       |  FROM f)
       |SELECT doc_id, source, target, rk FROM (
       |  SELECT d.doc_id, d.source, t.target,
       |         CAST(row_number() OVER (
       |           PARTITION BY d.source
       |           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
       |           AS BIGINT) AS rk
       |  FROM d JOIN t ON d.source IS NOT DISTINCT FROM t.source) p
       |WHERE rk <= target""".stripMargin
  }

  private[graft] def dedupExactOracle: String =
    """SELECT md5(text) AS fp, min(doc_id) AS first_doc_id,
      |       count(*) AS n_copies, min(n_chars) AS n_chars
      |FROM documents GROUP BY md5(text)""".stripMargin

  private[graft] def transitionsOracle: String =
    """WITH p AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts NULLS FIRST,
      |                                         event_id NULLS FIRST) AS to_type
      |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |c AS (
      |  SELECT from_type, to_type, count(*) AS n FROM p
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
      |       round(CAST(n AS DOUBLE) /
      |             CAST(CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
      |                  AS DOUBLE), 6) AS p
      |FROM c""".stripMargin
}
