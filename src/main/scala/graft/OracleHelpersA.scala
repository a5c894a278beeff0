package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Shared SQL fragments of the DuckDB oracle layer — split out of
  * SparkEntry (r19: the registry file passed 5,000 lines). One trait per
  * chunk, all mixed into [[SparkEntry]]; member visibility is
  * private[graft] so fragments cross trait boundaries within the
  * package. Zero behavior change: the composed oracleSql map is
  * byte-identical. */
trait OracleHelpersA {
  private[graft] def scd2Oracle: String =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER w AS prev_state,
      |         row_number() OVER w AS rn
      |  FROM events WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |i AS (
      |  SELECT user_id, ts, event_type,
      |         CAST(sum(CASE WHEN rn = 1 OR event_type IS DISTINCT FROM prev_state
      |                       THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS BIGINT) AS island
      |  FROM o),
      |g AS (
      |  SELECT user_id, island AS state_seq, min(event_type) AS state,
      |         count(*) AS n_events, min(ts) AS from_ts
      |  FROM i GROUP BY 1, 2)
      |SELECT user_id, state_seq, state,
      |       strftime(from_ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |       strftime(lead(from_ts) OVER (PARTITION BY user_id ORDER BY state_seq),
      |                '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
      |       n_events
      |FROM g""".stripMargin

  private[graft] def sessionizeOracle: String =
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
      |SELECT user_id, session_id, count(*) AS n_events,
      |       round(sum(value), 2) AS session_value,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      |       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
      |FROM s GROUP BY user_id, session_id""".stripMargin

  /** Shared by `anomaly_spikes` and its stateful streaming twin — both
    * reproduce the same trailing-7-observed-days ROWS frame. */
  private[graft] def anomalySpikesOracle: String = anomalySpikesSql(3.0)

  private[graft] def anomalySpikesSql(sigma: Double): String =
    """WITH d AS (
      |  SELECT event_type AS level, strftime(ts, '%Y-%m-%d') AS day,
      |         count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT level, day, n_events,
      |         avg(n_events) OVER win AS base_avg,
      |         stddev_samp(n_events) OVER win AS base_std,
      |         count(n_events) OVER win AS base_n
      |  FROM d
      |  WINDOW win AS (PARTITION BY level ORDER BY day NULLS FIRST
      |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT level, day, n_events, round(base_avg, 4) AS base_avg,
      |       round(base_std, 4) AS base_std, base_n,
      |       coalesce(base_n >= 3 AND n_events > base_avg + SIGMA_LIT * base_std,
      |                false) AS is_spike
      |FROM w""".stripMargin.replace("SIGMA_LIT", sigma.toString)

  /** Shared CTE prefix of the four multimodal oracles: the media-table
    * twin (payload = utf-8 bytes of documents.text), the FNV-1a stub
    * decode, and the real container-header branches — replayed over the
    * hex rendering of the payload, since `CAST('0x…' AS BIGINT)` is the
    * one blob-byte accessor DuckDB and a plain-SQL reading share.
    *
    * Only the GIF and RIFF/WAVE branches are replayed: a PNG payload
    * starts 0x89 and a JPEG payload 0xFF, and neither byte can LEAD a
    * valid UTF-8 sequence — a payload derived from a parquet string can
    * therefore never enter those branches, in either engine (the Scala
    * twins stay, for real binary media sources; spec-pinned with planted
    * binary payloads in TextAndStreamSpec). The RIFF chunk walk is the
    * Scala loop as a recursive CTE, including the clamp-to-end cursor
    * and the fmt/data stop condition; the FNV seed is the engine's
    * (1469598103934665603, [[graft.operators.Multimodal]]), folded
    * unsigned mod 2^64 with the xor applied to the low byte only (h is
    * always < 2^64 and the byte < 2^8, so the xor never reaches higher
    * bits — HUGEINT has no native 64-bit xor). */
  private[graft] def multimodalCtes: String =
    """WITH RECURSIVE m AS (
      |  -- distinct media entity: redelivered blobs collapse before decode
      |  -- (mirrors mediaTable's distinctEntities; without it the
      |  -- per-media_id joins below would MULTIPLY delivered copies)
      |  SELECT DISTINCT doc_id AS media_id,
      |         ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
      |         encode(text) AS payload
      |  FROM documents WHERE text IS NOT NULL),
      |b AS (
      |  SELECT media_id, kind, octet_length(payload) AS n, hex(payload) AS hx FROM m),
      |f AS (
      |  SELECT media_id,
      |         list_reduce(
      |           list_prepend(1469598103934665603::HUGEINT,
      |             list_transform(range(0, n::INT),
      |               i -> CAST('0x' || substr(hx, (i*2+1)::INT, 2) AS BIGINT)::HUGEINT)),
      |           (h, x) -> ((h - (h % 256) + xor((h % 256)::BIGINT, x::BIGINT)) * 1099511628211)
      |                     % 18446744073709551616::HUGEINT) AS hu
      |  FROM b),
      |s AS (
      |  SELECT media_id, hu,
      |         CASE WHEN hu >= 9223372036854775808::HUGEINT
      |              THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS hs
      |  FROM f),
      |stub AS (
      |  SELECT media_id, hu, hs,
      |         (hs - ((hs % 1024 + 1024) % 1024)) / 1024 AS fd10,
      |         (hs - ((hs % 1048576 + 1048576) % 1048576)) / 1048576 AS fd20
      |  FROM s),
      |riff AS (
      |  SELECT media_id, n, hx, 12::BIGINT AS i, 0::BIGINT AS byte_rate, -1::BIGINT AS data_size
      |  FROM b
      |  WHERE n >= 12 AND substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645'
      |  UNION ALL
      |  SELECT media_id, n, hx,
      |         least(n::BIGINT, i + 8 + sz + (sz % 2)) AS i,
      |         CASE WHEN is_fmt AND i + 20 <= n THEN br ELSE byte_rate END AS byte_rate,
      |         CASE WHEN NOT is_fmt AND is_data THEN sz ELSE data_size END AS data_size
      |  FROM (
      |    SELECT *,
      |           substr(hx, (i*2+1)::INT, 8) = '666D7420' AS is_fmt,
      |           substr(hx, (i*2+1)::INT, 8) = '64617461' AS is_data,
      |           CAST('0x' || substr(hx, ((i+4)*2+1)::INT, 2) AS BIGINT)
      |             + 256 * CAST('0x' || substr(hx, ((i+5)*2+1)::INT, 2) AS BIGINT)
      |             + 65536 * CAST('0x' || substr(hx, ((i+6)*2+1)::INT, 2) AS BIGINT)
      |             + 16777216 * CAST('0x' || substr(hx, ((i+7)*2+1)::INT, 2) AS BIGINT) AS sz,
      |           CASE WHEN i + 20 <= n THEN
      |             CAST('0x' || substr(hx, ((i+16)*2+1)::INT, 2) AS BIGINT)
      |               + 256 * CAST('0x' || substr(hx, ((i+17)*2+1)::INT, 2) AS BIGINT)
      |               + 65536 * CAST('0x' || substr(hx, ((i+18)*2+1)::INT, 2) AS BIGINT)
      |               + 16777216 * CAST('0x' || substr(hx, ((i+19)*2+1)::INT, 2) AS BIGINT)
      |           ELSE 0 END AS br
      |    FROM riff WHERE i + 8 <= n AND (byte_rate = 0 OR data_size < 0)) t),
      |riff_fin AS (
      |  SELECT media_id, byte_rate, data_size
      |  FROM (SELECT *, row_number() OVER (PARTITION BY media_id ORDER BY i DESC) AS rn FROM riff)
      |  WHERE rn = 1),
      |hdr AS (
      |  SELECT b.media_id,
      |         CASE
      |           WHEN b.n >= 10 AND substr(b.hx, 1, 8) = '47494638' THEN struct_pack(
      |             w := (CAST('0x' || substr(b.hx, 13, 2) AS BIGINT)
      |                   + 256 * CAST('0x' || substr(b.hx, 15, 2) AS BIGINT))::INT,
      |             h := (CAST('0x' || substr(b.hx, 17, 2) AS BIGINT)
      |                   + 256 * CAST('0x' || substr(b.hx, 19, 2) AS BIGINT))::INT,
      |             dur := 0::INT, fr := 1::INT)
      |           WHEN r.byte_rate > 0 AND r.data_size >= 0 THEN struct_pack(
      |             w := 0::INT, h := 0::INT,
      |             dur := least((r.data_size * 1000) // r.byte_rate, 2147483647)::INT, fr := 0::INT)
      |           ELSE NULL END AS hp
      |  FROM b LEFT JOIN riff_fin r USING (media_id)),
      |mm AS (
      |  SELECT b.media_id, b.kind, b.n AS n_bytes, b.hx,
      |         coalesce(hp.w, (64 + (stub.hu % 1024))::INT) AS width,
      |         coalesce(hp.h, (64 + ((stub.fd10 % 1024 + 1024) % 1024))::INT) AS height,
      |         coalesce(hp.dur, CASE WHEN b.kind = 'image' THEN 0
      |              ELSE (1000 + ((stub.fd20 % 60000 + 60000) % 60000))::INT END) AS duration_ms,
      |         coalesce(hp.fr, CASE b.kind WHEN 'image' THEN 1 WHEN 'audio' THEN 0
      |              ELSE 1 + CASE WHEN b.kind = 'image' THEN 0
      |                   ELSE (1000 + ((stub.fd20 % 60000 + 60000) % 60000))::INT END // 1000 END) AS n_frames
      |  FROM b JOIN stub USING (media_id)
      |  LEFT JOIN (SELECT media_id, hp.* FROM hdr WHERE hp IS NOT NULL) hp USING (media_id))""".stripMargin

  private[graft] def ingestErrorsSql(sinceTs: String, untilTs: String,
      userLike: String, limit: Int): String =
    s"""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
       |       user_id, event_type, value, props
       |FROM events
       |WHERE event_type = 'error'
       |  AND props NOT LIKE '%"k": 0}%'
       |  AND props LIKE '%k%'
       |  AND CAST(user_id AS VARCHAR) LIKE '$userLike'
       |  AND ts >= TIMESTAMP '$sinceTs'
       |  AND ts <  TIMESTAMP '$untilTs'
       |ORDER BY ts, event_id
       |LIMIT $limit""".stripMargin

  /** The dashboard-search oracle at a parameter point (mirror of
    * [[graft.operators.LogOps.searchEntries]]). */
  private[graft] def searchEntriesSql(level: String, userLike: String,
      keyword: String, sinceTs: String, limit: Int,
      namespace: String = ""): String = {
    val nsPred =
      if (namespace.isEmpty) ""
      else "\n  AND contains(lower(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END), '" +
        graft.functions.TextFns.foldCase(namespace) + "')"
    s"""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
       |       user_id, event_type, props
       |FROM events
       |WHERE event_type = '$level'
       |  AND CAST(user_id AS VARCHAR) LIKE '$userLike'
       |  AND contains(lower(props), '${graft.functions.TextFns.foldCase(keyword)}')
       |  AND ts >= TIMESTAMP '$sinceTs'$nsPred
       |ORDER BY ts DESC, event_id
       |LIMIT $limit""".stripMargin
  }

  /** BM25 search oracle (mirror of [[graft.operators.Corpus.searchBm25]]).
    * Float fidelity: every scalar replays the Spark expression tree's op
    * order literally — the per-doc score is the SAME left-associative
    * coalesce chain over the sorted term set (never a SUM(), whose row
    * order is arbitrary where float order decides a rank), and the k1/b
    * constants are embedded as round-trip string literals of the Scala
    * doubles the operator actually multiplies with (a bare SQL 2.2 is a
    * DECIMAL whose nearest double may differ from Scala's k1 + 1.0). */
  private[graft] def searchBm25Sql(query: String, topK: Int,
      k1: Double = 1.2, b: Double = 0.75, docsWhere: String = ""): String =
    s"""WITH ${bm25Ctes(query, topK, k1, b, docsWhere)}
       |SELECT doc_id, n_terms, score, rk FROM bm25r""".stripMargin

  /** The BM25 CTE chain ending in `bm25r` (the ranked, topK-limited
    * lexical relation) — shared by the standalone oracle and the hybrid
    * fusion oracle. */
  private[graft] def bm25Ctes(query: String, topK: Int,
      k1: Double = 1.2, b: Double = 0.75, docsWhere: String = ""): String = {
    val terms = graft.operators.Corpus.bm25Terms(query)
      .map(_.replace("'", "''")) // SQL string-literal escape
    def d(v: Double) = s"CAST('$v' AS DOUBLE)"
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val pivots = terms.indices.map(i =>
      s"max(CASE WHEN term = '${terms(i)}' THEN tscore END) AS s_$i")
      .mkString(",\n       |         ")
    val chain = terms.indices.foldLeft(d(0.0)) { (acc, i) =>
      s"($acc + coalesce(s_$i, ${d(0.0)}))"
    }
    s"""docs AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM documents WHERE text IS NOT NULL$docsWhere),
       |stats AS (
       |  SELECT CAST(sum(len(toks)) AS BIGINT) AS total_len,
       |         CAST(count(*) AS BIGINT) AS n_docs
       |  FROM docs),
       |pairs AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
       |  FROM docs),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
       |  FROM pairs WHERE term IN ($inList) GROUP BY 1, 2),
       |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id, term,
       |         ln(1.0 + ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5)
       |                  / (CAST(df AS DOUBLE) + 0.5))
       |         * ((CAST(tf AS DOUBLE) * ${d(k1 + 1.0)})
       |            / (CAST(tf AS DOUBLE) + ${d(k1)} * (${d(1.0 - b)}
       |               + (${d(b)} * CAST(dl AS DOUBLE))
       |                 / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
       |           AS tscore
       |  FROM tf JOIN dfr USING (term) CROSS JOIN stats),
       |p AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |         $pivots
       |  FROM scored GROUP BY doc_id),
       |bm25r AS (
       |  SELECT doc_id, n_terms, score,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
       |  FROM (SELECT doc_id, n_terms, round($chain, 6) AS score FROM p)
       |  ORDER BY score DESC, doc_id
       |  LIMIT $topK)""".stripMargin
  }

  /** Retrieval-eval oracle — the single qid-tagged plan of
    * [[graft.operators.Corpus.retrievalEval]] mirrored token-for-token:
    * tf/df from one exploded aggregation, per-doc scores as TERM-ordered
    * list_reduce folds (retrieval_eval's own scoring order), one
    * qid-partitioned rank window, relevance = matched-term count equals
    * the query's term count, MRR from the first relevant rank, DCG as a
    * rank-ordered fold of binary 1/log2(rk+1) gains, IDCG a CASE-guarded
    * fold over the 1..min(n_rel,k) ideal slots (ndcg NULL when nothing
    * is relevant — DuckDB's list_reduce cannot see an empty list); a
    * no-hit query re-enters through the qid-universe VALUES relation.
    * log2 wobble under round(·,6). */
  /** The CTE chain from the corpus scan through the qid-tagged `ranked`
    * (with scores) and `rel` relations — shared by the retrieval-eval
    * and hard-negative-mining oracles, exactly as the Spark side shares
    * [[graft.operators.Corpus.retrievalRankRel]]. */
  private[graft] def retrievalRankRelCtes(qs: Seq[(Long, String)],
      topK: Int): String = {
    val perQ = qs.map { case (qid, q) =>
      (qid, graft.operators.Corpus.bm25Terms(q).map(_.replace("'", "''")))
    }
    val allTerms = perQ.flatMap(_._2).distinct.sorted
    val inList = allTerms.map(t => s"'$t'").mkString(", ")
    val qtVals = perQ.flatMap { case (qid, ts) =>
      ts.map(t => s"($qid, '$t')") }.mkString(", ")
    def d(v: String) = s"CAST($v AS DOUBLE)"
    s"""WITH docs AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM docs),
       |stats AS (
       |  SELECT CAST(sum(dl) AS BIGINT) AS total_len,
       |         CAST(count(*) AS BIGINT) AS n_docs
       |  FROM base),
       |qt(qid, term) AS (VALUES $qtVals),
       |ntq AS (SELECT qid, CAST(count(*) AS BIGINT) AS ntq FROM qt GROUP BY 1),
       |pairs AS (SELECT doc_id, dl, unnest(toks) AS term FROM base),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
       |  FROM pairs WHERE term IN ($inList) GROUP BY 1, 2),
       |tfd AS (
       |  SELECT t.*, CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
       |  FROM tf t),
       |scored AS (
       |  SELECT q.qid, t.doc_id, t.term,
       |         ln(1.0 + ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5)
       |                  / (CAST(df AS DOUBLE) + 0.5))
       |         * ((CAST(tf AS DOUBLE) * ${d("2.2")})
       |            / (CAST(tf AS DOUBLE) + ${d("1.2")} * (${d("0.25")}
       |               + (${d("0.75")} * CAST(dl AS DOUBLE))
       |                 / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
       |           AS tscore
       |  FROM tfd t JOIN qt q USING (term) CROSS JOIN stats),
       |perdoc AS (
       |  SELECT qid, doc_id,
       |         round(list_reduce(list(tscore ORDER BY term),
       |                           (a, b) -> a + b), 6) AS score
       |  FROM scored GROUP BY 1, 2),
       |ranked AS (
       |  SELECT qid, doc_id, score,
       |         CAST(row_number() OVER (PARTITION BY qid
       |           ORDER BY score DESC, doc_id) AS BIGINT) AS rk
       |  FROM perdoc QUALIFY rk <= $topK),
       |rel AS (
       |  SELECT q.qid, t.doc_id
       |  FROM tf t JOIN qt q USING (term) JOIN ntq n ON n.qid = q.qid
       |  GROUP BY q.qid, t.doc_id, n.ntq
       |  HAVING CAST(count(*) AS BIGINT) = n.ntq)""".stripMargin
  }

  private[graft] def retrievalEvalSql(qs: Seq[(Long, String)], topK: Int): String = {
    val qidVals = qs.map { case (qid, _) => s"($qid)" }.mkString(", ")
    def d(v: String) = s"CAST($v AS DOUBLE)"
    retrievalRankRelCtes(qs, topK) + "," + s"""
       |nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel
       |         FROM rel GROUP BY 1),
       |j AS (
       |  SELECT r.qid, r.rk, rel.doc_id IS NOT NULL AS isrel
       |  FROM ranked r
       |  LEFT JOIN rel ON r.qid = rel.qid AND r.doc_id = rel.doc_id),
       |met AS (
       |  SELECT qid, min(CASE WHEN isrel THEN rk END) AS first_rel,
       |         list_reduce(list(
       |           CASE WHEN isrel THEN ${d("1.0")} / log2(CAST(rk + 1 AS DOUBLE))
       |                ELSE ${d("0.0")} END ORDER BY rk),
       |           (a, b) -> a + b) AS dcg
       |  FROM j GROUP BY 1),
       |qs(qid) AS (VALUES $qidVals)
       |SELECT CAST(qs.qid AS BIGINT) AS qid,
       |       coalesce(n_rel, 0) AS n_rel,
       |       round(coalesce(${d("1.0")} / CAST(first_rel AS DOUBLE),
       |                      ${d("0.0")}), 6) AS mrr,
       |       CASE WHEN coalesce(n_rel, 0) > 0 THEN
       |         round(dcg / list_reduce(list_transform(
       |           range(1, least(n_rel, $topK) + 1),
       |           i -> ${d("1.0")} / log2(CAST(i + 1 AS DOUBLE))),
       |           (a, b) -> a + b), 6)
       |       END AS ndcg
       |FROM qs LEFT JOIN met USING (qid) LEFT JOIN nrel USING (qid)""".stripMargin
  }

  /** Batch-serving oracle: the per-query BM25 chains (each scoped in its
    * own WITH subquery) tagged with qid and UNION ALL'd — served batch
    * results are per-query bit-identical to the scan path, so the union
    * of the scan oracles IS the batch oracle. */
  private[graft] def searchBm25BatchSql(qs: Seq[(Long, String)], topK: Int): String =
    qs.map { case (qid, q) =>
      s"""SELECT CAST($qid AS BIGINT) AS qid, doc_id, n_terms, score, rk
         |FROM (WITH ${bm25Ctes(q, topK)}
         |SELECT doc_id, n_terms, score, rk FROM bm25r)""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** RRF fusion oracle (mirror of
    * [[graft.operators.Embeddings.searchHybridRrf]]): the BM25 chain at
    * topL + the exact-cosine leg (the ann_cosine_topk SQL, one query
    * vector) fused as a two-term reciprocal sum in lexical-then-vector
    * order — both terms reciprocals of integer-valued doubles, so the
    * only float subtleties are the legs' own (already pinned). */
  private[graft] def searchHybridRrfSql(query: String, qvecId: Long, topL: Int,
      topK: Int, rrfK: Int): String =
    s"""WITH ${bm25Ctes(query, topL)},
       |c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = ${graft.operators.Embeddings.EmbeddingDim}
       |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0),
       |n AS (
       |  SELECT vec_id, CASE WHEN list_dot_product(e, e) = 0 THEN e
       |         ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e))) END AS e
       |  FROM c),
       |qv AS (SELECT e AS qe FROM n WHERE vec_id = $qvecId),
       |vs AS (SELECT n.vec_id, round(list_dot_product(n.e, qv.qe), 6) AS sim FROM n, qv),
       |vr AS (
       |  SELECT vec_id AS doc_id,
       |         CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS vec_rk
       |  FROM vs ORDER BY sim DESC, vec_id LIMIT $topL),
       |f AS (
       |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.rk AS lex_rk, v.vec_rk,
       |         round(coalesce(1.0 / ($rrfK.0 + CAST(l.rk AS DOUBLE)), 0.0)
       |             + coalesce(1.0 / ($rrfK.0 + CAST(v.vec_rk AS DOUBLE)), 0.0), 6) AS score
       |  FROM bm25r l FULL OUTER JOIN vr v ON l.doc_id = v.doc_id)
       |SELECT doc_id, lex_rk, vec_rk, score,
       |       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
       |FROM f
       |ORDER BY score DESC, doc_id
       |LIMIT $topK""".stripMargin

  /** Capped per-day report CTEs — the SQL mirror of
    * [[graft.operators.LogOps.incidentReport]]'s bounded assembly: `c` is
    * the UNCAPPED day count, `r` the report over the first `maxLines`
    * non-NULL lines per day in (ts_us, event_id) order. NULLS FIRST pins
    * the rank order to Spark's default asc-nulls-first. */
  private[graft] def reportCtes(maxLines: Int): String =
    s"""WITH e AS (
       |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_id,
       |         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
       |         printf('- %s | user_%d | %s | %s',
       |                strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), user_id, event_type, props) AS line
       |  FROM events
       |  WHERE event_type = 'error'),
       |c AS (SELECT day, count(*) AS n_incidents FROM e GROUP BY 1),
       |k AS (
       |  SELECT day, ts_us, event_id, line,
       |         row_number() OVER (PARTITION BY day
       |           ORDER BY ts_us NULLS FIRST, event_id NULLS FIRST) AS rn
       |  FROM e WHERE line IS NOT NULL),
       |r AS (
       |  SELECT day, string_agg(line, chr(10)
       |           ORDER BY ts_us NULLS FIRST, event_id NULLS FIRST) AS report
       |  FROM k WHERE rn <= $maxLines GROUP BY 1)""".stripMargin

  /** VecFns.cosine mirrored token-for-token: the norm product computed
    * ONCE and compared to zero (a zero vector scores 0.0, never 0/0),
    * sqrt(dot)·sqrt(dot) in the kernel's exact op order — bit-identical
    * doubles, like the other exact vector oracles. */
  private[graft] def cosSql(a: String, b: String): String =
    s"CASE WHEN sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)) = 0 " +
      s"THEN 0.0 ELSE list_dot_product($a, $b) / " +
      s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END"

  /** Shared CTE chain of the seeded-quantizer oracles (mirror of
    * [[graft.operators.Embeddings.seededAssign]]): valid corpus →
    * k = min(n, max(16, ⌈√n⌉)) → seeds = the k ids smallest by
    * md5 mod 2^61−1 (the unsigned-mod form, so both engines order
    * identically) → argmin-L2 assignment with zip−subtract−dot mirroring
    * VecL2Sq's op order and ties to the smaller bucket, exactly like the
    * min-struct argmin. */
  private[graft] def seededAssignCte: String =
    s"""c AS (
      |  SELECT DISTINCT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings
      |  WHERE embedding IS NOT NULL AND len(embedding) = ${graft.operators.Embeddings.EmbeddingDim}
      |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0),
      |kk AS (
      |  SELECT least(${graft.operators.Embeddings.MaxSeeds},
      |               count(*), greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k FROM c),
      |seeds AS (
      |  SELECT bucket, ce FROM (
      |    SELECT CAST(row_number() OVER (
      |             ORDER BY md5_number_lower(CAST(vec_id AS VARCHAR)) % 2305843009213693951,
      |                      vec_id) AS INT) - 1 AS bucket,
      |           e AS ce
      |    FROM c) WHERE bucket < (SELECT k FROM kk)),
      |a0 AS (
      |  SELECT c.vec_id, c.e, c.label, s.bucket,
      |         list_dot_product(list_transform(list_zip(c.e, s.ce), x -> x[1] - x[2]),
      |                          list_transform(list_zip(c.e, s.ce), x -> x[1] - x[2])) AS cdist
      |  FROM c, seeds s),
      |assign AS (
      |  SELECT vec_id, e, label, bucket, cdist FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cdist, bucket) AS ark FROM a0)
      |  WHERE ark = 1)""".stripMargin

  /** The ann_pq oracle (mirror of [[graft.operators.Embeddings.annPq]]):
    * seeded codebook → per-(vector, subspace) first-min argmin codes →
    * per-query LUT → fixed-order ADC → top-50 → exact re-rank. The
    * subspace distance mirrors PqKernels' sequential (a−b)² accumulation
    * as zip−subtract−dot over 1-based inclusive slices; the ADC sum is
    * an explicit left-associative 8-term chain, the kernel's ascending-s
    * accumulation — bit-identical doubles end to end, so the ADC cut at
    * 50 selects the same survivors. */
  private[graft] def pqM = graft.operators.Embeddings.PqM
  private[graft] def pqSubDim = graft.operators.Embeddings.EmbeddingDim / pqM

  /** Subspace L2² between 1-based inclusive slices of two DOUBLE[]
    * columns, zip−subtract−dot — PqKernels' sequential accumulation
    * order exactly. Expects a subspace relation aliased `s`. */
  private[graft] def pqDistSql(a: String, b: String): String = {
    val d = pqSubDim
    val diff = s"list_transform(list_zip($a[(s.s*$d+1):(s.s*$d+$d)], " +
      s"$b[(s.s*$d+1):(s.s*$d+$d)]), x -> x[1] - x[2])"
    s"list_dot_product($diff, $diff)"
  }

  /** The m conditional-aggregation ADC terms (one per subspace). */
  private[graft] def pqTermsSql: String = (0 until pqM).map(s =>
    s"max(CASE WHEN l.s = $s THEN l.qdist END) AS t$s").mkString(",\n      |         ")

  /** The kernel's ascending-s ADC accumulation as an explicit
    * left-associative sum chain. */
  private[graft] def pqAdcSumSql: String = (0 until pqM).map(s => s"t$s").mkString(" + ")

  private[graft] def annPqSql: String = {
    val codes = graft.operators.Embeddings.PqCodes
    def dist(a: String, b: String): String = pqDistSql(a, b)
    val ts = pqTermsSql
    val adcSum = pqAdcSumSql
    val m = pqM
    s"""WITH c AS (
      |  SELECT DISTINCT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings
      |  WHERE embedding IS NOT NULL AND len(embedding) = ${graft.operators.Embeddings.EmbeddingDim}
      |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0),
      |cb AS (
      |  SELECT code, ce FROM (
      |    SELECT CAST(row_number() OVER (
      |             ORDER BY md5_number_lower(CAST(vec_id AS VARCHAR)) % 2305843009213693951,
      |                      vec_id) AS INT) - 1 AS code,
      |           e AS ce
      |    FROM c) WHERE code < $codes),
      |sub AS (SELECT CAST(unnest(range($m)) AS INT) AS s),
      |enc0 AS (
      |  SELECT c.vec_id, s.s, cb.code, ${dist("c.e", "cb.ce")} AS dist
      |  FROM c, sub s, cb),
      |enc AS (
      |  SELECT vec_id, s, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rk
      |    FROM enc0) WHERE rk = 1),
      |q AS (SELECT vec_id AS qid, e AS qe FROM c WHERE vec_id < 100),
      |lutq AS (
      |  SELECT q.qid, s.s, cb.code, ${dist("q.qe", "cb.ce")} AS qdist
      |  FROM q, sub s, cb),
      |adc0 AS (
      |  SELECT l.qid, en.vec_id,
      |         $ts
      |  FROM enc en JOIN lutq l ON l.s = en.s AND l.code = en.code
      |  WHERE en.vec_id <> l.qid
      |  GROUP BY 1, 2),
      |cand AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, vec_id,
      |           row_number() OVER (PARTITION BY qid ORDER BY $adcSum, vec_id) AS crk
      |    FROM adc0) WHERE crk <= 50),
      |s1 AS (
      |  SELECT cand.qid, cand.vec_id, round(${cosSql("cv.e", "q.qe")}, 6) AS sim
      |  FROM cand JOIN c cv USING (vec_id) JOIN q USING (qid)),
      |r AS (SELECT qid, vec_id, sim,
      |             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
      |      FROM s1)
      |SELECT qid, rk, vec_id, sim FROM r WHERE rk <= 10""".stripMargin
  }

  /** The ann_ivfpq oracle (mirror of
    * [[graft.operators.Embeddings.annIvfPq]]): the seeded-quantizer
    * bucket assignment ([[seededAssignCte]]) restricts candidates to
    * each query's nprobe probed buckets (with the inert-but-mirrored
    * 1024 hot-bucket cap), PQ codes score them by the same fixed-order
    * ADC as ann_pq, and the top-50 re-rank by exact cosine. */
  /** The seeded-IVF serve replayed in SQL (ann_ivf_seeded), with an
    * optional candidate-side WHERE — the erasure twin filters the
    * subjects out before the per-bucket cap, exactly where the store's
    * tombstone anti-join runs. */
  private[graft] def seededIvfSql(cappedWhere: String = ""): String =
    s"""WITH $seededAssignCte,
      |np AS (SELECT greatest(8, CAST(ceil(k * 0.25) AS BIGINT)) AS nprobe FROM kk),
      |q0 AS (SELECT vec_id AS qid, e AS qe FROM assign WHERE vec_id < 100),
      |p0 AS (
      |  SELECT q.qid, q.qe, s.bucket,
      |         list_dot_product(list_transform(list_zip(q.qe, s.ce), x -> x[1] - x[2]),
      |                          list_transform(list_zip(q.qe, s.ce), x -> x[1] - x[2])) AS cdist
      |  FROM q0 q, seeds s),
      |probes AS (
      |  SELECT qid, qe, bucket FROM (
      |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cdist, bucket) AS crk FROM p0)
      |  WHERE crk <= (SELECT nprobe FROM np)),
      |capped AS (
      |  SELECT vec_id, e, bucket FROM (
      |    SELECT vec_id, e, bucket, row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
      |    FROM assign$cappedWhere) WHERE bn <= 1024),
      |s1 AS (
      |  SELECT p.qid, a.vec_id, round(${cosSql("a.e", "p.qe")}, 6) AS sim
      |  FROM capped a JOIN probes p USING (bucket) WHERE a.vec_id <> p.qid),
      |r AS (SELECT qid, vec_id, sim,
      |             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk FROM s1)
      |SELECT qid, rk, vec_id, sim FROM r WHERE rk <= 10""".stripMargin

  private[graft] def annIvfPqSql: String = {
    val codes = graft.operators.Embeddings.PqCodes
    s"""WITH $seededAssignCte,
      |np AS (SELECT greatest(8, CAST(ceil(k * 0.25) AS BIGINT)) AS nprobe FROM kk),
      |cb AS (
      |  SELECT code, ce FROM (
      |    SELECT CAST(row_number() OVER (
      |             ORDER BY md5_number_lower(CAST(vec_id AS VARCHAR)) % 2305843009213693951,
      |                      vec_id) AS INT) - 1 AS code,
      |           e AS ce
      |    FROM c) WHERE code < $codes),
      |sub AS (SELECT CAST(unnest(range($pqM)) AS INT) AS s),
      |enc0 AS (
      |  SELECT c.vec_id, s.s, cb.code, ${pqDistSql("c.e", "cb.ce")} AS dist
      |  FROM c, sub s, cb),
      |enc AS (
      |  SELECT vec_id, s, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rk
      |    FROM enc0) WHERE rk = 1),
      |q AS (SELECT vec_id AS qid, e AS qe FROM assign WHERE vec_id < 100),
      |p0 AS (
      |  SELECT q.qid, sd.bucket,
      |         list_dot_product(list_transform(list_zip(q.qe, sd.ce), x -> x[1] - x[2]),
      |                          list_transform(list_zip(q.qe, sd.ce), x -> x[1] - x[2])) AS cdist
      |  FROM q, seeds sd),
      |probes AS (
      |  SELECT qid, bucket FROM (
      |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cdist, bucket) AS crk FROM p0)
      |  WHERE crk <= (SELECT nprobe FROM np)),
      |capped AS (
      |  SELECT vec_id, bucket FROM (
      |    SELECT vec_id, bucket, row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
      |    FROM assign) WHERE bn <= 1024),
      |lutq AS (
      |  SELECT q.qid, s.s, cb.code, ${pqDistSql("q.qe", "cb.ce")} AS qdist
      |  FROM q, sub s, cb),
      |adc0 AS (
      |  SELECT p.qid, en.vec_id,
      |         $pqTermsSql
      |  FROM enc en
      |  JOIN capped cp ON cp.vec_id = en.vec_id
      |  JOIN probes p ON p.bucket = cp.bucket
      |  JOIN lutq l ON l.qid = p.qid AND l.s = en.s AND l.code = en.code
      |  WHERE en.vec_id <> p.qid
      |  GROUP BY 1, 2),
      |cand AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, vec_id,
      |           row_number() OVER (PARTITION BY qid ORDER BY $pqAdcSumSql, vec_id) AS crk
      |    FROM adc0) WHERE crk <= 50),
      |s1 AS (
      |  SELECT cand.qid, cand.vec_id, round(${cosSql("cv.e", "q.qe")}, 6) AS sim
      |  FROM cand JOIN c cv USING (vec_id) JOIN q USING (qid)),
      |r AS (SELECT qid, vec_id, sim,
      |             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
      |      FROM s1)
      |SELECT qid, rk, vec_id, sim FROM r WHERE rk <= 10""".stripMargin
  }

  /** The ann_lsh / ann_lsh_multiprobe oracle (mirror of
    * [[graft.operators.Embeddings.annLsh]]): the hyperplanes are
    * driver-computed constants shared with the Spark kernel
    * (Embeddings.lshPlanes), so the oracle embeds them as DuckDB list
    * literals and recomputes the band words from the RAW vectors —
    * sign(dot(v, p)) is normalization-invariant, so the words match the
    * kernel's normalized-side bits exactly. The xxhash64 band KEY is an
    * equality surrogate for (band, word), so the oracle joins on the pair
    * directly; the per-key keep-first-1024 cap and the query-side
    * Hamming flip masks are mirrored one-to-one. Sims re-rank candidates
    * with the same rounded dot the ann_cosine_topk oracle hash-matches. */
  private[graft] def annLshSql(hammingProbes: Int): String = {
    val nBits = 32
    val bands = 4
    val rowsPerBand = nBits / bands
    val planes = graft.operators.Embeddings.lshPlanes(nBits)
    def planeLit(p: Seq[Double]): String = p.mkString("[", ", ", "]")
    def wordExpr(band: Int): String = (0 until rowsPerBand).map { r =>
      s"(CASE WHEN list_dot_product(e, ${planeLit(planes(band * rowsPerBand + r))}) > 0 " +
        s"THEN ${1L << r} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    val words = (0 until bands).map(wordExpr).mkString(",\n        ")
    val masks = (0L +: (0 until hammingProbes).map(r => 1L << r))
      .mkString("[", ", ", "]")
    val bandRows = (0 until bands).map(b =>
      s"SELECT vec_id, $b AS band, words[${b + 1}] AS word FROM w")
      .mkString("\n  UNION ALL ")
    s"""WITH c AS (
       |  -- distinct vector entity: redelivered copies collapse BEFORE
       |  -- banding/capping (mirrors lshSigs' distinctEntities)
       |  SELECT DISTINCT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = ${graft.operators.Embeddings.EmbeddingDim}
       |    AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR NOT isfinite(x))) = 0),
       |n AS (
       |  SELECT vec_id, CASE WHEN list_dot_product(e, e) = 0 THEN e
       |         ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e))) END AS e
       |  FROM c),
       |w AS (SELECT vec_id, [$words] AS words FROM c),
       |x AS ($bandRows),
       |cap AS (
       |  SELECT vec_id, band, word FROM (
       |    SELECT vec_id, band, word,
       |           row_number() OVER (PARTITION BY band, word ORDER BY vec_id) AS bn
       |    FROM x) WHERE bn <= ${graft.operators.Embeddings.MaxIvfBucket}),
       |q AS (
       |  SELECT x.vec_id AS qid, x.band, xor(x.word, m.mask) AS word
       |  FROM x, (SELECT unnest($masks) AS mask) m
       |  WHERE x.vec_id < 100),
       |p AS (
       |  SELECT DISTINCT q.qid, cap.vec_id
       |  FROM q JOIN cap USING (band, word)
       |  WHERE cap.vec_id <> q.qid),
       |s AS (
       |  SELECT p.qid, p.vec_id, round(list_dot_product(nq.e, nc.e), 6) AS sim
       |  FROM p JOIN n nq ON nq.vec_id = p.qid JOIN n nc ON nc.vec_id = p.vec_id),
       |r AS (
       |  SELECT qid, vec_id, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
       |  FROM s)
       |SELECT qid, rk, vec_id, sim FROM r WHERE rk <= 10""".stripMargin
  }

  private[graft] def incidentReportSql(maxLines: Int): String =
    reportCtes(maxLines) +
    """
      |SELECT c.day, c.n_incidents, r.report
      |FROM c LEFT JOIN r USING (day)""".stripMargin

  private[graft] def searchAllSql(keyword: String, maxLines: Int = 1000): String =
    reportCtes(maxLines) +
    s""",
       |e2 AS (
       |  SELECT c.day, c.n_incidents, r.report,
       |         CASE WHEN r.report IS NOT NULL THEN
       |           printf('RCA pending for %d incidents (batch digest %s)',
       |                  c.n_incidents, md5(r.report)) END AS rca
       |  FROM c LEFT JOIN r USING (day))
       |SELECT day, n_incidents, report, rca
       |FROM e2
       |WHERE contains(lower(concat_ws(' ', day, report, rca)), '${graft.functions.TextFns.foldCase(keyword)}')""".stripMargin

  /** The 128 affine min-wise coefficients as a SQL VALUES list — computed
    * from the SAME SigUtil functions the kernel uses, so the oracle
    * literals cannot drift from the engine. */
  private[graft] lazy val minhashPermValues: String =
    (0 until 128).map(j =>
      s"($j, ${graft.expressions.SigUtil.coefA(j)}, ${graft.expressions.SigUtil.coefB(j)})")
      .mkString(", ")

  /** Signature-building CTEs shared by every minhash oracle: `shingleCte`
    * must yield sh(doc_id, shingle) from t(doc_id, text); minima come
    * from the md5 + mod-(2^61−1) affine family (same coefficients as the
    * kernel), band keys group `rowsPerBand` consecutive minima over the
    * first `keyPerms` permutations. */
  private[graft] def sigCtes(shingleCte: String, rowsPerBand: Int, keyPerms: Int): String =
    s"""t AS (SELECT DISTINCT doc_id, text FROM documents),
       |$shingleCte,
       |perms(j, a, b) AS (VALUES $minhashPermValues),
       |mins AS (SELECT doc_id, j,
       |    min(CAST((CAST(a AS HUGEINT)*(md5_number_lower(shingle)%2305843009213693951)+b)%2305843009213693951 AS BIGINT)) AS s
       |  FROM sh CROSS JOIN perms GROUP BY 1, 2),
       |keys AS (SELECT doc_id, CAST(j//$rowsPerBand AS VARCHAR) || '|' || string_agg(CAST(s AS VARCHAR), ',' ORDER BY j) AS key
       |  FROM mins WHERE j < $keyPerms GROUP BY doc_id, j//$rowsPerBand)""".stripMargin

  /** Self-join candidate CTEs: kn∈[2,64] hot-bucket cap, distinct pairs,
    * similarity = 128-perm agreement fraction. */
  private[graft] def simsCtes: String =
    """kc AS (SELECT key, count(*) AS kn FROM keys GROUP BY 1),
      |ek AS (SELECT k.doc_id, k.key FROM keys k JOIN kc USING (key) WHERE kn >= 2 AND kn <= 64),
      |prs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      |        FROM ek l JOIN ek r ON l.key = r.key AND l.doc_id < r.doc_id),
      |sims AS (SELECT p.id_a, p.id_b,
      |         round(CAST(sum(CASE WHEN ma.s = mb.s THEN 1 ELSE 0 END) AS DOUBLE)/128, 6) AS sim
      |         FROM prs p JOIN mins ma ON ma.doc_id = p.id_a
      |                    JOIN mins mb ON mb.doc_id = p.id_b AND mb.j = ma.j
      |         GROUP BY 1, 2)""".stripMargin

  /** LSH near-dup summary replayed in SQL. */
  private[graft] def lshSummarySql(shingleCte: String, rowsPerBand: Int,
      keyPerms: Int, thr: String): String =
    s"""WITH ${sigCtes(shingleCte, rowsPerBand, keyPerms)},
       |$simsCtes,
       |dirs AS (SELECT id_a AS id, id_b AS other, sim FROM sims
       |         UNION ALL SELECT id_b, id_a, sim FROM sims),
       |best AS (SELECT id, other, sim,
       |                row_number() OVER (PARTITION BY id ORDER BY sim DESC, other DESC) AS rk,
       |                count(*) OVER (PARTITION BY id) AS n FROM dirs)
       |SELECT t.doc_id, COALESCE(b.n, 0) AS n_candidates, b.other AS best_match_id,
       |       b.sim AS best_sim, COALESCE(b.sim >= $thr, false) AS is_dup
       |FROM t LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.id = t.doc_id""".stripMargin

  /** Connected-component labels of the word-3 dup graph (sim ≥ 0.8):
    * a recursive reachability closure — reach(x) accumulates the ids of
    * every node that can reach x over symmetric dup edges, so min(lbl)
    * is exactly the component minimum the iterative Spark CC converges
    * to. Closure size is Σ|component|² — bounded because the hot-bucket
    * cap bounds component fan-in. */
  private[graft] def word3LabelCtes: String =
    s"""${sigCtes(word3ShingleCte, 4, 128)},
       |$simsCtes,
       |edges AS (SELECT id_a AS src, id_b AS dst FROM sims WHERE sim >= 0.8
       |          UNION ALL SELECT id_b, id_a FROM sims WHERE sim >= 0.8),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS lbl FROM t
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
       |lab AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY 1)""".stripMargin

  /** Estimate-vs-exact calibration: the sims CTEs give the signature
    * estimates, `sh` is already the DISTINCT shingle set, exact Jaccard
    * is one integer division per candidate pair. */
  private[graft] def minhashCalibrationSql: String =
    s"""WITH ${sigCtes(word3ShingleCte, 4, 128)},
       |$simsCtes,
       |shc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT s.id_a, s.id_b, CAST(count(*) AS BIGINT) AS i
       |  FROM sims s JOIN sh a ON a.doc_id = s.id_a
       |              JOIN sh b ON b.doc_id = s.id_b AND b.shingle = a.shingle
       |  GROUP BY 1, 2),
       |cal AS (
       |  SELECT s.sim,
       |         CAST(coalesce(i.i, 0) AS DOUBLE) /
       |         CAST(ca.n + cb.n - coalesce(i.i, 0) AS DOUBLE) AS exact
       |  FROM sims s
       |  LEFT JOIN inter i ON i.id_a = s.id_a AND i.id_b = s.id_b
       |  JOIN shc ca ON ca.doc_id = s.id_a
       |  JOIN shc cb ON cb.doc_id = s.id_b)
       |SELECT CAST(floor(abs(sim - exact) / CAST(0.05 AS DOUBLE)) AS BIGINT)
       |         AS err_band,
       |       count(*) AS n_pairs,
       |       CAST(count(*) FILTER (WHERE sim >= CAST(0.8 AS DOUBLE))
       |            AS BIGINT) AS n_est_dup,
       |       CAST(count(*) FILTER (WHERE exact >= CAST(0.8 AS DOUBLE))
       |            AS BIGINT) AS n_exact_dup,
       |       CAST(count(*) FILTER (WHERE sim >= CAST(0.8 AS DOUBLE)
       |                              AND exact >= CAST(0.8 AS DOUBLE))
       |            AS BIGINT) AS n_both
       |FROM cal GROUP BY 1""".stripMargin

  private[graft] def dedupClustersSql: String =
    s"""WITH RECURSIVE $word3LabelCtes,
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.id AS doc_id, l.cluster AS cluster_id, s.cluster_size, l.id = l.cluster AS is_canonical
       |FROM lab l JOIN sz s ON s.cluster = l.cluster""".stripMargin

  private[graft] def trainTestSplitSql: String =
    s"""WITH RECURSIVE $word3LabelCtes
       |SELECT id AS doc_id, cluster AS cluster_id,
       |       CASE WHEN md5_number_lower(CAST(cluster AS VARCHAR)) % 100 < 80
       |            THEN 'train' ELSE 'test' END AS split
       |FROM lab""".stripMargin

  /** The incremental-dedup derivation; `corpusWhere` restricts the INDEX
    * side only — the erasure twin drops the subjects before the matched
    * set (and therefore before the hot-bucket count), exactly where the
    * store's tombstone anti-join runs. */
  private[graft] def dedupIncrementalSql(corpusWhere: String = ""): String =
    s"""WITH ${sigCtes(word3ShingleCte, 4, 128)},
       |mem AS (SELECT doc_id, md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 = 0 AS is_batch FROM t),
       |bkeys AS (SELECT k.doc_id, k.key FROM keys k JOIN mem USING (doc_id) WHERE is_batch),
       |ckeys AS (SELECT k.doc_id, k.key FROM keys k JOIN mem USING (doc_id)
       |          WHERE NOT is_batch$corpusWhere),
       |matched AS (SELECT c.doc_id, c.key FROM ckeys c WHERE c.key IN (SELECT DISTINCT key FROM bkeys)),
       |hot AS (SELECT key, count(*) AS kn FROM matched GROUP BY 1),
       |cok AS (SELECT m.key, m.doc_id AS corpus_id FROM matched m JOIN hot USING (key) WHERE kn <= 64),
       |prs AS (SELECT DISTINCT b.doc_id AS id, c.corpus_id
       |        FROM bkeys b JOIN cok c ON b.key = c.key AND b.doc_id != c.corpus_id),
       |sims AS (SELECT p.id, p.corpus_id,
       |         round(CAST(sum(CASE WHEN ma.s = mb.s THEN 1 ELSE 0 END) AS DOUBLE)/128, 6) AS sim
       |         FROM prs p JOIN mins ma ON ma.doc_id = p.id
       |                    JOIN mins mb ON mb.doc_id = p.corpus_id AND mb.j = ma.j
       |         GROUP BY 1, 2),
       |perdoc AS (SELECT id, CAST(count(*) AS BIGINT) AS n_candidates,
       |                  min(CASE WHEN sim >= 0.8 THEN corpus_id END) AS min_dup_id
       |           FROM sims GROUP BY 1),
       |best AS (SELECT id, corpus_id, sim,
       |                row_number() OVER (PARTITION BY id ORDER BY sim DESC, corpus_id DESC) AS rk
       |         FROM sims)
       |SELECT m.doc_id, COALESCE(pd.n_candidates, 0) AS n_candidates,
       |       b.corpus_id AS best_match_id, b.sim AS best_sim,
       |       COALESCE(b.sim >= 0.8, false) AS is_dup, pd.min_dup_id
       |FROM (SELECT doc_id FROM mem WHERE is_batch) m
       |LEFT JOIN perdoc pd ON pd.id = m.doc_id
       |LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.id = m.doc_id""".stripMargin

  private[graft] def docFingerprintSql: String =
    """WITH t AS (SELECT DISTINCT doc_id, text FROM documents),
      |grams AS (
      |  SELECT doc_id, i,
      |         CASE WHEN length(lt) < 5 THEN md5_number_lower(lt) % 2305843009213693951
      |              ELSE md5_number_lower(substr(lt, i, 5)) % 2305843009213693951 END AS g
      |  FROM (SELECT doc_id, lower(text) AS lt,
      |               unnest(range(1, greatest(length(lower(text))-3, 2))) AS i
      |        FROM t WHERE text IS NOT NULL)),
      |winmins AS (
      |  SELECT doc_id, CASE WHEN cnt <= 4 THEN gmin ELSE min_g END AS fp
      |  FROM (SELECT doc_id, i, g,
      |               count(*) OVER (PARTITION BY doc_id) AS cnt,
      |               min(g) OVER (PARTITION BY doc_id) AS gmin,
      |               min(g) OVER (PARTITION BY doc_id ORDER BY i
      |                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS min_g
      |        FROM grams)
      |  WHERE (cnt <= 4 AND i = 1) OR (cnt > 4 AND i <= cnt - 3)),
      |fps AS (SELECT DISTINCT doc_id, fp FROM winmins),
      |agg AS (SELECT doc_id, md5(string_agg(CAST(fp AS VARCHAR), ',' ORDER BY fp)) AS fingerprint,
      |               CAST(count(*) AS BIGINT) AS n_fingerprints
      |        FROM fps GROUP BY 1)
      |SELECT t.doc_id, a.fingerprint, a.n_fingerprints
      |FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin

  private[graft] def sampleStratifiedSql: String =
    """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
      |       user_id, event_type, value, props
      |FROM events
      |WHERE md5_number_lower('42:' || CAST(event_id AS VARCHAR)) % 1000 < 100""".stripMargin

  /** Word 3-shingles (distinct, short docs collapse to one shingle). */
  private[graft] def word3ShingleCte: String =
    """tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |        FROM t WHERE text IS NOT NULL),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, CASE WHEN len(ts) < 3 THEN array_to_string(ts, ' ')
      |         ELSE ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] END AS shingle
      |    FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts)-1, 2))) AS i FROM tok)))""".stripMargin

  /** Character 5-grams (code-point positions, distinct, short docs whole). */
  private[graft] def char5ShingleCte: String =
    """sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, CASE WHEN length(lt) < 5 THEN lt ELSE substr(lt, i, 5) END AS shingle
      |    FROM (SELECT doc_id, lower(text) AS lt,
      |                 unnest(range(1, greatest(length(lower(text))-3, 2))) AS i
      |          FROM t WHERE text IS NOT NULL)))""".stripMargin

  private[graft] def dedupSimhashSql: String =
    """WITH t AS (SELECT DISTINCT doc_id, text FROM documents),
      |tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
      |        FROM t WHERE text IS NOT NULL),
      |th AS (SELECT doc_id, md5_number_lower(w) AS h FROM tok),
      |bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |         FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) GROUP BY 1, 2),
      |sigbits AS (SELECT doc_id, b, CASE WHEN v >= 0 THEN 1 ELSE 0 END AS bit FROM bits),
      |keys AS (SELECT doc_id, CAST(b//16 AS VARCHAR) || '|' ||
      |                CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(b % 16 AS INTEGER))) AS VARCHAR) AS key
      |         FROM sigbits GROUP BY doc_id, b//16),
      |kc AS (SELECT key, count(*) AS kn FROM keys GROUP BY 1),
      |ek AS (SELECT k.doc_id, k.key FROM keys k JOIN kc USING (key) WHERE kn >= 2 AND kn <= 64),
      |prs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      |        FROM ek l JOIN ek r ON l.key = r.key AND l.doc_id < r.doc_id),
      |sims AS (SELECT p.id_a, p.id_b,
      |         round(1.0 - CAST(sum(CASE WHEN sa.bit != sb.bit THEN 1 ELSE 0 END) AS DOUBLE)/64.0, 6) AS sim
      |         FROM prs p JOIN sigbits sa ON sa.doc_id = p.id_a
      |                    JOIN sigbits sb ON sb.doc_id = p.id_b AND sb.b = sa.b
      |         GROUP BY 1, 2),
      |dirs AS (SELECT id_a AS id, id_b AS other, sim FROM sims
      |         UNION ALL SELECT id_b, id_a, sim FROM sims),
      |best AS (SELECT id, other, sim,
      |                row_number() OVER (PARTITION BY id ORDER BY sim DESC, other DESC) AS rk,
      |                count(*) OVER (PARTITION BY id) AS n FROM dirs)
      |SELECT t.doc_id, COALESCE(b.n, 0) AS n_candidates, b.other AS best_match_id,
      |       b.sim AS best_sim, COALESCE(b.sim >= 0.95, false) AS is_dup
      |FROM t LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.id = t.doc_id""".stripMargin

  private[graft] def dedupContainmentSql: String =
    """WITH t AS (SELECT DISTINCT doc_id, text FROM documents),
      |grams AS (
      |  SELECT doc_id, i,
      |         CASE WHEN length(lt) < 5 THEN md5_number_lower(lt) % 2305843009213693951
      |              ELSE md5_number_lower(substr(lt, i, 5)) % 2305843009213693951 END AS g
      |  FROM (SELECT doc_id, lower(text) AS lt,
      |               unnest(range(1, greatest(length(lower(text))-3, 2))) AS i
      |        FROM t WHERE text IS NOT NULL)),
      |winmins AS (
      |  SELECT doc_id, CASE WHEN cnt <= 4 THEN gmin ELSE min_g END AS fp
      |  FROM (SELECT doc_id, i, g,
      |               count(*) OVER (PARTITION BY doc_id) AS cnt,
      |               min(g) OVER (PARTITION BY doc_id) AS gmin,
      |               min(g) OVER (PARTITION BY doc_id ORDER BY i
      |                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS min_g
      |        FROM grams)
      |  WHERE (cnt <= 4 AND i = 1) OR (cnt > 4 AND i <= cnt - 3)),
      |fps AS (SELECT DISTINCT doc_id, fp FROM winmins),
      |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps FROM fps GROUP BY 1),
      |fc AS (SELECT fp, count(*) AS fn FROM fps GROUP BY 1),
      |cappedn AS (SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_fps_capped
      |            FROM fps f JOIN fc USING (fp) WHERE fn <= 64 GROUP BY 1),
      |pairable AS (SELECT f.doc_id, f.fp FROM fps f JOIN fc USING (fp) WHERE fn >= 2 AND fn <= 64),
      |shared AS (
      |  SELECT l.doc_id AS id, r.doc_id AS container_id, count(*) AS n_shared
      |  FROM pairable l JOIN pairable r ON l.fp = r.fp AND l.doc_id != r.doc_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT s.id, s.container_id,
      |         round(CAST(s.n_shared AS DOUBLE) / CAST(c.n_fps_capped AS DOUBLE), 6) AS containment
      |  FROM shared s JOIN cappedn c ON c.doc_id = s.id),
      |top AS (SELECT id, container_id, containment,
      |               row_number() OVER (PARTITION BY id ORDER BY containment DESC, container_id) AS rk
      |        FROM scored)
      |SELECT t.doc_id, nf.n_fps, b.container_id AS best_container_id,
      |       b.containment, COALESCE(b.containment >= 0.8, false) AS is_contained
      |FROM t LEFT JOIN nf ON nf.doc_id = t.doc_id
      |       LEFT JOIN (SELECT * FROM top WHERE rk = 1) b ON b.id = t.doc_id""".stripMargin

  /** Shared CTE prefix of the two RAG oracles: rebuild the md5
    * feature-hash embeddings of the DISTINCT document set and the
    * DISTINCT earliest-5 error batch in SQL, dot them via an integer
    * slot join, and rank top-5 docs per incident. The one float
    * expression (dot/(√Σc²·√Σq²)) mirrors the Spark side
    * token-for-token, so ranks are bit-identical. */
  private[graft] def ragCtes: String =
    """WITH inc AS (
      |  SELECT event_id AS incident_id, ts, user_id, event_type, props,
      |         regexp_split_to_array(trim(lower(concat_ws(' ', props, event_type))), '\s+') AS qt
      |  FROM (SELECT DISTINCT event_id, ts, user_id, event_type, props
      |        FROM events WHERE event_type = 'error' AND ts IS NOT NULL)
      |  ORDER BY ts, event_id LIMIT 5),
      |docs AS (SELECT DISTINCT doc_id, text, source FROM documents),
      |islots AS (
      |  SELECT incident_id, CAST(md5_number_lower(tok) % 64 AS BIGINT) AS slot,
      |         CAST(sum(CASE WHEN (md5_number_upper(tok) & 1) = 0 THEN 1 ELSE -1 END) AS BIGINT) AS c
      |  FROM (SELECT incident_id, unnest(qt) AS tok FROM inc)
      |  WHERE length(tok) > 0 GROUP BY 1, 2),
      |inorm AS (
      |  SELECT i.incident_id, COALESCE(s.sq, 0) AS sq
      |  FROM inc i LEFT JOIN (SELECT incident_id, sum(c*c) AS sq FROM islots GROUP BY 1) s
      |    USING (incident_id)),
      |dslots AS (
      |  SELECT doc_id, CAST(md5_number_lower(tok) % 64 AS BIGINT) AS slot,
      |         CAST(sum(CASE WHEN (md5_number_upper(tok) & 1) = 0 THEN 1 ELSE -1 END) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(concat_ws(' ', text, source))), '\s+')) AS tok
      |        FROM docs)
      |  WHERE length(tok) > 0 GROUP BY 1, 2),
      |dnorm AS (
      |  SELECT d.doc_id, COALESCE(s.sq, 0) AS sd
      |  FROM (SELECT doc_id FROM docs) d
      |  LEFT JOIN (SELECT doc_id, sum(c*c) AS sq FROM dslots GROUP BY 1) s USING (doc_id)),
      |dots AS (
      |  SELECT d.doc_id, i.incident_id, sum(d.c * i.c) AS dot
      |  FROM dslots d JOIN islots i ON d.slot = i.slot GROUP BY 1, 2),
      |pairs AS (
      |  SELECT dn.doc_id, q.incident_id,
      |         CASE WHEN dn.sd > 0 AND q.sq > 0 AND dt.dot IS NOT NULL
      |              THEN CAST(dt.dot AS DOUBLE) / (sqrt(CAST(dn.sd AS DOUBLE)) * sqrt(CAST(q.sq AS DOUBLE)))
      |              ELSE 0.0 END AS sim
      |  FROM dnorm dn CROSS JOIN inorm q
      |  LEFT JOIN dots dt ON dt.doc_id = dn.doc_id AND dt.incident_id = q.incident_id),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY incident_id ORDER BY sim DESC, doc_id) AS rk
      |  FROM pairs),
      |ctx AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits, min(incident_id) AS first_incident,
      |         round(max(sim), 4) AS best_sim
      |  FROM rk WHERE rk <= 5 GROUP BY doc_id)""".stripMargin

  private[graft] def ragContextSql: String = ragCtes + "\nSELECT * FROM ctx"

  private[graft] def ragPromptSql: String = ragCtes +
    """,
      |blines AS (
      |  SELECT incident_id,
      |         printf('- %s | user_%d | %s | %s',
      |                strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), user_id, event_type,
      |                regexp_replace(
      |                  regexp_replace(
      |                    regexp_replace(props, '[\w.-]+@[\w.-]+', '[REDACTED_EMAIL]', 'g'),
      |                    '(?i)api[_-]?key\s*[:=]\s*\w+', 'api_key=[REDACTED]', 'g'),
      |                  '(?i)token\s*[:=]\s*\w+', 'token=[REDACTED]', 'g')) AS line
      |  FROM inc),
      |batch AS (SELECT string_agg(line, chr(10) ORDER BY incident_id) AS batch_txt FROM blines),
      |slines AS (
      |  SELECT d.doc_id,
      |         printf('- doc_%d | %s | %s', d.doc_id, d.source,
      |                regexp_replace(
      |                  regexp_replace(
      |                    regexp_replace(d.text, '[\w.-]+@[\w.-]+', '[REDACTED_EMAIL]', 'g'),
      |                    '(?i)api[_-]?key\s*[:=]\s*\w+', 'api_key=[REDACTED]', 'g'),
      |                  '(?i)token\s*[:=]\s*\w+', 'token=[REDACTED]', 'g')) AS line
      |  FROM docs d JOIN (SELECT DISTINCT doc_id FROM ctx) s USING (doc_id)),
      |sims AS (SELECT string_agg(line, chr(10) ORDER BY doc_id) AS sim_txt FROM slines)
      |SELECT 'Given the following logs and similar past incidents, summarize the root cause and suggest a fix.'
      |       || chr(10) || chr(10) || 'Current Logs:' || chr(10) || batch_txt
      |       || chr(10) || chr(10) || 'Similar Past Incidents:' || chr(10) || sim_txt
      |       || chr(10) || chr(10) || 'RCA and Fix Suggestion:' AS prompt
      |FROM batch CROSS JOIN sims""".stripMargin

  /** Unrolled BPE-training CTE chain: s0 is the letters-only word
    * frequency dictionary split to character symbols; each step k then
    * derives p_k (adjacent-pair counts via lockstep unnest), m_k (the
    * argmax merge under the cnt DESC, lft, rgt total order) and s_k (the
    * dictionary with that merge applied). The merge application is a
    * list_reduce fold over singleton lists — exactly the Spark kernel's
    * left-to-right non-overlapping pass (equivalence argued at
    * Kernels.bpeMergeStep: a merged symbol can never equal `lft` again,
    * so fold-with-tail ≡ scan-and-skip). An exhausted dictionary makes
    * m_k empty; the scalar subqueries go NULL, s_k = s_{k-1}, and the
    * merge row for rank k vanishes on both engines. */
  private[graft] def bpeCtes(merges: Int): String = {
    // Every CTE is explicitly MATERIALIZED: s_{k-1} is referenced twice
    // per step (p_k and s_k), so DuckDB's default inlining would
    // re-evaluate the chain 2^merges times — measured as a >5 min hang
    // at merges=12 vs 0.7 s materialized.
    val b = new StringBuilder
    b ++= """WITH s0 AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
      |         regexp_extract_all(word, '[a-z]') AS syms
      |  FROM (
      |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
      |    FROM documents WHERE text IS NOT NULL) t
      |  WHERE regexp_matches(word, '^[a-z]+$')
      |  GROUP BY word)""".stripMargin
    for (k <- 1 to merges) {
      // LEFT JOIN ON TRUE, not a scalar subquery: DuckDB lambdas reject
      // subqueries but capture join columns; an empty m_k leaves lft/rgt
      // NULL and the CASE false — the dictionary passes through unchanged
      b ++= s""",
      |p$k AS MATERIALIZED (
      |  SELECT syms[i] AS lft, syms[i + 1] AS rgt,
      |         CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM (SELECT freq, syms,
      |               unnest(generate_series(1, len(syms) - 1)) AS i
      |        FROM s${k - 1})
      |  GROUP BY 1, 2),
      |m$k AS MATERIALIZED (SELECT lft, rgt, cnt FROM p$k
      |        ORDER BY cnt DESC, lft, rgt LIMIT 1),
      |s$k AS MATERIALIZED (
      |  SELECT word, freq,
      |         list_reduce(list_transform(syms, x -> [x]),
      |           (a, b) -> CASE WHEN a[len(a)] = mk.lft AND b[1] = mk.rgt
      |                     THEN list_concat(a[1:len(a) - 1],
      |                                      [mk.lft || mk.rgt])
      |                     ELSE list_concat(a, b) END) AS syms
      |  FROM s${k - 1} LEFT JOIN m$k mk ON TRUE)""".stripMargin
    }
    b.result()
  }

  private[graft] def bpeTrainSql(merges: Int): String =
    bpeCtes(merges) + "\n" + (1 to merges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank, lft, rgt,
         |       lft || rgt AS merged, cnt FROM m$k""".stripMargin
    }.mkString("\nUNION ALL\n")

  private[graft] def bpeEncodeSql(merges: Int): String =
    bpeCtes(merges) + s""",
      |w AS (
      |  SELECT doc_id,
      |         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word,
      |         generate_subscripts(
      |           regexp_split_to_array(trim(lower(text)), '\\s+'), 1) AS pos
      |  FROM documents WHERE text IS NOT NULL),
      |lw AS (SELECT doc_id, pos, word FROM w
      |       WHERE regexp_matches(word, '^[a-z]+$$'))
      |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(len(s.syms)) AS BIGINT) AS n_bpe_tokens,
      |       string_agg(array_to_string(s.syms, ' '), ' ' ORDER BY d.pos)
      |         AS bpe_text
      |FROM lw d JOIN s$merges s ON d.word = s.word
      |GROUP BY d.doc_id""".stripMargin

  private[graft] def bpeFertilitySql(merges: Int): String =
    bpeCtes(merges) + s""",
      |w AS (
      |  SELECT source,
      |         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
      |  FROM documents WHERE text IS NOT NULL),
      |lw AS (SELECT source, word FROM w WHERE regexp_matches(word, '^[a-z]+$$'))
      |SELECT d.source, CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(len(s.syms)) AS BIGINT) AS n_bpe_tokens,
      |       round(CAST(sum(len(s.syms)) AS DOUBLE) / CAST(count(*) AS DOUBLE),
      |             6) AS fertility
      |FROM lw d JOIN s$merges s ON d.word = s.word
      |GROUP BY d.source""".stripMargin

  /** DSIR log-likelihood ratios: LM divisions are exact rationals, the
    * per-doc sum is the pinned token-order fold (the source_jsd
    * pattern); vocab and toks are each referenced multiple times →
    * MATERIALIZED. */
  private[graft] def dsirWeightsSql(lang: String): String =
    s"""WITH vocab AS MATERIALIZED (
      |  SELECT token FROM (
      |    SELECT token, count(*) AS freq FROM (
      |      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      |      FROM documents WHERE text IS NOT NULL) t
      |    WHERE length(token) > 0
      |    GROUP BY token HAVING count(*) >= 2
      |    ORDER BY freq DESC, token LIMIT 1000) v),
      |toks AS MATERIALIZED (
      |  SELECT doc_id, lang, token FROM (
      |    SELECT doc_id, lang,
      |           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
      |    FROM documents WHERE text IS NOT NULL) t
      |  WHERE token IN (SELECT token FROM vocab)),
      |tgt AS MATERIALIZED (
      |  SELECT v.token, COALESCE(c.cnt, 0) AS cnt
      |  FROM vocab v LEFT JOIN (
      |    SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks
      |    WHERE lang = '$lang' GROUP BY token) c ON v.token = c.token),
      |bg AS MATERIALIZED (
      |  SELECT v.token, COALESCE(c.cnt, 0) AS cnt
      |  FROM vocab v LEFT JOIN (
      |    SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks
      |    GROUP BY token) c ON v.token = c.token),
      |lr AS MATERIALIZED (
      |  SELECT t.token,
      |         ln(((CAST(t.cnt AS DOUBLE) + 1.0) /
      |             (CAST((SELECT sum(cnt) FROM tgt) AS DOUBLE) +
      |              CAST((SELECT count(*) FROM vocab) AS DOUBLE))) /
      |            ((CAST(b.cnt AS DOUBLE) + 1.0) /
      |             (CAST((SELECT sum(cnt) FROM bg) AS DOUBLE) +
      |              CAST((SELECT count(*) FROM vocab) AS DOUBLE)))) AS lr
      |  FROM tgt t JOIN bg b ON t.token = b.token),
      |dt AS (
      |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
      |  FROM toks GROUP BY 1, 2)
      |SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_vocab_tokens,
      |       round(list_reduce(list(CAST(d.c AS DOUBLE) * l.lr ORDER BY d.token),
      |                         (x, y) -> x + y), 6) AS log_ratio
      |FROM dt d JOIN lr l ON d.token = l.token
      |GROUP BY d.doc_id""".stripMargin

  /** Positional grams (duplicates kept): g is referenced three times, so
    * it is MATERIALIZED like the BPE chain. */
  private[graft] def dedupSpansSql(n: Int): String =
    s"""WITH g AS MATERIALIZED (
      |  SELECT doc_id,
      |         array_to_string(t[CAST(i+1 AS BIGINT) : CAST(least(i+$n, n) AS BIGINT)], ' ') AS g
      |  FROM (
      |    SELECT doc_id, t, len(t) AS n,
      |           unnest(range(0, greatest(1, len(t) - ${n - 1}))) AS i
      |    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      |          FROM documents WHERE text IS NOT NULL))),
      |d AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
      |                     FROM g GROUP BY g)
      |      WHERE nd >= 2),
      |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
      |        FROM g GROUP BY doc_id),
      |dup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
      |        FROM g JOIN d USING (g) GROUP BY doc_id)
      |SELECT tot.doc_id, tot.n_grams,
      |       CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup_grams,
      |       round(CAST(coalesce(dup.n_dup, 0) AS DOUBLE)
      |             / CAST(tot.n_grams AS DOUBLE), 6) AS dup_fraction,
      |       CAST(coalesce(dup.n_dup, 0) AS DOUBLE)
      |         / CAST(tot.n_grams AS DOUBLE) >= 0.5 AS is_flagged
      |FROM tot LEFT JOIN dup ON tot.doc_id = dup.doc_id""".stripMargin

  /** Destructive-span-dedup oracle (mirror of
    * [[graft.operators.Corpus.dedupSpansRemoval]]): the audit's
    * positional-gram CTE with start positions kept, dup grams expanded
    * to their covered token positions, raw-case tokens anti-joined
    * against the coverage and reassembled in position order. Exact gram
    * text here where Spark ships xxhash64(g) — equivalent absent 2⁻⁶⁴
    * collisions (the dedup_lines precedent). */
  private[graft] def dedupSpansRemovalSql(n: Int): String =
    s"""WITH g AS MATERIALIZED (
      |  SELECT doc_id, i,
      |         array_to_string(t[CAST(i+1 AS BIGINT) : CAST(least(i+$n, nt) AS BIGINT)], ' ') AS g
      |  FROM (
      |    SELECT doc_id, t, len(t) AS nt,
      |           unnest(range(0, greatest(1, len(t) - ${n - 1}))) AS i
      |    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      |          FROM documents WHERE text IS NOT NULL))),
      |d AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
      |                     FROM g GROUP BY g)
      |      WHERE nd >= 2),
      |cov AS (SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos
      |        FROM (SELECT doc_id, unnest(range(i, i + $n)) AS pos
      |              FROM g JOIN d USING (g))),
      |raw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS rt
      |        FROM documents WHERE text IS NOT NULL),
      |toks AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, rt[CAST(i+1 AS BIGINT)] AS tok
      |         FROM (SELECT doc_id, rt, unnest(range(0, len(rt))) AS i FROM raw)),
      |m AS (SELECT t.doc_id, t.pos, t.tok, c.pos IS NOT NULL AS cov
      |      FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(sum(CASE WHEN NOT cov THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens_kept,
      |       coalesce(array_to_string(
      |         list(tok ORDER BY pos) FILTER (WHERE NOT cov), ' '), '') AS clean_text
      |FROM m GROUP BY doc_id""".stripMargin

  /** DuckDB-equivalent SQL per query (same tables, same column aliases). */
}
