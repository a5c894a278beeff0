package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every key in [[queries]] is one operator from the inventory; keys present
  * in [[oracleSql]] are verified value-for-value against DuckDB running the
  * equivalent ANSI SQL on the same parquet tables. Column aliases are kept
  * byte-identical between the Spark plan and the SQL (the driver hashes
  * values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference surface (log-analytics core) —
    "ingest_errors"         -> ((s: SparkSession, d: String) => LogOps.ingestErrors(s, d)),
    // a second NRQL window/filter point: narrower SINCE..UNTIL, different
    // container LIKE, and a LIMIT that actually truncates (149 matching
    // rows at sf0.01 → the ordered LIMIT 100 is exercised, not vacuous)
    "ingest_errors_window"  -> ((s: SparkSession, d: String) =>
      LogOps.ingestErrors(s, d, sinceTs = "2024-01-10 00:00:00",
        untilTs = "2024-01-20 00:00:00", userLike = "%3%", limit = 100)),
    "preprocess_redact"     -> (LogOps.preprocessRedact _),
    "preprocess_dedup"      -> (LogOps.preprocessDedup _),
    "redact_secrets"        -> (LogOps.redactSecrets _),
    "metrics_timeline"      -> (LogOps.metricsTimeline _),
    "metrics_by_service"    -> (LogOps.metricsByService _),
    "metrics_timeline_filled" -> (LogOps.metricsTimelineFilled _),
    "anomaly_spikes"        -> ((s: SparkSession, d: String) => LogOps.anomalySpikes(s, d)),
    "anomaly_spikes_stateful" -> ((s: SparkSession, d: String) =>
      graft.streaming.StatefulSpikes(
        graft.streaming.StatefulSpikes.fromEvents(
          graft.sources.Tables.events(s, d))).toDF()),
    // a second sensitivity point: σ=1.5 flags ~16 of 150 cells at sf0.01
    // (σ=3 flags 2), so the oracle exercises the spike branch broadly
    "anomaly_spikes_s15"    -> ((s: SparkSession, d: String) =>
      LogOps.anomalySpikes(s, d, sigma = 1.5)),
    "metrics_by_level"      -> (LogOps.metricsByLevel _),
    "metrics_by_namespace"  -> (LogOps.metricsByNamespace _),
    // drill-down totals, pivot matrix, smoothed trend — the three
    // dashboard relations the per-attribute Counters can't serve
    "metrics_rollup"        -> (LogOps.metricsRollup _),
    "events_pivot"          -> (LogOps.eventsPivot _),
    "metrics_moving_avg"    -> ((s: SparkSession, d: String) =>
      LogOps.metricsMovingAvg(s, d)),
    "search_keyword"        -> (LogOps.searchKeyword _),
    "log_templates"         -> (LogOps.logTemplates _),
    // empty on the synthetic corpus by design (every template shape spans
    // both periods) — the EMPTY result is hash-compared, like the _none
    // search points; the spec plants real novelty
    "template_novelty"      -> ((s: SparkSession, d: String) => LogOps.templateNovelty(s, d)),
    "template_trending"     -> ((s: SparkSession, d: String) => LogOps.templateTrending(s, d)),
    // streaming first-seen trigger, applied in batch mode (the
    // sessionize_stateful pairing): one alert row per distinct shape
    "template_first_seen"   -> ((s: SparkSession, d: String) =>
      graft.streaming.StatefulTemplates(
        graft.streaming.StatefulTemplates.fromEvents(
          graft.sources.Tables.events(s, d))).toDF()),
    "search_entries"        -> ((s: SparkSession, d: String) => LogOps.searchEntries(s, d)),
    // parameter sweep: the dashboard takes arbitrary level/keyword/window
    // combinations per request (app.py:66-84) — each variant pins a
    // different point: a non-error level, and a no-hit keyword (empty
    // result), all oracle-verified like the default point
    "search_entries_purchase" -> ((s: SparkSession, d: String) =>
      LogOps.searchEntries(s, d, level = "purchase", userLike = "%3%",
        keyword = "3", sinceTs = "2024-01-05 00:00:00", limit = 100)),
    "search_entries_none"   -> ((s: SparkSession, d: String) =>
      LogOps.searchEntries(s, d, keyword = "graftnope")),
    // namespace as its own substring attribute (app.py:70-72) — a biting
    // filter point: only entries whose props.k contains '9' survive
    // (chosen to keep the point non-empty at sf0.001 for the smoke gate)
    "search_entries_ns"     -> ((s: SparkSession, d: String) =>
      LogOps.searchEntries(s, d, namespace = "9")),
    "search_all"            -> ((s: SparkSession, d: String) => LogOps.searchAll(s, d)),
    // keyword landing in the report BODY only (log-line props — a hex
    // digest can't contain '"'), and one matching nothing at all
    "search_all_msg"        -> ((s: SparkSession, d: String) =>
      LogOps.searchAll(s, d, keyword = "\"k\": 12")),
    "search_all_none"       -> ((s: SparkSession, d: String) =>
      LogOps.searchAll(s, d, keyword = "graftnope")),
    "feedback_upsert"       -> (Upsert.feedbackUpsert _),
    "incident_report"       -> ((s: SparkSession, d: String) => LogOps.incidentReport(s, d)),
    // cap small enough to BITE at sf0.01 (~67 error lines/day): verifies
    // the truncation semantics itself, not just the uncapped fixpoint
    "incident_report_cap"   -> ((s: SparkSession, d: String) =>
      LogOps.incidentReport(s, d, maxLines = 25)),
    "slack_message"         -> (LogOps.slackMessage _),
    "slack_message_ns"      -> (LogOps.slackMessageApp _),
    "rag_prompt"            -> (Embeddings.ragPrompt _),
    "props_parse"           -> (LogOps.propsParse _),
    "distinct_users"        -> (LogOps.distinctUsers _),
    "approx_distinct"       -> (LogOps.approxDistinct _),
    // streaming HLL twin (the sessionize_stateful pairing): batch mode
    // reproduces the column pipeline's registers bit-for-bit -> same oracle
    "approx_distinct_stateful" -> ((s: SparkSession, d: String) =>
      graft.streaming.StatefulSketch(
        graft.streaming.StatefulSketch.fromEvents(
          graft.sources.Tables.events(s, d))).toDF()),
    "sessionize_stateful"   -> ((s: SparkSession, d: String) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      // the shared sessionizer contract: a NULL-ts event has no place in
      // a session (and would NPE the typed gap arithmetic)
      val ev = graft.sources.Tables.events(s, d)
        .where(col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.SessEvent]
      graft.streaming.StatefulSessionize(ev).toDF()
        .select(col("user_id"), col("n_events"),
          round(col("session_value"), 2).as("session_value"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"))
    }),
    // — scale-path analytics —
    "q1_pricing_summary"    -> (Relational.q1PricingSummary _),
    "q3_top_orders"         -> (Relational.q3TopOrders _),
    "q5_region_revenue"     -> (Relational.q5RegionRevenue _),
    "sessionize"            -> (Relational.sessionize _),
    "sessionize_native"     -> (Relational.sessionizeNative _),
    "top_events_per_user"   -> (Relational.topEventsPerUser _),
    "heavy_hitters"         -> (Relational.heavyHitters _),
    "skew_profile"          -> ((s: SparkSession, d: String) => Relational.skewProfile(s, d)),
    "heavy_hitters_approx"  -> ((s: SparkSession, d: String) => Relational.heavyHittersApprox(s, d)),
    "value_percentiles"     -> (Relational.valuePercentiles _),
    "value_percentiles_approx" -> (Relational.valuePercentilesApprox _),
    "value_percentiles_sampled" -> ((s: SparkSession, d: String) => Relational.valuePercentilesSampled(s, d)),
    // the RangePartitioner primitive: per-type value deciles assigned
    // from broadcast sampled cutpoints — no global sort anywhere
    "equidepth_buckets"     -> ((s: SparkSession, d: String) =>
      Relational.equidepthBuckets(s, d)),
    "asof_prev_error"       -> (Relational.asofPrevError _),
    // last-touch attribution: bounded asof; the streaming interval-join
    // twin (StreamJoins.attributionCandidates) emits the eligible pairs
    "click_attribution"     -> ((s: SparkSession, d: String) =>
      EventFlows.clickAttribution(s, d)),
    // 5-minute parameter point: most purchases lose their asof match, so
    // the NULL branch and the window predicate both bite differently
    "click_attribution_w5m" -> ((s: SparkSession, d: String) =>
      EventFlows.clickAttributionMinutes(s, d, 5)),
    "stream_windowed_counts" -> (Relational.streamWindowedCounts _),
    // — training-data text operators —
    "dedup_exact"           -> (TextOps.dedupExact _),
    // the streaming twin: fingerprint-keyed flatMapGroupsWithState;
    // batch mode sees each fingerprint whole → SAME oracle as
    // dedup_exact (the sessionize_stateful pairing)
    "dedup_exact_stateful"  -> ((s: SparkSession, d: String) =>
      graft.streaming.StatefulDedup(
        graft.streaming.StatefulDedup.fromDocuments(
          graft.sources.Tables.documents(s, d))).toDF()),
    "text_tokens"           -> (TextOps.textTokens _),
    "text_quality"          -> (TextOps.textQuality _),
    "clean_c4"              -> ((s: SparkSession, d: String) => TextOps.cleanC4(s, d)),
    "lang_id"               -> (TextOps.langId _),
    "text_repetition"       -> (TextOps.textRepetition _),
    "doc_fingerprint"       -> ((s: SparkSession, d: String) => TextOps.docFingerprint(s, d)),
    // — embedding / similarity search (exact scans oracle-verified via
    //   DuckDB list_dot_product — all-double sequential sums on both
    //   engines are bit-identical; the approximate/kernel-dependent ops
    //   stay rows-only) —
    "embed_text"            -> ((s: SparkSession, d: String) => Embeddings.embedText(s, d)),
    "vector_knn"            -> (Embeddings.vectorKnn _),
    "rag_context"           -> (Embeddings.ragContext _),
    "ann_cosine_topk"       -> (Embeddings.annCosineTopK _),
    "ann_ivf"               -> ((s: SparkSession, d: String) => Embeddings.annIvf(s, d)),
    // the seeded-quantizer IVF: same probe/cap/rank machinery with
    // deterministically sampled centroids — the one IVF path whose
    // BLOCKING geometry the oracle replays value-for-value
    "ann_ivf_seeded"        -> ((s: SparkSession, d: String) => Embeddings.annIvfSeeded(s, d)),
    // IVF-store ERASURE lifecycle: the seeded assignment persisted as a
    // durable index, subject vectors (vec_id ≡ 2 mod 13) tombstoned +
    // anti-joined at serve (before the candidate cap), centroids kept
    "ann_ivf_erased"        -> ((s: SparkSession, d: String) =>
      Embeddings.annIvfErasedServed(s, d)),
    // product quantization (FAISS IndexPQ shape): 8-byte codes, ADC scan,
    // exact re-rank — seeded codebook, so the compression pipeline itself
    // is oracle-hash-verified
    "ann_pq"                -> ((s: SparkSession, d: String) => Embeddings.annPq(s, d)),
    // the production composition: seeded IVF buckets prune, PQ codes
    // score, exact re-rank — oracle-verified end to end
    "ann_ivfpq"             -> ((s: SparkSession, d: String) => Embeddings.annIvfPq(s, d)),
    // SemDeDup-style semantic dedup groups: same-bucket cosine edges →
    // connected components → keep-one canonical (the embedding twin of
    // dedup_clusters), oracle-verified via the seeded quantizer
    "dedup_semantic_clusters" -> ((s: SparkSession, d: String) =>
      Embeddings.dedupSemanticClusters(s, d)),
    "ann_lsh"               -> ((s: SparkSession, d: String) => Embeddings.annLsh(s, d)),
    "ann_lsh_multiprobe"    -> ((s: SparkSession, d: String) =>
                                  Embeddings.annLsh(s, d, hammingProbes = 8)),
    "knn_label_vote"        -> (Embeddings.knnLabelVote _),
    "dedup_embedding"       -> ((s: SparkSession, d: String) => Embeddings.dedupEmbedding(s, d)),
    "embedding_outliers"    -> ((s: SparkSession, d: String) => Embeddings.embeddingOutliers(s, d)),
    "embedding_outliers_seeded" -> ((s: SparkSession, d: String) => Embeddings.embeddingOutliersSeeded(s, d)),
    "dedup_embedding_seeded" -> ((s: SparkSession, d: String) => Embeddings.dedupEmbeddingSeeded(s, d)),
    // — near-duplicate detection (rows-only) —
    "dedup_minhash"         -> ((s: SparkSession, d: String) => NearDup.dedupMinhash(s, d)),
    "dedup_clusters"        -> ((s: SparkSession, d: String) => NearDup.dedupClusters(s, d)),
    // golden-record survivorship: per near-dup cluster elect the longest
    // member (the ER "richest record wins" rule) + merge evidence
    "golden_records"        -> ((s: SparkSession, d: String) =>
      NearDup.goldenRecords(s, d)),
    // estimator-vs-exact calibration of the MinHash family: error-band
    // histogram + at-threshold confusion over the LSH candidates
    "minhash_calibration"   -> ((s: SparkSession, d: String) =>
      NearDup.minhashCalibration(s, d)),
    // TPC-H Q18 shape: the HAVING-subquery join, collapsed to ONE
    // lineitem pass by aggregating before the join
    "q18_large_orders"      -> ((s: SparkSession, d: String) =>
      Relational.q18LargeOrders(s, d)),
    // TPC-H Q2 shape: correlated scalar-min as a rank window over the
    // distinct (part, supplier) relation; oracle keeps the classic
    // double-correlated subquery form
    "q2_min_supplier"       -> ((s: SparkSession, d: String) =>
      Relational.q2MinSupplier(s, d)),
    // DSAR subject-access report: everything held about each subject in
    // the (deterministic) request set — the governance export leg
    "dsar_report"           -> ((s: SparkSession, d: String) =>
      LogOps.dsarReport(s, d)),
    // exact media dedup by payload digest — the multimodal dedup leg;
    // payloads never shuffle, the digest is computed at the scan
    "dedup_media"           -> ((s: SparkSession, d: String) =>
      Multimodal.dedupMedia(s, d)),
    // perceptual media near-dup: weighted SimHash over the 64-bin byte
    // histogram, LSH-banded with the hot-bucket cap, candidates verified
    // by EXACT cross-multiplied integer L1 — catches the re-encoded /
    // re-wrapped copy whose byte digest differs
    "dedup_media_perceptual" -> ((s: SparkSession, d: String) =>
      Multimodal.dedupMediaPerceptual(s, d)),
    // 2-D predicate served from the durable z-clustered table: the
    // cutpoints map (user, day-range) onto ≤4 of 32 file dirs, the scan
    // partition-prunes, the exact predicate is residual — same answer
    // as the raw-table filter (the oracle)
    "events_2d_served"      -> ((s: SparkSession, d: String) =>
      Relational.eventsServed2d(s, d, 3L, "2024-01-03", "2024-02-15")),
    // the z-store APPEND lifecycle: base build over 3/5 of the corpus,
    // two increments assigned against the STORED cutpoints, one replayed
    // verbatim (the content-keyed ledger makes it a no-op) — served
    // result must equal the raw filter over the union corpus
    "events_2d_appended"    -> ((s: SparkSession, d: String) =>
      Relational.eventsServed2dAppended(s, d)),
    // the COMPACTION lifecycle: multi-file fid dirs rewritten to one
    // file each via the two-phase tmp+swap; compaction must be invisible
    "events_2d_compacted"   -> ((s: SparkSession, d: String) =>
      Relational.eventsServed2dCompacted(s, d)),
    // the ERASURE lifecycle (dsar_report's executable art-17 leg):
    // subject 3 tombstoned — served as the zero row a from-scratch store
    // without the subject gives; subject 5 untouched, from the SAME store
    "events_2d_erasure"     -> ((s: SparkSession, d: String) =>
      Relational.eventsServed2dErasure(s, d)),
    // batch DSAR erasure: subjects {3,9} in ONE DataFrame request plus a
    // replay and an overlapping {9,11} request — parameter point of the
    // erasure lifecycle (inventory row 167)
    "events_2d_erasure_batch" -> ((s: SparkSession, d: String) =>
      Relational.eventsServed2dErasureBatch(s, d)),
    // as-of point lookup from the pruned z-table file set
    "events_2d_asof"        -> ((s: SparkSession, d: String) =>
      Relational.eventsAsofServed(s, d)),
    // N point-range requests answered by ONE pruned scan + broadcast join
    "events_2d_batch_served" -> ((s: SparkSession, d: String) =>
      Relational.eventsServed2dBatch(s, d)),
    // N as-of lookups from one pruned scan — parameter point of row 172
    "events_2d_asof_batch"  -> ((s: SparkSession, d: String) =>
      Relational.eventsAsofBatch(s, d)),
    // RELATION-shaped batch serve: requests read from a parquet table
    // (the API-queue shape), duplicate request planted — answers once
    "events_2d_batch_rel"   -> ((s: SparkSession, d: String) =>
      Relational.eventsServed2dBatchParquet(s, d)),
    // relation-shaped batch as-of from a parquet request table
    "events_2d_asof_rel"    -> ((s: SparkSession, d: String) =>
      Relational.eventsAsofBatchParquet(s, d)),
    // streaming serving-cache twin of the as-of serve: latest row per
    // (user, horizon) via one flatMapGroupsWithState record — batch
    // mode checks against the same raw-table as-of oracle
    "events_2d_asof_stateful" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val reqs = Seq((3L, "2024-01-20 00:00:00"), (5L, "2024-02-10 12:00:00"))
      val ev0 = graft.sources.Tables.events(s, d).where(col("ts").isNotNull)
      val tagged = reqs.map { case (u, t) =>
        ev0.where(col("user_id") === u &&
            col("ts") <= lit(t).cast("timestamp_ntz"))
          .select(col("user_id"), lit(t).as("horizon"), col("ts"),
            col("event_id"), col("event_type"),
            col("value").cast("double").as("value"))
      }.reduce(_ unionAll _).as[graft.streaming.AsofEvent]
      graft.streaming.StatefulAsof(tagged).toDF()
        .select(col("user_id"), col("horizon"), col("asof_us"),
          col("event_type"), col("value"))
    }),
    "dedup_simhash"         -> ((s: SparkSession, d: String) => NearDup.dedupSimhash(s, d)),
    "ngram_jaccard"         -> ((s: SparkSession, d: String) => NearDup.ngramJaccard(s, d)),
    "dedup_containment"     -> ((s: SparkSession, d: String) => NearDup.dedupContainment(s, d)),
    "dedup_incremental"     -> ((s: SparkSession, d: String) => NearDup.dedupIncremental(s, d)),
    // signature-store ERASURE lifecycle: the corpus split persisted as a
    // durable index, subject docs (id ≡ 8 mod 9) tombstoned — they
    // neither pair nor count toward the hot-bucket cap; ALSO the first
    // entry serving the incremental contract from the durable store
    "dedup_incremental_erased" -> ((s: SparkSession, d: String) =>
      NearDup.dedupIncrementalErased(s, d)),
    // — multimodal plumbing (rows-only) —
    "multimodal_meta"       -> (Multimodal.multimodalMeta _),
    "multimodal_frames"     -> (Multimodal.multimodalFrames _),
    "multimodal_resize"     -> ((s: SparkSession, d: String) => Multimodal.multimodalResize(s, d)),
    "multimodal_features"   -> (Multimodal.multimodalFeatures _),
    // — corpus preparation —
    "build_vocab"           -> ((s: SparkSession, d: String) => Corpus.buildVocab(s, d)),
    "encode_tokens"         -> (Corpus.encodeTokens _),
    "train_test_split"      -> ((s: SparkSession, d: String) => Corpus.trainTestSplit(s, d)),
    "sample_stratified"     -> ((s: SparkSession, d: String) => Corpus.stratifiedSample(s, d)),
    "sample_mixture"        -> ((s: SparkSession, d: String) => Corpus.sampleMixture(s, d)),
    // τ-sampling: targets apportioned over token-count^(1/τ) weights —
    // τ=2 the classic flattening, τ=4 nearly uniform (both sqrt-chains,
    // exact cross-engine; see the scaladoc on why pow() is banned here)
    "sample_temperature"    -> ((s: SparkSession, d: String) =>
      Corpus.sampleTemperature(s, d)),
    "sample_temperature_t4" -> ((s: SparkSession, d: String) =>
      Corpus.sampleTemperature(s, d, tau = 4)),
    "pack_sequences"        -> ((s: SparkSession, d: String) => Corpus.packSequences(s, d)),
    "chunk_documents"       -> ((s: SparkSession, d: String) => Corpus.chunkDocuments(s, d)),
    "decontaminate"         -> ((s: SparkSession, d: String) => Corpus.decontaminate(s, d)),
    // the pure-sketch screening regime: the md5-salted Bloom maybe-set
    // itself, deterministic and oracle-replayed (no exact verify pass —
    // one-sided by design, spec'd against the exact operator)
    "decontaminate_bloom"   -> ((s: SparkSession, d: String) =>
      Corpus.decontaminateBloom(s, d)),
    // the embedding-space complement (paraphrase leakage); blocked on
    // the SEEDED quantizer since r13, so the whole screen — seed choice,
    // argmin assignment, cap, verdicts — is oracle-hash-verified
    "decontaminate_semantic" -> ((s: SparkSession, d: String) =>
      Embeddings.decontaminateSemantic(s, d)),
    // the exact-scan escalation of the above (no k-means blocking, so no
    // blind spot AND no kernel dependence) — oracle-verified like the
    // other exact vector scans
    "decontaminate_semantic_exact" -> ((s: SparkSession, d: String) =>
      Embeddings.decontaminateSemanticExact(s, d)),
    "sample_exact_stratified" -> ((s: SparkSession, d: String) => Corpus.sampleExactStratified(s, d)),
    "quality_perplexity"    -> (Corpus.perplexityScore _),
    // the bigram-interpolated step toward CCNet/KenLM quality filtering
    "quality_perplexity_bigram" -> ((s: SparkSession, d: String) =>
      Corpus.perplexityBigram(s, d)),
    "corpus_shuffle"        -> ((s: SparkSession, d: String) => Corpus.corpusShuffle(s, d)),
    "length_buckets"        -> ((s: SparkSession, d: String) => Corpus.lengthBuckets(s, d)),
    "bigram_counts"         -> ((s: SparkSession, d: String) => Corpus.bigramCounts(s, d)),
    "corpus_stats"          -> ((s: SparkSession, d: String) => Corpus.corpusStats(s, d)),
    "tfidf_keywords"        -> ((s: SparkSession, d: String) => Corpus.tfidfKeywords(s, d)),
    "bigram_pmi"            -> ((s: SparkSession, d: String) => Corpus.bigramPmi(s, d)),
    "search_bm25"           -> ((s: SparkSession, d: String) => Corpus.searchBm25(s, d)),
    // MRR / NDCG@10 of the BM25 ranking vs a deterministic conjunctive-
    // containment relevance oracle — the measured retrieval-eval harness
    "retrieval_eval"        -> ((s: SparkSession, d: String) =>
      Corpus.retrievalEval(s, d)),
    // DPR-style hard-negative mining: per query the top relevant doc
    // (pos) + top-5 non-relevant BM25 hits (neg) — training triples off
    // the same single qid-tagged ranking plan as retrieval_eval
    "mine_hard_negatives"   -> ((s: SparkSession, d: String) =>
      Corpus.mineHardNegatives(s, d)),
    // k=3 parameter point on a different term set: the cut bites at a
    // different rank boundary
    "search_bm25_k3"        -> ((s: SparkSession, d: String) =>
      Corpus.searchBm25(s, d, query = "data stream sort", topK = 3)),
    // no-hit term: EMPTY result, hash-compared like search_entries_none
    "search_bm25_none"      -> ((s: SparkSession, d: String) =>
      Corpus.searchBm25(s, d, query = "zqxjkv")),
    "search_hybrid_rrf"     -> ((s: SparkSession, d: String) =>
      Embeddings.searchHybridRrf(s, d)),
    // durable-lexical-index serving paths: the index is built once per
    // (session, corpus) and both entries read it — BM25 from bucket-
    // pruned postings, the hybrid fusing that leg with the vector leg
    "search_bm25_served"    -> ((s: SparkSession, d: String) =>
      LexIndex.searchBm25Against(s, LexIndex.servedIndexPath(s, d),
        query = "customer window order part", topK = 5)),
    // the lexical store's ERASURE lifecycle (dsar_report's retrieval
    // leg): subject docs (id ≡ 3 mod 7) tombstoned + their mass
    // subtracted from the corpus constants — serving must equal a
    // from-scratch index built without them (two of this query's
    // unerased top five vanish, so the erasure visibly re-ranks)
    "search_bm25_erased"    -> ((s: SparkSession, d: String) =>
      LexIndex.searchBm25Against(s, LexIndex.erasedIndexPath(s, d),
        query = "customer window order part", topK = 5)),
    "search_hybrid_rrf_served" -> ((s: SparkSession, d: String) =>
      Embeddings.searchHybridRrfServed(s, d, LexIndex.servedIndexPath(s, d),
        query = "data stream sort", qvecId = 11)),
    // query-BATCH serving: one pruned postings read for three queries
    // (one of them hitting nothing — its leg is empty)
    "search_bm25_batch"     -> ((s: SparkSession, d: String) =>
      LexIndex.searchBm25BatchAgainst(s, LexIndex.servedIndexPath(s, d),
        Seq(1L -> "spark join window customer", 2L -> "data stream sort",
          3L -> "zqxjkv"), topK = 5)),
    "sample_weighted"       -> ((s: SparkSession, d: String) =>
      Corpus.sampleWeighted(s, d)),
    "corpus_token_budget"   -> ((s: SparkSession, d: String) =>
      Corpus.corpusTokenBudget(s, d)),
    "token_zipf"            -> ((s: SparkSession, d: String) =>
      Corpus.tokenZipf(s, d)),
    "source_jsd"            -> ((s: SparkSession, d: String) =>
      Corpus.sourceJsd(s, d)),
    "bpe_train"             -> ((s: SparkSession, d: String) =>
      Corpus.bpeTrain(s, d)),
    "bpe_encode"            -> ((s: SparkSession, d: String) =>
      Corpus.bpeEncode(s, d)),
    "bpe_fertility"         -> ((s: SparkSession, d: String) =>
      Corpus.bpeFertility(s, d)),
    "dsir_weights"          -> ((s: SparkSession, d: String) =>
      Corpus.dsirWeights(s, d)),
    // param point: a non-en target split exercises the small-target LM
    "dsir_weights_de"       -> ((s: SparkSession, d: String) =>
      Corpus.dsirWeights(s, d, targetLang = "de")),
    "dedup_spans"           -> ((s: SparkSession, d: String) =>
      Corpus.dedupSpans(s, d)),
    // param point: shorter grams collide more — the fraction rises and
    // the whole-doc short-gram rule stops firing for 8..14-token docs
    "dedup_spans_n8"        -> ((s: SparkSession, d: String) =>
      Corpus.dedupSpans(s, d, n = 8)),
    // the DESTRUCTIVE form (Lee '21's intervention): repeated ≥n-token
    // spans excised from every doc, survivors reassembled in order
    "dedup_spans_removal"   -> ((s: SparkSession, d: String) =>
      Corpus.dedupSpansRemoval(s, d)),
    // shorter grams collide more: the n=8 point removes MORE material
    // and the whole-doc rule stops firing for 8..14-token docs
    "dedup_spans_removal_n8" -> ((s: SparkSession, d: String) =>
      Corpus.dedupSpansRemoval(s, d, n = 8)),
    // UniMax water-filling token-budget allocation across sources
    "budget_waterfill"      -> ((s: SparkSession, d: String) =>
      Corpus.budgetWaterfill(s, d)),
    "quality_gopher"        -> ((s: SparkSession, d: String) =>
      TextOps.qualityGopher(s, d)),
    "pii_scan"              -> ((s: SparkSession, d: String) => TextOps.piiScan(s, d)),
    "dedup_cross_source"    -> ((s: SparkSession, d: String) => TextOps.dedupCrossSource(s, d)),
    // maxDocs=2 bites on the synthetic corpus (one text occurs in 3
    // docs); the planted-boilerplate spec drives the multi-line case
    "dedup_lines"           -> ((s: SparkSession, d: String) => TextOps.dedupLines(s, d)),
    // maxDocs=1 parameter point: the threshold bites DIFFERENTLY (any
    // line shared by ≥2 docs is boilerplate — the 3-copy text AND every
    // 2-doc line go), hash-compared like incident_report_cap
    "dedup_lines_md1"       -> ((s: SparkSession, d: String) =>
      TextOps.dedupLines(s, d, maxDocs = 1)),
    // — user-journey analytics —
    "funnel_steps"          -> ((s: SparkSession, d: String) => EventFlows.funnelSteps(s, d)),
    // windowed parameter point: each hop must convert within 1 day —
    // biting at sf0.01 (stage split 90/35/25 vs 0/0/150 unbounded)
    "funnel_steps_1d"       -> ((s: SparkSession, d: String) =>
      EventFlows.funnelSteps(s, d, withinDays = 1)),
    "retention_cohorts"     -> (EventFlows.retentionCohorts _),
    "event_transitions"     -> (EventFlows.eventTransitions _),
    // the streaming twin aggregated to the same relation — batch mode
    // sees each user whole, reproducing lead() exactly, so the SAME
    // oracle checks both (the sessionize_stateful pairing)
    "event_transitions_stateful" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val ev = graft.sources.Tables.events(s, d)
        .where(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .as[graft.streaming.TransEvent]
      EventFlows.transitionProbabilities(
        graft.streaming.StatefulTransitions(ev).toDF())
    }),
    // fixed-budget PageRank over the transition graph; the registered
    // path iterates driver-side under the bounded-graph gate, the _dist
    // twin forces the distributed join-loop — byte-identical (spec'd),
    // so all three share the generated unrolled-CTE oracle
    "pagerank"              -> ((s: SparkSession, d: String) =>
      Graphs.pagerank(s, d)),
    "pagerank_i3"           -> ((s: SparkSession, d: String) =>
      Graphs.pagerank(s, d, iters = 3)),
    "pagerank_dist"         -> ((s: SparkSession, d: String) =>
      Graphs.pagerankFrom(graft.sources.Tables.events(s, d),
        Graphs.DefaultIters, driverCap = 0L)),
    // weighted label propagation: community labels on the undirected
    // transition graph — exact integers + string tie-breaks, no floats;
    // the _dist twin forces the distributed round loop (same oracle)
    "label_propagation"     -> ((s: SparkSession, d: String) =>
      Graphs.labelPropagation(s, d)),
    "label_propagation_dist" -> ((s: SparkSession, d: String) =>
      Graphs.labelPropagationFrom(graft.sources.Tables.events(s, d),
        Graphs.LpaRounds, driverCap = 0L)),
    // degree-ordered triangle counting + local clustering coefficient
    // on the undirected transition graph — all-integer until the one
    // fixed-order clustering ratio
    "graph_triangles"       -> ((s: SparkSession, d: String) =>
      Graphs.triangleCount(s, d)),
    // robust (median/MAD) spike detection — the breakdown-resistant twin
    // of anomaly_spikes; explicit sorted-array medians, no engine
    // percentile semantics in the contract (+ a tighter-k point)
    "anomaly_mad"           -> ((s: SparkSession, d: String) =>
      Series.anomalyMad(s, d)),
    "anomaly_mad_k2"        -> ((s: SparkSession, d: String) =>
      Series.anomalyMad(s, d, k = 2.0)),
    // exponential smoothing over the gap-filled timeline: pinned
    // day-ordered left fold, exact-binary alphas (+ a faster-decay point)
    "metrics_ewma"          -> ((s: SparkSession, d: String) =>
      Series.metricsEwma(s, d)),
    "metrics_ewma_a5"       -> ((s: SparkSession, d: String) =>
      Series.metricsEwma(s, d, alpha = 0.5)),
    // pairwise Pearson r between event types' daily series from exact
    // integer sums (never the engines' merge-order-dependent corr())
    "corr_pairs"            -> ((s: SparkSession, d: String) =>
      Series.corrPairs(s, d)),
    // corpus-level source-pair shingle-set Jaccard — the contamination
    // diagnostic behind held-out-by-source splits; full pair grid
    "source_overlap"        -> ((s: SparkSession, d: String) =>
      TextOps.sourceOverlap(s, d)),
    // ASCII-alphabet char entropy per doc — the gibberish signal next
    // to text_quality's ratios; in-row, zero shuffles
    "text_entropy"          -> ((s: SparkSession, d: String) =>
      TextOps.textEntropy(s, d)),
    // order-3 sequential patterns past event_transitions' bigrams —
    // one user-keyed shuffle onto a |types|^3-bounded relation
    "event_trigrams"        -> ((s: SparkSession, d: String) =>
      EventFlows.eventTrigrams(s, d)),
    // global percentile rank per user WITHOUT a global sort: the
    // count-of-counts histogram decomposition (the oracle runs the
    // naive single-reducer window — same answer, opposite scale story)
    "user_percentiles"      -> ((s: SparkSession, d: String) =>
      Relational.userPercentiles(s, d)),
    // forward-fill (LOCF) imputation of per-level daily value totals
    // over the shared gap-filled day grid
    "metrics_locf"          -> ((s: SparkSession, d: String) =>
      Series.metricsLocf(s, d)),
    // trailing rolling MEDIAN over the zero-filled grid — the robust
    // trend line beside the box mean and the EWMA (+ a 3-day point)
    "metrics_rolling_median" -> ((s: SparkSession, d: String) =>
      Series.metricsRollingMedian(s, d)),
    "metrics_rolling_median_3d" -> ((s: SparkSession, d: String) =>
      Series.metricsRollingMedian(s, d, days = 3)),
    // TPC-H Q6 shape: the pure scan-aggregate benchmark point (zero
    // joins; every predicate must reach PushedFilters)
    "q6_forecast_revenue"   -> ((s: SparkSession, d: String) =>
      Relational.q6ForecastRevenue(s, d)),
    // TPC-H Q10 shape: returned-item revenue per customer, fact⋈fact on
    // the shuffle key, dims broadcast, deterministic top-20
    "q10_top_returns"       -> ((s: SparkSession, d: String) =>
      Relational.q10TopReturns(s, d)),
    // TPC-H Q14 shape: conditional aggregation over a broadcast part
    // join — covers the last untouched dimension table
    "q14_promo_share"       -> ((s: SparkSession, d: String) =>
      Relational.q14PromoShare(s, d)),
    // TPC-H Q4 shape: the EXISTS semi-join (LeftSemi — no fan-out, no
    // DISTINCT repair); ~52% of windowed orders qualify at sf0.01
    "q4_order_priority"     -> ((s: SparkSession, d: String) =>
      Relational.q4OrderPriority(s, d)),
    // TPC-H Q13 shape: outer-join histogram with the filter in the ON
    // clause — zero-order customers stay in the histogram at bucket 0
    "q13_customer_distribution" -> ((s: SparkSession, d: String) =>
      Relational.q13CustomerDistribution(s, d)),
    // TPC-H Q22 shape: scalar-subquery average + LeftAnti dormancy test
    // against the date-pruned orders scan
    "q22_dormant_customers" -> ((s: SparkSession, d: String) =>
      Relational.q22DormantCustomers(s, d)),
    // bucketed interval join: arbitrary [start,end] windows (top-20
    // sessions ±5 min) meet the fact through a bin equi-join + residual
    // range filter — never a nested-loop range join
    "interval_join"         -> ((s: SparkSession, d: String) =>
      JoinOps.intervalJoinEvents(s, d)),
    // exact join-cardinality probe: a prospective join's output size,
    // hottest key, and amplification from the per-key count relations —
    // without materializing one joined row
    "join_size_probe"       -> ((s: SparkSession, d: String) =>
      Relational.joinSizeProbe(s, d)),
    // z-order layout plan: 16×16 equi-depth buckets over (user, day)
    // bit-interleaved into 32 target files — both dimensions' file
    // fan-in bounded (≤4 / ≤8 of 32), which no 1-D sort gives
    "layout_zorder"         -> ((s: SparkSession, d: String) =>
      Relational.layoutZorder(s, d)),
    // CCNet head/middle/tail: per-language perplexity terciles from
    // sampled cutoffs — the LM-based quality split of CCNet/RedPajama
    "ccnet_buckets"         -> ((s: SparkSession, d: String) =>
      Corpus.ccnetBuckets(s, d)),
    // k-anonymity / l-diversity audit over the (event_type, day)
    // quasi-identifier — the pre-release privacy gate next to pii_scan
    "k_anonymity"           -> ((s: SparkSession, d: String) =>
      LogOps.kAnonymity(s, d)),
    // runtime-filter join: a k=2 md5 Bloom over the selective build
    // side's keys prunes the fact SCAN-side before any shuffle; false
    // positives die in the join, so the plain join IS the oracle
    "bloom_pruned_join"     -> ((s: SparkSession, d: String) =>
      JoinOps.bloomPrunedJoin(s, d)),
    // SCD type-2 state history: gaps-and-islands run collapse into
    // validity intervals — the warehouse dimension-history build
    "scd2_intervals"        -> ((s: SparkSession, d: String) =>
      EventFlows.scd2Intervals(s, d)),
    // streaming SCD2 twin (the sessionize_stateful pairing): closed
    // intervals emit on state change, batch mode ≡ the window twin →
    // same oracle
    "scd2_stateful"         -> ((s: SparkSession, d: String) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val ev = graft.sources.Tables.events(s, d)
        .where(col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .as[graft.streaming.Scd2Event]
      graft.streaming.StatefulScd2(ev).toDF()
        .select(col("user_id"), col("state_seq"), col("state"),
          date_format(col("valid_from"),
            "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
          date_format(col("valid_to"),
            "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
          col("n_events"))
    }),
    // small-file compaction planning: ordered day runs coalesced into
    // ~target-row merge groups via an exclusive prefix sum
    "compaction_plan"       -> ((s: SparkSession, d: String) =>
      Relational.compactionPlan(s, d)),
    // dbt/Deequ-style contract gate: referential integrity, key
    // uniqueness, NOT-NULL rates — one row per check
    "dq_checks"             -> ((s: SparkSession, d: String) =>
      Relational.dqChecks(s, d)),
    // lang_id confusion matrix + per-class recall — the measured eval
    // of the classifier the routing operators depend on
    "lang_id_eval"          -> ((s: SparkSession, d: String) =>
      TextOps.langIdEval(s, d)),
    // Naive Bayes quality classifier trained on the Gopher verdict —
    // the closed-form supervised leg of the quality family; the fitted
    // model is an exact integer-count function, fully SQL-replayable
    "quality_nb"            -> ((s: SparkSession, d: String) =>
      Corpus.qualityNb(s, d)),
    // LPA communities over the source-overlap graph — two r16 operators
    // composed through one shared gram relation; edges by the exact
    // integer Jaccard >= 1/10 test
    "source_communities"    -> ((s: SparkSession, d: String) =>
      TextOps.sourceCommunities(s, d)),
    // per-column profiling (row/NULL/exact-distinct counts) — the
    // ANALYZE-TABLE pass, one Expand-based aggregation over the scan
    "profile_events"        -> ((s: SparkSession, d: String) =>
      Relational.profileEvents(s, d)),
    "profile_documents"     -> ((s: SparkSession, d: String) =>
      Relational.profileDocuments(s, d))
  )

  /** The NRQL-ingest oracle at a parameter point (mirror of
    * [[graft.operators.LogOps.ingestErrors]]'s window/filter/limit). */
  /** Shared by `sessionize` and `sessionize_native` — the window-function
    * and built-in session_window plans must agree session-for-session. */
  /** Shared by the window and stateful SCD2 twins (both reproduce the
    * same island collapse; the stateful twin emits the identical rows
    * in batch mode). */
  private def scd2Oracle: String =
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

  private def sessionizeOracle: String =
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
  private def anomalySpikesOracle: String = anomalySpikesSql(3.0)

  private def anomalySpikesSql(sigma: Double): String =
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
  private def multimodalCtes: String =
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

  private def ingestErrorsSql(sinceTs: String, untilTs: String,
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
  private def searchEntriesSql(level: String, userLike: String,
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
  private def searchBm25Sql(query: String, topK: Int,
      k1: Double = 1.2, b: Double = 0.75, docsWhere: String = ""): String =
    s"""WITH ${bm25Ctes(query, topK, k1, b, docsWhere)}
       |SELECT doc_id, n_terms, score, rk FROM bm25r""".stripMargin

  /** The BM25 CTE chain ending in `bm25r` (the ranked, topK-limited
    * lexical relation) — shared by the standalone oracle and the hybrid
    * fusion oracle. */
  private def bm25Ctes(query: String, topK: Int,
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
  private def retrievalRankRelCtes(qs: Seq[(Long, String)],
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

  private def retrievalEvalSql(qs: Seq[(Long, String)], topK: Int): String = {
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
  private def searchBm25BatchSql(qs: Seq[(Long, String)], topK: Int): String =
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
  private def searchHybridRrfSql(query: String, qvecId: Long, topL: Int,
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
  private def reportCtes(maxLines: Int): String =
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
  private def cosSql(a: String, b: String): String =
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
  private def seededAssignCte: String =
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
  private def pqM = graft.operators.Embeddings.PqM
  private def pqSubDim = graft.operators.Embeddings.EmbeddingDim / pqM

  /** Subspace L2² between 1-based inclusive slices of two DOUBLE[]
    * columns, zip−subtract−dot — PqKernels' sequential accumulation
    * order exactly. Expects a subspace relation aliased `s`. */
  private def pqDistSql(a: String, b: String): String = {
    val d = pqSubDim
    val diff = s"list_transform(list_zip($a[(s.s*$d+1):(s.s*$d+$d)], " +
      s"$b[(s.s*$d+1):(s.s*$d+$d)]), x -> x[1] - x[2])"
    s"list_dot_product($diff, $diff)"
  }

  /** The m conditional-aggregation ADC terms (one per subspace). */
  private def pqTermsSql: String = (0 until pqM).map(s =>
    s"max(CASE WHEN l.s = $s THEN l.qdist END) AS t$s").mkString(",\n      |         ")

  /** The kernel's ascending-s ADC accumulation as an explicit
    * left-associative sum chain. */
  private def pqAdcSumSql: String = (0 until pqM).map(s => s"t$s").mkString(" + ")

  private def annPqSql: String = {
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
  private def seededIvfSql(cappedWhere: String = ""): String =
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

  private def annIvfPqSql: String = {
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
  private def annLshSql(hammingProbes: Int): String = {
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

  private def incidentReportSql(maxLines: Int): String =
    reportCtes(maxLines) +
    """
      |SELECT c.day, c.n_incidents, r.report
      |FROM c LEFT JOIN r USING (day)""".stripMargin

  private def searchAllSql(keyword: String, maxLines: Int = 1000): String =
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
  private lazy val minhashPermValues: String =
    (0 until 128).map(j =>
      s"($j, ${graft.expressions.SigUtil.coefA(j)}, ${graft.expressions.SigUtil.coefB(j)})")
      .mkString(", ")

  /** Signature-building CTEs shared by every minhash oracle: `shingleCte`
    * must yield sh(doc_id, shingle) from t(doc_id, text); minima come
    * from the md5 + mod-(2^61−1) affine family (same coefficients as the
    * kernel), band keys group `rowsPerBand` consecutive minima over the
    * first `keyPerms` permutations. */
  private def sigCtes(shingleCte: String, rowsPerBand: Int, keyPerms: Int): String =
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
  private def simsCtes: String =
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
  private def lshSummarySql(shingleCte: String, rowsPerBand: Int,
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
  private def word3LabelCtes: String =
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
  private def minhashCalibrationSql: String =
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

  private def dedupClustersSql: String =
    s"""WITH RECURSIVE $word3LabelCtes,
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.id AS doc_id, l.cluster AS cluster_id, s.cluster_size, l.id = l.cluster AS is_canonical
       |FROM lab l JOIN sz s ON s.cluster = l.cluster""".stripMargin

  private def trainTestSplitSql: String =
    s"""WITH RECURSIVE $word3LabelCtes
       |SELECT id AS doc_id, cluster AS cluster_id,
       |       CASE WHEN md5_number_lower(CAST(cluster AS VARCHAR)) % 100 < 80
       |            THEN 'train' ELSE 'test' END AS split
       |FROM lab""".stripMargin

  /** The incremental-dedup derivation; `corpusWhere` restricts the INDEX
    * side only — the erasure twin drops the subjects before the matched
    * set (and therefore before the hot-bucket count), exactly where the
    * store's tombstone anti-join runs. */
  private def dedupIncrementalSql(corpusWhere: String = ""): String =
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

  private def docFingerprintSql: String =
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

  private def sampleStratifiedSql: String =
    """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
      |       user_id, event_type, value, props
      |FROM events
      |WHERE md5_number_lower('42:' || CAST(event_id AS VARCHAR)) % 1000 < 100""".stripMargin

  /** Word 3-shingles (distinct, short docs collapse to one shingle). */
  private def word3ShingleCte: String =
    """tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |        FROM t WHERE text IS NOT NULL),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, CASE WHEN len(ts) < 3 THEN array_to_string(ts, ' ')
      |         ELSE ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] END AS shingle
      |    FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts)-1, 2))) AS i FROM tok)))""".stripMargin

  /** Character 5-grams (code-point positions, distinct, short docs whole). */
  private def char5ShingleCte: String =
    """sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id, CASE WHEN length(lt) < 5 THEN lt ELSE substr(lt, i, 5) END AS shingle
      |    FROM (SELECT doc_id, lower(text) AS lt,
      |                 unnest(range(1, greatest(length(lower(text))-3, 2))) AS i
      |          FROM t WHERE text IS NOT NULL)))""".stripMargin

  private def dedupSimhashSql: String =
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

  private def dedupContainmentSql: String =
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
  private def ragCtes: String =
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

  private def ragContextSql: String = ragCtes + "\nSELECT * FROM ctx"

  private def ragPromptSql: String = ragCtes +
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
  private def bpeCtes(merges: Int): String = {
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

  private def bpeTrainSql(merges: Int): String =
    bpeCtes(merges) + "\n" + (1 to merges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank, lft, rgt,
         |       lft || rgt AS merged, cnt FROM m$k""".stripMargin
    }.mkString("\nUNION ALL\n")

  private def bpeEncodeSql(merges: Int): String =
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

  private def bpeFertilitySql(merges: Int): String =
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
  private def dsirWeightsSql(lang: String): String =
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
  private def dedupSpansSql(n: Int): String =
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
  private def dedupSpansRemovalSql(n: Int): String =
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
  def oracleSql: Map[String, String] = Map(
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
  ) ++ oracleSqlRest

  private def approxDistinctSql: String =
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

  private def oracleSqlRest: Map[String, String] = Map(
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

  /** The unrolled label-propagation round chain over CTEs `sym`
    * (u, v, w) and `l0` (node, label) — shared by the transition-graph
    * LPA oracle and the source-communities oracle. */
  private def lpaStepCtes(rounds: Int): String =
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
  private def lpaOracle(rounds: Int): String = {
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
  private def sourceCommunitiesOracle(rounds: Int): String = {
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
  private def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Generated median/MAD anomaly oracle at sensitivity k (see the
    * "anomaly_mad" entry). */
  private def anomalyMadSql(k: Double): String =
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
  private def ewmaSql(alpha: Double): String =
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
  private def rollingMedianSql(days: Int): String =
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
  private def pagerankOracle(iters: Int): String = {
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
  private def perplexityBigramSql(lambda: Double): String = {
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
  private def equidepthBucketsSql(buckets: Int, k: Int): String = {
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
  private def sampleTemperatureSql(tau: Int, total: Int): String = {
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

  private def dedupExactOracle: String =
    """SELECT md5(text) AS fp, min(doc_id) AS first_doc_id,
      |       count(*) AS n_copies, min(n_chars) AS n_chars
      |FROM documents GROUP BY md5(text)""".stripMargin

  private def transitionsOracle: String =
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
