package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{TextFns, VecFns}

/** Embedding + similarity-search operators (SURVEY.md §2 rows 10-12, 25-28).
  *
  * The reference embeds log text with a sentence-transformer and searches a
  * FAISS IndexFlatL2 (/root/reference/src/embedding/embedder.py:22-30,
  * /root/reference/src/vector_db/faiss_db.py:49-62). The model itself is an
  * external artifact (like the LLM), so here the encoder is a deterministic
  * feature-hashing embedder — the Spark-side contract (schema, batching,
  * normalization, search) is the real thing.
  *
  * Scale design: query batches are always the small side and are
  * `broadcast()` so the corpus never shuffles for a search; the IVF variant
  * turns ANN into an equi-join on centroid ids, which partitions cleanly at
  * any corpus size.
  */
object Embeddings {
  val Dim = 64

  /** Feature-hashing text encoder: tokens hash to one of `dim` slots with a
    * ±1 sign hash (hashing trick), then L2-normalize — a native one-pass
    * expression ([[graft.expressions.FeatureHashEmbed]]), so embedding
    * 100 TB of text is a pure scan, no shuffle, O(tokens + dim) per row.
    */
  def embedCol(text: Column, dim: Int = Dim): Column = {
    val toks = TextFns.wsTokens(TextFns.foldCase(text))
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.FeatureHashEmbed(
        org.apache.spark.sql.graft.Bridge.expression(toks), dim))
  }

  /** [[embedCol]]'s pre-normalization integer slot counts — the form an
    * SQL oracle can rebuild exactly (slot = md5_number_lower(tok) mod dim,
    * sign = md5_number_upper(tok) & 1) and the form exact-rank consumers
    * use so their float expressions mirror the oracle's one-for-one. */
  def embedCounts(text: Column, dim: Int = Dim): Column = {
    val toks = TextFns.wsTokens(TextFns.foldCase(text))
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.FeatureHashCounts(
        org.apache.spark.sql.graft.Bridge.expression(toks), dim))
  }

  /** embedder.embed_logs: encode the configured fields, keep the id for
    * metadata join-back. The field list comes from config exactly like the
    * reference's `EMBEDDING_FIELDS` comma-list (embedder.py:14,20-21) —
    * default "text,source" on the documents corpus — and `concat_ws`
    * mirrors `_get_text`'s skip-missing-fields join (a NULL field
    * contributes nothing, it doesn't NULL the row).
    *
    * Output is driver-hashable scalars — dim, rounded L1 mass, and a
    * stable digest of the integer count vector — not the raw array (the
    * driver's row-sort can't order array cells). The raw embedding column
    * is [[embedCol]], which every downstream ANN operator consumes
    * directly. The digest is md5 over the comma-joined slot counts and
    * l1_mass is Σ|c|/√(Σc²) — both integer-derived with one mirrored
    * float step, so the DuckDB oracle reproduces them hash-exactly.
    */
  def embedText(spark: SparkSession, dir: String,
      cfg: graft.pipeline.GraftConfig = graft.pipeline.GraftConfig()): DataFrame = {
    val fields = cfg.embedFields.split(",").map(_.trim).filter(_.nonEmpty)
    require(fields.nonEmpty, s"embedFields must name at least one column: '${cfg.embedFields}'")
    // at-least-once delivery collapses to the distinct document entity
    // before embedding (same contract as the RAG consumers) — one
    // embedding row per document, not per delivered copy; distinctEntities
    // so the feature-hash kernel below fans out (Shuffles.scala)
    graft.operators.Shuffles.distinctEntities(
        Tables.documents(spark, dir)
          .select(col("doc_id") +: fields.map(col).toIndexedSeq: _*))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.Bridge.column(
          graft.expressions.FeatureHashMeta(
            org.apache.spark.sql.graft.Bridge.expression(
              TextFns.wsTokens(TextFns.foldCase(
                concat_ws(" ", fields.map(col).toIndexedSeq: _*)))),
            cfg.embedDim)).as("m"))
      .select(col("doc_id"),
        lit(cfg.embedDim).as("dim"),
        when(col("m.sum_sq") > 0,
          round(col("m.sum_abs").cast("double") / sqrt(col("m.sum_sq").cast("double")), 6))
          .otherwise(lit(0.0)).as("l1_mass"),
        md5(col("m.counts_csv")).as("emb_sig"))
  }

  /** The index dimensionality — explicit config, mirroring the reference's
    * `faiss.IndexFlatL2(dimension)` (faiss_db.py:37-40): FAISS refuses
    * off-dimension vectors at add() time, and so do we, at scan time.
    * Same dimension the embedder emits ([[Dim]]) — one model, one index. */
  private[graft] val EmbeddingDim = Dim

  /** A vector participates in similarity/clustering iff it has the index
    * dimensionality and every element is a finite non-NULL number. A
    * corrupt embedding (NaN/Inf element, NULL element, truncated or empty
    * list) would otherwise CRASH the ML k-means fit ("Vector values MUST
    * NOT be NaN or Infinity") or poison distance ranks — and the oracle's
    * list kernels reject it outright. One native codegen'd pass at the
    * scan ([[graft.expressions.VecIsValid]]): no extra job, and the
    * corpus scan stays inside whole-stage codegen. The oracle twin is the
    * identical WHERE over len() + list_filter(isnan/isfinite/IS NULL). */
  private[graft] def validEmb(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.VecIsValid(
        org.apache.spark.sql.graft.Bridge.expression(c), EmbeddingDim))

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .where(col("embedding").isNotNull && validEmb(col("embedding")))
      .select(col("vec_id"), VecFns.toDouble(col("embedding")).as("emb"), col("label"))

  /** FAISS IndexFlatL2 search semantics (faiss_db.py:49-62): exact top-k by
    * squared L2 per query, metadata joined back, distance in the output.
    * The 32-query batch is broadcast; the corpus scan never shuffles —
    * the only shuffle is the per-query rank on k·|queries| rows.
    */
  def vectorKnn(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val q = c.where(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val byQ = Window.partitionBy("qid").orderBy(col("distance"), col("vec_id"))
    c.crossJoin(broadcast(q))
      .withColumn("distance", round(VecFns.l2sq(col("emb"), col("qemb")), 6))
      .withColumn("rk", row_number().over(byQ).cast("long"))
      .where(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("vec_id"), col("distance"), col("label"))
  }

  /** Brute-force cosine top-k — the exact ANN baseline. Normalized corpus,
    * broadcast queries, dot product = cosine. */
  def annCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
      .select(col("vec_id"), VecFns.l2Normalize(col("emb")).as("emb"), col("label"))
    val q = c.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val byQ = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    c.where(col("vec_id") >= 100)
      .crossJoin(broadcast(q))
      .withColumn("sim", round(VecFns.dot(col("emb"), col("qemb")), 6))
      .withColumn("rk", row_number().over(byQ).cast("long"))
      .where(col("rk") <= 10)
      .select(col("qid"), col("rk"), col("vec_id"), col("sim"))
  }

  /** Hybrid lexical+vector retrieval by reciprocal-rank fusion — the
    * standard production composition of the two retrieval stages this
    * engine already serves (BM25 = search_bm25, exact cosine =
    * ann_cosine_topk): each leg contributes 1/(rrfK + rank) for the docs
    * it ranks in its top-L, fused score = lexical term + vector term.
    * RRF needs only RANKS, never score calibration across legs — which
    * is also what makes it oracle-exact: the fused score is a two-term
    * sum of reciprocals of integer-valued doubles in one pinned order.
    *
    * Scale shape: each leg is itself a bounded distributed top-L
    * (TakeOrderedAndProject); the fusion joins two ≤L-row relations —
    * nothing corpus-sized ever reaches the fusion stage, so the operator
    * costs exactly its legs. A missing/invalid query vector degrades to
    * the lexical leg alone (empty vector side, same contract both
    * engines). Ties rank by (rounded score desc, doc_id). */
  def searchHybridRrf(spark: SparkSession, dir: String,
      query: String = "spark join window customer", qvecId: Long = 7,
      topL: Int = 50, topK: Int = 10, rrfK: Int = 60): DataFrame =
    hybridRrfWithLex(spark, dir,
      Corpus.searchBm25(spark, dir, query = query, topK = topL),
      qvecId, topL, topK, rrfK)

  /** [[searchHybridRrf]] with the lexical leg SERVED from a persisted
    * [[LexIndex.writeLexIndex]] store instead of a corpus scan — the
    * serving-path composition (both legs bounded; the lexical one now
    * partition-pruned postings reads only). Served BM25 is bit-identical
    * to the scan path, so the fusion shares the hybrid oracle. */
  def searchHybridRrfServed(spark: SparkSession, dir: String,
      lexPath: String, query: String = "spark join window customer",
      qvecId: Long = 7, topL: Int = 50, topK: Int = 10,
      rrfK: Int = 60): DataFrame =
    hybridRrfWithLex(spark, dir,
      LexIndex.searchBm25Against(spark, lexPath, query, topK = topL),
      qvecId, topL, topK, rrfK)

  private def hybridRrfWithLex(spark: SparkSession, dir: String,
      lexTop: DataFrame, qvecId: Long, topL: Int, topK: Int,
      rrfK: Int = 60): DataFrame = {
    val lex = lexTop.select(col("doc_id"), col("rk").as("lex_rk"))
    val c = corpus(spark, dir)
      .select(col("vec_id"), VecFns.l2Normalize(col("emb")).as("emb"))
    val q = c.where(col("vec_id") === qvecId).select(col("emb").as("qemb"))
    val vec = c.crossJoin(broadcast(q))
      .withColumn("sim", round(VecFns.dot(col("emb"), col("qemb")), 6))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topL)
      // bounded: ranks only the ≤topL rows the limit just kept
      .withColumn("vec_rk", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("vec_rk"))
    val kD = lit(rrfK.toDouble)
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rk"), col("vec_rk"),
        round(
          coalesce(lit(1.0) / (kD + col("lex_rk").cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (kD + col("vec_rk").cast("double")), lit(0.0)),
          6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
      // bounded: ranks only the ≤topK rows the limit just kept
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
  }

  /** Coarse-quantizer training set cap: k-means cost is O(train·k·iters),
    * so at 100 TB the fit runs on a bounded uniform sample — centroid
    * quality converges long before 10⁵ points. */
  private val MaxKMeansTrain = 100000

  /** Hot-bucket cap (mirror of NearDup.MaxBucket): a skewed centroid
    * bucket makes within-bucket work quadratic; candidates beyond the cap
    * are dropped deterministically (by vec_id). Expected bucket size at
    * k=√N is √N, so the cap only engages on pathological skew. */
  private[graft] val MaxIvfBucket = 1024

  /** K-means coarse quantizer shared by the IVF operators. `k <= 0` picks
    * √N centroids (floored at 16) from a cheap metadata count; training
    * runs on a ≤[[MaxKMeansTrain]]-row sample via MLlib; assignment is a
    * broadcast argmin over k centroids — the corpus scan stays
    * shuffle-free.
    */
  /** Session-scoped memo of the persisted IVF assignment: ann_ivf and
    * dedup_embedding share one k-means fit + assignment per corpus instead
    * of each training their own. Release via [[releaseCache]]. */
  private val ivfMemo = new scala.collection.concurrent.TrieMap[
    (SparkSession, String, Int), (DataFrame, DataFrame)]

  /** Unpersist and drop every IVF assignment and LSH signature base cached
    * for `spark`. */
  def releaseCache(spark: SparkSession): Unit = {
    ivfMemo.filterInPlace { case ((s, _, _), (assigned, _)) =>
      if (s eq spark) { assigned.unpersist(); false } else true
    }
    seededMemo.filterInPlace { case ((s, _), (assigned, _)) =>
      if (s eq spark) { assigned.unpersist(); false } else true
    }
    lshMemo.filterInPlace { case ((s, _), df) =>
      if (s eq spark) { df.unpersist(); false } else true
    }
  }

  private[operators] def ivfAssign(spark: SparkSession, dir: String, k: Int = 0)
      : (DataFrame, DataFrame) = {
    // evict entries of stopped sessions (see NearDup.memoBase)
    ivfMemo.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    ivfMemo.getOrElseUpdate((spark, dir, k), ivfAssignFrom(corpus(spark, dir), k))
  }

  /** Direct (non-memoized) fit over an arbitrary corpus. The returned
    * assignment is PERSISTED and owned by the caller: it is not in
    * ivfMemo, so [[releaseCache]] cannot free it — unpersist it (or let
    * the session end) when done. Spec fixtures and probes accept the
    * session-lifetime pin; production paths go through [[ivfAssign]]. */
  private[graft] def ivfAssignFrom(c: DataFrame, k: Int = 0)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = c.sparkSession
    val n = c.count()
    // an empty corpus (an empty increment, a fully-filtered partition) has
    // nothing to fit — the ML k-means throws from its summarizer; the
    // coherent IVF of nothing is an empty assignment with no centroids
    if (n == 0L) {
      val assigned = c.select(col("vec_id"), col("emb"), col("label"),
        lit(0).as("bucket")).persist()
      val centDf = spark.createDataFrame(
        Seq.empty[(Int, Array[Double])]).toDF("bucket", "cemb")
      return (assigned, centDf)
    }
    val feat = c.withColumn("features", array_to_vector(col("emb")))
    val trainFrac = MaxKMeansTrain.toDouble / n
    val train = if (trainFrac < 1.0) feat.sample(withReplacement = false, trainFrac, 42) else feat
    // k can never exceed the number of TRAINING points: the ML fit
    // crashes outright (ArrayIndexOutOfBounds) when asked for more
    // centers than it has rows — a 3-row corpus must fit 3 centers, not
    // the 16-center floor, and an explicit k above the ~MaxKMeansTrain
    // sample must clamp to the sample's ACTUAL size (Bernoulli sampling
    // jitters around the mean, so the count is materialized — only on
    // the absurd-k path; the √N default can never reach it)
    val kk0 = if (k > 0) k.toLong
      else math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt).toLong
    val cap = if (trainFrac < 1.0 && kk0 > MaxKMeansTrain / 2) train.count() else n
    val kk = math.min(kk0, cap).toInt
    val model = new KMeans().setK(kk).setSeed(42).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("bucket").fit(train)
    // consumers reference the assignment several times (probe join sides,
    // near-dup pair sides) — persist so assignment runs once.
    // distinctEntities: at-least-once delivery collapses to ONE assignment
    // row per vector entity (a redelivered copy would otherwise emit one
    // output row per delivered copy in every IVF consumer — the
    // id-equality guards already prevent false dup flags). The collapse
    // sits in the assignment, not before the FIT: an approximate
    // quantizer tolerates redelivery weighting its sample, and collapsing
    // here rides the persisted plan for free instead of forcing an extra
    // persist/materialize cycle around the ~12 k-means jobs (which
    // re-read their input per job). Byte-identical on a clean corpus.
    // Cache compacted to a size-proportionate partition count (same
    // policy and rationale as NearDup.memoBase — every consumer re-read
    // pays one task per cached partition); n is already counted above.
    // CONDITIONAL, like memoBase: distinctEntities already leaves the
    // relation at `conf` partitions, so when the corpus is big enough
    // that parts == conf, a second repartition would be a full extra
    // shuffle of the corpus-sized assignment that changes nothing.
    val conf = spark.sessionState.conf.numShufflePartitions
    val parts = math.max(1L, math.min(conf.toLong, n / 50000L + 1L)).toInt
    val distinctAssigned = Shuffles.distinctEntities(
      model.transform(feat)
        .select(col("vec_id"), col("emb"), col("label"), col("bucket")))
    val assigned =
      (if (parts < conf) distinctAssigned.repartition(parts)
       else distinctAssigned).persist()
    val cents = model.clusterCenters.toSeq.zipWithIndex.map { case (v, i) => (i, v.toArray) }
    val centDf = spark.createDataFrame(cents).toDF("bucket", "cemb")
    (assigned, centDf)
  }

  /** Deterministic per-bucket candidate cap (keep-first-N by id) — one
    * partition-local window on the bucket key (the same shuffle the
    * candidate equi-join needs anyway, so AQE coalesces them into one
    * exchange). Keep-first, not drop-bucket: a query whose only collisions
    * land in a hot bucket must still get candidates. */
  private def capBucket(df: DataFrame, idCol: String,
      bucketCol: String = "bucket"): DataFrame = {
    val byBucket = Window.partitionBy(bucketCol).orderBy(col(idCol))
    df.withColumn("__bn", row_number().over(byBucket))
      .where(col("__bn") <= MaxIvfBucket)
      .drop("__bn")
  }

  /** nprobe policy. A FIXED nprobe probes nprobe/k of the centroid list,
    * and k grows as √N — so with corpus growth a fixed setting probes a
    * VANISHING fraction of the index and recall silently decays (measured
    * in RecallFloorSpec: recall@10 at nprobe=8 is 0.79 at sf0.01 where
    * 8/k ≈ 35%, and materially lower at sf0.1 where 8/k ≈ 11%). This does
    * not happen to the LSH/MinHash/SimHash banding paths, whose per-pair
    * collision probability is corpus-free.
    *
    * `nprobe <= 0` therefore selects the RECALL-STABLE policy: probe
    * ⌈[[NprobeFraction]]·k⌉ centroids (floored at [[NprobeFloor]]), so
    * the probed-bucket fraction — and with it recall, for a stationary
    * embedding distribution — holds roughly constant as the corpus grows.
    * The cost trade is explicit: recall-stable probing scores ~frac·N
    * candidates per query (linear in corpus, like the exact scan but
    * frac≈¼ of it and still shuffle-free), while a FIXED nprobe scores
    * ~nprobe·√N (sub-linear — the latency-stable serving mode, available
    * by passing nprobe explicitly). One knob, both regimes, measured in
    * RecallFloorSpec and the ScaleProbe ivf points. */
  private[graft] val NprobeFloor = 8
  private[graft] val NprobeFraction = 0.25
  private[graft] def autoNprobe(k: Long): Int =
    math.max(NprobeFloor, math.ceil(k * NprobeFraction).toInt)

  /** Per-query probe relation: the `nprobe` L2-nearest centroids of each
    * query — a crossJoin against the k-row broadcast centroid relation,
    * never against the corpus. */
  private def probesOf(q: DataFrame, centDf: DataFrame, nprobe: Int): DataFrame = {
    val byQc = Window.partitionBy("qid").orderBy(col("cdist"), col("bucket"))
    q.crossJoin(broadcast(centDf))
      .withColumn("cdist", VecFns.l2sq(col("qemb"), col("cemb")))
      .withColumn("crk", row_number().over(byQc))
      .where(col("crk") <= nprobe)
      .select(col("qid"), col("qemb"), col("bucket"))
  }

  /** Rank candidates within the probed buckets — the shared back half of
    * [[annIvf]] and [[annIvfAgainst]]: bucket equi-join against the
    * broadcast probe relation, exact cosine, per-query top-k. */
  private def rankProbed(assigned: DataFrame, probes: DataFrame,
      topK: Int): DataFrame = {
    val byQ = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    capBucket(assigned, "vec_id").join(broadcast(probes), "bucket")
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(VecFns.cosine(col("emb"), col("qemb")), 6))
      .withColumn("rk", row_number().over(byQ).cast("long"))
      .where(col("rk") <= topK)
      .select(col("qid"), col("rk"), col("vec_id"), col("sim"))
  }

  /** IVF ANN: probe the nearest centroids per query, then rank only
    * within those buckets — an equi-join on bucket id instead of a
    * corpus-wide cross join.
    *
    * No residual re-rank stage, deliberately: this index stores FULL
    * vectors and already ranks candidates by exact cosine, so a re-rank
    * would recompute identical scores (residual re-rank buys recall only
    * under PQ/SQ compression, where the first-pass scores are lossy).
    * Recall loss here comes solely from probe misses; with the corpus
    * unit-norm (embedCol L2-normalizes), L2-nearest centroids ARE the
    * cosine-nearest directions, so the probe geometry is already aligned
    * with the ranking metric. The remaining recall lever is `nprobe` —
    * default `0` = the recall-stable fraction-of-k policy (see
    * [[autoNprobe]]); pass an explicit value for latency-stable serving.
    */
  def annIvf(spark: SparkSession, dir: String, k: Int = 0, nprobe: Int = 0): DataFrame = {
    val (assigned, centDf) = ivfAssign(spark, dir, k)
    val q = assigned.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    ivfSearchOn(assigned, centDf, q, nprobe)
  }

  /** The search core over an existing assignment — queries are explicit
    * (qid, qemb); `nprobe <= 0` = the [[autoNprobe]] policy. Exposed for
    * the scale probes, which fit once and search at several settings. */
  private[graft] def ivfSearchOn(assigned: DataFrame, centDf: DataFrame,
      q: DataFrame, nprobe: Int = 0, topK: Int = 10): DataFrame = {
    val eff = if (nprobe > 0) nprobe else autoNprobe(centDf.count())
    rankProbed(assigned, probesOf(q, centDf, eff), topK)
  }

  // ---- deterministic seeded quantizer ---------------------------------

  /** Seeded-sample coarse quantizer: IVF with deterministically SAMPLED
    * centroids instead of a k-means fit — equivalently, k-means at zero
    * iterations. Centroids are the k corpus vectors with the smallest
    * md5(vec_id) (a seeded uniform sample BOTH engines can name;
    * density-adaptive, since dense regions contribute proportionally
    * more sample points), bucket id = md5 rank. Everything downstream —
    * probe selection, hot-bucket cap, in-bucket cosine rank — is the
    * SAME machinery as the fitted path, but the whole operator is now a
    * pure function of the corpus, so the DuckDB oracle replays it
    * value-for-value where the k-means path is rows-only by nature.
    *
    * The trade is centroid quality: a sample doesn't minimize
    * within-bucket variance, so recall at equal nprobe sits a few points
    * below the fitted quantizer (measured side-by-side in
    * RecallFloorSpec). The fitted path stays the ANN quality default;
    * this is the reproducibility/verifiability point on the same curve —
    * and at 100 TB it also skips the k-means fit entirely (the seed
    * selection is one distributed top-k, no iterations).
    *
    * Degeneracy to know: a pair where BOTH members are sampled as seeds
    * always splits (each is its own zero-distance centroid) — where
    * k-means would merge them into one center. At k=√N the probability
    * for a given pair is k²/N² = 1/N (vanishing at scale, and nprobe>1
    * re-finds such neighbors in the ANN path anyway), but on toy corpora
    * where k approaches n the quantizer degrades toward no-blocking —
    * specs pass an explicit small k. */
  /** Seed-count ceiling: √N grows unbounded with the corpus, but the
    * centroid relation must stay broadcast- and driver-sized (65536 ×
    * 64 doubles ≈ 34 MB — the MaxExactEval class of explicit cap). At
    * 100 TB this bounds per-bucket size growth to N/65536 instead of
    * √N; raise k explicitly (sharded probing) when bucket volume
    * matters more than centroid-relation size. Mirrored as `least(k,
    * 65536)` in the oracle's kk CTE. */
  private[graft] val MaxSeeds = 65536L

  private[graft] def seededAssign(c0: DataFrame, k: Int = 0): (DataFrame, DataFrame) = {
    val spark = c0.sparkSession
    // at-least-once delivery collapses BEFORE seed selection: a
    // redelivered vector must not occupy two centroid (or, downstream,
    // codebook) slots — the oracle mirrors with SELECT DISTINCT in the
    // shared corpus CTE, and k counts entities, not delivered copies.
    // Persisted for the BUILD only: the count, the seed TakeOrdered,
    // and the assignment each reference it, and without the pin each
    // would re-run the distinct shuffle; released once the assignment
    // is materialized.
    val c = Shuffles.distinctEntities(
      c0.select(col("vec_id"), col("emb"), col("label"))).persist()
    try {
      val n = c.count()
      if (n == 0L) {
        val assigned = c.select(col("vec_id"), col("emb"), col("label"),
          lit(0).as("bucket")).persist()
        return (assigned, spark.createDataFrame(
          Seq.empty[(Int, Array[Double])]).toDF("bucket", "cemb"))
      }
      val kk = if (k > 0) math.min(k.toLong, n).toInt
        else math.min(MaxSeeds, math.min(n,
          math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong))).toInt
      // md5 mod 2^61-1 (the signature family's modulus), NOT the raw
      // md5_number_lower: the kernel returns the SIGNED reinterpretation
      // while the oracle's native value is unsigned, so a raw ORDER BY
      // would disagree for digests ≥ 2^63 — the unsigned-mod form orders
      // identically on both engines (all values < 2^61)
      val md5OfId = org.apache.spark.sql.graft.Bridge.column(
        graft.expressions.Md5LowerMod(org.apache.spark.sql.graft.Bridge.expression(
          col("vec_id").cast("string")), graft.expressions.SigUtil.P))
      // distributed TakeOrdered picks the k seeds; they are COLLECTED
      // into a LocalRelation (≤MaxSeeds rows — the pqCodebook / frozen-
      // bounds class of driver bound, sorted driver-side so bucket ids
      // never depend on collect order): every later centroid reference
      // (probe joins, autoNprobe counts) is then free instead of
      // re-running the distinct+TakeOrdered pipeline
      val seedRows = c.select(col("vec_id"), col("emb"), md5OfId.as("m"))
        .orderBy(col("m"), col("vec_id")).limit(kk)
        .collect()
        .sortBy(r => (r.getLong(2), r.getLong(0)))
      val cents = spark.createDataFrame(
        seedRows.toIndexedSeq.zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Double](1).toArray) }).toDF("bucket", "cemb")
      // NOT cache-compacted, deliberately (r20 — measured): consumers
      // run KERNEL-heavy scans directly over this cache (ann_pq's ADC
      // pass, the in-bucket cosine ranks), so the distinctEntities
      // fan-out doctrine applies — a size-proportionate re-pin
      // serialized ann_pq's ADC scan onto one core (1.1 s -> 5.7 s in
      // the bench) and was reverted.
      val assigned = assignDistinct(c, cents).persist()
      assigned.count() // materialize so the build scaffold can be freed
      (assigned, cents)
    } finally { c.unpersist(); () }
  }

  /** Session memo of the seeded assignment (decontaminate_semantic and
    * ann_ivf_seeded share it), mirroring [[ivfAssign]]. */
  private val seededMemo = new scala.collection.concurrent.TrieMap[
    (SparkSession, String), (DataFrame, DataFrame)]

  private[graft] def seededAssignFor(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    seededMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    seededMemo.getOrElseUpdate((spark, dir), seededAssign(corpus(spark, dir)))
  }

  /** IVF ANN over the seeded quantizer — same probe/cap/rank machinery
    * as [[annIvf]], oracle-hash-verified end to end (the one ANN path
    * where even the BLOCKING geometry is replayed in SQL). */
  def annIvfSeeded(spark: SparkSession, dir: String, nprobe: Int = 0): DataFrame = {
    val (assigned, cents) = seededAssignFor(spark, dir)
    val q = assigned.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    ivfSearchOn(assigned, cents, q, nprobe)
  }

  private val erasedIvfMemo = scala.collection.concurrent.TrieMap.empty[
    (SparkSession, String), String]

  /** Store for `ann_ivf_erased`: the SEEDED assignment persisted as a
    * durable index (deterministic centroids — the one IVF geometry the
    * SQL oracle can replay), then every vector of the deterministic
    * subject set (vec_id ≡ 2 mod 13) erased via [[eraseIvfVectors]], the
    * request replayed verbatim to exercise the content-keyed no-op.
    * Serving reads the tombstone-phase path; [[compactIvfIndex]]'s
    * physical identity is spec-pinned. */
  private def erasedIvfPath(spark: SparkSession, dir: String): String = {
    erasedIvfMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    erasedIvfMemo.getOrElseUpdate((spark, dir), {
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(64)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val nonce = java.lang.Long.toHexString(
        new java.security.SecureRandom().nextLong())
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_ivf_ers_${safe}_${key}_$nonce").getAbsolutePath
      val (assigned, cents) = seededAssignFor(spark, dir)
      writeIvfIndexFrom(assigned, cents, path)
      val subjects = corpus(spark, dir)
        .where(pmod(col("vec_id"), lit(13L)) === 2L).select(col("vec_id"))
      eraseIvfVectors(spark, path, subjects)
      eraseIvfVectors(spark, path, subjects) // replayed request: no-op
      path
    })
  }

  /** The registered IVF-erasure query: the seeded query batch served
    * from the erased durable store — erased vectors neither surface nor
    * hold candidate-cap slots, centroids unchanged (erase the vectors,
    * keep the quantizer — the standard ANN-store erasure semantics). */
  def annIvfErasedServed(spark: SparkSession, dir: String): DataFrame = {
    // entity-distinct queries (the seeded path takes its batch from the
    // collapsed assignment; a redelivered query row must not duplicate
    // its result rows — the oracle's q0 reads the DISTINCT corpus CTE)
    val q = Shuffles.distinctEntities(
        corpus(spark, dir).where(col("vec_id") < 100))
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    annIvfAgainst(spark, erasedIvfPath(spark, dir), q)
  }

  // ---- product quantization -------------------------------------------

  /** PQ geometry: [[Dim]] splits into PqM subspaces of Dim/PqM dims, each
    * quantized against a ≤PqCodes-entry codebook → PqM small ints per
    * vector (8 bytes vs 512 for raw float64s — the 64× compression that
    * lets a 100 TB corpus's ANN index live in executor memory). */
  private[graft] val PqM = 8
  private[graft] val PqCodes = 256

  /** The seeded PQ codebook: the `codes` corpus vectors smallest by
    * md5(vec_id) mod 2⁶¹−1 (the [[seededAssign]] sampling rule), flat
    * row-major [code][dim], DRIVER-COLLECTED — dimension-sized (256×64
    * doubles = 128 KB), the frozen-quantile-bounds precedent, and what
    * makes the whole PQ pipeline an embedded-constant pure function of
    * the corpus that the SQL oracle replays. Sorted driver-side so the
    * code order never depends on collect order. */
  private def pqCodebook(c: DataFrame, codes: Int): Array[Double] = {
    val md5OfId = org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.Md5LowerMod(org.apache.spark.sql.graft.Bridge.expression(
        col("vec_id").cast("string")), graft.expressions.SigUtil.P))
    c.select(col("emb"), md5OfId.as("m0"), col("vec_id"))
      .orderBy(col("m0"), col("vec_id")).limit(codes)
      .collect()
      .sortBy(r => (r.getLong(1), r.getLong(2)))
      .flatMap(_.getSeq[Double](0))
  }

  /** PQ ANN (FAISS IndexPQ shape): encode the corpus to m-byte codes,
    * score candidates by asymmetric distance (m table lookups against a
    * per-query LUT — never a dim-element kernel on the scan side), keep
    * the ADC top-`topC`, then exact-cosine re-rank those survivors with
    * the full vectors (re-rank is where PQ recovers the recall its lossy
    * codes cost — measured in RecallFloorSpec). Every stage is
    * deterministic (seeded codebook, first-min argmin, fixed-order ADC
    * sums), so the DuckDB oracle hash-verifies the whole pipeline,
    * compression included.
    *
    * Scale shape: encoding is a pure scan (embedded-constant kernel, no
    * shuffle); the ADC pass moves only (qid, vec_id, adc) skinny rows —
    * the corpus-side payload is the m-int code array, which is the point;
    * the exact re-rank touches |q|·topC full vectors. Compose with the
    * IVF bucket join upstream for sub-linear candidate generation
    * (IVFPQ) when even the ADC scan is too much. */
  def annPq(spark: SparkSession, dir: String, topC: Int = 50): DataFrame =
    // ride the seeded memo's PERSISTED entity-distinct relation (the
    // bucket column is simply unused) instead of re-running the
    // distinct shuffle this session already paid for
    annPqOn(seededAssignFor(spark, dir)._1
      .select(col("vec_id"), col("emb"), col("label")), topC)

  private[graft] def annPqFrom(c0: DataFrame, topC: Int = 50,
      topK: Int = 10): DataFrame =
    // at-least-once delivery collapses before ranks (the engine-wide
    // entity contract for id-join/rank paths; oracle mirrors with
    // SELECT DISTINCT)
    annPqOn(Shuffles.distinctEntities(
      c0.select(col("vec_id"), col("emb"), col("label"))), topC, topK)

  /** Core over an already entity-distinct corpus. */
  private def annPqOn(c: DataFrame, topC: Int = 50,
      topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import graft.expressions.{PqAdcDist, PqEncode, PqLut}
    val cb = pqCodebook(c, PqCodes)
    val codesDf = c.select(col("vec_id"),
      Bridge.column(PqEncode(Bridge.expression(col("emb")), cb, PqM, Dim)).as("codes"))
    val q = c.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"),
        Bridge.column(PqLut(Bridge.expression(col("emb")), cb, PqM, Dim)).as("lut"),
        col("emb").as("qemb"))
    val byAdc = Window.partitionBy("qid").orderBy(col("adc"), col("vec_id"))
    val cand = codesDf.crossJoin(broadcast(q.select(col("qid"), col("lut"))))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("adc", Bridge.column(PqAdcDist(
        Bridge.expression(col("codes")), Bridge.expression(col("lut")))))
      .withColumn("crk", row_number().over(byAdc))
      .where(col("crk") <= topC)
      .select(col("qid"), col("vec_id"))
    val byQ = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    cand.join(c.select(col("vec_id"), col("emb")), "vec_id")
      .join(broadcast(q.select(col("qid"), col("qemb"))), "qid")
      .withColumn("sim", round(VecFns.cosine(col("emb"), col("qemb")), 6))
      .withColumn("rk", row_number().over(byQ).cast("long"))
      .where(col("rk") <= topK)
      .select(col("qid"), col("rk"), col("vec_id"), col("sim"))
  }

  /** Semantic dedup clusters — the embedding-space complement of the
    * text path's [[NearDup.dedupClusters]], and the cluster form of the
    * SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication"): same-bucket
    * vector pairs at cosine ≥ `thr` become edges, connected components
    * label every vector with its cluster (min vec_id canonical), and
    * downstream keep-one dedup is `is_canonical`. Where
    * [[dedupEmbedding]] reports each vector's single best neighbor,
    * this yields the transitive GROUPS a curation pipeline drops
    * together.
    *
    * Blocked on the seeded quantizer, so the whole operator — blocking
    * geometry, pair scoring, component labels — replays in SQL
    * (recursive label propagation, the dedup_clusters oracle pattern);
    * the component solver is the shared [[Cluster.connectedComponents]]
    * (driver union-find under the cap, checkpointed loop above it).
    * Same N²/k bucketed pair work as dedupEmbedding; the k-means-blocked
    * analog composes via [[dedupEmbeddingFrom]] + Cluster when centroid
    * quality matters more than verifiability. */
  def dedupSemanticClusters(spark: SparkSession, dir: String,
      thr: Double = 0.95): DataFrame = {
    val (assigned, _) = seededAssignFor(spark, dir)
    dedupSemanticClustersOn(assigned, thr)
  }

  private[graft] def dedupSemanticClustersFrom(c: DataFrame,
      thr: Double = 0.95, k: Int = 0): DataFrame =
    dedupSemanticClustersOn(seededAssign(c, k)._1, thr)

  private def dedupSemanticClustersOn(assigned: DataFrame, thr: Double): DataFrame = {
    val capped = capBucket(
      assigned.select(col("bucket"), col("vec_id"), col("emb")), "vec_id")
    val pairs = capped.as("l")
      .join(capped.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("sim", round(VecFns.cosine(col("l.emb"), col("r.emb")), 6))
      .where(col("sim") >= thr)
      .select(col("l.vec_id").as("id_a"), col("r.vec_id").as("id_b"))
    val labels = Cluster.connectedComponents(pairs,
      assigned.select(col("vec_id").as("id")))
    val sizes = labels.groupBy(col("cluster")).agg(count("*").as("cluster_size"))
    labels.join(sizes, "cluster")
      .select(col("id").as("vec_id"), col("cluster").as("cluster_id"),
        col("cluster_size"), (col("id") === col("cluster")).as("is_canonical"))
  }

  /** IVFPQ — the production composition (FAISS's default at scale):
    * seeded IVF buckets prune the candidate space to the probed
    * ~nprobe/k fraction (sub-linear candidate generation), PQ codes
    * score those survivors by ADC (8-byte reads, no full-vector math on
    * the scan side), and the exact re-rank touches only |q|·topC full
    * vectors. Shares the session-memoized seeded assignment with
    * [[annIvfSeeded]]/[[decontaminateSemantic]] and the codebook rule
    * with [[annPq]] — and, being seeded end to end, the whole composed
    * pipeline is oracle-hash-verified. */
  def annIvfPq(spark: SparkSession, dir: String, nprobe: Int = 0,
      topC: Int = 50, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import graft.expressions.{PqAdcDist, PqEncode, PqLut}
    val (assigned, cents) = seededAssignFor(spark, dir)
    val eff = if (nprobe > 0) nprobe else autoNprobe(cents.count())
    val cb = pqCodebook(assigned, PqCodes)
    val codesDf = assigned.select(col("vec_id"), col("bucket"),
      Bridge.column(PqEncode(Bridge.expression(col("emb")), cb, PqM, Dim)).as("codes"))
    val q = assigned.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"),
        Bridge.column(PqLut(Bridge.expression(col("emb")), cb, PqM, Dim)).as("lut"),
        col("emb").as("qemb"))
    val probes = probesOf(q.select(col("qid"), col("qemb")), cents, eff)
      .select(col("qid"), col("bucket"))
      .join(q.select(col("qid"), col("lut")), "qid")
    val byAdc = Window.partitionBy("qid").orderBy(col("adc"), col("vec_id"))
    val cand = capBucket(codesDf, "vec_id").join(broadcast(probes), "bucket")
      .where(col("vec_id") =!= col("qid"))
      .withColumn("adc", Bridge.column(PqAdcDist(
        Bridge.expression(col("codes")), Bridge.expression(col("lut")))))
      .withColumn("crk", row_number().over(byAdc))
      .where(col("crk") <= topC)
      .select(col("qid"), col("vec_id"))
    val byQ = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    cand.join(assigned.select(col("vec_id"), col("emb")), "vec_id")
      .join(broadcast(q.select(col("qid"), col("qemb"))), "qid")
      .withColumn("sim", round(VecFns.cosine(col("emb"), col("qemb")), 6))
      .withColumn("rk", row_number().over(byQ).cast("long"))
      .where(col("rk") <= topK)
      .select(col("qid"), col("rk"), col("vec_id"), col("sim"))
  }

  // ---- durable IVF index ----------------------------------------------
  // The on-disk form of the session memo — the ANN twin of
  // NearDup.writeSignatureIndex, and this engine's analog of the
  // reference's FAISS persistence (faiss_db.py:24-35 read_index/
  // write_index; add_logs at :52-58): without it every daily ANN job
  // refits k-means and reassigns the whole corpus. Layout:
  //   indexPath/centroids   k rows (bucket, cemb)
  //   indexPath/assign      (vec_id, emb, label) directory-partitioned
  //                         by bucket=<b>, so a query batch's scan
  //                         partition-prunes to the buckets it probes
  // Full writes go through one tmp dir + root _SUCCESS + rename-aside
  // swap (IO.swapInto): a crash leaves either the old complete index or
  // the new one, never centroids of one generation over assignments of
  // another.

  /** Fit + assign + persist the IVF index for a corpus. */
  def writeIvfIndex(spark: SparkSession, dir: String, indexPath: String,
      k: Int = 0): Unit = {
    val (assigned, centDf) = ivfAssignFrom(corpus(spark, dir), k)
    try writeIvfIndexFrom(assigned, centDf, indexPath)
    finally { assigned.unpersist(); () }
  }

  /** Same writer over an arbitrary (pre-assigned) corpus — `assigned` is
    * (vec_id, emb, label, bucket), `centDf` is (bucket, cemb). */
  private[graft] def writeIvfIndexFrom(assigned: DataFrame, centDf: DataFrame,
      indexPath: String): Unit = {
    val spark = assigned.sparkSession
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // shared publish protocol (IO.publishStore: writer-entry healing →
    // write under tmp → root _SUCCESS → rename-aside swap), plus one
    // IVF-specific step at the top of the write phase: a crashed
    // append's COMPLETE tmp is promoted into the OLD generation BEFORE
    // the rebuild starts (it was assigned against those centroids, so
    // this is the correct home): if the rebuild then fails, the old
    // index is live WITH the increment — deleting the tmp up front
    // would lose data the caller believes landed while leaving the
    // pre-increment index serving. A successful rebuild supersedes the
    // whole store either way, and promoting first means no append tmp
    // can survive into the new generation (no mixing).
    graft.sources.IO.publishStore(spark, indexPath, "__index_tmp") { tmp =>
      recoverIvfAppend(fs, p)
      recoverIvfErase(fs, p)
      recoverIvfCompact(fs, p)
      centDf.coalesce(1).write.mode("overwrite").parquet(s"$tmp/centroids")
      assigned.select(col("vec_id"), col("emb"), col("label"), col("bucket"))
        // one file per bucket directory (the repartition key IS the
        // partition key), not numShufflePartitions files in each
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$tmp/assign")
    }
  }

  /** The persisted centroid relation (k rows). Readers heal ONLY the
    * one state they cannot serve through — a mid-swap crash that left no
    * live dir — and never delete: a tmp next to a live index may be a
    * CONCURRENT writer's in-flight output (serving reads during a daily
    * append are the expected pattern), so promoting complete appends and
    * dropping partial debris happens at WRITER entries only
    * ([[writeIvfIndex]]/[[appendIvfIndex]], where single-writer
    * exclusion is already the contract). A crashed append is invisible
    * to readers until the next writer entry promotes it — they simply
    * serve the last complete generation. */
  private def readCentroids(spark: SparkSession, indexPath: String): DataFrame = {
    val fs = graft.sources.IO.readableStore(spark, indexPath, "__index_tmp")
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/centroids")),
      s"no IVF index at $indexPath (write one with writeIvfIndex)")
    spark.read.parquet(s"$indexPath/centroids")
  }

  /** Serve ANN queries from a persisted [[writeIvfIndex]] store with NO
    * k-means fit: probe selection runs against the k-row centroid
    * relation, and the corpus read PARTITION-PRUNES to the probed bucket
    * directories (the touched-bucket list is ≤ |queries|·nprobe values —
    * dimension-sized, like every pruning predicate here; a huge query
    * batch touches every bucket and correctly degrades to the full scan).
    * `queries` is (qid, qemb). Serving work is probe-join + rank only —
    * the daily-job shape where the fit amortizes across runs instead of
    * being re-paid per run.
    *
    * The pruned read collapses redelivered entity copies
    * (distinctEntities): a replayed [[appendIvfIndex]] batch may have
    * appended the same vector twice, and the engine-wide at-least-once
    * contract absorbs that at the consumer. */
  def annIvfAgainst(spark: SparkSession, indexPath: String, queries: DataFrame,
      nprobe: Int = 0, topK: Int = 10): DataFrame = {
    val centDf = readCentroids(spark, indexPath)
    val eff = if (nprobe > 0) nprobe else autoNprobe(centDf.count())
    // localCheckpoint (eager) truncates the probe lineage, so the
    // CALLER's query plan — which may be an arbitrary derived relation —
    // executes exactly once, while the probe rows (and their dim-double
    // qemb payloads) stay DISTRIBUTED on the executors. Only the
    // distinct touched-bucket list — ≤ k ints, the pruning predicate's
    // natural driver bound — is ever collected; a large query batch
    // never ships its embeddings through the driver.
    val probes = probesOf(queries, centDf, eff).localCheckpoint()
    val touched = probes.select(col("bucket")).distinct()
      .collect().map(_.getAs[Int]("bucket")).sorted
    if (touched.isEmpty) // empty index or empty query batch
      return emptyServeResult(spark, queries)
    // erased subjects drop BEFORE the per-bucket candidate cap: an
    // erased vector must neither surface nor consume a cap slot a
    // surviving vector would have had in a store built without it
    val assigned0 = Shuffles.distinctEntities(
      spark.read.parquet(s"$indexPath/assign")
        .where(col("bucket").isin(touched.map(Int.box).toIndexedSeq: _*)))
    val assigned = ivfTombstones(spark, indexPath)
      .map(t => assigned0.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(assigned0)
    rankProbed(assigned, probes, topK)
  }

  /** The tombstone relation of an IVF store, if any subject's vectors
    * were erased and not yet compacted away — request-sized, always
    * broadcast at the consumer. Discovery goes through
    * [[graft.sources.StoreProtocol.tombstones]] (the path's own Hadoop
    * filesystem — never java.io.File, which silently answers "no
    * tombstones" on a remote store and serves erased subjects). */
  private def ivfTombstones(spark: SparkSession,
      indexPath: String): Option[DataFrame] =
    graft.sources.StoreProtocol.tombstones(spark, indexPath, "vec_id")

  /** GDPR-article-17 erasure for the IVF store — the vector-store leg of
    * the governance family (the z-table / lexical-index siblings;
    * embeddings of a subject's content are personal data too): erasure
    * lands as a TOMBSTONE every serve anti-joins before the candidate
    * cap, and [[compactIvfIndex]] makes it physical. The CENTROIDS stay
    * — the model was fit before the request and removing training
    * influence is a refit, not an erasure (the standard ANN-index
    * erasure semantics: remove the vectors, keep the quantizer) — so
    * post-erasure serving is hash-identical to an index holding the same
    * centroids and the assignment MINUS the subjects. Idempotent by
    * content key (replayed requests no-op); crash contract = the lex
    * erasure's (COMPLETE tmp with the key persisted, promote under
    * deterministic names, resume at writer entries). */
  def eraseIvfVectors(spark: SparkSession, indexPath: String,
      subjects: DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.IO.recoverStore(fs, p,
      new org.apache.hadoop.fs.Path(indexPath + "__index_tmp"))
    recoverIvfAppend(fs, p)
    recoverIvfErase(fs, p)
    recoverIvfCompact(fs, p)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/centroids")),
      s"cannot erase from a missing IVF index at $indexPath")
    val fresh0 = subjects.select(col("vec_id"))
      .where(col("vec_id").isNotNull).distinct()
    val fresh = ivfTombstones(spark, indexPath)
      .map(t => fresh0.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(fresh0).localCheckpoint()
    if (fresh.isEmpty) return // fully-replayed or empty request: no-op
    val key = graft.sources.StoreProtocol.contentKey(fresh,
      expr("xxhash64(CAST(vec_id AS STRING))"))
    graft.sources.StoreProtocol.publishKeyed(fs, p, "__erase_tmp", "KEY",
      "ers", key, IvfEraseSubs) { tmp =>
      fresh.coalesce(1).write.mode("overwrite").parquet(s"$tmp/tombstones")
    }
  }

  private val IvfEraseSubs = Seq(("tombstones", "tombstones"))

  /** WRITER-entry healing for a crashed erasure promote — the shared
    * content-keyed contract ([[graft.sources.StoreProtocol]]). */
  private def recoverIvfErase(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit =
    graft.sources.StoreProtocol.recoverKeyedPromote(fs, p, "__erase_tmp",
      "KEY") { (tmp, key) =>
      graft.sources.StoreProtocol.promoteKeyed(fs, tmp, p, "ers", key,
        IvfEraseSubs)
      fs.delete(tmp, true)
    }

  /** Physical compaction of the IVF store — per-bucket two-phase rewrite
    * (the shared [[graft.sources.IO.commitDirSwaps]] protocol the
    * z-table uses): every bucket directory that holds tombstoned vectors
    * or append-decayed multi-file layout rewrites to one entity-distinct
    * file without the subjects; tombstones retire afterwards. A
    * subject's bucket is unknowable from its id alone (assignment needs
    * the embedding), so when tombstones exist EVERY bucket is a
    * candidate — erasure without a vector-id index is a store scan, the
    * honest governance cost (the lexical store pays the same). */
  def compactIvfIndex(spark: SparkSession, indexPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.IO.recoverStore(fs, p,
      new org.apache.hadoop.fs.Path(indexPath + "__index_tmp"))
    recoverIvfAppend(fs, p)
    recoverIvfErase(fs, p)
    recoverIvfCompact(fs, p)
    val assignDir = new org.apache.hadoop.fs.Path(p, "assign")
    if (!fs.exists(assignDir)) return
    val tombs = ivfTombstones(spark, indexPath)
    def files(d: org.apache.hadoop.fs.Path) =
      fs.listStatus(d).count(f => f.isFile &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
    val touched = fs.listStatus(assignDir)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
      .map(_.getPath)
      .filter(d => tombs.isDefined || files(d) > 1)
    val tmp = new org.apache.hadoop.fs.Path(indexPath + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(indexPath + "__compact_old")
    if (touched.nonEmpty) {
      fs.delete(tmp, true)
      touched.foreach { d =>
        var df = Shuffles.distinctEntities(spark.read.parquet(d.toString))
        tombs.foreach(t =>
          df = df.join(broadcast(t), Seq("vec_id"), "left_anti"))
        df.coalesce(1).write.mode("overwrite")
          .parquet(new org.apache.hadoop.fs.Path(tmp, d.getName).toString)
      }
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")).close()
      graft.sources.IO.commitDirSwaps(fs, tmp, assignDir, old, "bucket=")
    }
    val t = new org.apache.hadoop.fs.Path(p, "tombstones")
    if (fs.exists(t)) fs.delete(t, true)
    // tombstones retired AFTER the swaps — re-stale the serve memos so a
    // racing serve can't pin a tombstone relation over deleted files
    graft.sources.StoreProtocol.invalidateStore(p.toString)
  }

  private def recoverIvfCompact(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit =
    graft.sources.IO.recoverDirSwaps(fs,
      new org.apache.hadoop.fs.Path(p.toString + "__compact_tmp"),
      new org.apache.hadoop.fs.Path(p, "assign"),
      new org.apache.hadoop.fs.Path(p.toString + "__compact_old"), "bucket=")

  /** Empty serving result with the SAME schema as the non-empty path:
    * qid keeps the caller's type, but vec_id/rk/sim carry the index
    * schema (long/long/double) — deriving them from the query relation
    * would make the empty and non-empty paths disagree for a caller
    * whose qid is not a long. */
  private def emptyServeResult(spark: SparkSession, queries: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      queries.schema("qid").copy(name = "qid"),
      StructField("rk", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = true),
      StructField("sim", DoubleType, nullable = true)))
    spark.createDataFrame(spark.sparkContext
      .emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Assign NEW vectors against persisted centroids — no fit, assignment
    * work ∝ increment: a crossJoin against the broadcast k-row centroid
    * relation with a map-side-combined min-struct argmin (one exchange
    * row per new vector; a window would shuffle all k distance rows).
    * Redelivered copies collapse before assignment (distinctEntities). */
  private[graft] def assignAgainst(newVecs: DataFrame, centDf: DataFrame): DataFrame =
    assignDistinct(Shuffles.distinctEntities(
      newVecs.select(col("vec_id"), col("emb"), col("label"))), centDf)

  /** [[assignAgainst]] minus the entity collapse — for callers whose
    * input is already entity-distinct (one collapse, not two). */
  private def assignDistinct(newVecs: DataFrame, centDf: DataFrame): DataFrame =
    newVecs
      .crossJoin(broadcast(centDf))
      .withColumn("cdist", VecFns.l2sq(col("emb"), col("cemb")))
      .groupBy(col("vec_id"))
      // ties on exact-equal distance break to the SMALLER bucket id —
      // the same order the ML transform's first-min argmin induces.
      // emb/label are constant across a vector's k distance rows, so
      // first() is deterministic in value.
      .agg(min(struct(col("cdist"), col("bucket"))).as("b"),
        first(col("emb")).as("emb"), first(col("label")).as("label"))
      .select(col("vec_id"), col("emb"), col("label"),
        col("b.bucket").as("bucket"))

  /** Append an increment to a persisted IVF index. Both the assignment
    * COMPUTE and the write I/O are ∝ the increment: new files land
    * INSIDE the existing bucket directories via per-file rename — never
    * a rewrite of prior data. (An increment's vectors scatter across
    * ALL buckets, unlike the last-touch store's time-sealed epochs, so
    * any rewrite-the-touched-leaves scheme would be corpus-sized here.)
    *
    * Crash contract: the increment is first written COMPLETE to a tmp
    * dir (job _SUCCESS = completeness marker), then its files move
    * bucket-by-bucket into the live store. File renames are atomic and
    * part-file names are job-unique, so a crashed move RESUMES
    * idempotently ([[recoverIvfAppend]] at the next WRITER entry —
    * readers never delete and never touch a store with a live dir (the
    * one reader-side mutation is completing a crashed swap's final
    * rename when NO live dir exists, race-tolerantly), so serving reads
    * are safe concurrent with an in-flight append and simply don't see
    * a crashed increment until a writer promotes it): remaining files move,
    * already-moved files are no longer in tmp. A caller replaying a
    * fully-promoted append writes duplicate entity rows; readers
    * collapse them (see [[annIvfAgainst]]). Writers are single-flight:
    * two concurrent appends to one index is caller error (the tmp dir
    * is shared), matching every store here. */
  def appendIvfIndex(spark: SparkSession, indexPath: String,
      newVecs: DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // writer entry: full healing — complete a crashed swap, promote a
    // crashed append's COMPLETE increment (it was assigned against these
    // same centroids; losing it would drop data the caller believes
    // landed), then drop partial-write debris
    graft.sources.IO.recoverStore(fs, p,
      new org.apache.hadoop.fs.Path(indexPath + "__index_tmp"))
    recoverIvfAppend(fs, p)
    recoverIvfErase(fs, p)
    recoverIvfCompact(fs, p)
    val centDf = readCentroids(spark, indexPath)
    require(centDf.count() > 0,
      s"cannot append to an empty IVF index at $indexPath — rebuild with writeIvfIndex")
    val tmp = new org.apache.hadoop.fs.Path(indexPath + "__append_tmp")
    assignAgainst(newVecs.where(col("emb").isNotNull &&
        validEmb(col("emb"))), centDf)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)
    promoteAppend(fs, tmp, new org.apache.hadoop.fs.Path(p, "assign"))
  }

  /** Move a COMPLETE append-tmp's bucket files into the live assign
    * store. Idempotent: each file renames at most once; re-running after
    * a crash moves whatever remains. */
  private def promoteAppend(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path, assignDir: org.apache.hadoop.fs.Path): Unit = {
    fs.mkdirs(assignDir)
    fs.listStatus(tmp).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("bucket=")).foreach { bdir =>
      val dst = new org.apache.hadoop.fs.Path(assignDir, bdir.getPath.getName)
      fs.mkdirs(dst)
      fs.listStatus(bdir.getPath).filter(_.isFile).foreach { f =>
        if (!fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(dst, f.getPath.getName)))
          sys.error(s"append: cannot move ${f.getPath} into $dst")
      }
    }
    fs.delete(tmp, true)
  }

  /** WRITER-entry healing for a crashed [[appendIvfIndex]]: a tmp
    * carrying the write job's _SUCCESS is a complete increment — resume
    * its move; a tmp without one is partial-write debris — drop it (the
    * caller replays the batch). Never runs from the read path: a reader
    * cannot distinguish crash debris from a live writer's in-flight tmp,
    * and deleting the latter would fail that writer's job. */
  private def recoverIvfAppend(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(p.toString + "__append_tmp")
    if (fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")))
      promoteAppend(fs, tmp, new org.apache.hadoop.fs.Path(p, "assign"))
    else if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** Random-hyperplane LSH ANN (cosine): the training-free scale path next
    * to [[annIvf]]. `nBits` signed projections against deterministic
    * pseudo-random hyperplanes give each vector a bit signature; the bits
    * fold into `bands` band keys (any shared band → candidate, the same
    * pigeonhole banding as SimHash); candidates rank by exact cosine.
    *
    * For vectors at angle θ, P(bit agrees) = 1 − θ/π (Goemans–Williamson),
    * so an 8-bit band matches with p⁸ and 4 bands catch cosine ≳ 0.9 pairs
    * with ~75% probability per probe — no k-means fit, no metadata count,
    * fully deterministic. Candidate generation is an equi-join on band
    * keys with the same hot-bucket cap as the minhash path.
    *
    * Contract (unlike [[annIvf]]): this is a near-duplicate search — it
    * retrieves neighbors above the banding's similarity floor and returns
    * nothing for a query with no genuinely-close vector, by design. Use
    * IVF when every query must get k results regardless of distance.
    */
  def annLsh(spark: SparkSession, dir: String, nBits: Int = 32,
      bands: Int = 4, topK: Int = 10, hammingProbes: Int = 0): DataFrame = {
    // the signature projection feeds three plan references (queries,
    // candidates, hot-bucket counts) — persist it once per session, like
    // the other shared bases
    lshMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    val sigs = lshMemo.getOrElseUpdate((spark, s"$dir:$nBits:$bands"),
      lshSigs(corpus(spark, dir), nBits, bands).persist())
    lshSearch(sigs, topK, nBits / bands, hammingProbes)
  }

  private val lshMemo =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]

  private[graft] def annLshFrom(corpusDf: DataFrame, nBits: Int = 32,
      bands: Int = 4, topK: Int = 10, hammingProbes: Int = 0): DataFrame =
    lshSearch(lshSigs(corpusDf, nBits, bands), topK, nBits / bands, hammingProbes)

  /** The deterministic hyperplanes as plain numbers: hash-seeded uniform
    * in [-1, 1]. Shared by [[lshSigs]] (as column literals) and the
    * ann_lsh oracle SQL (as DuckDB list literals) — one definition, two
    * engines, so the banding geometry can never drift between them. */
  private[graft] def lshPlanes(nBits: Int): IndexedSeq[IndexedSeq[Double]] =
    (0 until nBits).map { b =>
      (0 until Dim).map { d =>
        // productHash is deprecated in favor of caseClassHash, but these
        // exact values ARE the banding geometry — they're frozen as list
        // literals inside the ann_lsh oracles, so the function must never
        // change out from under them
        val h: Int = (scala.util.hashing.MurmurHash3.productHash((b, d, 42)): @annotation.nowarn("cat=deprecation"))
        h.toDouble / Int.MaxValue
      }
    }

  private def lshSigs(corpusDf: DataFrame, nBits: Int, bands: Int): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    val rowsPerBand = nBits / bands
    // at-least-once delivery collapses to the distinct vector entity
    // BEFORE banding: a redelivered copy must not consume a hot-bucket
    // cap slot (both engines cap keep-first-N by vec_id) or pollute the
    // pair ranks the oracle derives from an id join — the Spark side's
    // (qid, vec_id) groupBy collapses copies that the oracle's rank
    // would otherwise count as separate neighbors. Same contract as the
    // text signature bases. The exact-scan paths stay shuffle-free: their
    // duplicate effects are order-deterministic and mirrored row-for-row
    // by their oracles, so collapse there buys nothing.
    val c = Shuffles.distinctEntities(corpusDf)
      .select(col("vec_id"), VecFns.l2Normalize(col("emb")).as("emb"), col("label"))
    // deterministic hyperplanes: hash-seeded uniform in [-1, 1] — unit
    // norm is irrelevant for the sign test
    val planes: Seq[Column] = lshPlanes(nBits).map(p => typedLit(p))
    // per-band RAW bit words, not hashed keys: the search derives keys
    // from the words, and multi-probe needs the words to flip bits in
    def bandBits(v: Column): Column = array((0 until bands).map { k =>
      (0 until rowsPerBand).map { r =>
        (VecFns.dot(v, planes(k * rowsPerBand + r)) > 0).cast("long") * lit(1L << r)
      }.reduce(_ + _)
    }: _*)
    c.withColumn("bits", bandBits(col("emb")))
  }

  /** `hammingProbes` = how many single-bit flips of each band word the
    * QUERY side additionally probes (0 = exact banding, rowsPerBand = full
    * Hamming-1 multi-probe). For a pair at bit-agreement probability p,
    * a band matches with p⁸; Hamming-1 probing adds the 8 one-bit-off
    * words, lifting per-band match probability to p⁸ + 8p⁷(1−p) — e.g.
    * at p = 0.85 from 0.27 to 0.66 — without growing bands or the corpus
    * side at all: only the broadcast query relation fans out ×(1+probes).
    * The trade is more random collisions per isolated query, so exact
    * banding stays the default near-dup contract. */
  private def lshSearch(sigs: DataFrame, topK: Int, rowsPerBand: Int,
      hammingProbes: Int): DataFrame = {
    require(hammingProbes >= 0 && hammingProbes <= rowsPerBand,
      "hammingProbes must be in [0, rowsPerBand]")
    def keyOf(band: Column, word: Column): Column = xxhash64(band, word)
    val flipMasks = typedLit(0L +: (0 until hammingProbes).map(r => 1L << r))
    val exploded = sigs.select(col("vec_id"), col("emb"),
      posexplode(col("bits")).as(Seq("band", "word")))
    val queries = exploded.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("band"),
        explode(transform(flipMasks, m => col("word").bitwiseXOR(m))).as("word"))
      .select(col("qid"), col("qemb"), keyOf(col("band"), col("word")).as("key"))
    val cand = exploded
      .select(col("vec_id"), col("emb"), keyOf(col("band"), col("word")).as("key"))
    // hot-bucket cap: a degenerate band key — e.g. a mass of near-zero
    // vectors landing on one signature — would otherwise make one bucket's
    // candidate join quadratic; keep the first MaxIvfBucket by vec_id so
    // hot buckets still contribute candidates
    val capped = capBucket(cand, "vec_id", bucketCol = "key")
    val byQ = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    // A pair colliding in several bands appears once per shared band; the
    // dedup happens AFTER scoring, as a map-side-combined groupBy on
    // (qid, vec_id) — so the exchange moves 24 bytes per candidate, never
    // the two 64-dim vectors (a `.distinct()` over the embedding payloads
    // shuffles ~1 KB/candidate to decide what the id pair already decides;
    // the repeated dot products it avoids are codegen'd scan-side work,
    // which is the cheap currency). max(sim) == every copy's sim.
    capped.join(broadcast(queries), "key")
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(VecFns.dot(col("emb"), col("qemb")), 6))
      .groupBy(col("qid"), col("vec_id")).agg(max(col("sim")).as("sim"))
      .withColumn("rk", row_number().over(byQ).cast("long"))
      .where(col("rk") <= topK)
      .select(col("qid"), col("rk"), col("vec_id"), col("sim"))
  }

  /** k-NN majority-label vote: top-10 cosine neighbors from the corpus,
    * predicted label = most frequent (ties → smaller label). */
  def knnLabelVote(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
      .select(col("vec_id"), VecFns.l2Normalize(col("emb")).as("emb"), col("label"))
    val q = c.where(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("label").as("true_label"))
    val byQ = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    val neighbors = c.where(pmod(col("vec_id"), lit(10)) =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("sim", VecFns.dot(col("emb"), col("qemb")))
      .withColumn("rk", row_number().over(byQ))
      .where(col("rk") <= 10)
    val byVote = Window.partitionBy("qid").orderBy(col("n_votes").desc, col("label"))
    neighbors.groupBy(col("qid"), col("true_label"), col("label"))
      .agg(count("*").as("n_votes"))
      .withColumn("vrk", row_number().over(byVote))
      .where(col("vrk") === 1)
      .select(col("qid"), col("true_label"), col("label").as("predicted_label"), col("n_votes"))
  }

  /** Embedding-cosine near-dup: IVF-blocked pairwise similarity — only
    * same-bucket pairs are scored (N²/k work instead of N²), the standard
    * blocking trade at corpus scale. Emits one summary row per vector.
    */
  def dedupEmbedding(spark: SparkSession, dir: String, thr: Double = 0.95): DataFrame =
    dedupEmbeddingOn(ivfAssign(spark, dir)._1, thr)

  private[graft] def dedupEmbeddingFrom(c: DataFrame, thr: Double = 0.95): DataFrame =
    dedupEmbeddingOn(ivfAssignFrom(c)._1, thr)

  /** [[dedupEmbedding]] blocked on the seeded quantizer — the
    * oracle-verified member of the pair-flag form (the last k-means
    * consumer to gain a seeded twin; shares the memoized assignment
    * with ann_ivf_seeded and the outlier/decontamination twins). A
    * near-identical pair shares its argmin bucket under any reasonable
    * quantizer, so flag recall is quantizer-robust; the fitted path
    * stays the quality default. */
  def dedupEmbeddingSeeded(spark: SparkSession, dir: String,
      thr: Double = 0.95): DataFrame =
    dedupEmbeddingOn(seededAssignFor(spark, dir)._1, thr)

  /** Best same-bucket neighbor of each LEFT vector among the RIGHT side:
    * one row per left vector with its top match by rounded cosine,
    * deterministic tie-break on the right id; the right side is
    * per-bucket capped (every left vector still gets scored, against at
    * most MaxIvfBucket candidates). A zero (junk) vector scores 0.0
    * against everything — [[VecFns.cosine]] pins the 0/0 case, so it can
    * neither error under ANSI mode nor NaN-sweep a bucket. Left vectors
    * with no candidate come back with NULL match columns (left join).
    *
    * The shared scaffold of [[dedupEmbedding]] (left = right = corpus)
    * and [[decontaminateSemantic]] (left = train, right = eval) — two
    * operators, one tuning surface. */
  private def bestBucketMatch(left: DataFrame, right: DataFrame,
      rightIdCol: String): DataFrame = {
    val r = capBucket(right.select(col("bucket"), col("vec_id"), col("emb")), "vec_id")
      .select(col("bucket"), col("vec_id").as(rightIdCol), col("emb").as("emb_r"))
    val best = Window.partitionBy("vec_id").orderBy(col("sim").desc, col(rightIdCol))
    val nn = left.select(col("bucket"), col("vec_id"), col("emb"))
      .join(r, "bucket")
      // inert when the sides are disjoint; excludes the self-pair when
      // left and right are the same corpus
      .where(col("vec_id") =!= col(rightIdCol))
      .withColumn("sim", round(VecFns.cosine(col("emb"), col("emb_r")), 6))
      .withColumn("rk", row_number().over(best))
      .where(col("rk") === 1)
      .select(col("vec_id"), col(rightIdCol), col("sim"))
    left.select(col("vec_id"), col("bucket")).join(nn, Seq("vec_id"), "left")
  }

  private def dedupEmbeddingOn(assigned: DataFrame, thr: Double): DataFrame =
    bestBucketMatch(assigned, assigned, "nn_id")
      .select(col("vec_id"), col("bucket"), col("nn_id"),
        col("sim").as("nn_sim"),
        (col("sim") >= thr).as("is_dup"))

  /** Semantic train/eval decontamination — the embedding-space
    * complement of [[Corpus.decontaminateFrom]]'s n-gram overlap: a
    * train vector whose cosine similarity to ANY eval vector reaches
    * `thr` is flagged as semantic leakage (paraphrases and translations
    * share no 8-grams but land adjacent in embedding space). Same eval
    * split convention as the n-gram pass (id % 10 == 0).
    *
    * Scale shape = [[dedupEmbedding]]'s: IVF-blocked pairwise scoring,
    * the eval side per-bucket capped, one row per TRAIN vector with its
    * best eval match. Blocking blind spot (an eval twin assigned to a
    * neighboring bucket is missed) is the documented IVF trade — the
    * exact twin ([[decontaminateSemanticExact]]) is the audit-grade
    * escalation.
    *
    * Blocked on the SEEDED quantizer ([[seededAssign]]), not the k-means
    * fit, since r13: a decontamination screen should be reproducible —
    * the same corpus must yield the same verdicts on every run and
    * engine, which also makes this operator fully oracle-verifiable
    * (the DuckDB twin replays the seed choice, the argmin assignment,
    * the cap, and the verdict relation value-for-value). A near-
    * identical train/eval pair shares its argmin bucket under any
    * reasonable quantizer, so the screen's recall is quantizer-robust;
    * k-means blocking remains available via [[decontaminateSemanticFrom]]
    * for parity with the ANN default. */
  def decontaminateSemantic(spark: SparkSession, dir: String,
      thr: Double = 0.95): DataFrame =
    decontaminateSemanticOn(seededAssignFor(spark, dir)._1, thr)

  /** k-means-blocked variant (the ANN default's quantizer) — kept for
    * parity; the registry path blocks on [[seededAssign]]. */
  private[graft] def decontaminateSemanticFrom(c: DataFrame,
      thr: Double = 0.95, k: Int = 0): DataFrame =
    decontaminateSemanticOn(ivfAssignFrom(c, k)._1, thr)

  /** The registry path's quantizer over an arbitrary corpus (specs). */
  private[graft] def decontaminateSemanticSeededFrom(c: DataFrame,
      thr: Double = 0.95, k: Int = 0): DataFrame =
    decontaminateSemanticOn(seededAssign(c, k)._1, thr)

  private def decontaminateSemanticOn(assigned: DataFrame, thr: Double): DataFrame = {
    val isEval = pmod(col("vec_id"), lit(10)) === 0
    bestBucketMatch(assigned.where(!isEval), assigned.where(isEval), "eval_id")
      .select(col("vec_id"), col("bucket"), col("eval_id"),
        col("sim").as("eval_sim"),
        coalesce(col("sim") >= thr, lit(false)).as("is_contaminated"))
  }

  /** Broadcast-side bound for the exact decontamination scan: the eval
    * split rides to every executor, so it is capped deterministically
    * (first N by vec_id). Coverage beyond the cap needs a sharded audit
    * run — the cap is in the operator contract, not silent. */
  private val MaxExactEval = 65536

  /** Exact-scan escalation of [[decontaminateSemantic]] — the documented
    * IVF-blocking escape hatch made real: every train vector is scored
    * against the ENTIRE eval split by brute-force cosine, so a
    * paraphrase that k-means assigned to a different bucket (the blocked
    * path's blind spot) cannot hide. Audit-grade, not default-grade:
    * cost is |train|·|eval| kernel evaluations — run it on a release
    * candidate; the blocked path remains the continuous screen.
    *
    * Scale shape: the eval split is broadcast (≤[[MaxExactEval]] rows,
    * first-N by vec_id — the cap is part of the contract, a larger eval
    * split needs a sharded audit); cosine = dot over unit-normalized
    * vectors (the [[annCosineTopK]] kernel). The best match per train
    * vector is a lexicographic `max(struct(sim, -eval_id))` aggregate,
    * NOT a window: partial aggregation collapses each train vector's
    * |eval| scores map-side inside the scan partition, so the only
    * exchange carries one row per train vector — a window would shuffle
    * the full |train|·|eval| cross product first. Deterministic given
    * the input (no k-means, no memo), hence oracle-verifiable where the
    * blocked path is rows-only. */
  def decontaminateSemanticExact(spark: SparkSession, dir: String,
      thr: Double = 0.95): DataFrame =
    decontaminateSemanticExactFrom(corpus(spark, dir), thr)

  private[graft] def decontaminateSemanticExactFrom(c: DataFrame,
      thr: Double = 0.95): DataFrame = {
    val n = c.select(col("vec_id"), VecFns.l2Normalize(col("emb")).as("emb"))
    val isEval = pmod(col("vec_id"), lit(10)) === 0
    val ev = n.where(isEval)
      .orderBy("vec_id").limit(MaxExactEval)
      .select(col("vec_id").as("eval_id"), col("emb").as("emb_r"))
    val train = n.where(!isEval)
    // max sim, ties to the SMALLEST eval id (negate inside the struct) —
    // the same total order bestBucketMatch's (sim DESC, eval_id) rank uses
    val best = train.crossJoin(broadcast(ev))
      .withColumn("sim", round(VecFns.dot(col("emb"), col("emb_r")), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("sim"), (-col("eval_id")).as("nid"))).as("b"))
      .select(col("vec_id"), (-col("b.nid")).as("eval_id"),
        col("b.sim").as("eval_sim"))
    // left join keeps every train verdict when the eval split is empty
    // (NULL match columns, not-contaminated — the blocked path's contract)
    train.select(col("vec_id")).join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("eval_id"), col("eval_sim"),
        coalesce(col("eval_sim") >= thr, lit(false)).as("is_contaminated"))
  }

  /** Embedding-space outlier ranking — the curation view that finds
    * mislabeled, off-distribution, or junk vectors BEFORE they enter a
    * training mix: each vector's L2 distance to its own k-means centroid,
    * normalized within its bucket (distance / bucket mean distance) so a
    * naturally diffuse cluster doesn't drown a genuinely anomalous point
    * in a tight one. Top-N by that ratio, deterministic tiebreak.
    *
    * Reuses the session-memoized IVF fit ([[ivfAssign]]) — no second
    * k-means; the centroid relation is k rows and broadcasts; the
    * per-bucket mean is a window on the bucket key (the assignment's own
    * partitioning). One linear scan + a distributed TakeOrdered. Kernel-
    * dependent (k-means fit) → rows-only with a planted-outlier spec.
    *
    * A vector the fit isolates into its own singleton bucket defines its
    * own bucket mean — the within-bucket ratio is vacuously uninformative
    * (reported as 0), and normalization cannot see between-bucket
    * anomalies. Those rows carry `singleton = true` and sort FIRST: a
    * point the fit refused to merge into any cluster is precisely the
    * kind of between-bucket anomaly this view exists to surface, and the
    * flag routes it to an exact-distance audit instead of silently
    * burying it at ratio 0 (the pre-r11 blind spot).
    */
  def embeddingOutliers(spark: SparkSession, dir: String, topN: Int = 100): DataFrame = {
    val (assigned, cents) = ivfAssign(spark, dir)
    embeddingOutliersOn(assigned, cents, topN)
  }

  private[graft] def embeddingOutliersFrom(c: DataFrame, k: Int = 0,
      topN: Int = 100): DataFrame = {
    val (assigned, cents) = ivfAssignFrom(c, k)
    embeddingOutliersOn(assigned, cents, topN)
  }

  private def embeddingOutliersOn(assigned: DataFrame, cents: DataFrame,
      topN: Int): DataFrame = {
    val byBucket = Window.partitionBy(col("bucket"))
    assigned
      .join(broadcast(cents), "bucket")
      .withColumn("dist", sqrt(VecFns.l2sq(col("emb"), col("cemb"))))
      // the bucket normalizer runs on µ-quantized INTEGER distances:
      // a float avg() is summation-order dependent (ratio ≈ dist/mean
      // could flip its 6th decimal between runs/engines), while integer
      // sums are exact — ratio = di·n/Σdi is a pure function of the
      // bucket's membership. di ≤ ~2e6 for unit vectors, so di·n stays
      // in int64 up to trillion-row buckets.
      .withColumn("di", round(col("dist") * lit(1.0e6), 0).cast("long"))
      .withColumn("sum_di", sum(col("di")).over(byBucket))
      .withColumn("nb", count(lit(1)).over(byBucket))
      .withColumn("singleton", col("nb") === 1L)
      // a singleton defines its own mean (ratio vacuously 0 — the flag
      // carries the signal); an all-identical-at-centroid bucket has
      // Σdi 0: its members are no outliers
      .withColumn("ratio",
        when(!col("singleton") && col("sum_di") > 0L,
          (col("di") * col("nb")).cast("double") / col("sum_di").cast("double"))
          .otherwise(lit(0.0)))
      .select(col("vec_id"), col("bucket"),
        round(col("dist"), 6).as("dist"),
        round(col("ratio"), 6).as("outlier_ratio"),
        col("singleton"))
      .orderBy(col("singleton").desc, col("outlier_ratio").desc, col("vec_id"))
      .limit(topN)
  }

  /** [[embeddingOutliers]] over the deterministic seeded quantizer
    * instead of the k-means fit — the oracle-verified member of the
    * outlier family (same promotion pattern as ann_ivf_seeded): seed
    * choice, argmin assignment, distances, and the integer-normalized
    * ratio are all pure functions of the corpus, so the ranking replays
    * in SQL end-to-end. Trade: seeded centroids are corpus samples, not
    * fitted means, so within-bucket distances skew slightly larger —
    * the ratio normalization absorbs that by construction. */
  def embeddingOutliersSeeded(spark: SparkSession, dir: String,
      topN: Int = 100): DataFrame = {
    val (assigned, cents) = seededAssignFor(spark, dir)
    embeddingOutliersOn(assigned,
      cents.select(col("bucket"), col("cemb")), topN)
  }

  private[graft] def embeddingOutliersSeededFrom(c: DataFrame, k: Int = 0,
      topN: Int = 100): DataFrame = {
    val (assigned, cents) = seededAssign(c, k)
    embeddingOutliersOn(assigned, cents.select(col("bucket"), col("cemb")), topN)
  }

  /** RAG context assembly (llm_processor.py:44-60): embed the incident
    * batch, top-5 similar docs per incident, union, dedup.
    *
    * Cosine is computed from the INTEGER slot counts as
    * dot/(√Σc²·√Σq²): the integer dot and norms are exact, the one
    * float expression is mirrored token-for-token by the SQL oracle, so
    * similarity ranks (not just rounded scores) are bit-identical across
    * engines. A timeless entry cannot rank among the earliest five
    * incidents (same NULL-ts contract as the Slack share batch), and
    * both inputs are full-row DISTINCTed at entry: at-least-once
    * delivery collapses before any similarity math (same entity
    * contract as click attribution — conflicting same-id rows are out
    * of contract).
    */
  def ragContext(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Shuffles.distinctEntities(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"), col("source")))
      .select(col("doc_id"),
        embedCounts(concat_ws(" ", col("text"), col("source"))).as("c"))
      .withColumn("sd", aggregate(col("c"), lit(0L), (a, x) => a + x * x))
    val incidents = Tables.events(spark, dir)
      .where(col("event_type") === "error" && col("ts").isNotNull)
      .select(col("event_id"), col("ts"), col("props"), col("event_type")).distinct()
      .orderBy(col("ts"), col("event_id"))
      .limit(5)
      .select(col("event_id").as("incident_id"),
        embedCounts(concat_ws(" ", col("props"), col("event_type"))).as("qc"))
      .withColumn("sq", aggregate(col("qc"), lit(0L), (a, x) => a + x * x))
    val byInc = Window.partitionBy("incident_id").orderBy(col("sim").desc, col("doc_id"))
    docs.crossJoin(broadcast(incidents))
      .withColumn("dot",
        aggregate(zip_with(col("c"), col("qc"), (a, b) => a * b), lit(0L), (a, x) => a + x))
      .withColumn("sim",
        when(col("sd") > 0 && col("sq") > 0,
          col("dot").cast("double") /
            (sqrt(col("sd").cast("double")) * sqrt(col("sq").cast("double"))))
          .otherwise(lit(0.0)))
      .withColumn("rk", row_number().over(byInc))
      .where(col("rk") <= 5)
      .groupBy(col("doc_id"))
      .agg(count("*").as("n_hits"),
        min("incident_id").as("first_incident"),
        round(max("sim"), 4).as("best_sim"))
  }

  /** Full build_prompt assembly (llm_processor.py:30-42): one RCA prompt
    * for the incident batch — current log lines + RAG context lines +
    * instruction header/footer — assembled distributively.
    *
    * Empty-input contract mirrors SQL aggregation (string_agg over zero
    * rows is NULL, `||` propagates): either section empty → NULL prompt,
    * one row either way. A line with a NULL field is NULL and is skipped
    * by both engines' joins — same contract as the Slack share. */
  def ragPrompt(spark: SparkSession, dir: String): DataFrame = {
    def joined(sortKey: Column): Column =
      when(count(col("line")) > 0,
        array_join(transform(
          sort_array(collect_list(struct(sortKey, col("line")))),
          x => x.getField("line")), "\n"))
    val incidents = Tables.events(spark, dir)
      .where(col("event_type") === "error" && col("ts").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("props"))
      .distinct()
      .orderBy(col("ts"), col("event_id"))
      .limit(5)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        TextFns.redactSecrets(col("props")).as("msg"))
    val batchLines = incidents
      .select(col("event_id"),
        format_string("- %s | user_%d | %s | %s",
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
          col("user_id"), col("event_type"), col("msg")).as("line"))
      .agg(joined(col("event_id")).as("batch_txt"))
    val simLines = ragContext(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text")).distinct(), "doc_id")
      .select(col("doc_id"),
        format_string("- doc_%d | %s | %s",
          col("doc_id"), col("source"),
          TextFns.redactSecrets(col("text"))).as("line"))
      .agg(joined(col("doc_id")).as("sim_txt"))
    batchLines.crossJoin(simLines)
      .select(concat(
        lit("Given the following logs and similar past incidents, summarize the root cause and suggest a fix.\n\nCurrent Logs:\n"),
        col("batch_txt"),
        lit("\n\nSimilar Past Incidents:\n"),
        col("sim_txt"),
        lit("\n\nRCA and Fix Suggestion:")).as("prompt"))
  }
}
