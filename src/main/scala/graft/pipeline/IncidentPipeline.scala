package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{TextFns, VecFns}
import graft.operators.{Embeddings, Upsert}

/** Pipeline configuration — the engine-side twin of the reference's
  * env-driven config surface (/root/reference/src/config.py,
  * new_relic_fetcher.py:55-79, embedder.py:9-16, llm_processor.py:9-13).
  * Defaults mirror the reference's defaults where a counterpart exists.
  */
case class GraftConfig(
    levelFilter: String = "error",            // NR_MESSAGE_ERROR_FILTER analog
    healthFilter: String = "%\"k\": 0}%",     // NR_MESSAGE_HEALTH_FILTER analog
    messageLike: String = "%k%",              // NR_MESSAGE_HTTP/containers analog
    sinceTs: String = "2024-01-01 00:00:00",  // NR_TIME_WINDOW
    untilTs: String = "2100-01-01 00:00:00",
    limitCount: Int = 1000,                   // NR_LIMIT_COUNT
    embedDim: Int = Embeddings.Dim,           // EMBEDDING_MODEL dim analog
    embedFields: String = "text,source",      // EMBEDDING_FIELDS (embedder.py:14)
    ragTopK: Int = 5,                         // RAG_TOP_K
    batchSize: Int = 5) {                     // main.py --batch-size
  // The incident batch is BROADCAST against the corpus (ragBatch,
  // Embeddings.ragContext) and collected for prompt assembly — both are
  // safe only because the batch is config-bounded. Enforce the bound at
  // construction so a misconfigured "full day" batch fails loudly here,
  // not as a multi-GB broadcast OOM three stages later.
  require(batchSize > 0 && batchSize <= GraftConfig.MaxBatchSize,
    s"batchSize=$batchSize outside (0, ${GraftConfig.MaxBatchSize}]: " +
      "the incident batch is broadcast + collected and must stay query-sized")
  require(ragTopK > 0 && ragTopK <= GraftConfig.MaxRagTopK,
    s"ragTopK=$ragTopK outside (0, ${GraftConfig.MaxRagTopK}]: " +
      "ragTopK*batchSize context lines are collected for the prompt")
}

object GraftConfig {
  /** Broadcast/collect safety bound on the incident batch: 10k rows ×
    * (embedding Dim doubles + a log line) is single-digit MB — far under
    * any broadcast threshold — while 100× the reference's own batch. */
  val MaxBatchSize = 10000
  /** Prompt assembly collects ragTopK×batchSize context lines. */
  val MaxRagTopK = 1000
  /** Env-style lookup with defaults (config.py get_config semantics). */
  def from(get: String => Option[String]): GraftConfig = {
    val d = GraftConfig()
    GraftConfig(
      levelFilter = get("GRAFT_LEVEL_FILTER").getOrElse(d.levelFilter),
      healthFilter = get("GRAFT_HEALTH_FILTER").getOrElse(d.healthFilter),
      messageLike = get("GRAFT_MESSAGE_LIKE").getOrElse(d.messageLike),
      sinceTs = get("GRAFT_SINCE").getOrElse(d.sinceTs),
      untilTs = get("GRAFT_UNTIL").getOrElse(d.untilTs),
      limitCount = get("GRAFT_LIMIT").map(_.toInt).getOrElse(d.limitCount),
      embedDim = get("GRAFT_EMBED_DIM").map(_.toInt).getOrElse(d.embedDim),
      embedFields = get("GRAFT_EMBED_FIELDS").getOrElse(d.embedFields),
      ragTopK = get("GRAFT_RAG_TOP_K").map(_.toInt).getOrElse(d.ragTopK),
      batchSize = get("GRAFT_BATCH_SIZE").map(_.toInt).getOrElse(d.batchSize))
  }
  def fromEnv(): GraftConfig = from(sys.env.get)
}

/** End-to-end incident pipeline — the Spark twin of
  * /root/reference/main.py:14-70 (run_pipeline): fetch → preprocess →
  * embed → index → RAG context → prompt → history sink. The LLM call
  * itself is the external boundary (as in the reference); the pipeline
  * produces the exact prompt and context it would receive.
  *
  * Every stage is a DataFrame transform, so the whole flow is one lazy
  * plan per sink — fetch filters push to the scan, embedding is a native
  * kernel, search broadcasts only the incident batch.
  */
object IncidentPipeline {
  private val TsUs = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Stage 1 — fetch_logs: NRQL-shaped filter + window + ordered limit. */
  def fetch(spark: SparkSession, dir: String, cfg: GraftConfig): DataFrame =
    Tables.events(spark, dir)
      .where(col("event_type") === cfg.levelFilter &&
        !col("props").like(cfg.healthFilter) &&
        col("props").like(cfg.messageLike) &&
        col("ts") >= lit(cfg.sinceTs).cast("timestamp") &&
        col("ts") < lit(cfg.untilTs).cast("timestamp"))
      .orderBy(col("ts"), col("event_id"))
      .limit(cfg.limitCount)

  /** Stage 2 — preprocess_logs: PII redaction + (message, ts) dedup. */
  def preprocess(fetched: DataFrame): DataFrame =
    fetched
      .withColumn("props", TextFns.redactPii(col("props")))
      .withColumn("ts_us", date_format(col("ts"), TsUs))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("props", "ts_us").orderBy("event_id")))
      .where(col("__rn") === 1).drop("__rn")

  /** Stage 3 — embed_logs over the configured fields. */
  def embed(cleaned: DataFrame, cfg: GraftConfig): DataFrame =
    cleaned.withColumn("embedding",
      Embeddings.embedCol(concat_ws(" ", col("props"), col("event_type")), cfg.embedDim))

  /** Stage 4 — vector index sink (the FAISS add_logs + save analog):
    * embeddings + metadata as parquet, queryable by any later session. */
  def writeIndex(embedded: DataFrame, indexPath: String): Unit =
    embedded.write.mode("overwrite").parquet(indexPath)

  /** Stage 4, append mode — the FAISS accumulating-index contract: the
    * reference's `add_logs` LOADS the saved index and appends each run's
    * vectors to it (faiss_db.py:19-21,37-47), so the index grows across
    * runs. The parquet twin merges the new batch onto the existing index
    * by event_id — [[graft.operators.Upsert.mergeByKey]], one
    * key-partitioned equi-join — so a re-embedded event REPLACES its row
    * instead of duplicating it (FAISS's raw `add` would double-count;
    * merge is the upsert an accumulating store actually wants). Write is
    * to a temp dir then swapped in: the merged plan READS `indexPath`, so
    * an in-place overwrite would truncate its own input mid-job. At scale
    * the store would be date-partitioned so a merge only rewrites touched
    * partitions; the swap here is the single-store local twin. */
  def appendIndex(spark: SparkSession, embedded: DataFrame,
      indexPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(indexPath + "__merge_tmp")
    // heal a previous run's crashed swap before deciding on exists(p) — a
    // delete+rename swap here could otherwise lose the whole accumulated
    // index to a crash between the two calls
    graft.sources.IO.recoverStore(fs, p, tmp)
    // the FIRST write also goes through tmp+swap: recoverStore's "p exists
    // means p is complete" rests on p only ever being produced by an
    // atomic rename — a direct first write that crashed mid-commit would
    // leave a partial store recovery then adopts as authoritative
    val merged =
      if (!fs.exists(p)) embedded
      else {
        val existing = spark.read.parquet(indexPath)
        Upsert.mergeByKey(existing,
          embedded.select(existing.columns.map(col).toIndexedSeq: _*),
          Seq("event_id"))
      }
    merged.write.mode("overwrite").parquet(tmp.toString)
    graft.sources.IO.swapInto(fs, tmp, p)
  }

  /** Stage 5 — RAG: top-k index entries per batch incident (cosine = dot
    * on unit vectors), deduped; plus the assembled RCA prompt. */
  def ragBatch(spark: SparkSession, indexPath: String, embedded: DataFrame,
      cfg: GraftConfig): (DataFrame, String) = {
    val index = spark.read.parquet(indexPath)
      .select(col("event_id").as("idx_id"), col("ts_us").as("idx_ts"),
        col("props").as("idx_msg"), col("embedding").as("idx_emb"))
    val batch = embedded.orderBy(col("ts"), col("event_id")).limit(cfg.batchSize)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"), col("props"), col("embedding"))
    val byInc = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("sim").desc, col("idx_id"))
    val similar = index.crossJoin(broadcast(batch.select(
        col("event_id"), col("embedding").as("qemb"))))
      .withColumn("sim", VecFns.dot(col("idx_emb"), col("qemb")))
      .withColumn("rk", row_number().over(byInc))
      .where(col("rk") <= cfg.ragTopK && col("idx_id") =!= col("event_id"))
      .groupBy(col("idx_id"), col("idx_ts"), col("idx_msg"))
      .agg(round(max("sim"), 4).as("best_sim"), count("*").as("n_hits"))
    val batchLines = batch.collect().map(r =>
      s"- ${r.getAs[String]("ts_us")} | user_${r.getAs[Long]("user_id")} | " +
        s"${r.getAs[String]("event_type")} | ${r.getAs[String]("props")}")
    val simLines = similar.orderBy(col("best_sim").desc, col("idx_id"))
      .limit(cfg.ragTopK * cfg.batchSize).collect()
      .map(r => s"- ${r.getAs[String]("idx_ts")} | ${r.getAs[String]("idx_msg")}")
    val prompt =
      "Given the following logs and similar past incidents, summarize the root cause and suggest a fix.\n\n" +
        "Current Logs:\n" + batchLines.mkString("\n") +
        "\n\nSimilar Past Incidents:\n" + simLines.mkString("\n") +
        "\n\nRCA and Fix Suggestion:"
    (similar, prompt)
  }

  /** Full run — the main.py flow. Returns (history row count, prompt). */
  def run(spark: SparkSession, dir: String, outDir: String,
      cfg: GraftConfig = GraftConfig()): (Long, String) = {
    val cleaned = preprocess(fetch(spark, dir, cfg))
    val embedded = embed(cleaned, cfg).persist()
    val indexPath = s"$outDir/index"
    writeIndex(embedded, indexPath)
    val (similar, prompt) = ragBatch(spark, indexPath, embedded, cfg)
    // Stage 6 — history sink (rca_history.json analog, parquet not JSON
    // because the dashboard re-queries it)
    val history = similar
      .withColumn("prompt_chars", lit(prompt.length))
      .withColumn("run_batch_size", lit(cfg.batchSize))
    history.write.mode("overwrite").parquet(s"$outDir/history")
    val n = spark.read.parquet(s"$outDir/history").count()
    embedded.unpersist()
    (n, prompt)
  }
}
