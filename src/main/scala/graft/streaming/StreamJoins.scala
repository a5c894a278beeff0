package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Stream-stream joins — the capability class the stateful-operator twins
  * (sessionize, transitions, spikes, templates) don't cover: two LIVE
  * streams correlated on key + time bounds, with watermarks letting the
  * engine discard join state it can no longer need.
  */
object StreamJoins {

  /** Continuous attribution-candidate stream: every (purchase, view) pair
    * for the same user with the view inside the trailing window — the
    * streaming form of [[graft.operators.EventFlows.clickAttribution]].
    *
    * The interval condition (`vts BETWEEN ts - window AND ts`) plus the
    * two watermarks bound the join state: a buffered view older than
    * watermark + window can never match a future purchase and is evicted
    * by the engine. Left-outer, so an unattributed purchase still emits
    * (with NULL view columns) once its watermark passes — the engine can
    * only then prove no matching view is still coming.
    *
    * Emits CANDIDATES, not the batch operator's single last-touch pick:
    * top-1-per-purchase needs a rank over a completed group, which
    * append-mode stream joins cannot express — downstream picks (or the
    * batch path of record recomputes) the winner. Both forms agree on
    * WHICH views are eligible; the spec drives that equivalence.
    *
    * Inputs are streaming DataFrames with the events schema; both get
    * `delayThreshold`-late tolerance.
    */
  def attributionCandidates(purchases: DataFrame, views: DataFrame,
      windowHours: Int = 1, delayThreshold: String = "10 minutes"): DataFrame = {
    val p = purchases
      .where(col("event_type") === "purchase" && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      .withWatermark("ts", delayThreshold)
    val v = views
      .where(col("event_type") === "view" && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("vts"))
      .withWatermark("vts", delayThreshold)
    p.join(v,
      col("user_id") === col("v_user_id") &&
        col("vts") >= col("ts") - expr(s"INTERVAL $windowHours HOURS") &&
        col("vts") <= col("ts"),
      "leftOuter")
      .select(col("purchase_id"), col("user_id"), col("ts"),
        col("view_id"), col("vts"))
  }

  /** Bucket fan of the winner store: within each purchase-ts epoch day,
    * winners hash-partition by purchase_id into this many directories.
    * A micro-batch's merge reads and rewrites ONLY the (epoch, bucket)
    * leaves its own purchases land in — the same partition-pruned
    * durable-store shape as the near-dup signature index
    * ([[graft.operators.NearDup.IndexBuckets]]). */
  val StoreBuckets = 64

  /** Degrade-gracefully threshold: a batch touching more distinct
    * (epoch, bucket) leaves than this (a backfill spanning years) skips
    * the pruning predicate and merges against the full store — the same
    * "corpus-sized increment degrades to the full scan" contract the
    * signature index documents. */
  private val MaxTouchedLeaves = 4096

  /** Streaming last-touch attribution END-TO-END: ranks the candidate
    * stream's (purchase, view) pairs per micro-batch and maintains a
    * one-winner-per-purchase store on disk — closing the loop
    * [[attributionCandidates]]' scaladoc leaves open (top-1-per-purchase
    * is not expressible in append mode, but it IS expressible per
    * micro-batch against the running store).
    *
    * Cross-batch upgrades: a late view (inside the delay threshold) can
    * arrive in a LATER micro-batch than its purchase's first candidate.
    * Each batch re-ranks the union of the prior winners and the new
    * candidates on (vts DESC NULLS LAST, view_id DESC NULLS LAST) per
    * purchase — the same total order the batch operator's
    * max-event_id-per-(user, ts) pre-aggregation + asof pick induces —
    * so a more-recent late candidate replaces the stored winner and an
    * unattributed purchase's NULL candidate (emitted only once the
    * watermark proves no view is coming) never displaces a real match.
    *
    * BOUNDED per-batch cost — the store is partitioned two levels deep,
    * `pe` (purchase-ts epoch day) × `pb` (hash(purchase_id) mod
    * [[StoreBuckets]]), and a micro-batch merges only the leaves its own
    * purchases touch: the prior read opens EXACTLY the touched leaf
    * directories (explicit paths + `basePath`, [[prunedPrior]] — no
    * store-wide partition discovery), crash healing walks only the
    * touched epochs, and the rewrite swaps only those directories. Both
    * data I/O AND filesystem listing scale with the batch, NEVER with
    * stream lifetime: a watermarked candidate stream can only emit for
    * recent purchase timestamps, so old epochs are sealed — their
    * winners can never change and their partitions are never read,
    * listed, or rewritten again.
    *
    * Crash safety: leaves are replaced with the rename-aside swap every
    * durable store here uses ([[graft.sources.IO.swapInto]]) — each leaf
    * has a complete version on disk at every instant. A crash mid-merge
    * leaves some leaves updated and some not; [[recoverLeaves]] restores
    * any set-aside leaf and drops the tmp dir, and the replayed
    * micro-batch (foreachBatch + checkpoint replays an uncommitted
    * batch) re-merges idempotently: re-ranking winners that already
    * absorbed the batch against the same batch picks the same winners
    * (top-1 of a set is unchanged by re-adding candidates that lost).
    *
    * [[readLastTouch]] projects the store onto the exact output shape of
    * the batch path of record
    * ([[graft.operators.EventFlows.clickAttribution]]); the spec drives
    * both over the same events and asserts row equality.
    */
  def lastTouchSink(candidates: DataFrame, storePath: String,
      checkpoint: String, buckets: Int = StoreBuckets): StreamingQuery = {
    // one FULL healing pass per sink start: covers debris from any prior
    // lifetime (a crash whose batch never replays here, e.g. a new
    // checkpoint over an old store). Per-batch healing is then scoped to
    // the batch's own epochs — the only place replay debris can live
    recoverStore(candidates.sparkSession, storePath)
    candidates.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        mergeBatch(batch.toDF(), storePath, buckets)
        ()
      }
      .start()
  }

  /** One micro-batch's merge into the winner store — the foreachBatch
    * body, exposed for the bounded-I/O and pruning specs. */
  private[graft] def mergeBatch(batch: DataFrame, storePath: String,
      buckets: Int = StoreBuckets): Unit = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(storePath + "__merge_tmp")
    // pe/pb are functions of the PURCHASE (ts is the purchase ts on every
    // candidate row, including the NULL-view row), so all candidates for
    // one purchase land in one leaf and the per-purchase rank never
    // crosses a partition boundary
    // ts is the PARTITION key (pe below): a NULL purchase ts has no leaf
    // to land in and would NPE the touched-leaf collect. The streaming
    // source ([[attributionCandidates]]) already filters it; this guard
    // covers direct private[graft] callers feeding raw candidate rows.
    val b = batch
      .where(col("ts").isNotNull && col("purchase_id").isNotNull)
      .withColumn("pe", datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")))
      .withColumn("pb", pmod(xxhash64(col("purchase_id")), lit(buckets.toLong)).cast("int"))
      .persist()
    try {
      val touched = b.select("pe", "pb").distinct().collect()
        .map(r => (r.getInt(0), r.getInt(1))).sorted
      if (touched.nonEmpty) {
        // replay debris can only live in the interrupted batch's own
        // leaves, and foreachBatch replays the same batch (same touched
        // set) — so healing the touched epochs is complete, and O(batch)
        recoverLeaves(fs, p, tmp, touched.map(_._1).distinct.toIndexedSeq)
        // prior winners read from the touched leaves ONLY; never derived
        // from `batch` — a fresh parquet read has its own attribute IDs,
        // so the union below can never alias two sides of the same plan
        val merged0 = prunedPrior(spark, storePath, touched.toIndexedSeq)
          .map(_.unionByName(b)).getOrElse(b.toDF())
        // same ordering (and tie-breaks) as the batch twin's entity rank
        // in EventFlows.attributionCore — one contract, two engines
        val best = Window.partitionBy(col("purchase_id"))
          .orderBy(col("vts").desc_nulls_last, col("view_id").desc_nulls_last,
            col("ts").desc_nulls_last, col("user_id").desc_nulls_last)
        merged0
          .withColumn("rk", row_number().over(best))
          .where(col("rk") === 1).drop("rk")
          .repartition(col("pe"), col("pb"))
          .write.mode("overwrite").partitionBy("pe", "pb").parquet(tmp.toString)
        touched.foreach { case (e, x) =>
          val src = new org.apache.hadoop.fs.Path(tmp, s"pe=$e/pb=$x")
          if (fs.exists(src)) {
            val parent = new org.apache.hadoop.fs.Path(p, s"pe=$e")
            fs.mkdirs(parent)
            graft.sources.IO.swapInto(fs, src, new org.apache.hadoop.fs.Path(parent, s"pb=$x"))
          }
        }
        fs.delete(tmp, true)
      }
    } finally { b.unpersist(); () }
  }

  /** Prior winners for a merge, read from the touched leaf directories
    * DIRECTLY (explicit paths + `basePath`, which still materializes
    * pe/pb as partition columns): neither the data I/O nor the
    * filesystem LISTING sees untouched leaves, so per-batch cost is
    * O(touched) even against a store that has accumulated years of
    * sealed epochs — `spark.read.parquet(root)` would re-discover every
    * leaf each batch, a cost term proportional to store lifetime. None
    * when no touched leaf exists yet (first batch, or all-new leaves).
    * A batch touching more than [[MaxTouchedLeaves]] leaves (a backfill
    * spanning years) degrades to the full-store scan — pruning buys
    * nothing there and the path list would be planning-sized. */
  private[graft] def prunedPrior(spark: SparkSession, storePath: String,
      touched: Seq[(Int, Int)]): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (touched.length > MaxTouchedLeaves) {
      val hasStore = fs.exists(p) &&
        fs.listStatus(p).exists(_.getPath.getName.startsWith("pe="))
      if (hasStore) Some(spark.read.parquet(storePath)) else None
    } else {
      val leaves = touched.map { case (e, x) =>
        new org.apache.hadoop.fs.Path(p, s"pe=$e/pb=$x") }.filter(fs.exists)
      if (leaves.isEmpty) None
      else Some(spark.read.option("basePath", storePath)
        .parquet(leaves.map(_.toString): _*))
    }
  }

  /** Heal one epoch directory: restore any leaf set aside by an
    * interrupted [[graft.sources.IO.swapInto]] (old exists, promoted
    * copy missing → the pre-batch version is authoritative; both exist →
    * the promote completed, drop the old). */
  private def healEpoch(fs: org.apache.hadoop.fs.FileSystem,
      peDir: org.apache.hadoop.fs.Path): Unit = {
    val Old = "__swap_old"
    fs.listStatus(peDir).filter(_.getPath.getName.endsWith(Old)).foreach { st =>
      val orig = new org.apache.hadoop.fs.Path(
        peDir, st.getPath.getName.stripSuffix(Old))
      if (!fs.exists(orig)) {
        if (!fs.rename(st.getPath, orig))
          sys.error(s"recover: cannot restore ${st.getPath}")
      } else fs.delete(st.getPath, true)
    }
  }

  /** Per-batch crash recovery, scoped to the batch's own epochs: an
    * interrupted merge can only have set leaves aside in ITS touched
    * epochs, and the checkpoint replays that same batch (same touched
    * set) — so walking just those epoch dirs is complete, and the per-
    * batch listing stays O(batch) instead of O(store lifetime). Then
    * drop the merge tmp wholesale — the replayed micro-batch re-merges
    * idempotently, so tmp's partial (or even complete) output is never
    * needed. */
  private def recoverLeaves(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      epochs: Seq[Int]): Unit = {
    epochs.foreach { e =>
      val peDir = new org.apache.hadoop.fs.Path(p, s"pe=$e")
      if (fs.exists(peDir)) healEpoch(fs, peDir)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** Full-store healing pass — run ONCE per [[lastTouchSink]] start (not
    * per batch): covers debris that per-batch scoped recovery can never
    * see, e.g. a crash whose batch is not replayed because the store was
    * re-attached under a fresh checkpoint. */
  private[graft] def recoverStore(spark: SparkSession, storePath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      fs.listStatus(p).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("pe=")).foreach(s => healEpoch(fs, s.getPath))
    val tmp = new org.apache.hadoop.fs.Path(storePath + "__merge_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** The batch-shaped output schema of [[readLastTouch]]. */
  private val lastTouchSchema = StructType(Seq(
    StructField("purchase_id", LongType), StructField("user_id", LongType),
    StructField("purchase_ts", StringType), StructField("view_id", LongType),
    StructField("view_ts", StringType), StructField("gap_us", LongType)))

  /** The [[lastTouchSink]] store in the batch operator's output shape
    * (purchase_id, user_id, purchase_ts, view_id, view_ts, gap_us) — an
    * unattributed purchase keeps NULL view columns, exactly as
    * [[graft.operators.EventFlows.clickAttribution]] renders it. Before
    * the first micro-batch commits a leaf, the store path is absent (or
    * an empty directory) — that reads as an EMPTY relation in the same
    * shape, not a PATH_NOT_FOUND. */
  def readLastTouch(spark: SparkSession, storePath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val empty = !fs.exists(p) ||
      !fs.listStatus(p).exists(_.getPath.getName.startsWith("pe="))
    if (empty)
      spark.createDataFrame(java.util.Collections.emptyList[Row](), lastTouchSchema)
    else {
      val tsUs = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      spark.read.parquet(storePath).select(
        col("purchase_id"), col("user_id"),
        date_format(col("ts"), tsUs).as("purchase_ts"),
        col("view_id"),
        date_format(col("vts"), tsUs).as("view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("vts"))).as("gap_us"))
    }
  }
}
