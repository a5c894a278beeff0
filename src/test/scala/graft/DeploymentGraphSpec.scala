package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{StreamJoins, StreamPipeline}

/** The whole reference main loop as ONE streaming deployment graph —
  * chaining the surfaces the other suites prove in isolation: a
  * kafka-shaped source (broker binary key/value contract) fans into
  *   events → parse → redact → attribution candidates → last-touch
  *            winner store, and
  *   docs   → parse → redact → streaming near-dup dedup → signature
  *            index append,
  * driven across ≥3 real micro-batches per topic (maxFilesPerTrigger=1)
  * with a mid-run crash (injected store debris) and a restart from the
  * same checkpoints. Final stores must equal the BATCH operators of
  * record over the same inputs — the continuous deployment and the
  * batch engine are one contract.
  *
  * Mirrors the reference's poll → preprocess → embed/index → analyze
  * loop (/root/reference/main.py:14-45) as a continuous job.
  */
class DeploymentGraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private def rec(off: Long, json: String) = Row(
    s"k$off".getBytes("UTF-8"), json.getBytes("UTF-8"), "t", 0, off,
    Timestamp.valueOf("2024-07-01 10:00:00"), 0)

  private def writeBatch(dir: String, name: String, rows: Seq[Row]): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), kafkaSchema)
      .write.parquet(s"$dir/$name")

  test("kafka ingest -> redact -> dedup index + attribution winner store " +
      "across micro-batches with crash/restart equals the batch engine") {
    import spark.implicits._
    val base = "/tmp/graft_deploy_graph"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
    val evDir = s"$base/topic_events"; val docDir = s"$base/topic_docs"
    val idx = s"$base/sig_index"; val store = s"$base/winner_store"
    val tile = s"$base/hll_tile"
    val model = s"$base/bpe_model"; val enc = s"$base/bpe_encoded"
    new java.io.File(evDir).mkdirs(); new java.io.File(docDir).mkdirs()
    // the tokenizer is trained ONCE (on the reference corpus) and
    // persisted BEFORE the stream starts — the durable-model serving
    // contract: micro-batches encode fit-free, novel words take the
    // frozen fallback
    graft.operators.Corpus.writeBpeModel(spark, SparkTest.Sf, model)

    // ---- the graph ----------------------------------------------------
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("props", StringType)))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def startGraph(): (org.apache.spark.sql.streaming.StreamingQuery,
        org.apache.spark.sql.streaming.StreamingQuery,
        org.apache.spark.sql.streaming.StreamingQuery,
        org.apache.spark.sql.streaming.StreamingQuery) = {
      val evRaw = spark.readStream.schema(kafkaSchema)
        .option("maxFilesPerTrigger", 1).option("basePath", evDir)
        .parquet(s"$evDir/*")
      val events = StreamPipeline.ingestRedact(
        StreamPipeline.parseKafkaJson(evRaw, evSchema))
      // one parsed relation, both join sides — attributionCandidates
      // applies its own purchase/view filters and watermarks
      val attrQ = StreamJoins.lastTouchSink(
        StreamJoins.attributionCandidates(events, events),
        store, s"$base/ckpt_attr")
      // the live distinct-users tile: HLL registers in checkpointed
      // state, running estimates appended to a durable log — the latest
      // row per type (max n_events, monotone per group) IS the tile
      val hllQ = graft.streaming.StatefulSketch(
        graft.streaming.StatefulSketch.fromEvents(events))
        .toDF().writeStream.format("parquet")
        .option("path", tile).option("checkpointLocation", s"$base/ckpt_hll")
        .outputMode("append").start()
      val docRaw = spark.readStream.schema(kafkaSchema)
        .option("maxFilesPerTrigger", 1).option("basePath", docDir)
        .parquet(s"$docDir/*")
      val docs = StreamPipeline.parseKafkaJson(docRaw, docSchema)
        .where(col("doc_id").isNotNull)
        // preprocess_redact before anything is signed or indexed — the
        // reference's preprocessor step in stream position
        .withColumn("text", graft.functions.TextFns.redactPii(col("text")))
      val dedupQ = StreamPipeline.dedupingIndexSink(docs, idx, s"$base/ckpt_dedup")
      // fourth leg: per-micro-batch BPE encoding against the PERSISTED
      // model (no training in the hot path). Encoding is a deterministic
      // pure function of (doc_id, text), so a crash-replayed batch
      // appends byte-identical rows — the read side distincts
      val encQ = docs.writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          graft.operators.Corpus.bpeEncodeAgainstFrom(spark, b, model)
            .write.mode("append").parquet(enc)
        }
        .option("checkpointLocation", s"$base/ckpt_enc").start()
      (attrQ, dedupQ, hllQ, encQ)
    }

    // ---- the feed -----------------------------------------------------
    def evJson(id: Long, u: Long, ts: String, et: String) =
      s"""{"event_id":$id,"user_id":$u,"ts":"${ts.replace(' ', 'T')}Z","event_type":"$et","props":"p$id"}"""
    val bodyA = (1 to 50).map(i => s"a$i").mkString(" ")
    val bodyB = (1 to 50).map(i => s"b$i").mkString(" ")
    val bodyC = "contact ops@example.com now " + (1 to 50).map(i => s"c$i").mkString(" ")
    val bodyD = (1 to 50).map(i => s"d$i").mkString(" ")
    def docJson(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text"}"""

    var fedEvents = Seq.empty[(Long, Long, Timestamp, String)]
    def feedEvents(name: String, rows: Seq[(Long, Long, String, String)]): Unit = {
      fedEvents ++= rows.map { case (id, u, ts, et) =>
        (id, u, Timestamp.valueOf(ts), et) }
      writeBatch(evDir, name, rows.zipWithIndex.map { case ((id, u, ts, et), i) =>
        rec(id * 10 + i, evJson(id, u, ts, et)) })
    }
    var fedDocs = Seq.empty[(Long, String)]
    def feedDocs(name: String, rows: Seq[(Long, String)]): Unit = {
      fedDocs ++= rows
      writeBatch(docDir, name, rows.zipWithIndex.map { case ((id, tx), i) =>
        rec(id * 10 + i, docJson(id, tx)) })
    }

    val (attr1, dedup1, hll1, enc1) = startGraph()
    try {
      // batch 1
      feedEvents("b1", Seq((101L, 1L, "2024-07-01 11:40:00", "view"),
        (10L, 1L, "2024-07-01 12:00:00", "purchase")))
      feedDocs("b1", Seq((1L, bodyA), (2L, bodyB), (3L, bodyA + " tail1 tail2")))
      attr1.processAllAvailable(); dedup1.processAllAvailable()
      hll1.processAllAvailable(); enc1.processAllAvailable()
      // batch 2: a late-but-in-threshold upgrade view for p10, a matched
      // purchase p11, and a doc near-duplicating the INDEX (4) plus a
      // fresh doc carrying PII (5)
      feedEvents("b2", Seq((102L, 1L, "2024-07-01 11:55:00", "view"),
        (104L, 2L, "2024-07-01 12:05:00", "view"),
        (11L, 2L, "2024-07-01 12:10:00", "purchase")))
      feedDocs("b2", Seq((4L, bodyA + " tail3"), (5L, bodyC)))
      attr1.processAllAvailable(); dedup1.processAllAvailable()
      hll1.processAllAvailable(); enc1.processAllAvailable()
    } finally { attr1.stop(); dedup1.stop(); hll1.stop(); enc1.stop() }

    assert(spark.read.parquet(idx).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 5L), "pre-crash index: intra-batch and vs-index dups dropped")

    // ---- the crash ----------------------------------------------------
    // signature index: interrupted swap (live dir set aside, no tmp) +
    // dead partial merge tmp; winner store: one leaf set aside mid-swap
    // + dead merge tmp. The restarted sinks must heal ALL of it at entry.
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + "__swap_old")))
    new java.io.File(idx + "__merge_tmp").mkdirs()
    val peDirs = new java.io.File(store).listFiles().filter(_.getName.startsWith("pe="))
    val victimLeaf = peDirs.head.listFiles().filter(_.getName.startsWith("pb=")).head
    assert(victimLeaf.renameTo(
      new java.io.File(victimLeaf.getParentFile, victimLeaf.getName + "__swap_old")))
    new java.io.File(store + "__merge_tmp/pe=0").mkdirs()

    // batches 3 and 4 land while the graph is DOWN
    feedEvents("b3", Seq((103L, 3L, "2024-07-01 12:20:00", "view"),
      (12L, 3L, "2024-07-01 12:30:00", "purchase"),
      (13L, 4L, "2024-07-01 14:00:00", "purchase")))
    feedDocs("b3", Seq((6L, bodyC + " tail"), (7L, bodyD)))
    // b4 advances the watermark so p13's no-view NULL verdict can flush
    feedEvents("b4", Seq((105L, 5L, "2024-07-01 16:20:00", "view"),
      (14L, 5L, "2024-07-01 16:30:00", "purchase")))

    val (attr2, dedup2, hll2, enc2) = startGraph()
    try {
      attr2.processAllAvailable(); dedup2.processAllAvailable()
      hll2.processAllAvailable(); enc2.processAllAvailable()
    } finally { attr2.stop(); dedup2.stop(); hll2.stop(); enc2.stop() }

    // ---- the proof ----------------------------------------------------
    // 1) no crash debris survives anywhere
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + "__swap_old")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(idx + "__merge_tmp")),
      "index debris healed")
    def swapDebris(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.endsWith("__swap_old"))
    assert(swapDebris(new java.io.File(store)).isEmpty, "winner leaf debris healed")
    assert(!new java.io.File(store + "__merge_tmp").exists(), "winner tmp dropped")

    // 2) winner store == the batch attribution operator of record over
    //    everything fed (all arrivals were in-watermark by construction)
    val streamed = StreamJoins.readLastTouch(spark, store)
    val batchRef = graft.operators.EventFlows.clickAttributionFrom(
      fedEvents.toDF("event_id", "user_id", "ts", "event_type"))
    def rows(df: DataFrame) = df.orderBy("purchase_id").collect().map(_.toSeq).toSeq
    assert(rows(streamed) == rows(batchRef),
      s"winner store must equal the batch engine:\n stream=${rows(streamed)}\n batch =${rows(batchRef)}")

    // 3) final index doc set: 6 near-dups 5 (post-redaction) and is
    //    refused; 7 is fresh
    assert(spark.read.parquet(idx).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 5L, 7L), "post-restart index")

    // 4) the index's signatures equal the batch kernels over the SAME
    //    redacted texts — the redact step demonstrably ran before
    //    signing (doc 5 carried an email)
    val expected = Seq((1L, bodyA), (2L, bodyB), (5L, bodyC), (7L, bodyD))
      .toDF("doc_id", "text")
      .select(col("doc_id").as("id"),
        graft.operators.NearDup.minhashSig(graft.operators.NearDup.wordShingles(
          graft.functions.TextFns.redactPii(col("text")), 3), 128).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val stored = spark.read.parquet(idx)
      .select(col("id"), col("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(stored == expected,
      "indexed signatures must equal the batch kernel over redacted text")
    val unredacted = Seq((5L, bodyC)).toDF("doc_id", "text")
      .select(graft.operators.NearDup.minhashSig(
        graft.operators.NearDup.wordShingles(col("text"), 3), 128).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(stored(5L) != unredacted,
      "doc 5's raw (unredacted) text must NOT be what got signed")

    // 5) the live HLL tile: registers rode the checkpoint across the
    //    crash, so the LATEST row per type (max n_events — monotone per
    //    group) must equal the batch sketch over everything fed
    val tileRows = spark.read.parquet(tile).collect()
      .map(r => (Option(r.getAs[String]("event_type")),
        r.getAs[Long]("n_users_approx"), r.getAs[Long]("n_events")))
    val latest = tileRows.groupBy(_._1).map { case (t, rs) =>
      val r = rs.maxBy(_._3); t -> (r._2, r._3) }
    val batchTile = graft.operators.Sketches.approxDistinctCounts(
      fedEvents.toDF("event_id", "user_id", "ts", "event_type")
        .withColumn("props", concat(lit("p"), col("event_id"))))
      .collect().map(r => (Option(r.getString(0)),
        (r.getLong(1), r.getLong(3)))).toMap
    assert(latest == batchTile,
      s"live tile must equal the batch sketch over all fed events:\n" +
        s" tile =$latest\n batch=$batchTile")

    // 6) the encode log == the persisted-model batch encode over every
    //    fed doc (same redaction first) — the durable tokenizer serving
    //    micro-batches fit-free; replayed batches write byte-identical
    //    rows, so the read side distincts
    val fedDocsDf = fedDocs.toDF("doc_id", "text")
      .withColumn("text", graft.functions.TextFns.redactPii(col("text")))
    val encRef = graft.operators.Corpus
      .bpeEncodeAgainstFrom(spark, fedDocsDf, model)
      .collect().map(_.toSeq).toSet
    val encGot = spark.read.parquet(enc).distinct()
      .collect().map(_.toSeq).toSet
    assert(encRef.nonEmpty, "the encode leg must produce rows")
    assert(encGot == encRef,
      s"streamed encodes must equal the persisted-model batch encode:\n" +
        s" stream=$encGot\n batch =$encRef")
  }
}
