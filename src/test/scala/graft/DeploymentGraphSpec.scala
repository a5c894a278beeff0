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
    val spikes = s"$base/spike_alerts"; val shapes = s"$base/shape_alerts"
    val lexIdx = s"$base/lex_index"
    val dedupLog = s"$base/dedup_verdicts"
    new java.io.File(evDir).mkdirs(); new java.io.File(docDir).mkdirs()
    // the tokenizer is trained ONCE (on the reference corpus) and
    // persisted BEFORE the stream starts — the durable-model serving
    // contract: micro-batches encode fit-free, novel words take the
    // frozen fallback
    graft.operators.Corpus.writeBpeModel(spark, SparkTest.Sf, model)
    // the lexical index starts EMPTY (a real deployment's day zero) —
    // micro-batches grow it via appends only
    graft.operators.LexIndex.writeLexIndexFrom(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), lexIdx)

    // ---- the graph ----------------------------------------------------
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("props", StringType)))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def startGraph(): Seq[org.apache.spark.sql.streaming.StreamingQuery] = {
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
      // fifth leg — the incident-trigger trilogy's streaming side (the
      // reference's whole point is this alerting loop, main.py → Slack):
      // the SAME parsed event stream fans into the rate-spike detector
      // (day verdicts emit as the watermark closes days; open-day counts
      // and the trailing baseline ride the checkpoint across the crash)
      // and the first-seen template trigger (one alert per novel shape,
      // known-shape state rides the checkpoint so a restart never
      // re-alerts)
      val spikeQ = graft.streaming.StatefulSpikes(
        graft.streaming.StatefulSpikes.fromEvents(events))
        .toDF().writeStream.format("parquet")
        .option("path", spikes)
        .option("checkpointLocation", s"$base/ckpt_spikes")
        .outputMode("append").start()
      val tmplQ = graft.streaming.StatefulTemplates(
        graft.streaming.StatefulTemplates.fromEvents(events))
        .toDF().writeStream.format("parquet")
        .option("path", shapes)
        .option("checkpointLocation", s"$base/ckpt_shapes")
        .outputMode("append").start()
      // sixth leg — continuous retrieval-index maintenance (the
      // reference's add_logs loop, faiss_db.py:52-58, on the lexical
      // side): each micro-batch of redacted docs appends its postings
      // increment at increment cost; a crash-replayed batch lays
      // byte-identical rows the read side collapses, so the leg is
      // exactly-once at the serving surface
      val lexQ = docs.writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          graft.operators.LexIndex.appendLexIndex(spark, lexIdx,
            b.select(col("doc_id"), col("text")))
        }
        .option("checkpointLocation", s"$base/ckpt_lex").start()
      // seventh leg — continuous EXACT dedup verdicts (the near-dup
      // index refuses similars; this is the byte-identity ledger next
      // to it): fingerprint state rides the checkpoint, so a duplicate
      // arriving AFTER the crash still folds onto its pre-crash twin
      val exQ = graft.streaming.StatefulDedup(
        graft.streaming.StatefulDedup.fromDocuments(
          docs.withColumn("n_chars", length(col("text")).cast("long"))))
        .toDF().writeStream.format("parquet")
        .option("path", dedupLog)
        .option("checkpointLocation", s"$base/ckpt_exdedup")
        .outputMode("append").start()
      Seq(attrQ, dedupQ, hllQ, encQ, spikeQ, tmplQ, lexQ, exQ)
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

    val run1 = startGraph()
    try {
      // batch 1
      feedEvents("b1", Seq((101L, 1L, "2024-07-01 11:40:00", "view"),
        (10L, 1L, "2024-07-01 12:00:00", "purchase")))
      feedDocs("b1", Seq((1L, bodyA), (2L, bodyB), (3L, bodyA + " tail1 tail2")))
      run1.foreach(_.processAllAvailable())
      // batch 2: a late-but-in-threshold upgrade view for p10, a matched
      // purchase p11, and a doc near-duplicating the INDEX (4) plus a
      // fresh doc carrying PII (5)
      feedEvents("b2", Seq((102L, 1L, "2024-07-01 11:55:00", "view"),
        (104L, 2L, "2024-07-01 12:05:00", "view"),
        (11L, 2L, "2024-07-01 12:10:00", "purchase")))
      feedDocs("b2", Seq((4L, bodyA + " tail3"), (5L, bodyC)))
      run1.foreach(_.processAllAvailable())
    } finally run1.foreach(_.stop())

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
    // lexical index: a PARTIAL append tmp (no _SUCCESS) — debris of an
    // append that died mid-write; the next writer entry must drop it
    new java.io.File(lexIdx + "__append_tmp/postings").mkdirs()

    // batches 3 and 4 land while the graph is DOWN
    feedEvents("b3", Seq((103L, 3L, "2024-07-01 12:20:00", "view"),
      (12L, 3L, "2024-07-01 12:30:00", "purchase"),
      (13L, 4L, "2024-07-01 14:00:00", "purchase")))
    // doc 8 is a BYTE-identical copy of doc 2, fed on the far side of
    // the crash: the exact-dedup leg must fold it onto its pre-crash
    // twin (state rode the checkpoint); the near-dup index refuses it
    feedDocs("b3", Seq((6L, bodyC + " tail"), (7L, bodyD), (8L, bodyB)))
    // b4 advances the watermark so p13's no-view NULL verdict can flush
    feedEvents("b4", Seq((105L, 5L, "2024-07-01 16:20:00", "view"),
      (14L, 5L, "2024-07-01 16:30:00", "purchase")))
    // b5 (still down): later DAYS — the spike detector's 07-01 open-day
    // counts accumulated BEFORE the crash must close correctly after it
    feedEvents("b5", Seq((106L, 6L, "2024-07-02 10:00:00", "view"),
      (15L, 6L, "2024-07-02 11:00:00", "purchase"),
      (16L, 7L, "2024-07-03 09:00:00", "purchase")))

    val run2 = startGraph()
    try {
      run2.foreach(_.processAllAvailable())
      // two watermark-advancing nudges (separate micro-batches: the wm a
      // batch sees is the PREVIOUS batch's max − delay), each carrying a
      // view AND a purchase: the attribution join's global watermark is
      // the MIN over its two watermark nodes, so a views-only nudge
      // would stall the purchase side and p16's no-view NULL verdict
      // could never flush; the spike detector needs the same two-sided
      // advance to close 07-01..07-03 for BOTH level groups via rows
      feedEvents("b6", Seq((107L, 8L, "2024-07-05 12:00:00", "view"),
        (17L, 8L, "2024-07-05 12:30:00", "purchase")))
      run2.foreach(_.processAllAvailable())
      feedEvents("b7", Seq((108L, 9L, "2024-07-08 12:00:00", "view"),
        (18L, 9L, "2024-07-08 12:30:00", "purchase")))
      run2.foreach(_.processAllAvailable())
    } finally run2.foreach(_.stop())

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

    // 7) the spike leg: every closed-day verdict in the alert store must
    //    equal the BATCH detector of record over everything fed (the
    //    anomaly_spikes oracle pairing) — including day 07-01, whose
    //    open-day counts accumulated BEFORE the crash and closed after
    //    the restart (state rode the checkpoint), with counts from BOTH
    //    sides of the crash (b1+b2 pre, b3+b4 post)
    val fedEvDf = fedEvents.toDF("event_id", "user_id", "ts", "event_type")
    val batchSpikes = graft.streaming.StatefulSpikes(
        graft.streaming.StatefulSpikes.fromEvents(fedEvDf)).toDF()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    val streamedSpikes = spark.read.parquet(spikes).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    streamedSpikes.foreach { case (k, row) =>
      assert(batchSpikes.get(k).contains(row),
        s"closed-day verdict $k diverges from the batch detector:\n" +
          s" stream=$row\n batch =${batchSpikes.get(k)}")
    }
    val mustClose = Set(("view", "2024-07-01"), ("purchase", "2024-07-01"),
      ("purchase", "2024-07-02"), ("purchase", "2024-07-03"))
    assert(mustClose.subsetOf(streamedSpikes.keySet),
      s"watermark-closed days missing from the alert store: " +
        s"${mustClose -- streamedSpikes.keySet} (got ${streamedSpikes.keySet})")
    // the pre-crash day's count spans the crash: 07-01 saw 5 views
    // (101/102/104 pre-crash + 103/105 post) and 5 purchases
    // (10/11 pre + 12/13/14 post) — fed on both sides of the restart
    assert(streamedSpikes(("view", "2024-07-01"))(2) == 5L)
    assert(streamedSpikes(("purchase", "2024-07-01"))(2) == 5L)

    // 8) the first-seen template leg: exactly one alert per novel
    //    (level, template) shape, pinned to the globally-first exemplar —
    //    equal to the batch trigger of record over everything fed; the
    //    post-restart replays and re-arrivals of known shapes stayed
    //    silent because the known-shape state rode the checkpoint
    val batchShapes = graft.streaming.StatefulTemplates(
        graft.streaming.StatefulTemplates.fromEvents(
          fedEvDf.withColumn("props", concat(lit("p"), col("event_id")))))
      .toDF().collect().map(_.toSeq).toSet
    val streamedShapes = spark.read.parquet(shapes).collect().map(_.toSeq).toSet
    assert(streamedShapes == batchShapes,
      s"shape alerts must equal the batch trigger:\n stream=$streamedShapes" +
        s"\n batch =$batchShapes")
    assert(streamedShapes.nonEmpty &&
      streamedShapes.size == streamedShapes.map(_.take(2)).size,
      "exactly one alert per shape")

    // 9) the lexical-index leg: the continuously-appended store serves
    //    BM25 BIT-identically to the corpus-scan path over everything
    //    fed (same redaction first) — grown from an EMPTY day-zero index
    //    purely by increments, across the crash/restart, with the
    //    injected partial append tmp dropped at the first writer entry
    assert(!new java.io.File(lexIdx + "__append_tmp").exists(),
      "partial append debris must be dropped at the next writer entry")
    Seq(("a5 b7 c9", 10), ("d3 tail", 5)).foreach { case (q, k) =>
      val served = graft.operators.LexIndex
        .searchBm25Against(spark, lexIdx, q, topK = k)
        .collect().map(_.toSeq).toSeq
      val scan = graft.operators.Corpus
        .searchBm25From(fedDocsDf, q, k)
        .collect().map(_.toSeq).toSeq
      assert(served == scan,
        s"append-grown index must serve the scan-path result ($q):\n" +
          s" served=$served\n scan  =$scan")
      assert(served.nonEmpty, s"$q must hit")
    }

    // 10) the exact-dedup leg: the LATEST verdict per fingerprint
    //     (max n_copies — monotone per group) must equal the batch
    //     keep-first groupBy over everything fed; doc 8 (byte-identical
    //     to doc 2, fed on the far side of the crash) folds onto its
    //     pre-crash twin because the fingerprint state rode the
    //     checkpoint — first_doc_id 2, n_copies 2
    val verdictRows = spark.read.parquet(dedupLog).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val latestVerdicts = verdictRows.groupBy(_._1).map { case (fp, rs) =>
      val r = rs.maxBy(_._3); fp -> (r._2, r._3, r._4)
    }
    val dedupRef = fedDocsDf
      .withColumn("n_chars", length(col("text")).cast("long"))
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min("doc_id").as("first_doc_id"), count("*").as("n_copies"),
        min("n_chars").as("n_chars"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(latestVerdicts == dedupRef,
      s"dedup ledger must equal the batch keep-first groupBy:\n" +
        s" stream=$latestVerdicts\n batch =$dedupRef")
    val dupVerdict = latestVerdicts.values.filter(_._2 == 2L)
    assert(dupVerdict.toSeq == Seq((2L, 2L, bodyB.length.toLong)),
      s"the cross-crash duplicate must fold onto doc 2: $dupVerdict")
  }
}
