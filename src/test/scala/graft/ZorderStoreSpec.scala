package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.sources.Tables

/** Durable z-clustered table lifecycle: geometry plumbing, incremental
  * append against the STORED cutpoints, content-keyed replay idempotence,
  * two-phase compaction, subject erasure (tombstone serving + physical
  * rewrite), and crash recovery at every protocol point — the 2-D store's
  * twin of IvfIndexSpec/LexIndexSpec (the reference persists its own
  * serving index the same way, faiss_db.py:24-58). */
class ZorderStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  private val Sf = "/root/testdata/sf0.001"
  private val Root = "/tmp/graft_ztable_spec"

  private def wipe(path: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(path)).deleteRecursively()
    ()
  }

  private def fs = new org.apache.hadoop.fs.Path(Root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ev: DataFrame = Tables.events(spark, Sf)

  /** The base/increment split: increments = event_id residues 3 and 4
    * mod 5 (the registered events_2d_appended split). */
  private def split: (DataFrame, DataFrame, DataFrame) = {
    val r = pmod(coalesce(col("event_id"), lit(0L)), lit(5L))
    (ev.where(r =!= 3L && r =!= 4L), ev.where(r === 3L), ev.where(r === 4L))
  }

  private def serve(path: String, user: Long): Seq[(Long, Long, Option[Double], Long)] =
    Relational.eventsServed2dFrom(spark, path, user, "2024-01-01", "2024-02-15")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3))).toSeq

  private def rawAnswer(user: Long, excludeUser: Option[Long] = None)
      : Seq[(Long, Long, Option[Double], Long)] = {
    val lo = lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    val hi = lit("2024-02-16 00:00:00").cast("timestamp_ntz")
    var base = ev.where(col("user_id") === user &&
      col("ts") >= lo && col("ts") < hi)
    excludeUser.foreach(u => base = base.where(col("user_id") =!= u))
    base.agg(count(lit(1)).as("n_events"),
        sum(expr("try_cast(value AS DECIMAL(12,2))")).cast("double")
          .as("total_value"),
        countDistinct(col("event_type")).as("n_types"))
      .select(lit(user).as("user_id"), col("n_events"),
        col("total_value"), col("n_types"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3))).toSeq
  }

  private def dataFileCount(path: String): Int = {
    val d = new java.io.File(s"$path/data")
    Option(d.listFiles()).map(_.filter(_.getName.startsWith("fid=")).map {
      fd => Option(fd.listFiles()).map(_.count { f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")
      }).getOrElse(0)
    }.sum).getOrElse(0)
  }

  test("append against stored cuts serves identically to a full rebuild and the raw filter") {
    val full = s"$Root/full"
    val app = s"$Root/app"
    wipe(full); wipe(app)
    Relational.writeZorderTableFrom(ev, full)
    val (base, inc1, inc2) = split
    Relational.writeZorderTableFrom(base, app)
    Relational.appendZorderTable(spark, app, inc1)
    Relational.appendZorderTable(spark, app, inc2)
    // row conservation across the whole store, duplicates included
    assert(spark.read.parquet(s"$app/data").count() == ev.count())
    for (u <- Seq(3L, 5L, 7L)) {
      val raw = rawAnswer(u)
      assert(serve(full, u) == raw, s"full-rebuild serve diverged for $u")
      assert(serve(app, u) == raw, s"append serve diverged for $u")
    }
  }

  test("a replayed increment is a ledger no-op: no new files, same answer") {
    val app = s"$Root/app" // built by the test above (suite-ordered)
    val (_, inc1, _) = split
    val filesBefore = dataFileCount(app)
    val ansBefore = serve(app, 5L)
    Relational.appendZorderTable(spark, app, inc1) // byte-identical replay
    assert(dataFileCount(app) == filesBefore,
      "replayed increment must not land a second time")
    assert(serve(app, 5L) == ansBefore)
  }

  test("a replay against a PRE-r18 ledger marker (legacy xor_count id) is still a no-op") {
    // FORMAT COMPAT: stores persisted before the inc id grew its decimal-
    // sum middle field hold 2-field markers; a replayed old increment
    // must match them, not append its rows a second time (r18 advisor)
    import org.apache.hadoop.fs.Path
    val p = s"$Root/legacy"
    wipe(p)
    val (base, inc1, _) = split
    Relational.writeZorderTableFrom(base, p)
    Relational.appendZorderTable(spark, p, inc1)
    val incId = Relational.zorderIncId(inc1)
    assert(incId.split('_').length == 3, "current id format is 3-field")
    val legacyId = { val a = incId.split('_'); s"${a(0)}_${a(2)}" }
    // rewrite the ledger to what a pre-r18 writer would have left behind
    assert(fs.delete(new Path(s"$p/incs/$incId"), false))
    fs.create(new Path(s"$p/incs/$legacyId")).close()
    val filesBefore = dataFileCount(p)
    val rowsBefore = spark.read.parquet(s"$p/data").count()
    Relational.appendZorderTable(spark, p, inc1) // replay vs legacy marker
    assert(dataFileCount(p) == filesBefore,
      "replay against a legacy-format marker must not land a second time")
    assert(spark.read.parquet(s"$p/data").count() == rowsBefore)
  }

  test("geometry is read from the cuts relation, never assumed: non-default (bits, files) serves exactly") {
    val p = s"$Root/geom"
    wipe(p)
    Relational.writeZorderTableFrom(ev, p, bits = 3, files = 16, k = 512)
    for (u <- Seq(3L, 7L))
      assert(serve(p, u) == rawAnswer(u), s"non-default geometry diverged for $u")
    // and appends honor the stored geometry too
    val (base, inc1, _) = split
    val p2 = s"$Root/geom2"
    wipe(p2)
    Relational.writeZorderTableFrom(base, p2, bits = 3, files = 16, k = 512)
    Relational.appendZorderTable(spark, p2, inc1)
    val r = pmod(coalesce(col("event_id"), lit(0L)), lit(5L))
    val lo = lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    val expect = ev.where(r =!= 4L).where(col("user_id") === 3L &&
      col("ts") >= lo && col("ts") < lit("2024-02-16 00:00:00").cast("timestamp_ntz"))
      .count()
    assert(serve(p2, 3L).head._2 == expect)
  }

  test("append crash walk: partial tmp drops, complete tmp resumes, at the next writer entry") {
    import org.apache.hadoop.fs.Path
    val p = s"$Root/crash"
    wipe(p)
    val (base, inc1, inc2) = split
    Relational.writeZorderTableFrom(base, p)
    // 1) PARTIAL append tmp (no _SUCCESS): debris — the next writer entry
    // must drop it and the increment must not surface
    val tmp = new Path(p + "__append_tmp")
    fs.mkdirs(new Path(tmp, "data/fid=0"))
    fs.create(new Path(tmp, "data/fid=0/part-junk.parquet")).close()
    Relational.appendZorderTable(spark, p, inc1) // writer entry heals first
    assert(!fs.exists(tmp), "partial append tmp must be dropped")
    // 2) COMPLETE append tmp (root _SUCCESS + INCID): a crashed promote —
    // fabricate one the way the writer lays it, then let the next writer
    // entry resume the move
    val cutsDf = spark.read.parquet(s"$p/cuts")
    Relational.zorderApplyCuts(inc2, broadcast(cutsDf), 4, 32)
      .withColumn("fid", coalesce(col("file_id"), lit(-1L)))
      .drop("file_id")
      .repartition(col("fid"))
      .write.mode("overwrite").partitionBy("fid").parquet(s"$tmp/data")
    val incId = Relational.zorderIncId(inc2)
    fs.create(new Path(tmp, s"INCID_$incId")).close()
    fs.create(new Path(tmp, "_SUCCESS")).close()
    Relational.compactZorderStore(spark, p) // any writer entry resumes it
    assert(!fs.exists(tmp), "complete append tmp must be promoted")
    assert(fs.exists(new Path(s"$p/incs/$incId")),
      "resumed append must cut its ledger marker")
    for (u <- Seq(3L, 5L))
      assert(serve(p, u) == rawAnswer(u),
        s"store after resumed append + compact must equal the union corpus for $u")
    // 3) and the resumed increment replayed through the normal path is a no-op
    val files = dataFileCount(p)
    Relational.appendZorderTable(spark, p, inc2)
    assert(dataFileCount(p) == files)
    assert(serve(p, 5L) == rawAnswer(5L))
  }

  test("compaction collapses multi-file dirs to one file each and is invisible to serving") {
    val p = s"$Root/cmp"
    wipe(p)
    val (base, inc1, inc2) = split
    Relational.writeZorderTableFrom(base, p)
    Relational.appendZorderTable(spark, p, inc1)
    Relational.appendZorderTable(spark, p, inc2)
    val ansBefore = Seq(3L, 5L, 7L).map(serve(p, _))
    val (before, after) = Relational.compactZorderStore(spark, p)
    assert(before > after, s"compaction must shrink touched files: $before -> $after")
    // every dir is single-file now
    val d = new java.io.File(s"$p/data")
    d.listFiles().filter(_.getName.startsWith("fid=")).foreach { fd =>
      val n = fd.listFiles().count(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(n == 1, s"${fd.getName} still has $n files")
    }
    assert(Seq(3L, 5L, 7L).map(serve(p, _)) == ansBefore,
      "compaction changed served answers")
    assert(spark.read.parquet(s"$p/data").count() == ev.count())
    // idempotent second run: nothing multi-file left to touch
    assert(Relational.compactZorderStore(spark, p) == ((0, 0)))
  }

  test("compaction crash walk: debris tmp is dropped, a _SUCCESS tmp resumes mid-commit") {
    import org.apache.hadoop.fs.Path
    val p = s"$Root/cmpcrash"
    wipe(p)
    val (base, inc1, _) = split
    Relational.writeZorderTableFrom(base, p)
    Relational.appendZorderTable(spark, p, inc1)
    val ans = serve(p, 5L)
    val tmp = new Path(p + "__compact_tmp")
    val old = new Path(p + "__compact_old")
    // 1) no-_SUCCESS tmp: live store untouched, debris dropped
    fs.mkdirs(new Path(tmp, "fid=0"))
    fs.create(new Path(tmp, "fid=0/part-junk.parquet")).close()
    val (b1, a1) = Relational.compactZorderStore(spark, p)
    assert(!fs.exists(tmp) && !fs.exists(old))
    assert(b1 > a1 && serve(p, 5L) == ans)
    // rebuild a fragmented store for the mid-commit walk
    wipe(p)
    Relational.writeZorderTableFrom(base, p)
    Relational.appendZorderTable(spark, p, inc1)
    // pick a fid dir with >1 file and fabricate the exact crash states
    val dataDir = new java.io.File(s"$p/data")
    val fidName = dataDir.listFiles().filter(_.getName.startsWith("fid="))
      .find(_.listFiles().count(f => f.isFile &&
        !f.getName.startsWith("_")) > 1).map(_.getName)
      .getOrElse(fail("need a multi-file fid dir"))
    val live = new Path(s"$p/data/$fidName")
    // phase-1 output: the replacement dir + _SUCCESS
    spark.read.parquet(live.toString).coalesce(1)
      .write.mode("overwrite").parquet(new Path(tmp, fidName).toString)
    fs.create(new Path(tmp, "_SUCCESS")).close()
    // state (b): live moved aside, replacement not yet in — the worst point
    fs.mkdirs(old)
    assert(fs.rename(live, new Path(old, fidName)))
    Relational.compactZorderStore(spark, p) // writer entry resumes commit
    assert(!fs.exists(tmp) && !fs.exists(old))
    assert(serve(p, 5L) == ans, "resumed mid-commit compact lost rows")
    assert(spark.read.parquet(s"$p/data").count() ==
      split._1.unionAll(split._2).count())
  }

  test("2-D serving partition-prunes to the geometry-bounded fid set") {
    val p = s"$Root/full" // built by the first test (suite-ordered)
    if (!new java.io.File(s"$p/cuts").exists())
      Relational.writeZorderTableFrom(ev, p)
    val out = Relational.eventsServed2dFrom(spark, p, 5L,
      "2024-01-05", "2024-01-20")
    out.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      pl match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case qs: QueryStageExec => scans(qs.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    val dataScans = scans(out.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/data")))
    assert(dataScans.nonEmpty, "the serve must scan the store's data dirs")
    val totalDirs = new java.io.File(s"$p/data").listFiles()
      .count(_.getName.startsWith("fid="))
    assert(totalDirs >= 16, s"the corpus should populate most fid dirs: $totalDirs")
    dataScans.foreach { scan =>
      // the z-curve bound: one user bucket touches <= 4 of 32 files no
      // matter how wide the day range — the pruned read IS the design
      val parts = scan.selectedPartitions.partitionCount
      assert(parts > 0 && parts <= 4,
        s"2-D serve must prune to the z-curve's fid set: read $parts of $totalDirs dirs")
      // and the user/ts residual predicate reaches the scan
      assert(scan.dataFilters.nonEmpty,
        s"the exact residual must run at the scan: $scan")
    }
  }

  test("differential fuzz: random worlds x geometry x splits x predicates serve the raw filter exactly") {
    import spark.implicits._
    // small adversarial worlds: duplicate event ids (at-least-once),
    // NULL user_id / NULL ts (unplaceable rows -> fid -1), NaN values,
    // heavy user skew, tiny day pools (cutpoint ties) — the shapes the
    // fixed sf corpus never exercises. Seeds fixed: failures reproduce.
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val dayPool = (1 to 4 + rnd.nextInt(6)).map(d => f"2024-0${1 + rnd.nextInt(3)}%s-${1 + rnd.nextInt(27)}%02d")
      val types = Seq("view", "click", "purchase", "error")
      val n = 150 + rnd.nextInt(150)
      val rows = (1 to n).map { i =>
        val id = if (rnd.nextInt(10) == 0) (i / 2 + 1).toLong else i.toLong
        val uid: Option[Long] =
          if (rnd.nextInt(10) == 0) None
          else if (rnd.nextInt(3) == 0) Some(1L) // skew
          else Some(1L + rnd.nextInt(8))
        val ts: Option[java.sql.Timestamp] =
          if (rnd.nextInt(20) == 0) None
          else Some(java.sql.Timestamp.valueOf(
            s"${dayPool(rnd.nextInt(dayPool.length))} " +
              f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
        val v: Option[Double] =
          if (rnd.nextInt(15) == 0) None
          else if (rnd.nextInt(25) == 0) Some(Double.NaN)
          else Some(rnd.nextInt(10000) / 100.0)
        (id, ts, uid, types(rnd.nextInt(types.length)), v,
          if (rnd.nextBoolean()) Some(s"""{"k":$i}""") else None)
      }
      val world = rows.toDF("event_id", "ts", "user_id", "event_type",
        "value", "props")
      val (bits, files) = Seq((4, 32), (3, 16), (2, 8))(rnd.nextInt(3))
      val p = s"$Root/fuzz$seed"
      wipe(p)
      val r = pmod(coalesce(col("event_id"), lit(0L)), lit(3L))
      Relational.writeZorderTableFrom(world.where(r =!= 0L), p,
        bits, files, k = 64)
      Relational.appendZorderTable(spark, p, world.where(r === 0L))
      def rawRef(u: Long, lo: String, hi: String, exclude: Option[Long]) = {
        var base = world.where(col("user_id") === u &&
          col("ts") >= lit(s"$lo 00:00:00").cast("timestamp") &&
          col("ts") < lit(java.time.LocalDate.parse(hi).plusDays(1).toString +
            " 00:00:00").cast("timestamp"))
        exclude.foreach(x => base = base.where(col("user_id") =!= x))
        base.agg(count(lit(1)), sum(expr("try_cast(value AS DECIMAL(12,2))"))
            .cast("double"), countDistinct(col("event_type")))
          .collect().map(row => (u, row.getLong(0),
            if (row.isNullAt(1)) None else Some(row.getDouble(1)),
            row.getLong(2))).toSeq
      }
      for (_ <- 1 to 4) {
        val u = 1L + rnd.nextInt(9) // sometimes absent from the world
        val Seq(lo, hi) = Seq(dayPool(rnd.nextInt(dayPool.length)),
          dayPool(rnd.nextInt(dayPool.length))).sorted
        val served = Relational.eventsServed2dFrom(spark, p, u, lo, hi)
          .collect().map(row => (row.getLong(0), row.getLong(1),
            if (row.isNullAt(2)) None else Some(row.getDouble(2)),
            row.getLong(3))).toSeq
        assert(served == rawRef(u, lo, hi, None),
          s"seed=$seed geometry=($bits,$files) predicate=($u,$lo,$hi) diverged")
      }
      // random-subject erasure + physical compaction, then re-probe
      val victim = 1L + rnd.nextInt(8)
      Relational.eraseZorderSubject(spark, p, victim)
      Relational.compactZorderStore(spark, p)
      val (lo2, hi2) = (dayPool.min, dayPool.max)
      val afterErase = Relational.eventsServed2dFrom(spark, p, victim, lo2, hi2)
        .collect().map(row => (row.getLong(0), row.getLong(1),
          if (row.isNullAt(2)) None else Some(row.getDouble(2)),
          row.getLong(3))).toSeq
      assert(afterErase == rawRef(victim, lo2, hi2, Some(victim)),
        s"seed=$seed erased subject $victim still serves rows")
      assert(spark.read.parquet(s"$p/data")
        .where(col("user_id") === victim).count() == 0L,
        s"seed=$seed erased subject $victim has physical rows")
    }
  }

  test("streaming ingest: micro-batch appends land through the ledger; a full checkpoint-replay is a no-op") {
    val p = s"$Root/stream"
    val drops = s"$Root/stream_drops"
    val ck1 = s"$Root/stream_ck1"
    val ck2 = s"$Root/stream_ck2"
    Seq(p, drops, ck1, ck2).foreach(wipe)
    val (base, inc1, inc2) = split
    Relational.writeZorderTableFrom(base, p)
    new java.io.File(drops).mkdirs()
    inc1.coalesce(1).write.parquet(s"$drops/b1")
    inc2.coalesce(1).write.parquet(s"$drops/b2")
    val schema = ev.schema
    def start(ck: String) = graft.streaming.StreamPipeline.zorderAppendSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .option("basePath", drops).parquet(s"$drops/*"), p, ck)
    val q = start(ck1)
    q.processAllAvailable(); q.stop()
    for (u <- Seq(3L, 5L, 7L))
      assert(serve(p, u) == rawAnswer(u),
        s"streamed store must serve the union corpus for $u")
    assert(spark.read.parquet(s"$p/data").count() == ev.count())
    val files = dataFileCount(p)
    // FULL redelivery (fresh checkpoint, same one-file batches): every
    // increment replays byte-identical — the content-keyed ledger must
    // absorb both, no new files, same answers
    val q2 = start(ck2)
    q2.processAllAvailable(); q2.stop()
    assert(dataFileCount(p) == files,
      "a byte-identical batch replay must be a ledger no-op")
    assert(serve(p, 5L) == rawAnswer(5L))
  }

  test("erasure: tombstone serving equals a from-scratch store without the subject; compaction makes it physical") {
    val p = s"$Root/erase"
    val scratch = s"$Root/erase_scratch"
    wipe(p); wipe(scratch)
    Relational.writeZorderTableFrom(ev, p)
    Relational.eraseZorderSubject(spark, p, 3L)
    Relational.eraseZorderSubject(spark, p, 3L) // replayed request: no-op
    Relational.writeZorderTableFrom(
      ev.where(col("user_id").isNull || col("user_id") =!= 3L), scratch)
    // tombstone-phase serving ≡ from-scratch-without-subject serving
    for (u <- Seq(3L, 5L, 7L))
      assert(serve(p, u) == serve(scratch, u),
        s"tombstone serving diverged from the scratch store for $u")
    assert(serve(p, 3L) == rawAnswer(3L, excludeUser = Some(3L)))
    // the tombstone read path must be a BROADCAST anti-join (a shuffled
    // anti over the fact would make every erased subject a full shuffle)
    val plan = Relational.eventsServed2dFrom(spark, p, 5L,
      "2024-01-01", "2024-02-15").queryExecution.sparkPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("Broadcast"),
      s"tombstone path must broadcast-anti-join:\n$plan")
    // physical rewrite: compact filters the subject out and retires the
    // tombstones; serving identical before/after
    Relational.compactZorderStore(spark, p)
    assert(!new java.io.File(s"$p/tombstones").exists(),
      "tombstones must retire once physical")
    assert(spark.read.parquet(s"$p/data")
      .where(col("user_id") === 3L).count() == 0L,
      "erased subject must have no physical rows after compaction")
    for (u <- Seq(3L, 5L, 7L))
      assert(serve(p, u) == serve(scratch, u),
        s"post-compaction serving diverged for $u")
  }

  test("batch erasure: one multi-subject request equals a scratch store without the subjects; replay and overlap no-op") {
    val p = s"$Root/eraseb"
    val scratch = s"$Root/eraseb_scratch"
    wipe(p); wipe(scratch)
    def req(ids: Long*) = {
      val sp = spark
      import sp.implicits._
      ids.toDF("user_id")
    }
    Relational.writeZorderTableFrom(ev, p)
    // ONE request, two subjects — one writer entry, one tombstone promote
    Relational.eraseZorderSubjects(spark, p, req(3L, 7L))
    val tombFiles = Option(new java.io.File(s"$p/tombstones").listFiles())
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    assert(tombFiles == 1,
      s"a batch request must land ONE tombstone artifact, found $tombFiles")
    Relational.writeZorderTableFrom(
      ev.where(col("user_id").isNull || !col("user_id").isin(3L, 7L)),
      scratch)
    for (u <- Seq(3L, 5L, 7L))
      assert(serve(p, u) == serve(scratch, u),
        s"batch-erased serving diverged from the scratch store for $u")
    // byte-identical replay: content-keyed no-op (no second artifact)
    Relational.eraseZorderSubjects(spark, p, req(3L, 7L))
    assert(Option(new java.io.File(s"$p/tombstones").listFiles())
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0) == tombFiles)
    // overlapping request {7, 9}: only 9 is fresh — 7 must not
    // double-land, 9 must take effect
    Relational.eraseZorderSubjects(spark, p, req(7L, 9L))
    assert(serve(p, 9L) == rawAnswer(9L, excludeUser = Some(9L)))
    assert(serve(p, 5L) == rawAnswer(5L))
    // compaction makes the whole batch physical
    Relational.compactZorderStore(spark, p)
    assert(spark.read.parquet(s"$p/data")
      .where(col("user_id").isin(3L, 7L, 9L)).count() == 0L,
      "batch-erased subjects must have no physical rows after compaction")
  }

  test("as-of serve: latest surviving row from the pruned file set equals the raw-table as-of at every horizon") {
    val p = s"$Root/asof"
    wipe(p)
    Relational.writeZorderTableFrom(ev, p)
    def rawAsof(u: Long, t: String): Seq[Seq[Any]] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc,
        col("event_id").desc_nulls_last, col("event_type").desc_nulls_last)
      ev.where(col("user_id") === u &&
          col("ts") <= lit(t).cast("timestamp_ntz"))
        .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("user_id"), expr("unix_micros(ts)").as("asof_us"),
          col("event_type"), col("value").cast("double").as("value"))
        .collect().map(_.toSeq).toSeq
    }
    val horizons = Seq("2024-01-05 00:00:00", "2024-01-20 12:00:00",
      "2024-03-01 00:00:00", "1999-01-01 00:00:00")
    for (u <- Seq(3L, 5L, 7L); t <- horizons) {
      val served = Relational.eventsAsofServedFrom(spark, p, u, t)
        .collect().map(_.toSeq).toSeq
      assert(served == rawAsof(u, t), s"as-of serve diverged at ($u, $t)")
      // the pre-corpus horizon must serve the EMPTY relation
      if (t.startsWith("1999")) assert(served.isEmpty)
    }
    // an erased subject's as-of answer is empty at every horizon
    Relational.eraseZorderSubject(spark, p, 3L)
    assert(Relational.eventsAsofServedFrom(spark, p, 3L,
      "2024-03-01 00:00:00").collect().isEmpty,
      "erased subject must have no as-of answer")
    assert(Relational.eventsAsofServedFrom(spark, p, 5L,
      "2024-03-01 00:00:00").collect().map(_.toSeq).toSeq ==
      rawAsof(5L, "2024-03-01 00:00:00"),
      "untouched subject's as-of answer must survive the erasure")
  }

  test("serve-path metadata memo: repeat serves probe the FS zero times; erase and compaction invalidate") {
    val p = s"$Root/memo"
    wipe(p)
    Relational.writeZorderTableFrom(ev, p)
    // first serve fills the memo (subdir count, cuts row, tombstone gate)
    Relational.eventsServed2dFrom(spark, p, 3L, "2024-01-01", "2024-02-15")
      .collect()
    val misses0 = graft.sources.StoreProtocol.probeMisses.get
    Relational.eventsServed2dFrom(spark, p, 5L, "2024-01-01", "2024-02-15")
      .collect()
    assert(graft.sources.StoreProtocol.probeMisses.get == misses0,
      "a repeat serve on an unchanged store must answer from the memo — " +
        "zero FS probes, zero metadata jobs")
    // STALENESS-AFTER-ERASE: a serve AFTER an erase on the same session
    // must see the tombstone (the writer entry invalidates the memo)
    Relational.eraseZorderSubject(spark, p, 3L)
    assert(Relational.eventsServed2dFrom(spark, p, 3L,
        "2024-01-01", "2024-02-15").head().getLong(1) == 0L,
      "a serve after an erase must see the tombstone, not the memo")
    // tombstone RETIREMENT invalidates too: the serve after compaction
    // must not pin a tombstone relation over deleted files
    Relational.compactZorderStore(spark, p)
    assert(Relational.eventsServed2dFrom(spark, p, 3L,
        "2024-01-01", "2024-02-15").head().getLong(1) == 0L)
    assert(Relational.eventsServed2dFrom(spark, p, 5L,
        "2024-01-01", "2024-02-15").head().getLong(1) > 0L,
      "untouched subject must survive compaction")
  }

  /** Shared fixture for the two batch-serve tests: built ONCE at first
    * use (full store, subject 7 erased), so each test is self-contained
    * when run in isolation and an abort in one can't poison the other
    * (r18 advisor finding: the as-of test used to piggyback on the store
    * the serve test had built and mutated). */
  private lazy val batchStore: String = {
    val p = s"$Root/batch"
    wipe(p)
    Relational.writeZorderTableFrom(ev, p)
    Relational.eraseZorderSubject(spark, p, 7L)
    p
  }

  test("batch serve: N requests equal their element-wise single serves through ONE pruned scan") {
    val p = batchStore
    val reqs = Seq(
      (3L, "2024-01-03", "2024-02-15"),
      (5L, "2024-01-10", "2024-03-01"),
      (7L, "2024-02-01", "2024-02-10"), // erased: must report the zero row
      (999L, "2024-01-05", "2024-01-06")) // absent user: zero row too
    val batch = Relational.eventsServed2dBatchFrom(spark, p, reqs)
    val got = batch.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getLong(5))).toSet
    val want = reqs.map { case (u, lo, hi) =>
      val single = Relational.eventsServed2dFrom(spark, p, u, lo, hi).head()
      (u, lo, hi, single.getLong(1),
        if (single.isNullAt(2)) None else Some(single.getDouble(2)),
        single.getLong(3))
    }.toSet
    assert(got == want, s"batch serve diverged from single serves:\n" +
      s"only-batch=${(got -- want).take(3)} only-single=${(want -- got).take(3)}")
    assert(got.exists { case (u, _, _, n, _, _) => u == 7L && n == 0L },
      "erased subject must report the zero row in the batch")
    assert(got.exists { case (u, _, _, n, _, _) => u == 3L && n > 0L })
    // ONE scan of the store's data relation — the batch's whole point
    val scans = batch.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("/data"))
        => s
    }
    assert(scans.length == 1,
      s"batch serve must read the data relation ONCE, found ${scans.length}")
  }

  test("batch as-of: N lookups equal their element-wise single as-ofs through ONE pruned scan") {
    val p = batchStore
    val reqs = Seq(
      (3L, "2024-01-20 00:00:00"),
      (5L, "2024-02-10 12:00:00"),
      (5L, "2024-01-08 06:00:00"), // same user, second horizon
      (7L, "2024-03-01 00:00:00"), // erased subject: no row
      (9L, "1999-01-01 00:00:00")) // pre-corpus horizon: no row
    val batch = Relational.eventsAsofBatchFrom(spark, p, reqs)
    val got = batch.collect().map(_.toSeq).toSet
    val want = reqs.flatMap { case (u, t) =>
      Relational.eventsAsofServedFrom(spark, p, u, t).collect()
        .map(r => Seq[Any](r.get(0), t, r.get(1), r.get(2), r.get(3)))
    }.toSet
    assert(got == want, s"batch as-of diverged from single as-ofs:\n" +
      s"only-batch=${(got -- want).take(3)} only-single=${(want -- got).take(3)}")
    assert(got.size == 3, s"exactly the three answerable requests report: $got")
    val scans = batch.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("/data"))
        => s
    }
    assert(scans.length == 1,
      s"batch as-of must read the data relation ONCE, found ${scans.length}")
  }
}
