package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{JoinOps, Relational}
import graft.streaming.{SessEvent, StatefulSessionize}

class StatefulAndJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import SparkTest.Sf

  test("batch stateful sessionize matches the window-function sessionizer") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, Sf)
      .select(col("user_id"), col("ts"), col("value")).as[SessEvent]
    val stateful = StatefulSessionize(ev).toDF()
    val windowed = Relational.sessionize(spark, Sf)
    assert(stateful.count() == windowed.count())
    assert(stateful.agg(sum("n_events")).head().getLong(0) ==
      windowed.agg(sum("n_events")).head().getLong(0))
  }

  test("interval join equals the nested-loop range join, boundaries inclusive") {
    // independent derivation: the naive formulation the bin decomposition
    // exists to avoid — window × event cross with the raw range predicate
    val tsUs = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val sess = Relational.sessionize(spark, Sf)
    val win = sess
      .orderBy(col("n_events").desc, col("user_id"), col("session_start"))
      .limit(20)
      .select(col("user_id").as("window_user"),
        (to_timestamp(col("session_start"), tsUs) -
          expr("INTERVAL 5 MINUTES")).as("w0"),
        (to_timestamp(col("session_end"), tsUs) +
          expr("INTERVAL 5 MINUTES")).as("w1"))
    val ev = graft.sources.Tables.events(spark, Sf)
      .where(col("ts").isNotNull)
    val naive = ev.crossJoin(broadcast(win))
      .where(col("ts") >= col("w0") && col("ts") <= col("w1"))
      .groupBy(col("window_user"), col("w0"), col("w1"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window_user"), date_format(col("w0"), tsUs).as("ws"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = JoinOps.intervalJoinEvents(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(got == naive)
    assert(got.size == 20, s"every window overlaps its own session: $got")
  }

  test("interval join boundary: an event exactly at a window edge is inside") {
    import spark.implicits._
    // hand fixture through the same bin arithmetic: bin width 1h, window
    // [10:00:00, 11:30:00] — events at both exact edges, one 1µs outside
    // each, and one in a bin the window overlaps but outside the range
    val binUs = 3600L * 1000000L
    val w = Seq((7L, "2024-01-01 10:00:00.000000", "2024-01-01 11:30:00.000000"))
      .toDF("window_user", "s0", "s1")
      .select(col("window_user"),
        to_timestamp(col("s0")).as("w0"), to_timestamp(col("s1")).as("w1"))
    val winBins = w.withColumn("bin",
      explode(sequence(expr(s"unix_micros(w0) DIV $binUs"),
        expr(s"unix_micros(w1) DIV $binUs"))))
    val ev = Seq(
      "2024-01-01 09:59:59.999999", // 1µs early — out
      "2024-01-01 10:00:00.000000", // exact start — in
      "2024-01-01 11:30:00.000000", // exact end — in
      "2024-01-01 11:30:00.000001", // 1µs late, same bin — out
      "2024-01-01 11:59:59.000000"  // overlapped bin, outside range — out
    ).toDF("s").select(to_timestamp(col("s")).as("ts"))
      .withColumn("bin", expr(s"unix_micros(ts) DIV $binUs"))
    val hits = ev.join(broadcast(winBins), Seq("bin"))
      .where(col("ts") >= col("w0") && col("ts") <= col("w1"))
      .select(date_format(col("ts"), "HH:mm:ss.SSSSSS"))
      .as[String].collect().sorted
    assert(hits.toSeq == Seq("10:00:00.000000", "11:30:00.000000"))
  }

  test("bloom prune is a strict superset of true matches and actually prunes") {
    val ord = graft.sources.Tables.orders(spark, Sf)
      .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
             col("o_orderdate") <  lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
      .select(col("o_orderkey"))
    val li = graft.sources.Tables.lineitem(spark, Sf).select(col("l_orderkey"))
    val pruned = JoinOps.bloomPrune(li, "l_orderkey", ord, "o_orderkey", 1L << 21)
    val truth = li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val (nAll, nPruned, nTruth) = (li.count(), pruned.count(), truth.count())
    // one-sided: never drops a real match
    assert(pruned.join(ord, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count() == nTruth)
    assert(nPruned >= nTruth, "Bloom survivors cover every true match")
    // and it must BITE: the selective build side kills most of the fact
    assert(nPruned < nAll / 2,
      s"prune must remove the non-matching majority: $nPruned of $nAll")
    // with 2 salted bits over m=2^21 and a few hundred keys, false
    // positives are ~0 at this scale — survivors ≈ truth
    assert(nPruned - nTruth <= nAll / 100,
      s"false-positive tail stays negligible: $nPruned vs $nTruth")
  }

  test("streaming stateful sessionize closes sessions on gap and watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessEvent]
    val q = StatefulSessionize(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    def ts(s: String) = Timestamp.valueOf(s)
    try {
      mem.addData(
        SessEvent(Some(1L), ts("2024-01-01 10:00:00"), Some(1.0)),
        SessEvent(Some(1L), ts("2024-01-01 10:10:00"), Some(2.0)),
        SessEvent(Some(1L), ts("2024-01-01 13:00:00"), Some(5.0)))
      q.processAllAvailable()
      // gap between 10:10 and 13:00 closes the first session inline
      val afterB1 = spark.table("sess_test").collect()
      assert(afterB1.length == 1)
      assert(afterB1(0).getAs[Int]("n_events") == 2)
      assert(afterB1(0).getAs[Double]("session_value") == 3.0)
      // advance the watermark well past 13:00+gap → timeout fires
      mem.addData(SessEvent(Some(2L), ts("2024-01-01 20:00:00"), Some(1.0)))
      q.processAllAvailable()
      mem.addData(SessEvent(Some(2L), ts("2024-01-01 23:00:00"), Some(1.0)))
      q.processAllAvailable()
      val out = spark.table("sess_test").collect()
      assert(out.exists(r => r.getAs[Long]("user_id") == 1 &&
        r.getAs[Int]("n_events") == 1 && r.getAs[Double]("session_value") == 5.0),
        s"timed-out session must be emitted, got ${out.mkString(";")}")
    } finally q.stop()
  }

  test("streaming as-of cache: latest wins, ties break on event_id, a late older event never regresses it") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{AsofEvent, StatefulAsof}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsofEvent]
    val q = StatefulAsof(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("asof_cache_test")
      .outputMode("update").start()
    def ts(s: String) = Timestamp.valueOf(s)
    def rows() = spark.table("asof_cache_test").collect()
    try {
      mem.addData(
        AsofEvent(Some(1L), "h", ts("2024-01-01 10:00:00"), Some(1L), Some("a"), Some(1.0)),
        AsofEvent(Some(1L), "h", ts("2024-01-01 11:00:00"), Some(2L), Some("b"), Some(2.0)))
      q.processAllAvailable()
      val b1 = rows()
      assert(b1.length == 1 && b1(0).getAs[String]("event_type") == "b",
        s"trigger 1 must seed the cache with the latest row: ${b1.mkString(";")}")
      // a newer event advances the cache; a ts-TIE breaks on event_id
      mem.addData(
        AsofEvent(Some(1L), "h", ts("2024-01-01 12:00:00"), Some(3L), Some("c"), Some(3.0)),
        AsofEvent(Some(1L), "h", ts("2024-01-01 12:00:00"), Some(4L), Some("d"), Some(4.0)))
      q.processAllAvailable()
      assert(rows().last.getAs[String]("event_type") == "d",
        "ties at equal ts must seat the higher event_id")
      // LATE delivery of an OLDER event: max is order-insensitive — the
      // cache re-emits the same winner and never regresses (the property
      // the SCD2 twin needs a guard for and this one gets for free)
      mem.addData(
        AsofEvent(Some(1L), "h", ts("2024-01-01 09:00:00"), Some(9L), Some("z"), Some(9.0)))
      q.processAllAvailable()
      val fin = rows()
      assert(fin.last.getAs[String]("event_type") == "d" &&
        !fin.exists(_.getAs[String]("event_type") == "z"),
        s"a late older event must not regress the cache: ${fin.mkString(";")}")
      // a second group is independent state
      mem.addData(
        AsofEvent(Some(2L), "h", ts("2024-01-01 08:00:00"), Some(1L), Some("x"), Some(1.0)))
      q.processAllAvailable()
      assert(rows().exists(r => r.getAs[Long]("user_id") == 2L &&
        r.getAs[String]("event_type") == "x"))
    } finally q.stop()
  }

  test("streaming first-seen templates alert once per shape, then stay silent") {
    import spark.implicits._
    import graft.streaming.{StatefulTemplates, TemplEvent}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TemplEvent]
    val q = StatefulTemplates(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("templ_test")
      .outputMode("append").start()
    def ev(id: Long, lvl: String, tpl: String) =
      TemplEvent(Some(lvl), Some(tpl), Some(id), Some("2024-01-01"))
    try {
      // the NULL-id row must neither crash the encoder nor win the
      // exemplar pick (defined ids rank first, like the oracle's min)
      mem.addData(ev(3, "error", "oom in <hex>"), ev(1, "error", "oom in <hex>"),
        TemplEvent(Some("error"), Some("oom in <hex>"), None, Some("2024-01-01")),
        ev(2, "warn", "slow query <num>"))
      q.processAllAvailable()
      val b1 = spark.table("templ_test").collect()
      assert(b1.length == 2, s"two shapes, two alerts: ${b1.mkString(";")}")
      // the alert pins the batch's earliest exemplar, not arrival order
      assert(b1.find(_.getAs[String]("level") == "error")
        .get.getAs[Long]("first_event_id") == 1L)
      // repeats are silent; a genuinely new shape still alerts
      mem.addData(ev(9, "error", "oom in <hex>"), ev(10, "error", "disk full <num>"))
      q.processAllAvailable()
      val b2 = spark.table("templ_test").collect()
      assert(b2.length == 3, s"one NEW shape only: ${b2.mkString(";")}")
      assert(b2.exists(r => r.getAs[String]("template") == "disk full <num>" &&
        r.getAs[Long]("first_event_id") == 10L))
    } finally q.stop()
  }

  test("batch stateful HLL sketch is bit-identical to the column pipeline") {
    val batch = graft.operators.LogOps.approxDistinct(spark, Sf).collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val stateful = graft.streaming.StatefulSketch(
      graft.streaming.StatefulSketch.fromEvents(
        graft.sources.Tables.events(spark, Sf))).collect()
      .map(o => o.event_type -> (o.n_users_approx, o.n_props_approx, o.n_events)).toMap
    assert(stateful == batch,
      s"state registers must reproduce the column registers exactly:\n" +
        s"only-batch=${(batch.toSet -- stateful.toSet).take(3)}\n" +
        s"only-stateful=${(stateful.toSet -- batch.toSet).take(3)}")
  }

  test("streaming HLL converges to the batch estimate; replays don't move it") {
    import spark.implicits._
    import graft.streaming.{SketchEvent, StatefulSketch}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SketchEvent]
    val q = StatefulSketch(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("hll_test")
      .outputMode("append").start()
    def ev(u: Long) = SketchEvent(Some("t"), Some(u.toString), None)
    def latest(): (Long, Long) = {
      val rows = spark.table("hll_test").collect()
      val r = rows.last
      (r.getAs[Long]("n_users_approx"), r.getAs[Long]("n_events"))
    }
    try {
      mem.addData((1L to 40L).map(ev): _*)
      q.processAllAvailable()
      val (e1, n1) = latest()
      assert(n1 == 40L)
      assert(math.abs(e1 - 40L) <= 3, s"40 keys in linear-counting regime: $e1")
      // trigger 2: 40 NEW keys — the running estimate must track ~80
      mem.addData((41L to 80L).map(ev): _*)
      q.processAllAvailable()
      val (e2, n2) = latest()
      assert(n2 == 80L)
      assert(math.abs(e2 - 80L) <= 5, s"80 keys after second trigger: $e2")
      // trigger 3: an at-least-once REPLAY of trigger 1 — register max
      // is idempotent, so the distinct estimate must not move at all
      // (n, a row count, honestly counts the redelivered rows)
      mem.addData((1L to 40L).map(ev): _*)
      q.processAllAvailable()
      val (e3, n3) = latest()
      assert(e3 == e2, s"replayed keys must not move the estimate: $e2 -> $e3")
      assert(n3 == 120L)
      // convergence: the final streaming estimate equals the batch
      // operator over the same logical corpus (dup rows and all)
      val batchDf = ((1L to 80L) ++ (1L to 40L)).map(u =>
        (Some("t"): Option[String], Some(u): Option[Long], None: Option[String]))
        .toDF("event_type", "user_id", "props")
      val b = graft.operators.Sketches.approxDistinctCounts(batchDf).collect().head
      assert(b.getLong(1) == e3 && b.getLong(3) == n3,
        s"streaming end-state must equal batch: ${b.toSeq} vs ($e3, $n3)")
    } finally q.stop()
  }

  test("batch stateful spike detector matches the window-function operator") {
    import graft.streaming.StatefulSpikes
    val ev = graft.sources.Tables.events(spark, Sf)
    val stateful = StatefulSpikes(StatefulSpikes.fromEvents(ev)).toDF()
    val windowed = graft.operators.LogOps.anomalySpikesFrom(ev)
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    val a = stateful.collect().map(key).sorted
    val b = windowed.collect().map(key).sorted
    assert(a.toSeq == b.toSeq,
      s"stateful and windowed detectors must agree row-for-row:\n${a.diff(b).take(3)}\n${b.diff(a).take(3)}")
  }

  test("streaming spike detector emits a verdict once the watermark closes a day") {
    import spark.implicits._
    import graft.streaming.{SpikeEvent, StatefulSpikes}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SpikeEvent]
    val q = StatefulSpikes(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("spike_test")
      .outputMode("append").start()
    def e(s: String) = SpikeEvent(Some("error"), Some(Timestamp.valueOf(s)))
    try {
      mem.addData((1 to 5).map(i => e(s"2024-05-01 0$i:00:00")): _*)
      q.processAllAvailable()
      assert(spark.table("spike_test").count() == 0,
        "an open day must not emit before the watermark closes it")
      // events two days later push the watermark (1 day delay) past day 1
      mem.addData(e("2024-05-03 12:00:00"))
      q.processAllAvailable()
      mem.addData(e("2024-05-03 13:00:00"))
      q.processAllAvailable()
      val out = spark.table("spike_test").collect()
      assert(out.exists(r => r.getAs[String]("day") == "2024-05-01" &&
        r.getAs[Long]("n_events") == 5L && !r.getAs[Boolean]("is_spike")),
        s"closed day must emit its verdict: ${out.mkString(";")}")
      // a LATE event for the closed day must be dropped, not re-open it
      mem.addData(e("2024-05-01 23:00:00"))
      q.processAllAvailable()
      mem.addData(e("2024-05-06 12:00:00"))
      q.processAllAvailable()
      val days = spark.table("spike_test").collect()
        .map(_.getAs[String]("day")).filter(_ == "2024-05-01")
      assert(days.length == 1,
        s"a closed day must emit exactly once despite late data: ${days.length}")
    } finally q.stop()
  }

  test("graft kernels are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql("SELECT word_shingles(array('a','b','c','d'), 3) AS s")
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val sig = spark.sql("SELECT simhash_sig(array('x','y')) AS s").head().getLong(0)
    val sig2 = spark.sql("SELECT simhash_sig(array('x','y')) AS s").head().getLong(0)
    assert(sig == sig2)
  }

  test("mergeByKey: update wins on match, base-only passes, update-only inserts") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
    val updates = Seq(
      (2L, Some(25.0)),                 // matched: update wins
      (3L, None: Option[Double]),       // matched but NULL: base survives
      (4L, Some(40.0)))                 // unmatched: insert (name NULL)
      .toDF("id", "score")
    val out = graft.operators.Upsert.mergeByKey(base, updates, Seq("id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("name")),
        Option(r.getAs[Any]("score")))).toSet
    assert(out == Set(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(25.0)),
      (3L, Some("c"), Some(30.0)),
      (4L, None, Some(40.0))))
  }

  test("mergeByKey rejects update columns absent from the base") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("id", "name")
    val updates = Seq((1L, 9.0)).toDF("id", "bogus")
    intercept[IllegalArgumentException] {
      graft.operators.Upsert.mergeByKey(base, updates, Seq("id"))
    }
  }

  test("exact percentiles treat the NULL stratum as a real group") {
    import spark.implicits._
    // the r4 bug: plain equi-joins dropped NULL-type rows from the rank
    // path, yielding NULL percentiles where SQL GROUP BY computes real
    // ones — this pins the null-safe (<=>) joins and the try_element_at
    // bounds fallback in-repo (the NULL probe recipe is out-of-repo)
    val ev = ((1 to 101).map(i => (Some("a"), Some(i.toDouble))) ++
      (1 to 101).map(i => (Option.empty[String], Some(i * 2.0))) ++
      Seq((Some("b"), Option.empty[Double])))
      .toDF("event_type", "value")
    val out = Relational.valuePercentilesFrom(ev).collect()
      .map(r => Option(r.getString(0)) -> r).toMap
    assert(out(None).getDouble(1) == 102.0,
      s"NULL stratum must get its real p50: ${out(None)}")   // median of 2,4,..,202
    assert(out(Some("a")).getDouble(1) == 51.0, s"${out(Some("a"))}")
    assert(out(Some("b")).isNullAt(1),
      s"all-NULL-value stratum keeps NULL percentiles: ${out(Some("b"))}")
    assert(out(Some("b")).getLong(5) == 1L)
  }

  test("approx percentiles are rank-bounded against the data") {
    // t-digest @ accuracy 10⁴ promises ≤1e-4 rank error; allow that plus
    // one discrete rank step at the test's small n
    val ap = Relational.valuePercentilesApprox(spark, Sf)
      .select(col("event_type"), col("p50_approx"), col("p90_approx"), col("n_events"))
    val ev = graft.sources.Tables.events(spark, Sf)
      .where(col("value").isNotNull).select(col("event_type"), col("value"))
    val checked = ev.join(broadcast(ap), "event_type")
      .groupBy(col("event_type"), col("n_events"))
      .agg(
        avg(when(col("value") <= col("p50_approx"), 1.0).otherwise(0.0)).as("le50"),
        avg(when(col("value") <  col("p50_approx"), 1.0).otherwise(0.0)).as("lt50"),
        avg(when(col("value") <= col("p90_approx"), 1.0).otherwise(0.0)).as("le90"),
        avg(when(col("value") <  col("p90_approx"), 1.0).otherwise(0.0)).as("lt90"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val eps = 1e-4 + 1.0 / r.getAs[Long]("n_events")
      assert(r.getAs[Double]("lt50") <= 0.5 + eps && r.getAs[Double]("le50") >= 0.5 - eps,
        s"p50 rank off for ${r.get(0)}: $r")
      assert(r.getAs[Double]("lt90") <= 0.9 + eps && r.getAs[Double]("le90") >= 0.9 - eps,
        s"p90 rank off for ${r.get(0)}: $r")
    }
  }

  test("sampled percentiles: exact when the sample covers, rank-bounded beyond") {
    import spark.implicits._
    // covering regime: every sf0.001 group is smaller than k=4096, so
    // the sample IS the population and the sampled operator must equal
    // the exact one value-for-value
    val exact = Relational.valuePercentiles(spark, Sf).collect()
      .map(r => Option(r.getString(0)) ->
        (r.get(1), r.get(2), r.get(3))).toMap
    val samp = Relational.valuePercentilesSampled(spark, Sf).collect()
      .map(r => Option(r.getString(0)) ->
        (r.get(1), r.get(2), r.get(3), r.getLong(4))).toMap
    assert(samp.keySet == exact.keySet)
    exact.foreach { case (g, (p50, p90, p99)) =>
      val s = samp(g)
      assert((s._1, s._2, s._3) == ((p50, p90, p99)),
        s"$g: covering sample must be exact: $s vs ($p50,$p90,$p99)")
    }
    // subsample regime: 40k rows, k=4096 — the estimate's rank must sit
    // within ~3 sigma of the target (sqrt(.25/4096) ~ 0.8% at p50)
    val big = spark.range(40000).select(lit("t").as("event_type"),
      (col("id") % 9973).cast("double").as("value"), col("id").as("event_id"))
    val r = Relational.valuePercentilesSampledFrom(big).collect().head
    assert(r.getLong(4) == 4096L, s"fixed-size sample: $r")
    val p50 = r.getDouble(1)
    val frac = big.where(col("value") <= p50).count().toDouble / 40000
    assert(math.abs(frac - 0.5) < 0.03, s"p50 rank error: $frac via $p50")
    val p99 = r.getDouble(3)
    val frac99 = big.where(col("value") <= p99).count().toDouble / 40000
    assert(math.abs(frac99 - 0.99) < 0.01, s"p99 rank error: $frac99 via $p99")
  }

  test("equidepth buckets: covering sample gives true deciles; boundary " +
    "and NULL/non-finite contracts; rank error bounded beyond the sample") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def evDf(rows: Seq[(Long, String, java.lang.Double)]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, t, v) =>
          Row(id, t, v) }),
        StructType(Seq(StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType))))
    // covering regime: values 1..100 in one type → cuts at 10,20,...,90;
    // bucket sizes 9,10,...,10,11 (the ≤ boundary sends v=10·j up)
    val flat = evDf((1 to 100).map(i =>
      (i.toLong, "t", java.lang.Double.valueOf(i.toDouble))))
    val got = Relational.equidepthBucketsFrom(flat).collect()
      .map(r => r.getDouble(2) -> r.getLong(3)).toMap
    assert(got(5.0) == 0L && got(10.0) == 1L && got(19.0) == 1L &&
      got(20.0) == 2L && got(95.0) == 9L && got(100.0) == 9L,
      s"decile assignment: $got")
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes(0L) == 9 && (1L to 8L).forall(sizes(_) == 10) &&
      sizes(9L) == 11, s"bucket sizes: $sizes")
    // NULL value, NaN, and a type with NO finite values → NULL bucket
    val edge = evDf(Seq((1L, "t", 1.0), (2L, "t", null),
      (3L, "t", java.lang.Double.valueOf(Double.NaN)),
      (4L, "only_nan", java.lang.Double.valueOf(Double.NaN))))
    val eg = Relational.equidepthBucketsFrom(edge).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some(r.getLong(3)))).toMap
    // a singleton sample makes every cutpoint equal the one value, and
    // the pinned ≤ rule sends it to the top bucket — degenerate but
    // well-defined, identically on both engines
    assert(eg == Map(1L -> Some(9L), 2L -> None, 3L -> None, 4L -> None),
      s"edge contracts: $eg")
    // subsample regime: 40k rows, k=4096 — every bucket must hold
    // 10% ± 3% of the finite rows (the sampled-cutpoint rank bound)
    val big = spark.range(40000).select(col("id").as("event_id"),
      lit("t").as("event_type"), (col("id") % 9973).cast("double").as("value"))
    val frac = Relational.equidepthBucketsFrom(big).groupBy("bucket")
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frac.keySet == (0L to 9L).toSet, s"all deciles present: $frac")
    frac.values.foreach(n => assert(math.abs(n / 40000.0 - 0.1) < 0.03,
      s"decile mass off: $frac"))
    // real corpus: every finite-valued event bucketed in [0, 9]
    val corpus = Relational.equidepthBuckets(spark, Sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      if (!r.isNullAt(3))
        assert(r.getLong(3) >= 0L && r.getLong(3) <= 9L, s"range: $r")
    }
  }

  test("asofJoin: inclusive vs strict semantics and no-match NULLs") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),   // exactly at a right row
      (2L, ts("2024-01-01 10:30:00"), 1L),   // between right rows
      (3L, ts("2024-01-01 09:00:00"), 1L),   // before any right row
      (4L, ts("2024-01-01 12:00:00"), 2L))   // key with no right rows
      .toDF("id", "ts", "k")
    val right = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "a"),
      (ts("2024-01-01 11:00:00"), 1L, "b"))
      .toDF("rts", "k", "v")
    def run(strict: Boolean): Map[Long, Option[String]] =
      JoinOps.asofJoin(left, right, "k", "ts", "rts", "p", strict)
        .select(col("id"), col("p.v"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(run(strict = false) == Map(
      1L -> Some("a"), 2L -> Some("a"), 3L -> None, 4L -> None))
    // strict: the 10:00 event no longer matches the 10:00 right row
    assert(run(strict = true) == Map(
      1L -> None, 2L -> Some("a"), 3L -> None, 4L -> None))
  }

  test("asofJoin: NULL keys never match, per SQL equi-join semantics") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-01 12:00:00"), None: Option[Long]),
        (2L, ts("2024-01-01 12:00:00"), Some(1L)))
      .toDF("id", "ts", "k")
    val right = Seq((ts("2024-01-01 11:00:00"), None: Option[Long], "nullkey"),
        (ts("2024-01-01 11:00:00"), Some(1L), "real"))
      .toDF("rts", "k", "v")
    val out = JoinOps.asofJoin(left, right, "k", "ts", "rts", "p")
      .select(col("id"), col("p.v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> None, 2L -> Some("real")),
      s"NULL-key rows must not match each other: $out")
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    val left = (Seq.fill(500)(1L) ++ (2L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val right = (1L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, "k").select("k", "v", "name")
    val salted = JoinOps.saltedJoin(left, right, "k", 8).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("bucketed tables join without exchange") {
    import graft.sources.{IO, Tables}
    val ev = Tables.events(spark, Sf).groupBy("user_id").count()
    val users = Tables.events(spark, Sf).groupBy("user_id")
      .agg(sum("value").as("total"))
    Seq("ev_bucketed", "users_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    IO.writeBucketed(ev, "ev_bucketed", "user_id", 8)
    IO.writeBucketed(users, "users_bucketed", "user_id", 8)
    // force the shuffle-join path (broadcast would sidestep bucketing here)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_bucketed").join(spark.table("users_bucketed"), "user_id")
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must be bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("click_attribution picks the last in-window view, nulls a stale one") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: two views inside the hour (latest wins), one after the
      // purchase (ignored), purchase at 12:00
      (1L, 1L, t("2024-07-01 11:10:00"), "view"),
      (2L, 1L, t("2024-07-01 11:40:00"), "view"),
      (3L, 1L, t("2024-07-01 12:00:00"), "purchase"),
      (4L, 1L, t("2024-07-01 12:05:00"), "view"),
      // user 2: only view is 2h old -> unattributed
      (5L, 2L, t("2024-07-01 10:00:00"), "view"),
      (6L, 2L, t("2024-07-01 12:00:00"), "purchase"),
      // user 3: two views at the SAME instant -> max event_id wins
      (7L, 3L, t("2024-07-01 12:00:00"), "view"),
      (8L, 3L, t("2024-07-01 12:00:00"), "view"),
      (9L, 3L, t("2024-07-01 12:30:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.EventFlows.clickAttributionFrom(ev)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(out(3L) == ((Some(2L), Some(1200L * 1000000L))),
      s"latest in-window view, 20 min gap: ${out(3L)}")
    assert(out(6L) == ((None, None)), s"stale view must not attribute: ${out(6L)}")
    assert(out(9L) == ((Some(8L), Some(1800L * 1000000L))),
      s"tied instant resolves to max event_id: ${out(9L)}")
  }

  test("click_attribution collapses redelivered purchase rows to one entity") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // the purchase row arrives three times (at-least-once delivery) and a
    // view row twice — attribution is per purchase ENTITY, so the output
    // is ONE row, matching the oracle's per-purchase_id rank and the
    // streaming twin's purchase_id-keyed winner store
    val p = (2L, 1L, t("2024-07-01 12:00:00"), "purchase")
    val v = (1L, 1L, t("2024-07-01 11:30:00"), "view")
    val out = graft.operators.EventFlows.clickAttributionFrom(
        Seq(v, v, p, p, p).toDF("event_id", "user_id", "ts", "event_type"))
      .collect()
    assert(out.length == 1, s"one row per purchase entity: ${out.length}")
    assert(out.head.getLong(3) == 1L && out.head.getLong(5) == 1800L * 1000000L)
  }

  test("click_attribution collapses MUTATED redeliveries of one purchase_id") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // a producer retry can redeliver the same purchase_id with a drifted
    // ts — NOT byte-identical. Attribution is still per entity: the
    // variants compete and the one whose asof match has the latest view
    // wins (the winner-store rule), so the output is ONE row per id
    val ev = Seq(
      (1L, 1L, t("2024-07-01 11:30:00"), "view"),
      (2L, 1L, t("2024-07-01 12:30:00"), "view"),
      // purchase 9 delivered twice with drifted ts: variant A matches
      // view 1 (vts 11:30), variant B matches view 2 (vts 12:30) — B's
      // match is later, so B's row is the entity's row
      (9L, 1L, t("2024-07-01 12:00:00"), "purchase"),
      (9L, 1L, t("2024-07-01 12:50:00"), "purchase"),
      // purchase 7 delivered twice: one variant matches, one is out of
      // window — the MATCHED variant must win (nulls rank last)
      (7L, 1L, t("2024-07-01 12:10:00"), "purchase"),
      (7L, 1L, t("2024-07-01 14:50:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.EventFlows.clickAttributionFrom(ev)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getString(2)))).toMap
    assert(out.size == 2, s"one row per purchase_id: $out")
    assert(out(9L) == ((Some(2L), "2024-07-01 12:50:00.000000")),
      s"latest matched view across variants wins: ${out(9L)}")
    assert(out(7L) == ((Some(1L), "2024-07-01 12:10:00.000000")),
      s"matched variant beats out-of-window variant: ${out(7L)}")
  }

  test("streaming attribution interval join pairs only in-window views") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val pMem = MemoryStream[(Long, Long, Timestamp, String)]
    val vMem = MemoryStream[(Long, Long, Timestamp, String)]
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts", "event_type")
    val q = graft.streaming.StreamJoins
      .attributionCandidates(named(pMem.toDF()), named(vMem.toDF()))
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      vMem.addData(
        (1L, 1L, t("2024-07-01 11:40:00"), "view"),   // in window
        (2L, 1L, t("2024-07-01 09:00:00"), "view"),   // 3h old - outside
        (3L, 2L, t("2024-07-01 11:50:00"), "view"))   // other user
      pMem.addData((10L, 1L, t("2024-07-01 12:00:00"), "purchase"))
      q.processAllAvailable()
      val pairs = spark.table("attr_test").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(pairs.toSet == Set((10L, 1L)),
        s"only the same-user in-window view pairs: ${pairs.toSeq}")
    } finally q.stop()
  }

  test("streaming last-touch sink equals the batch attribution on the same events") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val base = "/tmp/graft_lasttouch"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
    val pMem = MemoryStream[(Long, Long, Timestamp, String)]
    val vMem = MemoryStream[(Long, Long, Timestamp, String)]
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts", "event_type")
    val store = s"$base/store"
    val q = graft.streaming.StreamJoins.lastTouchSink(
      graft.streaming.StreamJoins.attributionCandidates(
        named(pMem.toDF()), named(vMem.toDF())),
      store, s"$base/ckpt")
    // the full event log, fed in four micro-batches below. u2's stale
    // view rides in batch 1 ON PURPOSE: fed later it would be dropped as
    // watermark-late, which the batch path (that sees everything) cannot
    // imitate — the spec's equivalence claim is for in-watermark arrivals
    val views = Seq(
      (1L, 1L, t("2024-07-01 11:40:00"), "view"),  // b1: first winner
      (5L, 2L, t("2024-07-01 10:00:00"), "view"),  // b1: out-of-window for u2
      (2L, 1L, t("2024-07-01 11:55:00"), "view"),  // b2: LATE, better -> upgrade
      (6L, 99L, t("2024-07-01 15:59:00"), "view"), // b3: sentinel match
      (7L, 98L, t("2024-07-01 16:29:00"), "view")) // b4: sentinel match
    val purchases = Seq(
      (10L, 1L, t("2024-07-01 12:00:00"), "purchase"),  // b1
      (11L, 2L, t("2024-07-01 12:00:00"), "purchase"),  // b3: stays NULL
      (12L, 99L, t("2024-07-01 16:00:00"), "purchase"), // b3: advances watermark
      (13L, 98L, t("2024-07-01 16:30:00"), "purchase")) // b4: flushes 11's NULL row
    try {
      vMem.addData(views(0), views(1)); pMem.addData(purchases(0))
      q.processAllAvailable()
      val w1 = spark.read.parquet(store)
        .select("purchase_id", "view_id").as[(Long, Option[Long])].collect().toMap
      assert(w1 == Map(10L -> Some(1L)), s"batch-1 winner: $w1")
      vMem.addData(views(2))
      q.processAllAvailable()
      val w2 = spark.read.parquet(store)
        .select("purchase_id", "view_id").as[(Long, Option[Long])].collect().toMap
      assert(w2 == Map(10L -> Some(2L)),
        s"a late better candidate must upgrade the stored winner: $w2")
      vMem.addData(views(3)); pMem.addData(purchases(1), purchases(2))
      q.processAllAvailable()
      vMem.addData(views(4)); pMem.addData(purchases(3))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.StreamJoins.readLastTouch(spark, store)
    val batchRef = graft.operators.EventFlows.clickAttributionFrom(
      (views ++ purchases).toDF("event_id", "user_id", "ts", "event_type"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("purchase_id").collect().map(_.toSeq).toSeq
    assert(rows(streamed) == rows(batchRef),
      s"streaming winners must equal the batch path of record:\n" +
        s"stream: ${rows(streamed)}\nbatch:  ${rows(batchRef)}")
  }

  // --- last-touch store: suite-order, bounded I/O, pruning, recovery ---

  /** Candidate-stream schema rows for driving mergeBatch directly. */
  private def cand(rows: Seq[(Long, Long, Timestamp, Option[Long], Option[Timestamp])]) = {
    import spark.implicits._
    rows.toDF("purchase_id", "user_id", "ts", "view_id", "vts")
  }

  private def leafFiles(store: String): Map[String, Set[String]] = {
    val root = new java.io.File(store)
    val leaves = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("pe="))
      .flatMap(pe => Option(pe.listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("pb=")))
    leaves.map(d => s"${d.getParentFile.getName}/${d.getName}" ->
      d.listFiles().map(f => s"${f.getName}:${f.length}").toSet).toMap
  }

  private def bucketOf(id: Long): Int = spark.range(1)
    .select(pmod(xxhash64(lit(id)), lit(64L)).cast("int")).head().getInt(0)

  private def epochOf(s: String): Int = spark.range(1)
    .select(datediff(lit(Timestamp.valueOf(s)).cast("date"),
      lit("1970-01-01").cast("date"))).head().getInt(0)

  test("last-touch merge rewrites only the touched store leaves") {
    def t(s: String) = Timestamp.valueOf(s)
    val store = "/tmp/graft_lasttouch_leaves/store"
    import scala.reflect.io.Directory
    new Directory(new java.io.File("/tmp/graft_lasttouch_leaves")).deleteRecursively()
    // batch 1: 200 purchases in one epoch day populate most of the 64 buckets
    val b1 = cand((1L to 200L).map(i =>
      (i, i, t("2024-07-01 12:00:00"), Some(1000L + i), Some(t("2024-07-01 11:40:00")))))
    graft.streaming.StreamJoins.mergeBatch(b1, store)
    val after1 = leafFiles(store)
    assert(after1.size > 40, s"200 uniform purchases should fill most buckets: ${after1.size}")
    // batch 2: ONE purchase gets a better late candidate
    val b2 = cand(Seq((42L, 42L, t("2024-07-01 12:00:00"),
      Some(9999L), Some(t("2024-07-01 11:55:00")))))
    graft.streaming.StreamJoins.mergeBatch(b2, store)
    val after2 = leafFiles(store)
    val changed2 = (after1.keySet ++ after2.keySet)
      .filter(k => after1.get(k) != after2.get(k))
    val e1 = epochOf("2024-07-01 12:00:00")
    assert(changed2 == Set(s"pe=$e1/pb=${bucketOf(42L)}"),
      s"a one-purchase batch must rewrite exactly its own leaf: $changed2")
    // batch 3: a purchase four days later lands in a NEW epoch partition —
    // every epoch-1 leaf is sealed (not even the same hash bucket is touched)
    val b3 = cand(Seq((300L, 300L, t("2024-07-05 09:00:00"),
      Some(7000L), Some(t("2024-07-05 08:30:00")))))
    graft.streaming.StreamJoins.mergeBatch(b3, store)
    val after3 = leafFiles(store)
    val changed3 = after2.keySet.filter(k => after2.get(k) != after3.get(k))
    assert(changed3.isEmpty,
      s"a new-epoch batch must not rewrite any sealed epoch-1 leaf: $changed3")
    assert(after3.keySet.contains(s"pe=${epochOf("2024-07-05 09:00:00")}/pb=${bucketOf(300L)}"))
    // winners: 42 upgraded, 41 untouched, 300 present
    val w = graft.streaming.StreamJoins.readLastTouch(spark, store)
      .select("purchase_id", "view_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(42L) == 9999L, s"late better candidate must upgrade: ${w(42L)}")
    assert(w(41L) == 1041L && w(300L) == 7000L, s"others keep/gain winners: $w")
  }

  test("last-touch prior read partition-prunes to the touched leaves") {
    val store = "/tmp/graft_lasttouch_leaves/store" // built by the previous test
    assume(new java.io.File(store).exists())
    val e1 = epochOf("2024-07-01 12:00:00")
    val touched = Seq((e1, bucketOf(42L)), (e1, bucketOf(43L)))
    val pruned = graft.streaming.StreamJoins.prunedPrior(spark, store, touched).get
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = leafFiles(store).values.map(_.count(_.contains(".parquet"))).sum
    assert(totalFiles > 40, s"store should hold many leaf files: $totalFiles")
    assert(filesRead > 0 && filesRead <= 2,
      s"a two-leaf merge must scan at most its two leaves: $filesRead of $totalFiles")
    // the LISTING pin (the r10 carried item): the scan's file index must
    // be rooted at exactly the touched leaf dirs — store-wide partition
    // discovery would root at the store and re-list every sealed leaf
    // each batch, a cost term growing with store lifetime
    val roots = scan.relation.location.rootPaths.map(_.toString)
    assert(roots.size == touched.size &&
      touched.forall { case (e, x) => roots.exists(_.endsWith(s"pe=$e/pb=$x")) },
      s"prior read must be rooted at the touched leaves only: $roots")
    // and the partition columns still materialize through basePath
    assert(pruned.columns.contains("pe") && pruned.columns.contains("pb"),
      s"basePath read must keep partition columns: ${pruned.columns.toSeq}")
    // a merge whose touched leaves don't exist yet has NO prior to read
    assert(graft.streaming.StreamJoins.prunedPrior(spark, store,
      Seq((e1 + 9999, 0))).isEmpty, "all-new leaves => no prior scan at all")
  }

  test("last-touch recovery restores a set-aside leaf and drops merge debris") {
    def t(s: String) = Timestamp.valueOf(s)
    val store = "/tmp/graft_lasttouch_leaves/store"
    assume(new java.io.File(store).exists())
    val e1 = epochOf("2024-07-01 12:00:00")
    val peDir = new java.io.File(store, s"pe=$e1")
    val victim = new java.io.File(peDir, s"pb=${bucketOf(41L)}")
    // crash window 1: leaf renamed aside, promote never happened
    assert(victim.renameTo(new java.io.File(peDir, victim.getName + "__swap_old")))
    // crash window 2: promote completed, old copy not yet deleted
    val done = new java.io.File(peDir, s"pb=${bucketOf(43L)}")
    val doneOld = new java.io.File(peDir, done.getName + "__swap_old")
    doneOld.mkdirs()
    // plus a dead merge tmp from the interrupted batch
    new java.io.File(store + "__merge_tmp/pe=0").mkdirs()
    // any merge entry heals all three before touching data
    graft.streaming.StreamJoins.mergeBatch(
      cand(Seq((42L, 42L, t("2024-07-01 12:00:00"),
        Some(9999L), Some(t("2024-07-01 11:55:00"))))), store)
    assert(victim.exists(), "set-aside leaf must be restored")
    assert(!doneOld.exists(), "completed-swap debris must be deleted")
    assert(!new java.io.File(store + "__merge_tmp").exists(), "merge tmp must be dropped")
    val w = graft.streaming.StreamJoins.readLastTouch(spark, store)
      .select("purchase_id", "view_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(41L) == 1041L && w(42L) == 9999L, s"store intact after recovery: $w")
  }

  test("sink start heals debris in epochs a fresh checkpoint never replays") {
    // the one crash window per-batch scoped healing can NOT reach: the
    // interrupted batch's checkpoint is gone (store re-attached under a
    // fresh checkpoint), so no batch will ever touch the debris epoch.
    // lastTouchSink's start-time full healing pass must cover it
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val base = "/tmp/graft_lasttouch_freshckpt"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
    val store = s"$base/store"
    // seed an epoch-1 winner via a direct merge (no checkpoint involved)
    graft.streaming.StreamJoins.mergeBatch(cand(Seq(
      (50L, 50L, t("2024-06-01 12:00:00"),
        Some(500L), Some(t("2024-06-01 11:40:00"))))), store)
    val peDir = new java.io.File(store, s"pe=${epochOf("2024-06-01 12:00:00")}")
    val victim = new java.io.File(peDir, s"pb=${bucketOf(50L)}")
    assert(victim.renameTo(new java.io.File(peDir, victim.getName + "__swap_old")))
    // fresh-checkpoint sink whose only batch touches a DIFFERENT epoch
    val pMem = MemoryStream[(Long, Long, Timestamp, String)]
    val vMem = MemoryStream[(Long, Long, Timestamp, String)]
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts", "event_type")
    val q = graft.streaming.StreamJoins.lastTouchSink(
      graft.streaming.StreamJoins.attributionCandidates(
        named(pMem.toDF()), named(vMem.toDF())),
      store, s"$base/ckpt")
    try {
      vMem.addData((101L, 1L, t("2024-07-01 11:40:00"), "view"))
      pMem.addData((10L, 1L, t("2024-07-01 12:00:00"), "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    assert(victim.exists() &&
      !new java.io.File(peDir, victim.getName + "__swap_old").exists(),
      "start-time healing must restore the set-aside leaf in the unreplayed epoch")
    val w = graft.streaming.StreamJoins.readLastTouch(spark, store)
      .select("purchase_id", "view_id").as[(Long, Option[Long])].collect().toMap
    assert(w == Map(50L -> Some(500L), 10L -> Some(101L)),
      s"both the healed epoch-1 winner and the new winner survive: $w")
  }

  test("last-touch merge drops NULL-key candidates instead of NPEing") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val base = "/tmp/graft_lasttouch_nullts"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
    val store = s"$base/store"
    // raw private[graft] rows: a NULL purchase ts has no pe leaf to land
    // in, a NULL purchase_id no pb — before the entry guard these NPE'd
    // the touched-leaf collect (r10 carried finding). The streaming
    // source filters them; a direct caller must get a drop, not a crash
    val rows = Seq[(Option[Long], Long, Option[Timestamp], Option[Long], Option[Timestamp])](
      (Some(10L), 1L, Some(t("2024-07-01 12:00:00")),
        Some(100L), Some(t("2024-07-01 11:40:00"))),
      (Some(11L), 2L, None, Some(101L), Some(t("2024-07-01 11:41:00"))),
      (None, 3L, Some(t("2024-07-01 12:00:00")),
        Some(102L), Some(t("2024-07-01 11:42:00"))))
      .toDF("purchase_id", "user_id", "ts", "view_id", "vts")
    graft.streaming.StreamJoins.mergeBatch(rows, store)
    val w = graft.streaming.StreamJoins.readLastTouch(spark, store)
      .select("purchase_id").as[Long].collect().toSet
    assert(w == Set(10L), s"only the fully-keyed candidate is stored: $w")
  }

  test("last-touch sink's first batch works after other streaming queries in the session") {
    // the r8 in-suite failure distilled: lastTouchSink's first micro-batch
    // ran AFTER other streaming queries in the same session and its
    // prior-union (then derived from the batch itself, sharing attribute
    // IDs) died in constraint propagation (key not found: ts#...).
    // The store-read prior (or no union at all on the first batch) must
    // make ordering irrelevant — this spec pins exactly that sequencing.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts", "event_type")
    // another streaming query first (same session, runs to completion)
    val pre = MemoryStream[(Long, Long, Timestamp, String)]
    val preQ = graft.streaming.StreamJoins
      .attributionCandidates(named(pre.toDF()), named(pre.toDF()))
      .writeStream.format("memory").queryName("order_probe")
      .outputMode("append").start()
    try {
      pre.addData((1L, 1L, t("2024-07-01 12:00:00"), "purchase"))
      preQ.processAllAvailable()
    } finally preQ.stop()
    // now a FRESH last-touch sink: its first micro-batch must succeed
    val base = "/tmp/graft_lasttouch_order"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
    val pMem = MemoryStream[(Long, Long, Timestamp, String)]
    val vMem = MemoryStream[(Long, Long, Timestamp, String)]
    val q = graft.streaming.StreamJoins.lastTouchSink(
      graft.streaming.StreamJoins.attributionCandidates(
        named(pMem.toDF()), named(vMem.toDF())),
      s"$base/store", s"$base/ckpt")
    try {
      vMem.addData((2L, 1L, t("2024-07-01 11:40:00"), "view"))
      pMem.addData((10L, 1L, t("2024-07-01 12:00:00"), "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val w = spark.read.parquet(s"$base/store")
      .select("purchase_id", "view_id").as[(Long, Option[Long])].collect().toMap
    assert(w == Map(10L -> Some(2L)), s"first batch after prior queries: $w")
  }

  test("last-touch soak: 12 batches, late upgrade, watermark drop, crash+restart") {
    // the replay-idempotence and longevity claims DRIVEN, not argued:
    // two epoch days of micro-batches through a real checkpoint, a late
    // in-threshold upgrade, a watermark-dropped candidate, and a mid-run
    // stop with injected swap debris — after restart FROM THE SAME
    // checkpoint the store must equal the batch path of record over the
    // non-dropped events, with every debris artifact healed
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts", "event_type")
    val base = "/tmp/graft_lasttouch_soak"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
    val store = s"$base/store"
    val pMem = MemoryStream[(Long, Long, Timestamp, String)]
    val vMem = MemoryStream[(Long, Long, Timestamp, String)]
    def sink() = graft.streaming.StreamJoins.lastTouchSink(
      graft.streaming.StreamJoins.attributionCandidates(
        named(pMem.toDF()), named(vMem.toDF())),
      store, s"$base/ckpt")
    var views = Seq.empty[(Long, Long, Timestamp, String)]
    var purchases = Seq.empty[(Long, Long, Timestamp, String)]
    def feed(q: org.apache.spark.sql.streaming.StreamingQuery,
        vs: Seq[(Long, Long, Timestamp)], ps: Seq[(Long, Long, Timestamp)]): Unit = {
      val vRows = vs.map { case (id, u, ts) => (id, u, ts, "view") }
      val pRows = ps.map { case (id, u, ts) => (id, u, ts, "purchase") }
      views ++= vRows; purchases ++= pRows
      if (vRows.nonEmpty) vMem.addData(vRows: _*)
      if (pRows.nonEmpty) pMem.addData(pRows: _*)
      q.processAllAvailable()
    }
    val q1 = sink()
    try {
      feed(q1, Seq((101L, 1L, t("2024-07-01 11:40:00"))),
        Seq((10L, 1L, t("2024-07-01 12:00:00"))))                 // b1
      feed(q1, Seq((102L, 1L, t("2024-07-01 11:55:00"))), Nil)    // b2: upgrade
      feed(q1, Seq((103L, 3L, t("2024-07-01 12:20:00"))),
        Seq((11L, 2L, t("2024-07-01 12:10:00"))))                 // b3
      feed(q1, Seq((104L, 4L, t("2024-07-01 12:59:00"))),
        Seq((12L, 3L, t("2024-07-01 12:30:00")),
          (13L, 4L, t("2024-07-01 13:00:00"))))                   // b4
      feed(q1, Seq((105L, 5L, t("2024-07-01 13:58:00"))),
        Seq((14L, 5L, t("2024-07-01 14:00:00"))))                 // b5: wm→13:48
    } finally q1.stop()
    // induced crash: one winner leaf renamed aside mid-swap + a dead tmp
    val e1 = epochOf("2024-07-01 12:00:00")
    val peDir = new java.io.File(store, s"pe=$e1")
    val victim = new java.io.File(peDir, s"pb=${bucketOf(10L)}")
    assert(victim.exists(), s"u1's winner leaf must exist before the crash: $victim")
    assert(victim.renameTo(new java.io.File(peDir, victim.getName + "__swap_old")))
    new java.io.File(store + "__merge_tmp/pe=0").mkdirs()
    // a watermark-dropped candidate arrives while the sink is DOWN: p11's
    // in-window view is behind the checkpointed watermark (13:48) when the
    // restarted query processes it, so the engine drops it and p11 keeps
    // its NULL row. The batch reference below EXCLUDES it — the
    // equivalence claim is for in-watermark arrivals
    vMem.addData((106L, 2L, t("2024-07-01 11:55:00"), "view"))
    val dropped = Seq((106L, 2L, t("2024-07-01 11:55:00"), "view"))
    val q2 = sink()
    try {
      q2.processAllAvailable()                                    // b6: drop
      feed(q2, Seq((107L, 7L, t("2024-07-02 09:30:00"))),
        Seq((15L, 7L, t("2024-07-02 10:00:00"))))                 // b7: day 2
      feed(q2, Seq((108L, 8L, t("2024-07-02 10:29:00"))),
        Seq((16L, 8L, t("2024-07-02 10:30:00"))))                 // b8
      feed(q2, Seq((109L, 8L, t("2024-07-02 10:30:00"))), Nil)    // b9: upgrade
      feed(q2, Nil, Seq((17L, 9L, t("2024-07-02 11:00:00"))))     // b10: no view
      feed(q2, Seq((110L, 10L, t("2024-07-02 11:58:00"))),
        Seq((18L, 10L, t("2024-07-02 12:00:00"))))                // b11
      feed(q2, Seq((111L, 11L, t("2024-07-02 13:58:00"))),
        Seq((19L, 11L, t("2024-07-02 14:00:00"))))                // b12: flush 17
    } finally q2.stop()
    // every debris artifact healed by the restart
    def swapDebris(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.endsWith("__swap_old"))
    assert(swapDebris(new java.io.File(store)).isEmpty, "swap debris healed")
    assert(!new java.io.File(store + "__merge_tmp").exists(), "merge tmp dropped")
    val streamed = graft.streaming.StreamJoins.readLastTouch(spark, store)
    val batchRef = graft.operators.EventFlows.clickAttributionFrom(
      (views ++ purchases).toDF("event_id", "user_id", "ts", "event_type"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("purchase_id").collect().map(_.toSeq).toSeq
    assert(rows(streamed) == rows(batchRef),
      s"after crash+restart the store must equal the batch path of record:\n" +
        s"stream: ${rows(streamed)}\nbatch:  ${rows(batchRef)}")
    // the dropped view would have changed p11's verdict — prove the soak
    // exercised the drop (the batch path WITH it disagrees)
    val withDropped = graft.operators.EventFlows.clickAttributionFrom(
      (views ++ dropped ++ purchases).toDF("event_id", "user_id", "ts", "event_type"))
    assert(rows(withDropped) != rows(batchRef),
      "the watermark-dropped view must be one the batch path would have used")
  }

  test("last-touch sink equals batch attribution on a randomized chronological stream") {
    // seeded randomized equivalence: 300 events over 20 users fed in 8
    // CHRONOLOGICAL micro-batches. Sorted feeding means every batch's
    // min ts is at or above the previous batch's max, so nothing is ever
    // watermark-late; and a matching view (vts <= pts) always arrives in
    // an earlier-or-same batch than its purchase, still in join state
    // (views evict only once the watermark proves they can't match). So
    // the stream must reproduce the batch operator EXACTLY — no carve-out
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = "/tmp/graft_lasttouch_fuzz"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(base)).deleteRecursively()
    val day0 = Timestamp.valueOf("2024-07-01 00:00:00").getTime
    val rnd = new scala.util.Random(1234)
    val events = (1 to 300).map { i =>
      val tp = if (rnd.nextInt(10) < 3) "purchase" else "view"
      (i.toLong, (1 + rnd.nextInt(20)).toLong,
        new Timestamp(day0 + rnd.nextInt(600) * 60000L), tp)
    }.sortBy(e => (e._3.getTime, e._1))
    // far-future matched sentinel: advances the watermark past every
    // purchase's window so unattributed purchases flush their NULL rows
    val sentinel = Seq(
      (9001L, 999L, new Timestamp(day0 + 800 * 60000L), "view"),
      (9002L, 999L, new Timestamp(day0 + 801 * 60000L), "purchase"))
    val pMem = MemoryStream[(Long, Long, Timestamp, String)]
    val vMem = MemoryStream[(Long, Long, Timestamp, String)]
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts", "event_type")
    val q = graft.streaming.StreamJoins.lastTouchSink(
      graft.streaming.StreamJoins.attributionCandidates(
        named(pMem.toDF()), named(vMem.toDF())),
      s"$base/store", s"$base/ckpt")
    try {
      (events.grouped(38).toSeq :+ sentinel).foreach { b =>
        val (ps, vs) = b.partition(_._4 == "purchase")
        if (vs.nonEmpty) vMem.addData(vs: _*)
        if (ps.nonEmpty) pMem.addData(ps: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = graft.streaming.StreamJoins.readLastTouch(spark, s"$base/store")
    val batchRef = graft.operators.EventFlows.clickAttributionFrom(
      (events ++ sentinel).toDF("event_id", "user_id", "ts", "event_type"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("purchase_id").collect().map(_.toSeq).toSeq
    val (s, b) = (rows(streamed), rows(batchRef))
    assert(s.size == b.size && s == b,
      s"randomized stream/batch divergence: stream ${s.size} rows, batch ${b.size};" +
        s" first diff: ${s.zip(b).find { case (x, y) => x != y }}")
    // the run must exercise both branches materially
    val withView = b.count(_(3) != null)
    assert(withView > 10 && withView < b.size,
      s"fuzz must produce both attributed and NULL purchases: $withView/${b.size}")
  }

  test("readLastTouch on an absent or empty store is an empty typed relation") {
    val df = graft.streaming.StreamJoins.readLastTouch(
      spark, "/tmp/graft_lasttouch_never_written")
    assert(df.columns.toSeq == Seq("purchase_id", "user_id", "purchase_ts",
      "view_id", "view_ts", "gap_us"))
    assert(df.count() == 0)
  }

  test("batch stateful transitions match the lead() window operator") {
    import spark.implicits._
    import graft.streaming.{StatefulTransitions, TransEvent}
    val ev = graft.sources.Tables.events(spark, Sf)
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[TransEvent]
    val stateful = StatefulTransitions(ev).toDF()
      .groupBy("from_type", "to_type").agg(count("*").as("n"))
    val windowed = graft.operators.EventFlows.eventTransitions(spark, Sf)
      .select("from_type", "to_type", "n")
    assert(stateful.join(windowed, Seq("from_type", "to_type"), "full_outer")
      .where(!(stateful("n") <=> windowed("n")))
      .count() == 0, "stateful and windowed pair counts must agree exactly")
  }

  test("transitions twins agree on NULL ts: it sorts first in both plans") {
    import spark.implicits._
    import graft.streaming.{StatefulTransitions, TransEvent}
    // a NULL-ts event is not filtered by either twin — the window orders
    // it first (Spark's nulls-first default, pinned in the oracle); the
    // stateful sort key mirrors that with a Long.MinValue sentinel
    val ev = Seq(
      TransEvent(1L, None, Some(5L), "signup"),
      TransEvent(1L, Some(Timestamp.valueOf("2024-01-01 10:00:00")), Some(1L), "view"),
      TransEvent(1L, Some(Timestamp.valueOf("2024-01-01 10:05:00")), None, "click"))
    val stateful = StatefulTransitions(ev.toDS()).toDF()
      .select("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(stateful == Set("signup" -> "view", "view" -> "click"),
      s"NULL ts pairs first, NULL event_id tolerated: $stateful")
    val windowed = graft.operators.EventFlows.eventTransitionsFrom(
      ev.toDF("user_id", "ts", "event_id", "event_type"))
      .select("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(windowed == stateful, s"twins must agree: $windowed vs $stateful")
  }

  test("batch stateful scd2 equals the window-function interval build") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, Sf)
      .where(col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[graft.streaming.Scd2Event]
    val stateful = graft.streaming.StatefulScd2(ev).toDF()
      .select(col("user_id"), col("state_seq"), col("state"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("f"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"),
        col("n_events"))
      .collect().map(_.toSeq).toSet
    val windowed = graft.operators.EventFlows.scd2Intervals(spark, Sf)
      .collect().map(_.toSeq).toSet
    assert(stateful == windowed, "twins must emit identical interval rows")
  }

  test("streaming scd2 emits an interval only when its run closes") {
    import spark.implicits._
    import graft.streaming.{StatefulScd2, Scd2Event}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Scd2Event]
    val q = StatefulScd2(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("scd2_test")
      .outputMode("append").start()
    def ts(s: String) = Timestamp.valueOf(s)
    try {
      // trigger 1: a 2-event view run — still OPEN, nothing may emit
      mem.addData(
        Scd2Event(Some(1L), ts("2024-01-01 10:00:00"), Some(1L), Some("view")),
        Scd2Event(Some(1L), ts("2024-01-01 10:05:00"), Some(2L), Some("view")))
      q.processAllAvailable()
      assert(spark.table("scd2_test").count() == 0,
        "an open run must stay in state, not emit")
      // trigger 2: the state changes — the view run closes with
      // valid_to = the click's timestamp and BOTH its events counted
      mem.addData(
        Scd2Event(Some(1L), ts("2024-01-01 10:20:00"), Some(3L), Some("click")))
      q.processAllAvailable()
      val b2 = spark.table("scd2_test").collect()
      assert(b2.length == 1, s"exactly the closed run emits: ${b2.mkString(";")}")
      val r = b2(0)
      assert(r.getLong(1) == 1L && r.getString(2) == "view" &&
        r.getLong(5) == 2L &&
        r.getTimestamp(4) == ts("2024-01-01 10:20:00"),
        s"closed interval carries its run and chains valid_to: $r")
    } finally q.stop()
  }

  test("streaming transitions pair across triggers via carried state") {
    import spark.implicits._
    import graft.streaming.{StatefulTransitions, TransEvent}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TransEvent]
    val q = StatefulTransitions(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("trans_test")
      .outputMode("append").start()
    def ts(s: String) = Timestamp.valueOf(s)
    try {
      // trigger 1: out-of-arrival-order within the trigger — the local
      // (ts, event_id) sort must pair view->click, not click->view
      mem.addData(
        TransEvent(1L, Some(ts("2024-01-01 10:05:00")), Some(2L), "click"),
        TransEvent(1L, Some(ts("2024-01-01 10:00:00")), Some(1L), "view"))
      q.processAllAvailable()
      val b1 = spark.table("trans_test").collect()
      assert(b1.length == 1 && b1(0).getString(1) == "view" &&
        b1(0).getString(2) == "click",
        s"intra-trigger pairs follow (ts, event_id) order: ${b1.mkString(";")}")
      // trigger 2: the cross-trigger pair rides the carried state
      mem.addData(TransEvent(1L, Some(ts("2024-01-01 10:10:00")), Some(3L), "purchase"))
      q.processAllAvailable()
      val b2 = spark.table("trans_test").collect()
      assert(b2.length == 2 && b2.exists(r =>
        r.getString(1) == "click" && r.getString(2) == "purchase"),
        s"carried state pairs the first event of the next trigger: ${b2.mkString(";")}")
    } finally q.stop()
  }

  test("streaming exact dedup: cross-trigger duplicates fold into one " +
    "running verdict; batch mode equals dedup_exact row-for-row") {
    import spark.implicits._
    import graft.streaming.{DedupDoc, StatefulDedup}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DedupDoc]
    val q = StatefulDedup(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(
        DedupDoc(Some("f1"), 7L, Some(3L)),
        DedupDoc(Some("f2"), 2L, None))
      q.processAllAvailable()
      val b1 = spark.table("dedup_test").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(b1 == Set(("f1", 7L, 1L), ("f2", 2L, 1L)), s"b1: $b1")
      // a LATER delivery with a SMALLER doc_id must retake the winner,
      // and the copy count keeps counting across triggers
      mem.addData(
        DedupDoc(Some("f1"), 5L, Some(2L)),
        DedupDoc(Some("f1"), 9L, None))
      q.processAllAvailable()
      val last = spark.table("dedup_test").collect()
        .filter(_.getString(0) == "f1")
        .maxBy(_.getLong(2)) // n_copies is monotone → max = latest
      assert((last.getLong(1), last.getLong(2), last.getLong(3)) ==
        ((5L, 3L, 2L)),
        s"running verdict after trigger 2: $last")
    } finally q.stop()
    // batch mode folds each fingerprint whole → identical relation to
    // the batch groupBy operator (same oracle checks both in the gate)
    val twin = StatefulDedup(StatefulDedup.fromDocuments(
      graft.sources.Tables.documents(spark, SparkTest.Sf))).toDF()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    val batch = graft.operators.TextOps.dedupExact(spark, SparkTest.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(twin == batch, "stateful batch mode must equal dedup_exact")
  }
}
