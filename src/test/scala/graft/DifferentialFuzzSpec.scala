package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz over the user-journey operators: seeded random event
  * tables (duplicate timestamps, same-(user, ts) collisions, users
  * missing stages entirely) checked against independent in-memory
  * reference implementations. The DuckDB oracle gate runs these operators
  * on ONE fixed corpus shape; this spec varies the shape — tie-breaks,
  * empty stages, single-event users — where CTE/window logic actually
  * breaks. Seeds are fixed: failures reproduce.
  */
case class FuzzEv(event_id: Long, user_id: Long, ts: Timestamp,
    event_type: String)

class DifferentialFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  /** Small worlds on purpose: few users × few distinct timestamps forces
    * the collision cases a realistic generator almost never hits. */
  private def randomEvents(seed: Int): Seq[FuzzEv] = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("view", "click", "purchase", "error")
    val base = Timestamp.valueOf("2024-05-01 00:00:00").getTime
    val tsPool = Seq.fill(10)(base + rnd.nextInt(4 * 24 * 60) * 60000L)
    (1 to 40 + rnd.nextInt(30)).map { i =>
      FuzzEv(i.toLong, 1L + rnd.nextInt(6),
        new Timestamp(tsPool(rnd.nextInt(tsPool.length))),
        types(rnd.nextInt(types.length)))
    }
  }

  private val stages = Seq("view", "click", "purchase")

  /** The funnel contract, restated imperatively: earliest stage-1 time,
    * then earliest LATER stage-2 time (within the hop window if set),
    * then earliest stage-3 time after THAT. */
  private def refFunnel(evs: Seq[FuzzEv], withinDays: Int)
      : Map[Long, (Long, Option[Long], Option[Long], Long)] = {
    val windowMs = withinDays.toLong * 24 * 60 * 60 * 1000
    def hop(prev: Long, t: Long) =
      t > prev && (withinDays <= 0 || t <= prev + windowMs)
    evs.groupBy(_.user_id).flatMap { case (u, es) =>
      def tsOf(stage: String) = es.filter(_.event_type == stage).map(_.ts.getTime)
      tsOf(stages(0)).minOption.map { t1 =>
        val t2 = tsOf(stages(1)).filter(hop(t1, _)).minOption
        val t3 = t2.flatMap(p => tsOf(stages(2)).filter(hop(p, _)).minOption)
        u -> ((t1, t2, t3, if (t3.isDefined) 3L else if (t2.isDefined) 2L else 1L))
      }
    }
  }

  test("funnel_steps matches a brute-force reference on random collision-heavy worlds") {
    import spark.implicits._
    for (seed <- 1 to 5; within <- Seq(0, 1)) {
      val evs = randomEvents(seed)
      val out = graft.operators.EventFlows
        .funnelStepsFrom(evs.toDF(), stages, within)
        .collect().map { r =>
          def t(i: Int) = Option(r.getTimestamp(i)).map(_.getTime)
          r.getLong(0) -> ((t(1).get, t(2), t(3), r.getLong(4)))
        }.toMap
      val ref = refFunnel(evs, within)
      assert(out == ref, s"seed=$seed within=$within:\n spark=$out\n ref=$ref")
    }
  }

  test("sessionize matches a brute-force reference, including exact-gap ties") {
    import spark.implicits._
    // values are multiples of 0.25, so double summation is
    // order-independent and round(·, 2) compares exactly; the minute-grid
    // timestamp pool makes EXACTLY-30-minute gaps (stay in session) and
    // duplicate timestamps genuinely occur across seeds
    for (seed <- 21 to 25) {
      val evs = randomEvents(seed)
      val df = evs.toDF().withColumn("value",
        (col("event_id") % 7).cast("double") / 4)
      val out = graft.operators.Relational.sessionizeFrom(df)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
      val ref = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        var sid = 0L; var prev = Long.MinValue
        val tagged = sorted.map { e =>
          val t = e.ts.getTime
          if (prev == Long.MinValue || t - prev > 1800000L) sid += 1
          prev = t
          (sid, e)
        }
        tagged.groupBy(_._1).map { case (s, ses) =>
          (u, s) -> ((ses.size.toLong,
            ses.map(x => (x._2.event_id % 7).toDouble / 4).sum))
        }
      }
      assert(out == ref, s"seed=$seed:\n spark=$out\n ref=$ref")
    }
  }

  test("retention_cohorts matches a brute-force reference on random worlds") {
    import spark.implicits._
    for (seed <- 31 to 35) {
      val evs = randomEvents(seed)
      val out = graft.operators.EventFlows.retentionCohortsFrom(evs.toDF())
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      // UTC, matching the pinned session timezone — the JVM-default-TZ
      // form would diverge on any non-UTC machine
      val day = (e: FuzzEv) =>
        e.ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
      val cohort = evs.groupBy(_.user_id).view.mapValues(_.map(day).min).toMap
      val active = evs.map(e => (cohort(e.user_id),
          java.time.temporal.ChronoUnit.DAYS.between(cohort(e.user_id), day(e)),
          e.user_id)).distinct
        .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).distinct.size.toLong)
      val sizes = active.collect { case ((d, 0L), n) => d -> n }.toMap
      val ref = active.map { case ((d, off), n) =>
        (d.toString, off) -> ((n, sizes(d), n.toDouble / sizes(d)))
      }.toMap
      assert(out.keySet == ref.keySet, s"seed=$seed key sets differ:" +
        s" ${out.keySet.diff(ref.keySet)} | ${ref.keySet.diff(out.keySet)}")
      ref.foreach { case (k, (n, sz, rt)) =>
        assert(out(k)._1 == n && out(k)._2 == sz, s"seed=$seed $k: ${out(k)} vs ($n,$sz)")
        assert(math.abs(out(k)._3 - rt) < 1e-6, s"seed=$seed $k rate")
      }
    }
  }

  test("top_events_per_user matches a brute-force reference with NULL values") {
    import spark.implicits._
    for (seed <- 51 to 55) {
      val evs = randomEvents(seed)
      // every 5th event has a NULL value: desc ordering must put them
      // LAST (Spark's desc default), never rank a NULL into the top 3
      val df = evs.toDF().withColumn("value",
        when(col("event_id") % 5 === 0, lit(null))
          .otherwise((col("event_id") % 7).cast("double") / 4))
      val out = graft.operators.Relational.topEventsPerUserFrom(df)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
        .toMap
      val value = (e: FuzzEv) =>
        if (e.event_id % 5 == 0) None else Some((e.event_id % 7).toDouble / 4)
      val ref = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        es.sortBy(e => (value(e).map(-_).getOrElse(Double.MaxValue), e.event_id))
          .take(3).zipWithIndex.map { case (e, i) =>
            (u, i + 1L) -> ((e.event_id, value(e)))
          }
      }
      assert(out == ref, s"seed=$seed:\n spark=$out\n ref=$ref")
    }
  }

  test("click_attribution matches a brute-force reference on random worlds") {
    import spark.implicits._
    for (seed <- 71 to 75) {
      val evs = randomEvents(seed)
      // redeliver a random quarter of the rows (at-least-once delivery):
      // attribution is per purchase ENTITY, so the reference — keyed by
      // event_id over the ORIGINAL rows — must be reproduced exactly
      val rnd = new scala.util.Random(seed + 1000)
      val world = evs ++ rnd.shuffle(evs).take(evs.length / 4)
      val rows = graft.operators.EventFlows.clickAttributionFrom(world.toDF())
        .collect()
      // exactly one row per purchase ENTITY — a map compare alone would
      // mask duplicated output rows (later keys overwrite identically)
      assert(rows.length == evs.count(_.event_type == "purchase"),
        s"seed=$seed: ${rows.length} rows for " +
          s"${evs.count(_.event_type == "purchase")} purchases")
      val out = rows.map(r => r.getLong(0) ->
          ((if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
      val windowMs = 3600000L
      val ref = evs.filter(_.event_type == "purchase").map { p =>
        val best = evs.filter(v => v.event_type == "view" &&
            v.user_id == p.user_id &&
            v.ts.getTime <= p.ts.getTime &&
            v.ts.getTime >= p.ts.getTime - windowMs)
          // latest view first, then largest event_id — the tie contract
          .sortBy(v => (-v.ts.getTime, -v.event_id)).headOption
        p.event_id -> ((best.map(_.event_id),
          best.map(v => (p.ts.getTime - v.ts.getTime) * 1000L)))
      }.toMap
      assert(out == ref, s"seed=$seed:\n spark=$out\n ref=$ref")
    }
  }

  test("heavy_hitters matches a brute-force reference threshold") {
    import spark.implicits._
    for (seed <- 61 to 65) {
      val evs = randomEvents(seed)
      val out = graft.operators.Relational.heavyHittersFrom(evs.toDF())
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val counts = evs.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
      val thr = counts.values.sum.toDouble / counts.size * 1.15
      val ref = counts.filter(_._2 > thr)
      assert(out == ref, s"seed=$seed thr=$thr:\n spark=$out\n ref=$ref")
    }
  }

  test("anomaly_spikes matches a brute-force reference over observed-day windows") {
    import spark.implicits._
    for (seed <- 41 to 45) {
      val rnd = new scala.util.Random(seed)
      // 10 days × 2 levels with random intensities; ~1 in 4 (level, day)
      // cells has NO events at all — the trailing window must skip the
      // missing day (observed-day semantics), not count it as zero —
      // plus one planted +30 burst
      val base = java.time.Instant.parse("2024-06-01T00:00:00Z").toEpochMilli
      val cells = for {
        d <- 0 until 10; lvl <- Seq("error", "signup")
        n = rnd.nextInt(8) - 1 // -1 or 0 -> absent day
        if n > 0
      } yield (lvl, d, n)
      val burst = cells(rnd.nextInt(cells.size))
      val all = cells.map { case (l, d, n) =>
        (l, d, if ((l, d) == (burst._1, burst._2)) n + 30 else n)
      }
      var id = 0L
      val evs = all.flatMap { case (lvl, d, n) =>
        (1 to n).map { j =>
          id += 1
          FuzzEv(id, 1L, new Timestamp(base + d * 86400000L + j * 60000L), lvl)
        }
      }
      val out = graft.operators.LogOps.anomalySpikesFrom(evs.toDF(), sigma = 3.0)
        .collect().map { r =>
          (r.getString(0), r.getString(1)) ->
            ((r.getLong(2), r.getLong(5), r.getBoolean(6)))
        }.toMap
      val ref = all.groupBy(_._1).flatMap { case (lvl, rows) =>
        val days = rows.sortBy(_._2)
        days.zipWithIndex.map { case ((_, d, n), i) =>
          val baseWin = days.slice(math.max(0, i - 7), i).map(_._3.toDouble)
          val bn = baseWin.size
          val spike = bn >= 3 && {
            val avg = baseWin.sum / bn
            val std = math.sqrt(
              baseWin.map(x => (x - avg) * (x - avg)).sum / (bn - 1))
            n > avg + 3.0 * std
          }
          val label = java.time.Instant.ofEpochMilli(base + d * 86400000L)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
          (lvl, label) -> ((n.toLong, bn.toLong, spike))
        }
      }
      assert(out == ref, s"seed=$seed:\n spark=$out\n ref=$ref")
    }
  }

  test("event_transitions matches a brute-force reference on random worlds") {
    import spark.implicits._
    for (seed <- 11 to 15) {
      val evs = randomEvents(seed)
      val out = graft.operators.EventFlows.eventTransitionsFrom(evs.toDF())
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
      // pairs from the per-user (ts, event_id) order; probabilities
      // normalize within each from_type
      val pairs = evs.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e.ts.getTime, e.event_id)).sliding(2).collect {
          case Seq(a, b) => (a.event_type, b.event_type)
        }
      }
      val n = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val fromTotals = n.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val ref = n.map { case (k, c) => k -> ((c, c.toDouble / fromTotals(k._1))) }
      assert(out.keySet == ref.keySet, s"seed=$seed pair sets differ")
      ref.foreach { case (k, (c, p)) =>
        assert(out(k)._1 == c, s"seed=$seed count($k): ${out(k)._1} vs $c")
        assert(math.abs(out(k)._2 - p) < 1e-6, s"seed=$seed p($k): ${out(k)._2} vs $p")
      }
      assert(evs.map(_.user_id).distinct.map(u =>
        evs.count(_.user_id == u) - 1).sum == n.values.sum,
        "every consecutive pair is counted exactly once")
    }
  }

  /** Spark's round(x, 6) on doubles: BigDecimal.valueOf + HALF_UP. The
    * references reuse it so score comparisons are exact, not epsilon. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Line-world docs: a tiny line pool (trim-variants, blank and
    * whitespace-only lines, repeats within a doc, the occasional NULL
    * text) so cross-doc boilerplate, within-doc repeats, and
    * empty-line preservation all genuinely occur. */
  private def randomLineDocs(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val pool = Seq("alpha", " alpha ", "beta", "", "   ",
      "gamma delta", "epsilon zeta", "beta")
    (1L to (6 + rnd.nextInt(5)).toLong).map { i =>
      val text =
        if (rnd.nextInt(10) == 0) null
        else Seq.fill(rnd.nextInt(8))(pool(rnd.nextInt(pool.size))).mkString("\n")
      (i, text)
    }
  }

  test("dedup_lines matches a brute-force reference on random line worlds") {
    import spark.implicits._
    for (seed <- 91 to 95; maxDocs <- Seq(1, 2)) {
      val docs = randomLineDocs(seed)
      val out = graft.operators.TextOps
        .dedupLinesFrom(docs.toDF("doc_id", "text"), maxDocs)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      val valid = docs.filter(_._2 != null)
      // split with limit -1, like Spark's split(): trailing empty lines
      // are real lines
      val lined = valid.map { case (id, t) => id -> t.split("\n", -1).toSeq }
      val docsPerLine = lined
        .flatMap { case (id, ls) => ls.map(_.trim).filter(_.nonEmpty).distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val ref = lined.map { case (id, ls) =>
        val kept = ls.filter(l => l.trim.isEmpty || docsPerLine(l.trim) <= maxDocs)
        id -> ((ls.size.toLong, kept.size.toLong, kept.mkString("\n")))
      }.toMap
      assert(out == ref, s"seed=$seed maxDocs=$maxDocs:\n spark=$out\n ref=$ref")
    }
  }

  /** Word-world docs: a 7-word vocab with a planted stopword present in
    * almost every doc (df ≈ N — the tfidf hot-term case), mixed case
    * (lowering must happen before counting), empty and NULL texts. */
  private def randomWordDocs(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("the", "cat", "dog", "runs", "fast", "Blue", "moon")
    (1L to (8 + rnd.nextInt(5)).toLong).map { i =>
      val words = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))) ++
        (if (rnd.nextInt(4) > 0) Seq("the") else Nil)
      (i, if (rnd.nextInt(12) == 0) null else words.mkString(" "))
    }
  }

  test("tfidf_keywords matches a brute-force reference on random corpora") {
    import spark.implicits._
    for (seed <- 101 to 105; topK <- Seq(2, 5)) {
      val docs = randomWordDocs(seed)
      val out = graft.operators.Corpus
        .tfidfKeywordsFrom(docs.toDF("doc_id", "text"), topK)
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
        .toMap
      val valid = docs.filter(_._2 != null)
      val n = valid.size
      val tf = valid
        .flatMap { case (id, t) =>
          t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).map(id -> _) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val df = tf.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val ref = tf.keys.groupBy(_._1).flatMap { case (id, keys) =>
        keys.toSeq
          .map { case (_, term) =>
            val score = round6(tf((id, term)).toDouble *
              math.log(1.0 + n.toDouble / df(term).toDouble))
            (term, score)
          }
          .sortBy { case (term, score) => (-score, term) }
          .zipWithIndex.filter(_._2 < topK)
          .map { case ((term, score), i) =>
            (id, term) -> ((tf((id, term)), df(term), score, i + 1L))
          }
      }
      assert(out == ref, s"seed=$seed topK=$topK:\n spark=$out\n ref=$ref")
    }
  }

  test("bigram_pmi matches a brute-force reference on random corpora") {
    import spark.implicits._
    for (seed <- 111 to 115; minCount <- Seq(1, 2)) {
      val docs = randomWordDocs(seed)
      // topN above any possible pair count: the fuzz pins counting and
      // the PMI law; the top-N cut is a deterministic order pin elsewhere
      val out = graft.operators.Corpus
        .bigramPmiFrom(docs.toDF("doc_id", "text"), minCount, topN = 10000)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
        .toMap
      val pairs = docs.filter(_._2 != null)
        .flatMap { case (_, t) =>
          t.toLowerCase.trim.split("\\s+").toSeq.sliding(2).collect {
            case Seq(a, b) => (a, b)
          }
        }
      val n12 = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n1 = n12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val n2 = n12.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val t = n12.values.sum
      val ref = n12.collect { case (k @ (w1, w2), c) if c >= minCount =>
        k -> ((c, n1(w1), n2(w2), round6(math.log(
          (c.toDouble * t.toDouble) / (n1(w1).toDouble * n2(w2).toDouble)))))
      }
      assert(out == ref, s"seed=$seed minCount=$minCount:\n spark=$out\n ref=$ref")
    }
  }

  test("asof_prev_error matches a brute-force reference on collision-heavy worlds") {
    import spark.implicits._
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    // render through UTC explicitly, matching the pinned session timezone
    def render(ms: Long) = java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.format(fmt)
    for (seed <- 81 to 85) {
      val evs = randomEvents(seed)
      val out = graft.operators.Relational.asofPrevErrorFrom(evs.toDF())
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          Option(r.getString(4)))))
        .toMap
      // STRICTLY earlier errors only (an error is never its own context,
      // and an equal-ts error of the same user must not leak in); ties at
      // the winning instant resolve to max event_id
      val ref = evs.map { e =>
        val errs = evs.filter(x => x.event_type == "error" &&
          x.user_id == e.user_id && x.ts.getTime < e.ts.getTime)
        val prevTs = errs.map(_.ts.getTime).maxOption
        val prevId = prevTs.map(t =>
          errs.filter(_.ts.getTime == t).map(_.event_id).max)
        e.event_id -> ((render(e.ts.getTime), e.user_id, prevId, prevTs.map(render)))
      }.toMap
      assert(out == ref, s"seed=$seed:\n spark=$out\n ref=$ref")
    }
  }

  test("connected components: driver union-find and distributed loop agree " +
      "byte-for-byte on adversarial graphs") {
    import spark.implicits._
    // The oracle gate pins the driver path on ONE fixed corpus; this
    // varies the graph shape — chain diameters at the iteration budget,
    // cliques, duplicate/reversed edges, self-loops, forests — and
    // asserts the two solvers produce IDENTICAL (id, cluster) labels.
    // A divergence here is silent train/eval leakage downstream
    // (train_test_split groups by these labels).
    def labelsOf(edges: Seq[(Long, Long)], nodes: Seq[Long],
        cap: Long): Map[Long, Long] =
      graft.operators.Cluster.connectedComponents(
        edges.toDF("id_a", "id_b"), nodes.toDF("id"),
        maxIter = 60, driverEdgeCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def check(name: String, edges: Seq[(Long, Long)], nodes: Seq[Long]): Unit = {
      val uf = labelsOf(edges, nodes, cap = Long.MaxValue)
      val loop = labelsOf(edges, nodes, cap = -1L)
      assert(uf == loop, s"$name: solvers disagree\n uf=$uf\n loop=$loop")
      // and straddle the gate itself: a cap exactly at / just under the
      // edge count routes the same graph down different paths
      if (edges.nonEmpty) {
        val at = labelsOf(edges, nodes, cap = edges.size.toLong)
        val under = labelsOf(edges, nodes, cap = math.max(0L, edges.size.toLong - 1))
        assert(at == uf && under == uf, s"$name: cap-straddling paths disagree")
      }
      ()
    }
    check("chain40", (0L until 40L).map(i => (i, i + 1)), 0L to 41L)
    check("clique12",
      for { a <- 0L until 12L; b <- 0L until 12L if a < b } yield (a, b),
      0L until 12L)
    check("dups+reversed+selfloops",
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L), (4L, 3L), (2L, 3L),
        (5L, 5L), (6L, 6L)),
      0L to 7L)
    check("empty", Seq.empty, 0L to 4L)
    for (seed <- 31 to 35) {
      val rnd = new scala.util.Random(seed)
      val n = 20 + rnd.nextInt(40)
      val edges = Seq.fill(10 + rnd.nextInt(50))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      check(s"random$seed", edges, 0L until n.toLong)
    }
    // NULL endpoints: dropped identically by both paths (a NULL id can't
    // name a component member); the NULL-involving real ids fall back to
    // singletons unless another edge connects them
    val nullEdges = Seq((Some(1L), Some(2L)), (None, Some(3L)),
      (Some(4L), None), (Some(4L), Some(5L)))
      .toDF("id_a", "id_b")
    Seq(Long.MaxValue, -1L).foreach { cap =>
      val out = graft.operators.Cluster.connectedComponents(
        nullEdges, (0L to 5L).toDF("id"), maxIter = 60, driverEdgeCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L,
        4L -> 4L, 5L -> 4L), s"cap=$cap: $out")
    }
  }

  test("dedup_spans matches a brute-force reference on random small-vocab corpora") {
    import spark.implicits._
    // tiny vocab + short docs force heavy gram collisions, docs shorter
    // than n (whole-doc gram rule), and exact-duplicate pairs
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      val vocab = Seq("a", "b", "c", "d")
      def doc() = Seq.fill(2 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val texts = (1 to 30).map(_ => doc())
      // plant one exact duplicate pair
      val all = texts :+ texts.head
      val docs = all.zipWithIndex
        .map { case (t, i) => (i.toLong + 1, t, "s") }
        .toDF("doc_id", "text", "source")
      val n = 4
      def gramsOf(t: String): Seq[String] = {
        val toks = t.split("\\s+").toSeq
        if (toks.length < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      }
      val byDoc = all.zipWithIndex.map { case (t, i) => (i.toLong + 1, gramsOf(t)) }
      val docsPerGram = byDoc.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val expected = byDoc.map { case (id, gs) =>
        val dup = gs.count(g => docsPerGram(g) >= 2)
        id -> ((gs.size.toLong, dup.toLong))
      }.toMap
      val out = graft.operators.Corpus.dedupSpansFrom(docs, n = n).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams")))).toMap
      assert(out == expected, s"seed $seed diverged")
    }
  }

  test("user_percentiles' histogram decomposition matches the naive " +
    "global-window percent_rank on random collision-heavy worlds") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // the operator's whole claim is that the count-of-counts prefix sum
    // IS percent_rank without the single-reducer sort — fuzz it against
    // Spark's own percent_rank over the same per-user counts
    for (seed <- 41 to 46) {
      val evs = randomEvents(seed)
      val out = graft.operators.Relational.userPercentilesFrom(evs.toDF())
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      val naive = evs.toDF().groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n"))
        .withColumn("pr", percent_rank().over(Window.orderBy(col("n"))))
        .collect().map { r =>
          val bd = BigDecimal(r.getDouble(2))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          r.getLong(0) -> ((r.getLong(1), Some(bd)))
        }.toMap
      assert(out.view.mapValues(v => (v._1, v._3)).toMap == naive,
        s"seed $seed diverged:\n $out\n vs $naive")
    }
  }

  test("corr_pairs matches a brute-force zero-filled-grid reference on " +
    "random worlds") {
    import spark.implicits._
    for (seed <- 51 to 55) {
      val evs = randomEvents(seed)
      val out = graft.operators.Series.corrPairsFrom(evs.toDF())
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
        .toMap
      // brute force: materialize the full zero-filled grid per type
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val byDay = evs.groupBy(e => (e.event_type, fmt.format(e.ts)))
        .view.mapValues(_.size.toLong).toMap
      val days = evs.map(e => fmt.format(e.ts)).distinct.sorted
      val d0 = java.time.LocalDate.parse(days.head)
      val d1 = java.time.LocalDate.parse(days.last)
      val grid = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(_.toString).toSeq
      val types = evs.map(_.event_type).distinct.sorted
      def series(t: String): Seq[Long] = grid.map(d => byDay.getOrElse((t, d), 0L))
      val ref = (for {
        a <- types; b <- types if a < b
      } yield {
        val (xs, ys) = (series(a), series(b))
        val n = grid.size.toDouble
        val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
        val sxx = xs.map(x => x * x).sum.toDouble
        val syy = ys.map(y => y * y).sum.toDouble
        val (cov, vx, vy) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
        val r = if (vx > 0 && vy > 0)
          Some(BigDecimal(cov / math.sqrt(vx * vy))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
        (a, b) -> ((grid.size.toLong, r))
      }).toMap
      assert(out == ref, s"seed $seed diverged:\n $out\n vs $ref")
    }
  }

  test("metrics_rolling_median matches a brute-force trailing-window " +
    "reference on random worlds") {
    import spark.implicits._
    for (seed <- 61 to 64) {
      val evs = randomEvents(seed)
      val out = graft.operators.Series.metricsRollingMedianFrom(evs.toDF(), days = 3)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val byDay = evs.groupBy(e => (e.event_type, fmt.format(e.ts)))
        .view.mapValues(_.size.toLong).toMap
      val days = evs.map(e => fmt.format(e.ts)).distinct.sorted
      val d0 = java.time.LocalDate.parse(days.head)
      val d1 = java.time.LocalDate.parse(days.last)
      val grid = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(_.toString).toSeq
      def med(w: Seq[Long]): Double = {
        val s = w.sorted
        if (s.size % 2 == 1) s(s.size / 2).toDouble
        else (s(s.size / 2 - 1).toDouble + s(s.size / 2).toDouble) / 2.0
      }
      val ref = (for {
        t <- evs.map(_.event_type).distinct
        (d, i) <- grid.zipWithIndex
      } yield {
        val win = grid.slice(math.max(0, i - 2), i + 1)
          .map(dd => byDay.getOrElse((t, dd), 0L))
        (t, d) -> ((byDay.getOrElse((t, d), 0L), med(win)))
      }).toMap
      assert(out == ref, s"seed $seed diverged")
    }
  }
}
