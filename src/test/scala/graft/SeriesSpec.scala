package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Series

/** Robust MAD anomalies (breakdown resistance vs the mean-σ detector),
  * EWMA smoothing (hand-computed pinned folds, gap-day decay), and
  * exact-sum Pearson correlation (analytic ±1 / NULL fixed points). */
class SeriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import SparkTest.Sf

  private def eventsOf(rows: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"))
  }

  /** n events of one type on one day. */
  private def day(t: String, d: String, n: Int): Seq[(String, String, String, String)] =
    (0 until n).map(i =>
      (s"$t-$d-$i", f"$d ${i / 60}%02d:${i % 60}%02d:00", "u", t))

  test("anomaly_mad: hand-computed median/MAD; one planted 100x day " +
    "does not shift the baseline (the mean-sigma masking case)") {
    // err: days [2,4,4,4,400] -> med 4, devs [0,0,0,2,396] -> mad 0
    // ... use [1,4,4,6,400]: med 4, devs sorted [0,0,2,3,396] -> mad 2
    val ev = eventsOf(
      day("err", "2024-01-01", 1) ++ day("err", "2024-01-02", 4) ++
      day("err", "2024-01-03", 4) ++ day("err", "2024-01-04", 6) ++
      day("err", "2024-01-05", 400))
    val out = Series.anomalyMadFrom(ev, k = 3.0).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out.values.forall(v => v._2 == 4.0 && v._3 == 2.0),
      s"median 4, MAD 2 — the 400 outlier moves NEITHER: $out")
    // |1-4|=3 <= 6, |6-4|=2 <= 6, |400-4| > 6: only the spike flags
    assert(out.filter(_._2._4).keySet == Set("2024-01-05"), s"$out")
    // a trailing-mean detector centered near (1+4+4+6+400)/5 = 83 would
    // call every normal day anomalous instead — the breakdown contrast
  }

  test("anomaly_mad: MAD = 0 falls back to any-deviation; even-length " +
    "median averages the two middles; NULL level is a real group") {
    // const: [5,5,5,7] -> med (5+5)/2 = 5, devs [0,0,0,2] -> mad 0
    val ev = eventsOf(
      day("const", "2024-01-01", 5) ++ day("const", "2024-01-02", 5) ++
      day("const", "2024-01-03", 5) ++ day("const", "2024-01-04", 7) ++
      (0 until 3).map(i => (s"n-$i", "2024-01-01 00:00:00", "u", null)))
    val rows = Series.anomalyMadFrom(ev, k = 3.0).collect()
    val const = rows.filter(r => r.getString(0) == "const")
      .map(r => r.getString(1) -> ((r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))).toMap
    assert(const.values.forall(v => v._1 == 5.0 && v._2 == 0.0), s"$const")
    assert(const.filter(_._2._3).keySet == Set("2024-01-04"),
      s"mad=0: exactly the deviating day flags: $const")
    val nullLevel = rows.filter(_.isNullAt(0))
    assert(nullLevel.length == 1 && nullLevel.head.getLong(2) == 3L,
      "a NULL event_type is its own series, not dropped")
  }

  test("metrics_ewma: hand-computed fold s1=x1, s_i=.25x+.75s; a GAP " +
    "day decays the level as a zero") {
    // days 01,02,04 with counts 4,0,8 -> filled [4,0,0,8]:
    // s1=4, s2=3, s3=2.25, s4=.25*8+.75*2.25=3.6875
    val ev = eventsOf(
      day("e", "2024-01-01", 4) ++ day("e", "2024-01-04", 8))
    val out = Series.metricsEwmaFrom(ev, alpha = 0.25).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 4L, 4.0), ("2024-01-02", 0L, 3.0),
      ("2024-01-03", 0L, 2.25), ("2024-01-04", 8L, 3.6875)), s"${out.toSeq}")
    // single-day series: ewma = the value itself (the fold init)
    val one = Series.metricsEwmaFrom(eventsOf(day("e", "2024-01-01", 7)),
      alpha = 0.25).collect()
    assert(one.length == 1 && one.head.getDouble(2) == 7.0)
  }

  test("corr_pairs: analytic fixed points — identical series r=1, " +
    "mirrored series r=-1, constant series r=NULL; zero-filled days " +
    "count in n_days") {
    // a and b identical [1,2,3]; c mirrored [3,2,1]; k constant [2,2,2]
    def series(t: String, ns: Seq[Int]): Seq[(String, String, String, String)] =
      ns.zipWithIndex.flatMap { case (n, i) =>
        day(t, f"2024-01-${i + 1}%02d", n) }
    val ev = eventsOf(series("a", Seq(1, 2, 3)) ++ series("b", Seq(1, 2, 3)) ++
      series("c", Seq(3, 2, 1)) ++ series("k", Seq(2, 2, 2)))
    val out = Series.corrPairsFrom(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(out.size == 6, s"C(4,2) pairs: $out")
    assert(out.values.forall(_._1 == 3L), s"3-day shared axis: $out")
    assert(out(("a", "b")) == ((3L, Some(1.0))), s"$out")
    assert(out(("a", "c")) == ((3L, Some(-1.0))), s"$out")
    assert(out(("b", "c"))._2 == Some(-1.0), s"$out")
    assert(out(("a", "k"))._2.isEmpty && out(("c", "k"))._2.isEmpty,
      s"zero-variance series correlate with nothing: $out")
    // zero-fill: 'a' occurs on days 1 and 3 only — the gap day is a 0
    // in a's series, not a missing point: n_days spans the domain (3)
    // and a⊥b's sums see x = [1, 0, 3] against y = [1, 2, 3]
    val gap = Series.corrPairsFrom(eventsOf(
      day("a", "2024-01-01", 1) ++ day("a", "2024-01-03", 3) ++
      series("b", Seq(1, 2, 3))))
    val g = gap.collect().head
    assert(g.getLong(2) == 3L, s"domain spans the gap: $g")
    // by hand: n=3, sx=4, sy=6, sxy=1+0+9=10, sxx=10, syy=14
    // cov=3*10-24=6, vx=3*10-16=14, vy=3*14-36=6 -> r=6/sqrt(84)
    val expected = BigDecimal(6.0 / math.sqrt(14.0 * 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g.getDouble(3) == expected, s"hand-computed r: $g vs $expected")
  }

  test("metrics_locf: a gap day and an all-NULL-value day both inherit " +
    "the last observation; leading missing days stay NULL") {
    import spark.implicits._
    val ev = Seq(
      // level e: observed 10.5 on d1; absent d2; present-but-unsummable
      // d3 (NULL value); observed 2.0 on d4
      ("e1", "2024-01-01 00:00:00", "u", "e", Some(5.25)),
      ("e2", "2024-01-01 01:00:00", "u", "e", Some(5.25)),
      ("e3", "2024-01-03 00:00:00", "u", "e", None),
      ("e4", "2024-01-04 00:00:00", "u", "e", Some(2.0)),
      // level f first observed on d3: its d1/d2 grid rows lead-missing
      ("f1", "2024-01-03 00:00:00", "u", "f", Some(7.0)))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val out = graft.operators.Series.metricsLocfFrom(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(out.size == 8, s"2 levels x 4 grid days: $out")
    assert(out(("e", "2024-01-01")) == ((2L, Some(10.5), Some(10.5))))
    assert(out(("e", "2024-01-02")) == ((0L, None, Some(10.5))),
      s"gap day carries the last reading: $out")
    assert(out(("e", "2024-01-03")) == ((1L, None, Some(10.5))),
      s"an observed-but-unsummable day is missing too: $out")
    assert(out(("e", "2024-01-04")) == ((1L, Some(2.0), Some(2.0))))
    assert(out(("f", "2024-01-01")) == ((0L, None, None)) &&
      out(("f", "2024-01-02")) == ((0L, None, None)),
      s"nothing to carry before the first observation: $out")
    assert(out(("f", "2024-01-03")) == ((1L, Some(7.0), Some(7.0))))
    assert(out(("f", "2024-01-04")) == ((0L, None, Some(7.0))))
  }

  test("metrics_rolling_median: a planted 100x day bends the 7-day mean " +
    "but not the window medians around it; gap days are zeros in the " +
    "window; short leading windows are defined") {
    // e: 7 steady days of 4, day 8 = 400, then 3 more of 4 (day 10 gap)
    val ev = eventsOf(
      (1 to 7).flatMap(i => day("e", f"2024-01-$i%02d", 4)) ++
      day("e", "2024-01-08", 400) ++
      day("e", "2024-01-09", 4) ++ day("e", "2024-01-11", 4))
    val out = graft.operators.Series.metricsRollingMedianFrom(ev, days = 7)
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // day 1: window [4] -> 4; day 8: [4,4,4,4,4,4,400] -> 4 (the spike
    // IS in the window and the median doesn't move — the robustness
    // contrast: the 7-day mean jumps to ~60.6)
    assert(out("2024-01-01") == ((4L, 4.0)), s"$out")
    assert(out("2024-01-08") == ((400L, 4.0)),
      s"median ignores the spike it contains: $out")
    // day 10 is a GAP: zero-filled, window [4,4,4,400,4,0,4] -> 4
    assert(out("2024-01-10") == ((0L, 4.0)), s"$out")
    // day 2: [4,4] -> (4+4)/2 = 4.0 (even-length short window defined)
    assert(out("2024-01-02") == ((4L, 4.0)), s"$out")
    assert(out.size == 11, s"continuous day grid: $out")
  }

  test("event_trigrams: order-3 windows stay inside one user's journey; " +
    "shares sum to 1 over the trigram universe") {
    val ev = eventsOf(Seq(
      ("a1", "2024-01-01 00:00:00", "u1", "a"),
      ("a2", "2024-01-01 00:01:00", "u1", "b"),
      ("a3", "2024-01-01 00:02:00", "u1", "c"),
      ("a4", "2024-01-01 00:03:00", "u1", "d"),
      // u2 has only two events: no trigram may cross into u1
      ("b1", "2024-01-01 00:00:00", "u2", "x"),
      ("b2", "2024-01-01 00:01:00", "u2", "y")))
    val out = graft.operators.EventFlows.eventTrigramsFrom(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map(
      ("a", "b", "c") -> ((1L, 0.5)), ("b", "c", "d") -> ((1L, 0.5))),
      s"two trigrams, half share each: $out")
  }

  test("user_percentiles: histogram decomposition matches the rank " +
    "definition by hand; ties share a rank; N=1 is undefined") {
    val ev = eventsOf(
      (1 to 1).map(i => (s"p$i", "2024-01-01 00:00:00", "u_lo", "e")) ++
      (1 to 2).map(i => (s"q$i", "2024-01-01 00:00:00", "u_m1", "e")) ++
      (1 to 2).map(i => (s"r$i", "2024-01-01 00:00:00", "u_m2", "e")) ++
      (1 to 5).map(i => (s"s$i", "2024-01-01 00:00:00", "u_hi", "e")))
    val out = graft.operators.Relational.userPercentilesFrom(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out("u_lo") == ((1L, 0L, Some(0.0))), s"$out")
    assert(out("u_m1") == ((2L, 1L, Some(0.333333))) &&
      out("u_m2") == ((2L, 1L, Some(0.333333))),
      s"ties share below-count and rank: $out")
    assert(out("u_hi") == ((5L, 3L, Some(1.0))), s"$out")
    // single-user corpus: percentile of a population of one is undefined
    val one = graft.operators.Relational.userPercentilesFrom(
      eventsOf(Seq(("z1", "2024-01-01 00:00:00", "solo", "e")))).collect()
    assert(one.length == 1 && one.head.isNullAt(3), s"${one.toSeq}")
  }

  test("corr_pairs on real events: symmetric in magnitude, every r in " +
    "[-1, 1], pair grid is C(types, 2)") {
    val ev = graft.sources.Tables.events(spark, Sf)
    val out = Series.corrPairsFrom(ev).collect()
    val nTypes = ev.where(col("event_type").isNotNull && col("ts").isNotNull)
      .select("event_type").distinct().count().toInt
    assert(out.length == nTypes * (nTypes - 1) / 2, s"${out.length}")
    assert(out.forall(r => r.isNullAt(3) ||
      (r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)))
    assert(out.forall(r => r.getString(0) < r.getString(1)),
      "pairs are emitted once, lexicographically ordered")
  }
}
