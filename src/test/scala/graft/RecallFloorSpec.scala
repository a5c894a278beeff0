package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecFns
import graft.operators.{Embeddings, NearDup}
import graft.sources.Tables

/** Corpus-wide recall floors for every BLOCKED similarity path, measured
  * against the exact twin at sf0.01 (500 vectors / 500 documents — the
  * all-pairs ground truth is cheap here).
  *
  * Transfer caveat: the LSH/MinHash/SimHash floors DO transfer with
  * corpus growth (per-pair band-collision probability is a function of
  * the pair's similarity alone — corpus-free), but the IVF floor does
  * NOT: √N centroids grow with the corpus while a fixed nprobe probes a
  * shrinking fraction of them, so IVF recall at a fixed setting decays
  * as the corpus grows. The sf0.1 test below measures that decay
  * directly and pins the fraction-of-k nprobe policy
  * ([[graft.operators.Embeddings.autoNprobe]]) that holds recall
  * roughly constant in corpus size.
  *
  * Why this spec exists: the blocked paths (IVF probing, LSH banding,
  * MinHash banding, SimHash chunking) are rows-only in the oracle gate —
  * CORRECTNESS can't see a recall regression, and the planted-pair specs
  * only witness their own plants. This spec measures recall over the
  * WHOLE corpus every run, so a silent change to nprobe/bands/caps that
  * degrades retrieval fails CI instead of shipping.
  *
  * Floors are set ~5-10 points under the measured values (recorded in
  * SURVEY §6) — tight enough to catch a real regression (these knobs move
  * recall in >10-point steps), loose enough to absorb estimator noise.
  */
class RecallFloorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  private val Sf = "/root/testdata/sf0.01"
  private val SfBig = "/root/testdata/sf0.1"

  /** The operators' own corpus contract (Embeddings.corpus): valid
    * embeddings only, doubled. */
  private def corpusAt(dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .where(col("embedding").isNotNull && Embeddings.validEmb(col("embedding")))
      .select(col("vec_id"), VecFns.toDouble(col("embedding")).as("emb"),
        col("label"))

  private def corpusDf: DataFrame = corpusAt(Sf)

  /** Exact cosine top-k per query under the SAME candidate contract as
    * the approximate operators (queries = vec_id < 100, candidates =
    * whole corpus minus self, sim rounded to 6, ties on vec_id asc). */
  private def exactCosineTop(k: Int, dir: String = Sf): Map[Long, Seq[(Long, Double)]] = {
    val c = corpusAt(dir)
    val q = c.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val byQ = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(VecFns.cosine(col("emb"), col("qemb")), 6))
      .withColumn("rk", row_number().over(byQ))
      .where(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq }
  }

  private def retrievedSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }

  private def ivfRecallAt(dir: String, nprobe: Int,
      exact: Map[Long, Seq[(Long, Double)]]): Double = {
    val ivf = retrievedSets(Embeddings.annIvf(spark, dir, nprobe = nprobe))
    val recalls = exact.toSeq.map { case (qid, top) =>
      val got = ivf.getOrElse(qid, Set.empty)
      top.count(t => got(t._1)).toDouble / top.size
    }
    assert(recalls.size == 100, "every query must be measured")
    recalls.sum / recalls.size
  }

  test("ann_ivf recall@10 vs the exact scan holds its floor") {
    val exact = exactCosineTop(10)
    val r4 = ivfRecallAt(Sf, 4, exact)
    val r8 = ivfRecallAt(Sf, 8, exact)
    // nprobe=0 = the fraction-of-k auto policy (the registry default);
    // at sf0.01 k≈22 so auto resolves to the floor of 8 — identical
    // retrieval, asserted rather than assumed
    val rAuto = ivfRecallAt(Sf, 0, exact)
    // the oracle-verifiable seeded quantizer: same machinery, sampled
    // centroids — the documented trade is a few recall points vs the fit
    val rSeeded = {
      val got = retrievedSets(Embeddings.annIvfSeeded(spark, Sf))
      exact.toSeq.map { case (qid, top) =>
        top.count(t => got.getOrElse(qid, Set.empty)(t._1)).toDouble / top.size
      }.sum / exact.size
    }
    info(f"ann_ivf mean recall@10 at sf0.01: nprobe=4 -> $r4%.4f, " +
      f"nprobe=8 -> $r8%.4f, auto -> $rAuto%.4f, seeded quantizer -> $rSeeded%.4f")
    // measured r12: 0.548 / 0.789 — the curve that set the floor to 8
    assert(r8 >= r4, f"recall must be monotone in nprobe: $r8%.4f < $r4%.4f")
    assert(r4 >= 0.45, f"IVF recall@10 (nprobe=4) regressed: $r4%.4f")
    assert(r8 >= 0.70, f"IVF recall@10 (nprobe=8) regressed: $r8%.4f")
    assert(rAuto >= r8, f"the auto policy must not retrieve less than " +
      f"nprobe=8 at this scale: $rAuto%.4f < $r8%.4f")
    assert(rSeeded >= 0.55, f"seeded-quantizer recall collapsed: $rSeeded%.4f")
  }

  test("ann_pq recall@10 vs the exact scan holds its floor") {
    // PQ is LOSSY by construction (8-byte codes); the exact re-rank of
    // the top-50 ADC survivors is where recall comes back — this
    // measures the net of both. A miss here means a true neighbor's ADC
    // rank fell outside the re-rank window.
    val exact = exactCosineTop(10)
    val got = retrievedSets(Embeddings.annPq(spark, Sf))
    val recalls = exact.toSeq.map { case (qid, top) =>
      top.count(t => got.getOrElse(qid, Set.empty)(t._1)).toDouble / top.size
    }
    assert(recalls.size == 100, "every query must be measured")
    val r = recalls.sum / recalls.size
    info(f"ann_pq (ADC top-50 + exact re-rank) mean recall@10 = $r%.4f")
    // measured r13: 0.946
    assert(r >= 0.85, f"PQ recall@10 regressed: $r%.4f")
    // IVFPQ: the bucket pruning stacks ITS miss probability on top of
    // PQ's — recall sits between the seeded-IVF floor and plain PQ
    val gotIvfPq = retrievedSets(Embeddings.annIvfPq(spark, Sf))
    val rIvfPq = exact.toSeq.map { case (qid, top) =>
      top.count(t => gotIvfPq.getOrElse(qid, Set.empty)(t._1)).toDouble / top.size
    }.sum / exact.size
    info(f"ann_ivfpq mean recall@10 = $rIvfPq%.4f")
    assert(rIvfPq >= 0.50, f"IVFPQ recall@10 regressed: $rIvfPq%.4f")
    assert(r >= rIvfPq,
      f"bucket pruning cannot ADD recall over the full ADC scan: $r%.4f < $rIvfPq%.4f")
  }

  test("ann_ivf at sf0.1: fixed nprobe decays with corpus growth, the " +
      "fraction-of-k policy holds the floor") {
    // THE measurement the sf0.01 floor cannot give: at sf0.1 the fit
    // picks k≈71 centroids (√5000), so fixed nprobe=8 probes ~11% of the
    // index where it probed ~36% at sf0.01 — recall at a FIXED setting
    // must be expected to fall, and this quantifies by how much. The
    // auto policy (⌈k/4⌉ = 18 here) probes the same ~25% fraction at
    // every scale and must hold the sf0.01-class floor.
    val exact = exactCosineTop(10, SfBig)
    val rFixed = ivfRecallAt(SfBig, 8, exact)
    val rAuto = ivfRecallAt(SfBig, 0, exact)
    info(f"ann_ivf mean recall@10 at sf0.1: nprobe=8 (fixed) -> $rFixed%.4f, " +
      f"auto (fraction-of-k) -> $rAuto%.4f")
    assert(rAuto >= rFixed,
      f"fraction-of-k must dominate the fixed setting it generalizes: " +
        f"$rAuto%.4f < $rFixed%.4f")
    // the auto policy's floor at 10x the corpus — the recall-stability
    // claim itself. Fixed-8 gets a lower floor: it is the documented
    // latency-stable mode, not the quality default, but a collapse would
    // still mean the bucket geometry broke.
    assert(rAuto >= 0.70, f"auto-nprobe recall@10 regressed at sf0.1: $rAuto%.4f")
    assert(rFixed >= 0.40, f"fixed-nprobe recall@10 collapsed at sf0.1: $rFixed%.4f")
  }

  test("ann_lsh recall on close neighbors holds; multiprobe dominates exact banding") {
    // LSH's contract is near-dup retrieval: it owes recall only on
    // genuinely-close neighbors (the banding floor ~cos 0.9). The natural
    // sf0.01 corpus has NO pair that close (measured: max off-diagonal
    // cosine among the queries < 0.9), so the measurable ground truth is
    // planted: every query gets one seeded near-neighbor at a controlled
    // cosine (alternating 0.93 / 0.96), which makes recall a 100-pair
    // corpus-wide measurement with randomized directions — strictly
    // stronger than a single-plant spec, and deterministic (seeded by qid).
    val queries = corpusDf.where(col("vec_id") < 100)
      .select(col("vec_id"), col("emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val planted = queries.map { case (qid, v) =>
      val vn = normalize(v)
      val c = if (qid % 2 == 0) 0.93 else 0.96
      val rng = new scala.util.Random(qid)
      val g = Array.fill(vn.length)(rng.nextGaussian())
      val dotGV = g.zip(vn).map { case (a, b) => a * b }.sum
      val perp = normalize(g.zip(vn).map { case (gi, vi) => gi - dotGV * vi })
      val twin = vn.zip(perp).map { case (vi, pi) =>
        c * vi + math.sqrt(1 - c * c) * pi }
      (10000L + qid, twin, -1L)
    }
    import spark.implicits._
    val ext = corpusDf.select(col("vec_id"), col("emb"), col("label"))
      .unionByName(planted.toSeq.toDF("vec_id", "emb", "label"))
    // relevant set per query: every ext-corpus vector at cos >= 0.9 —
    // the plant by construction, plus any natural pair that qualifies
    val q = ext.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val relevant = ext.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", VecFns.cosine(col("emb"), col("qemb")))
      .where(col("sim") >= 0.90)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(relevant.size == 100, s"every query must have ground truth: ${relevant.size}")
    def recallOf(df: DataFrame): Double = {
      val got = retrievedSets(df)
      val hits = relevant.map { case (qid, rel) =>
        rel.count(got.getOrElse(qid, Set.empty)).toDouble / rel.size }
      hits.sum / hits.size
    }
    val exactBanding = recallOf(Embeddings.annLshFrom(ext))
    val multiprobe = recallOf(Embeddings.annLshFrom(ext, hammingProbes = 8))
    info(f"ann_lsh recall(cos>=0.9) = $exactBanding%.4f, multiprobe = $multiprobe%.4f")
    // theory: per-band match p^8 at p = 1 - theta/pi -> 0.83/0.92 over 4
    // bands at cos 0.93/0.96; Hamming-1 probing lifts both past 0.97
    assert(exactBanding >= 0.60, f"LSH banding recall regressed: $exactBanding%.4f")
    assert(multiprobe >= exactBanding,
      f"multiprobe must dominate exact banding: $multiprobe%.4f < $exactBanding%.4f")
    assert(multiprobe >= 0.90, f"multiprobe recall regressed: $multiprobe%.4f")
  }

  /** Doc-level ground truth for the text near-dup paths: for each doc,
    * its best exact word-3-shingle Jaccard partner over ALL pairs. */
  private def exactJaccardBest: Map[Long, Double] = {
    val sh = NearDup.wordShingles(col("text"), 3)
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id").as("id"), array_distinct(sh).as("sh"))
    val best = docs.as("l").crossJoin(docs.as("r"))
      .where(col("l.id") =!= col("r.id"))
      .select(col("l.id").as("id"),
        NearDup.exactJaccard(col("l.sh"), col("r.sh")).as("j"))
      .groupBy("id").agg(max(col("j")).as("best_j"))
    best.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("dedup_minhash flags every doc with a true Jaccard>=0.9 partner") {
    val truth = exactJaccardBest
    val strong = truth.filter(_._2 >= 0.90).keySet
    info(s"docs with exact-J>=0.9 partner: ${strong.size}; " +
      s"J>=0.8: ${truth.count(_._2 >= 0.80)}")
    assert(strong.size >= 10,
      s"ground truth too thin to measure pair recall: ${strong.size} docs")
    val flagged = NearDup.dedupMinhash(spark, Sf)
      .where(col("is_dup")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val recall = strong.count(flagged).toDouble / strong.size
    info(f"dedup_minhash recall on exact-J>=0.9 docs = $recall%.4f")
    // banding at J 0.9 matches with ~1-1e-12; residual misses are
    // estimator noise (128 perms, SE 0.027: est<0.8 at true 0.9 is a
    // 3.8-sigma event per doc)
    assert(recall >= 0.90, f"minhash pair recall regressed: $recall%.4f")
  }

  test("dedup_simhash banding is lossless at thr 0.95 (pigeonhole) modulo hot buckets") {
    // ground truth: ALL pairs by the same 64-bit signature, sim >= 0.95
    // (<= 3 differing bits). 4 x 16-bit chunks with <= 3 bit diffs must
    // share a chunk (pigeonhole), so banding itself loses nothing; the
    // only legitimate loss surface is the hot-bucket cap.
    val base = Tables.documents(spark, Sf)
      .select(col("doc_id").as("id"),
        NearDup.simhashSig(graft.functions.TextFns.wsTokens(
          graft.functions.TextFns.foldCase(col("text")))).as("sig"))
    val truthDf = base.as("l").crossJoin(base.as("r"))
      .where(col("l.id") < col("r.id"))
      .withColumn("sim", lit(1.0) -
        NearDup.hamming(col("l.sig"), col("r.sig")).cast("double") / 64.0)
      .where(col("sim") >= 0.95)
    val truthDocs = truthDf.select(explode(array(col("l.id"), col("r.id"))).as("id"))
      .distinct().collect().map(_.getLong(0)).toSet
    info(s"docs in a sig-sim>=0.95 pair: ${truthDocs.size}")
    assert(truthDocs.size >= 10,
      s"ground truth too thin: ${truthDocs.size} docs")
    val flagged = NearDup.dedupSimhash(spark, Sf)
      .where(col("is_dup")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val recall = truthDocs.count(flagged).toDouble / truthDocs.size
    info(f"dedup_simhash recall on sig-sim>=0.95 docs = $recall%.4f")
    assert(recall >= 0.95, f"simhash banding recall regressed: $recall%.4f")
  }
}
