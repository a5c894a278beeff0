package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecFns
import graft.operators.{Embeddings, NearDup}

class VectorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import SparkTest.Sf

  test("vector math: dot/cosine/l2 on known vectors") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0, 2.0), Seq(3.0, 4.0, 0.0))).toDF("a", "b")
    val row = df.select(
      VecFns.dot(col("a"), col("b")).as("dot"),
      VecFns.l2sq(col("a"), col("b")).as("l2"),
      VecFns.norm(col("a")).as("na")).head()
    assert(row.getDouble(0) == 3.0)
    assert(row.getDouble(1) == (4.0 + 16.0 + 4.0))
    assert(math.abs(row.getDouble(2) - math.sqrt(5.0)) < 1e-12)
  }

  test("l2Normalize: unit norm, zero vector stays zero, codegen-safe") {
    import spark.implicits._
    val df = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0), Seq(-1.0, 0.0))
      .toDF("v").select(VecFns.l2Normalize(col("v")).as("u"))
    val rows = df.collect().map(_.getSeq[Double](0))
    assert(rows(0) == Seq(0.6, 0.8))
    assert(rows(1) == Seq(0.0, 0.0))
    assert(rows(2) == Seq(-1.0, 0.0))
    // the kernel must stay inside whole-stage codegen (no interpreted HOF)
    // — over a real scan: literal inputs constant-fold to a LocalTableScan
    val scanned = spark.range(3).select(
      VecFns.l2Normalize(array(col("id").cast("double"), lit(4.0))).as("u"))
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"l2Normalize must be codegen'd:\n$plan")
    assert(scanned.collect().last.getSeq[Double](0) == Seq(2.0 / math.sqrt(20.0), 4.0 / math.sqrt(20.0)))
    // and be callable from SQL after registration
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT vec_l2_normalize(array(3.0d, 4.0d)) AS u")
      .head().getSeq[Double](0)
    assert(viaSql == Seq(0.6, 0.8))
  }

  test("embedCol is deterministic and L2-normalized") {
    import spark.implicits._
    val df = Seq("hello world foo", "hello world foo", "different text entirely")
      .toDF("text").select(Embeddings.embedCol(col("text")).as("e"))
    val rows = df.select(VecFns.norm(col("e")).as("n"), col("e")).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-9)
    assert(rows(0).getSeq[Double](1) == rows(1).getSeq[Double](1))
    assert(rows(0).getSeq[Double](1) != rows(2).getSeq[Double](1))
  }

  test("embedCounts pins the oracle's md5_number slot/sign contract") {
    import spark.implicits._
    // fixtures computed independently (python hashlib + duckdb 1.0.0):
    // slot = LE-uint64(md5 bytes 8..15) % 64 = md5_number_lower(tok) % 64
    // sign = +1 iff (md5 byte 0 & 1) == 0    = md5_number_upper(tok) & 1
    val expected = Seq(
      ("hello", 57, -1L), ("error", 45, -1L), ("the", 59, -1L),
      ("über", 36, 1L), ("x", 53, -1L))
    val got = expected.map(_._1).toDF("text")
      .select(col("text"), Embeddings.embedCounts(col("text")).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    expected.foreach { case (tok, slot, sgn) =>
      val c = got(tok)
      assert(c(slot) == sgn, s"'$tok' slot $slot: got ${c(slot)}, want $sgn")
      assert(c.map(math.abs).sum == 1L, s"'$tok' must contribute exactly one slot")
    }
  }

  test("vector_knn returns 5 ranked neighbors per query, self first") {
    val knn = Embeddings.vectorKnn(spark, Sf)
    val counts = knn.groupBy("qid").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSet == Set(5L))
    // a query's nearest neighbor under L2 is itself (distance 0)
    val self = knn.where(col("rk") === 1).collect()
    assert(self.forall(r => r.getAs[Long]("qid") == r.getAs[Long]("vec_id")))
    assert(self.forall(r => r.getAs[Double]("distance") == 0.0))
  }

  test("ann_cosine_topk ranks are ordered by similarity") {
    val ann = Embeddings.annCosineTopK(spark, Sf)
    val bad = ann.as("a").join(ann.as("b"),
      col("a.qid") === col("b.qid") && (col("a.rk") + 1) === col("b.rk") &&
        col("a.sim") < col("b.sim"))
    assert(bad.count() == 0)
  }

  test("ann_ivf returns results for every query") {
    val ivf = Embeddings.annIvf(spark, Sf)
    assert(ivf.select("qid").distinct().count() > 0)
    assert(ivf.where(col("rk") > 10).count() == 0)
  }

  test("IVF family no-ops on an empty corpus instead of failing the fit") {
    import spark.implicits._
    // an empty increment / fully-filtered partition reaches the k-means
    // fit with zero rows — must yield the empty IVF, not a summarizer
    // throw from inside the ML fit
    val empty = Seq.empty[(Long, Seq[Double], Long)].toDF("vec_id", "emb", "label")
    val (assigned, cents) = Embeddings.ivfAssignFrom(empty)
    assert(assigned.count() == 0 && cents.count() == 0)
    assert(assigned.columns.toSeq == Seq("vec_id", "emb", "label", "bucket"))
    val dd = Embeddings.dedupEmbeddingFrom(empty)
    assert(dd.count() == 0)
    assert(dd.columns.contains("is_dup"))
  }

  test("ann_ivf recall vs exact brute force is above the nprobe floor") {
    // exact top-10 cosine per query, computed independently on the driver
    // (500-vector fixture), vs the IVF operator's output
    val corpus = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    val exact = (0L until 100L).map { qid =>
      val q = corpus(qid)
      qid -> corpus.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    }.toMap
    val ivf = Embeddings.annIvf(spark, Sf).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val recalls = exact.map { case (qid, truth) =>
      (ivf.getOrElse(qid, Set.empty) & truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // nprobe=8 (the default) of ~22 sqrt(N) buckets; genuinely near
    // vectors cluster into the probed buckets, so recall must sit well
    // above the random-read floor (the full nprobe curve is pinned in
    // RecallFloorSpec at sf0.01)
    assert(mean > 0.65, f"mean recall@10 $mean%.3f must exceed 0.65")
  }

  test("ann_lsh retrieves planted near-duplicates as top hit") {
    import spark.implicits._
    // corpus: 400 hash-deterministic pseudo-random vectors; queries 0..19
    // are small perturbations of corpus vectors 1000..1019 (cosine ~0.99)
    def vec(seed: Int): Array[Double] = Array.tabulate(64) { d =>
      scala.util.hashing.MurmurHash3.productHash((seed, d)).toDouble / Int.MaxValue
    }
    val base = (1000 until 1400).map(i => (i.toLong, vec(i).toSeq, "c"))
    val queries = (0 until 20).map { q =>
      val twin = vec(1000 + q)
      val perturbed = twin.zipWithIndex.map { case (v, d) => v + 0.02 * vec(q + 5000)(d) }
      (q.toLong, perturbed.toSeq, "q")
    }
    val corpus = (base ++ queries).toDF("vec_id", "emb", "label")
    val hits = Embeddings.annLshFrom(corpus).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap
    (0L until 20L).foreach { q =>
      assert(hits.get(q).contains(1000 + q),
        s"query $q must retrieve its planted twin ${1000 + q}, got ${hits.get(q)}")
    }
    // an isolated query (no close vector) only sees rare random band
    // collisions: few candidates, none reported as similar — the near-dup
    // contract is honest absence, not fabricated far neighbors
    val lonely = ((0 until 400).map(i => (1000L + i, vec(i + 9000).toSeq, "c"))
      :+ ((5L, vec(77).toSeq, "q"))).toDF("vec_id", "emb", "label")
    val lonelyHits = Embeddings.annLshFrom(lonely)
      .where(col("qid") === 5L).collect()
    assert(lonelyHits.length < 40,
      s"random collisions must stay rare: ${lonelyHits.length} of 400")
    lonelyHits.foreach { r =>
      assert(r.getAs[Double]("sim") < 0.6,
        s"collision candidates must carry their true low similarity: $r")
    }
  }

  test("hamming-1 multi-probe recovers twins exact banding misses") {
    import spark.implicits._
    def vec(seed: Int): Array[Double] = Array.tabulate(64) { d =>
      scala.util.hashing.MurmurHash3.productHash((seed, d)).toDouble / Int.MaxValue
    }
    // stronger perturbation (cosine ≈ 0.9): per-band match prob p⁸ drops
    // to ~0.3, so exact 4-band LSH misses a fair share of the planted
    // twins — the regime multi-probe exists for
    val base = (1000 until 1400).map(i => (i.toLong, vec(i).toSeq, "c"))
    val queries = (0 until 20).map { q =>
      val twin = vec(1000 + q)
      val perturbed = twin.zipWithIndex.map { case (v, d) => v + 0.5 * vec(q + 5000)(d) }
      (q.toLong, perturbed.toSeq, "q")
    }
    val corpus = (base ++ queries).toDF("vec_id", "emb", "label")
    def twinHits(probes: Int): Set[Long] =
      Embeddings.annLshFrom(corpus, hammingProbes = probes).collect()
        .filter(r => r.getAs[Long]("vec_id") == 1000 + r.getAs[Long]("qid"))
        .map(_.getAs[Long]("qid")).toSet
    val exactHits = twinHits(0)
    val multiHits = twinHits(8)
    assert(exactHits.subsetOf(multiHits),
      s"probing only ADDS candidates: $exactHits vs $multiHits")
    assert(multiHits.size > exactHits.size,
      s"multi-probe must recover twins exact banding missed " +
        s"(exact ${exactHits.size}/20, multi ${multiHits.size}/20)")
    assert(multiHits.size >= 15,
      s"hamming-1 probing should catch most cosine≈0.9 twins: ${multiHits.size}/20")
  }

  test("knn_label_vote predicts one label per query") {
    val v = Embeddings.knnLabelVote(spark, Sf)
    assert(v.groupBy("qid").count().where(col("count") =!= 1).count() == 0)
  }

  test("minhash LSH finds planted near-duplicates") {
    import spark.implicits._
    val doc = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 57).map(i => s"w$i").mkString(" ") + " x1 x2 x3"
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val docs = Seq((0L, doc), (1L, nearDup), (2L, other)).toDF("id", "text")
      .select(col("id"), NearDup.wordShingles(col("text"), 3).as("sig"))
      .withColumn("keys", NearDup.bandKeys(NearDup.minhashSig(col("sig"), 128), 32, 4))
    // reuse the internal summary path via the public query on a temp view is
    // awkward; verify the primitive instead: docs 0 and 1 share a band key
    val k0 = docs.where(col("id") === 0).select(explode(col("keys"))).as[Long].collect().toSet
    val k1 = docs.where(col("id") === 1).select(explode(col("keys"))).as[Long].collect().toSet
    val k2 = docs.where(col("id") === 2).select(explode(col("keys"))).as[Long].collect().toSet
    assert((k0 & k1).nonEmpty, "near-dups must share an LSH band")
    assert((k0 & k2).isEmpty, "unrelated docs must not collide")
  }

  test("simhash hamming distance: identical texts collide, different do not") {
    import spark.implicits._
    val df = Seq((0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta"),
      (2L, "zz yy xx ww vv uu")).toDF("id", "text")
      .select(col("id"), NearDup.simhashSig(
        graft.functions.TextFns.wsTokens(lower(col("text")))).as("sig"))
    val sigs = df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("sig")).toMap
    assert(sigs(0L) == sigs(1L))
    val hd = java.lang.Long.bitCount(sigs(0L) ^ sigs(2L))
    assert(hd > 5, s"unrelated docs should differ in many bits, got $hd")
  }

  test("near-dup summary queries emit one row per document") {
    val nDocs = graft.sources.Tables.documents(spark, Sf).count()
    assert(NearDup.dedupMinhash(spark, Sf).count() == nDocs)
    assert(NearDup.dedupSimhash(spark, Sf).count() == nDocs)
    assert(NearDup.ngramJaccard(spark, Sf).count() == nDocs)
  }

  test("embedding outliers rank a planted far point first") {
    import spark.implicits._
    // two tight clusters around e1/e2 plus one far rogue point: the rogue
    // must rank first with a ratio well above the in-cluster points
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Double]) = base.map(_ + rnd.nextGaussian() * 0.01)
    val e1 = Array.fill(8)(1.0); val e2 = Array.fill(8)(-1.0)
    // rogue at 3.0/dim: far enough to dominate the ratio, near enough
    // that the k=2 fit attaches it to the e1 cluster rather than
    // isolating it in a singleton bucket (the documented blind spot —
    // splitting e1∪e2 would cost far more WSSQ than absorbing the rogue)
    val rogue = Array.fill(8)(3.0)
    val rows =
      (1L to 20L).map(i => (i, jitter(e1).toSeq, 0L)) ++
      (21L to 40L).map(i => (i, jitter(e2).toSeq, 1L)) :+ ((99L, rogue.toSeq, 0L))
    val c = rows.toDF("vec_id", "emb", "label")
    val out = Embeddings.embeddingOutliersFrom(c, k = 2, topN = 5).collect()
    assert(out.head.getLong(0) == 99L,
      s"the planted rogue must rank first: ${out.toSeq}")
    assert(out.head.getDouble(3) > 2.0 * out(1).getDouble(3),
      s"rogue ratio must dominate the runner-up: ${out.toSeq}")
    // ratios are non-negative and the output is rank-ordered
    assert(out.forall(_.getDouble(3) >= 0.0))
    assert(out.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)))
    // the absorbed rogue is NOT a singleton — the flag stays false here
    assert(out.forall(!_.getBoolean(4)), s"no singleton buckets: ${out.toSeq}")
  }

  test("embedding outliers flag a vector isolated into a singleton bucket") {
    import spark.implicits._
    // rogue at 100/dim: isolating it costs ~0 WSSQ while attaching it to
    // either cluster costs ~10^5 — the k=2 fit MUST give it its own
    // bucket, the within-bucket ratio is vacuously 0 there, and only the
    // `singleton` flag can surface it (the pre-r11 blind spot)
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Double]) = base.map(_ + rnd.nextGaussian() * 0.01)
    val e1 = Array.fill(8)(1.0); val e2 = Array.fill(8)(-1.0)
    val rogue = Array.fill(8)(100.0)
    val rows =
      (1L to 20L).map(i => (i, jitter(e1).toSeq, 0L)) ++
      (21L to 40L).map(i => (i, jitter(e2).toSeq, 1L)) :+ ((99L, rogue.toSeq, 0L))
    val out = Embeddings.embeddingOutliersFrom(
      rows.toDF("vec_id", "emb", "label"), k = 2, topN = 41).collect()
    val flagged = out.filter(_.getBoolean(4))
    assert(flagged.map(_.getLong(0)).toSeq == Seq(99L),
      s"exactly the isolated rogue is flagged: ${flagged.toSeq}")
    assert(out.head.getLong(0) == 99L,
      "singletons sort first — routing surfaces them even at small topN")
    assert(flagged.head.getDouble(3) == 0.0,
      s"a singleton's within-bucket ratio is vacuously 0: ${flagged.toSeq}")
  }

  test("seeded outliers surface a planted rogue and keep the ranking laws") {
    import spark.implicits._
    // same planted geometry as the k-means test, over the seeded
    // quantizer: seeds are corpus SAMPLES, so the rogue either becomes a
    // seed itself (then nothing assigns near it -> singleton, sorts
    // first) or assigns to a sampled in-cluster seed at ~10x the
    // in-cluster distances (ratio-dominant). Either way it must surface
    // at the very top.
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Double]) = base.map(_ + rnd.nextGaussian() * 0.01)
    val e1 = Array.fill(8)(1.0); val e2 = Array.fill(8)(-1.0)
    val rogue = Array.fill(8)(3.0)
    val rows =
      (1L to 20L).map(i => (i, jitter(e1).toSeq, 0L)) ++
      (21L to 40L).map(i => (i, jitter(e2).toSeq, 1L)) :+ ((99L, rogue.toSeq, 0L))
    val out = Embeddings.embeddingOutliersSeededFrom(
      rows.toDF("vec_id", "emb", "label"), k = 4, topN = 41).collect()
    assert(out.length == 41, "every vector scored")
    val top = out.take(3).map(_.getLong(0))
    assert(top.contains(99L), s"planted rogue must surface at the top: ${out.take(5).toSeq}")
    // ranking laws: non-negative ratios, singletons first, then ratio desc
    assert(out.forall(_.getDouble(3) >= 0.0))
    val (singles, rest) = out.partition(_.getBoolean(4))
    assert(out.take(singles.length).forall(_.getBoolean(4)),
      "singleton rows sort before ratio-ranked rows")
    assert(rest.map(_.getDouble(3)).sliding(2).forall(
      p => p.length < 2 || p(0) >= p(1)), "ratio-ordered tail")
    // determinism: a second run is row-identical
    val again = Embeddings.embeddingOutliersSeededFrom(
      rows.toDF("vec_id", "emb", "label"), k = 4, topN = 41).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("IVF fit clamps k to the corpus size on tiny inputs") {
    import spark.implicits._
    // 3 vectors < the 16-center floor: the ML fit crashes outright when
    // asked for more centers than points (3-row-probe catch) — the clamp
    // must fit 3 centers and every downstream IVF consumer must run
    val rows = Seq(
      (1L, Seq.fill(8)(1.0), 0L), (2L, Seq.fill(8)(-1.0), 1L),
      (3L, Seq.fill(8)(3.0), 0L))
    val c = rows.toDF("vec_id", "emb", "label")
    val (assigned, cents) = Embeddings.ivfAssignFrom(c)
    assert(cents.count() <= 3, "no more centers than points")
    assert(assigned.count() == 3)
    val out = Embeddings.embeddingOutliersFrom(c, topN = 10).collect()
    assert(out.length == 3, s"every vector scored: ${out.toSeq}")
  }

  test("semantic decontamination flags a train vector near an eval vector") {
    import spark.implicits._
    // eval ids are % 10 == 0: vec 10 is eval; train vec 11 is its near-
    // paraphrase (tiny jitter), the rest of the cluster sits further off;
    // a second far cluster guarantees the k=2 fit separates, not isolates
    val rnd = new scala.util.Random(11)
    def jitter(base: Array[Double], s: Double) =
      base.map(_ + rnd.nextGaussian() * s)
    val e1 = Array.fill(8)(1.0); val e2 = Array.fill(8)(-1.0)
    val rows =
      Seq((10L, jitter(e1, 0.001).toSeq, 0L), (11L, jitter(e1, 0.001).toSeq, 0L)) ++
      (1L to 9L).map(i => (i, jitter(e1, 0.4).toSeq, 0L)) ++
      (21L to 29L).map(i => (i, jitter(e2, 0.4).toSeq, 1L))
    val c = rows.toDF("vec_id", "emb", "label")
    val out = Embeddings.decontaminateSemanticFrom(c, thr = 0.999, k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(10L) && !out.contains(20L),
      s"eval vectors never appear in the train verdicts: ${out.keySet}")
    assert(out(11L).getBoolean(4) && out(11L).getLong(2) == 10L,
      s"the planted paraphrase must be flagged against eval 10: ${out(11L)}")
    val clean = out.removed(11L).values.filter(_.getBoolean(4))
    assert(clean.isEmpty, s"jittered cluster mates stay clean: $clean")
    assert(out.size == rows.size - 1, "one verdict per train vector")
    // the REGISTRY path blocks on the seeded quantizer (r13) — the same
    // planted leak must be caught there: a near-identical train/eval
    // pair shares its argmin bucket whenever at most one of them is a
    // seed (k=2 here; the default k=max(16,√n) on a 20-vector toy world
    // would make BOTH plants seeds — each its own bucket, the documented
    // k≈n degeneracy that vanishes at k=√N ≪ N)
    val seeded = Embeddings.decontaminateSemanticSeededFrom(c, thr = 0.999, k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(seeded(11L).getBoolean(4) && seeded(11L).getLong(2) == 10L,
      s"seeded blocking must flag the paraphrase: ${seeded(11L)}")
    assert(seeded.removed(11L).values.forall(!_.getBoolean(4)),
      "seeded blocking: cluster mates stay clean")
    assert(seeded.size == rows.size - 1)
  }

  test("semantic dedup clusters group transitive near-dups, keep-one canonical") {
    import spark.implicits._
    // a transitive chain a~b~c where cos(a,c) may dip below thr must
    // still land in ONE cluster (that's what the component pass adds
    // over dedup_embedding's best-neighbor rows); unrelated vectors
    // stay singletons and are their own canonicals
    val rnd = new scala.util.Random(5)
    def jitter(base: Array[Double], s: Double) =
      base.map(_ + rnd.nextGaussian() * s)
    val e1 = Array.fill(8)(1.0); val e2 = Array.fill(8)(-1.0)
    val rows =
      Seq((10L, jitter(e1, 0.01).toSeq, 0L), (11L, jitter(e1, 0.01).toSeq, 0L),
        (12L, jitter(e1, 0.01).toSeq, 0L)) ++
      (20L to 25L).map(i => (i, jitter(e2, 0.5).toSeq, 1L))
    val out = Embeddings.dedupSemanticClustersFrom(
        rows.toDF("vec_id", "emb", "label"), thr = 0.99, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.length == rows.size, "one row per vector")
    // the planted trio is one cluster, canonical = min id
    assert(Seq(10L, 11L, 12L).map(byId(_)._2).toSet == Set(10L),
      s"chain must collapse to one cluster: $out")
    assert(byId(10L)._4 && !byId(11L)._4 && !byId(12L)._4)
    assert(byId(10L)._3 == 3L, s"cluster size: ${byId(10L)}")
    // the diffuse vectors at 0.5 jitter stay singletons
    (20L to 25L).foreach { i =>
      assert(byId(i)._2 == i && byId(i)._4 && byId(i)._3 == 1L,
        s"vector $i must stay a singleton canonical: ${byId(i)}")
    }
  }

  test("exact decontamination catches the cross-bucket paraphrase IVF misses") {
    import spark.implicits._
    // train 11 and its eval paraphrase 10 straddle the k=2 boundary: 11
    // leans cluster A (0.6a+0.4b), 10 leans cluster B (0.4a+0.6b), so
    // cos(10,11) ≈ 0.923 but the fit buckets them apart — and cluster A
    // holds NO eval vector, so IVF blocking can never pair them (the
    // documented blind spot). The exact scan has no blocking and must
    // flag the pair. All other cosines sit ≤ ~0.83, clear of thr=0.9.
    val rnd = new scala.util.Random(7)
    val a = Array.tabulate(8)(i => if (i < 4) 1.0 else 0.0)
    val b = Array.tabulate(8)(i => if (i < 4) 0.0 else 1.0)
    def mix(wa: Double, wb: Double) = Array.tabulate(8)(i => wa * a(i) + wb * b(i))
    def jitter(base: Array[Double], s: Double) = base.map(_ + rnd.nextGaussian() * s)
    val rows =
      Seq((10L, mix(0.4, 0.6).toSeq, 0L), (11L, mix(0.6, 0.4).toSeq, 0L)) ++
      (1L to 9L).map(i => (i, jitter(a, 0.15).toSeq, 0L)) ++
      (21L to 29L).map(i => (i, jitter(b, 0.15).toSeq, 1L))
    val c = rows.toDF("vec_id", "emb", "label")
    val blocked = Embeddings.decontaminateSemanticFrom(c, thr = 0.9, k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!blocked(11L).getBoolean(4),
      s"the cross-bucket paraphrase must slip past IVF blocking: ${blocked(11L)}")
    val exact = Embeddings.decontaminateSemanticExactFrom(c, thr = 0.9)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(exact.keySet == blocked.keySet,
      "one verdict per train vector on both paths")
    assert(exact(11L).getBoolean(3) && exact(11L).getLong(1) == 10L,
      s"the exact scan must catch it against eval 10: ${exact(11L)}")
    val extra = exact.removed(11L).values.filter(_.getBoolean(3))
    assert(extra.isEmpty, s"cluster mates stay clean: $extra")
  }

  test("hybrid RRF fuses the two legs exactly; laws hold") {
    val (topL, topK, rrfK, qvecId) = (50, 10, 60, 7L)
    val out = Embeddings.searchHybridRrf(spark, Sf,
      topL = topL, topK = topK, rrfK = rrfK, qvecId = qvecId)
      .collect().map(r => (r.getAs[Long]("doc_id"), r)).toMap

    // lexical leg from the operator of record (itself brute-force-spec'd)
    val lexRk = graft.operators.Corpus.searchBm25(spark, Sf, topK = topL)
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("rk")).toMap
    // vector leg re-derived driver-side with the kernels' exact fold
    // order (ascending-index accumulation, x/sqrt(sum x^2) normalize)
    val embs = graft.sources.Tables.embeddings(spark, Sf)
      .where(col("embedding").isNotNull &&
        Embeddings.validEmb(col("embedding")))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getAs[Long](0) -> r.getSeq[Double](1).toArray)
    def normed(v: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n > 0.0) v.map(_ / n) else v.clone()
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val qe = normed(embs.find(_._1 == qvecId).get._2)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecRk = embs.map { case (id, e) => (id, r6(dot(normed(e), qe))) }
      .sortBy { case (id, sim) => (-sim, id) }
      .take(topL).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap

    // expected fusion, same op order: lex term + vec term, rounded
    val expect = (lexRk.keySet ++ vecRk.keySet).map { id =>
      val lt = lexRk.get(id).map(r => 1.0 / (rrfK.toDouble + r)).getOrElse(0.0)
      val vt = vecRk.get(id).map(r => 1.0 / (rrfK.toDouble + r)).getOrElse(0.0)
      id -> r6(lt + vt)
    }.toSeq.sortBy { case (id, s) => (-s, id) }.take(topK)

    assert(out.keySet == expect.map(_._1).toSet,
      s"fused doc set ${out.keySet} vs expected ${expect.map(_._1)}")
    expect.foreach { case (id, sc) =>
      val row = out(id)
      assert(math.abs(row.getAs[Double]("score") - sc) < 1e-9,
        s"doc $id fused score")
      assert(Option(row.getAs[Any]("lex_rk")).map(_.asInstanceOf[Long]) ==
        lexRk.get(id), s"doc $id lex_rk")
      assert(Option(row.getAs[Any]("vec_rk")).map(_.asInstanceOf[Long]) ==
        vecRk.get(id), s"doc $id vec_rk")
    }
    // rank law: dense 1..topK following (score desc, doc_id)
    val byRk = out.values.toSeq.sortBy(_.getAs[Long]("rk"))
    assert(byRk.map(_.getAs[Long]("rk")) == (1L to byRk.size))
    assert(byRk.zip(byRk.tail).forall { case (a, b) =>
      val (sa, sb) = (a.getAs[Double]("score"), b.getAs[Double]("score"))
      sa > sb || (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id"))
    })
    // a doc ranked by BOTH legs must beat one ranked by a single leg at
    // an equal-or-worse position in that leg (monotone additivity)
    val both = out.values.filter(r =>
      r.getAs[Any]("lex_rk") != null && r.getAs[Any]("vec_rk") != null)
    both.foreach { r =>
      out.values.filter(o => o.getAs[Any]("vec_rk") == null &&
        o.getAs[Any]("lex_rk") != null &&
        o.getAs[Long]("lex_rk") >= r.getAs[Long]("lex_rk")).foreach { o =>
        assert(o.getAs[Double]("score") <= r.getAs[Double]("score"))
      }
    }
  }

  test("a zero vector scores cosine 0, never a NaN flag sweep") {
    import spark.implicits._
    // vec 10 is an all-zeros EVAL embedding sharing a bucket with real
    // train vectors: cosine(x, 0) = 0/0 = NaN, and Spark sorts NaN above
    // every double AND satisfies NaN >= thr — unguarded, one junk eval
    // vector would flag its whole bucket as contaminated
    val e1 = Array.fill(8)(1.0)
    val rows =
      Seq((10L, Array.fill(8)(0.0).toSeq, 0L)) ++
      (1L to 9L).map(i => (i, e1.map(_ + i * 0.3).toSeq, 0L)) ++
      (21L to 29L).map(i => (i, e1.map(v => -v - i * 0.3).toSeq, 1L))
    val out = Embeddings.decontaminateSemanticFrom(
      rows.toDF("vec_id", "emb", "label"), thr = 0.95, k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.values.forall(!_.getBoolean(4)),
      s"nothing is near the zero vector: ${out.values.filter(_.getBoolean(4))}")
    assert(out.values.forall(r => r.isNullAt(3) || !r.getDouble(3).isNaN),
      "similarity to a zero vector must be pinned to 0.0, not NaN")
    // same pin on the exact-scan path (its oracle mirrors this with a
    // CASE-guarded normalize: zero stays zero, never 0/0 = NaN)
    val exact = Embeddings.decontaminateSemanticExactFrom(
      rows.toDF("vec_id", "emb", "label"), thr = 0.95)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(exact.values.forall(!_.getBoolean(3)),
      s"exact scan: nothing is near the zero vector: " +
        s"${exact.values.filter(_.getBoolean(3))}")
    assert(exact.values.forall(r => r.isNullAt(2) || !r.getDouble(2).isNaN),
      "exact scan: zero-vector sim must be 0.0, not NaN")
  }

  test("connected components label planted clusters correctly") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 7L).toDF("id")
    val cc = graft.operators.Cluster.connectedComponents(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connected components: long chains converge or fail loudly") {
    import spark.implicits._
    // a 30-node chain has diameter 29: min-label propagation needs 29
    // rounds, so maxIter=20 must THROW (silent wrong labels would leak
    // near-dups across train_test_split), and maxIter=35 must converge.
    // driverEdgeCap = -1 forces the distributed loop — the default gate
    // would solve this graph driver-side and never iterate (0 is not the
    // sentinel: an empty graph satisfies 0 <= 0 and would still take the
    // driver path)
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 29L).toDF("id")
    intercept[IllegalStateException] {
      graft.operators.Cluster.connectedComponents(chain, nodes,
        maxIter = 20, driverEdgeCap = -1L).collect()
    }
    // the DEFAULT path union-finds the same chain driver-side: same
    // labels, no iteration budget to exhaust
    val ufLabels = graft.operators.Cluster.connectedComponents(chain, nodes, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ufLabels.values.toSet == Set(0L), s"union-find path: got $ufLabels")
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val cc = graft.operators.Cluster.connectedComponents(chain, nodes,
        maxIter = 35, driverEdgeCap = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(0L), s"one component labeled 0, got $cc")
    // 29 propagation rounds must not leave 29 checkpointed label copies:
    // each round frees the previous (only the final labels checkpoint and
    // at most a couple of stragglers may remain)
    val rddsAfter = spark.sparkContext.getPersistentRDDs.size
    assert(rddsAfter - rddsBefore <= 3,
      s"checkpoint storage leaked across rounds: $rddsBefore -> $rddsAfter")
  }

  test("dedup_clusters covers every doc exactly once and sizes add up") {
    val cl = graft.operators.NearDup.dedupClusters(spark, Sf)
    val n = graft.sources.Tables.documents(spark, Sf).count()
    assert(cl.count() == n)
    // every cluster has exactly one canonical doc
    val canonPerCluster = cl.groupBy("cluster_id")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"))
    assert(canonPerCluster.where(col("n_canon") =!= 1).count() == 0)
    // sizes sum back to the doc count
    assert(cl.select("cluster_id", "cluster_size").distinct()
      .agg(sum("cluster_size")).head().getLong(0) == n)
  }

  test("dedup_embedding emits one row per vector") {
    val n = graft.sources.Tables.embeddings(spark, Sf).count()
    assert(Embeddings.dedupEmbedding(spark, Sf).count() == n)
  }

  test("releaseCache unpersists memoized bases and assignments") {
    // warm the caches
    graft.operators.NearDup.dedupMinhash(spark, Sf).count()
    graft.operators.Embeddings.annIvf(spark, Sf).count()
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    assert(cachedBefore > 0, "memoized bases must be persisted")
    graft.operators.NearDup.releaseCache(spark)
    graft.operators.Embeddings.releaseCache(spark)
    assert(spark.sparkContext.getPersistentRDDs.size < cachedBefore,
      "releaseCache must unpersist the session's cached relations")
    // queries still work after release (caches rebuild on demand)
    assert(graft.operators.NearDup.dedupMinhash(spark, Sf).count() > 0)
  }

  test("rag_context dedups doc hits across the incident batch") {
    val ctx = Embeddings.ragContext(spark, Sf)
    assert(ctx.count() > 0)
    assert(ctx.groupBy("doc_id").count().where(col("count") > 1).count() == 0)
    assert(ctx.agg(sum("n_hits")).head().getLong(0) == 25L) // 5 incidents × 5 hits
  }
}
