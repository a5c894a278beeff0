package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Corpus

class CorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import SparkTest.Sf

  test("quality_nb: the fitted model separates a separable fixture, " +
    "hand-checked priors and smoothing; NULL text and zero-vocab-token " +
    "docs keep their contracts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // kept docs pass every Gopher rule (>=50 words, stopword-rich,
    // alphabetic) and carry the token "clean"; dropped docs are short
    // ("junk junk ...") and carry "junk". NB must reproduce its teacher
    // on this separable world.
    val keptText = (("the data is clean and it has a good signal " * 6)
      + "the clean end").trim // 66 words, mean len ~3.6, stopwords galore
    val docs = ((1 to 4).map(i => (s"k$i", keptText)) ++
      (1 to 4).map(i => (s"d$i", "junk junk junk junk")) ++
      Seq(("n1", null: String), ("z1", "zz zz zz zz")))
      .toDF("doc_id", "text")
    // hand vocab: only the two discriminative tokens
    val vocab = Seq(("clean", 1L), ("junk", 2L)).toDF("token", "token_id")
    val out = Corpus.qualityNbFrom(docs, vocab).collect()
      .map(r => r.getString(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getBoolean(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))).toMap
    // teacher labels: kept docs true, junk/zz docs false, null-text NULL;
    // each kept doc holds 63 words of which 7 are "clean"
    (1 to 4).foreach { i =>
      assert(out(s"k$i") == ((Some(true), Some(7L), Some(true))),
        s"k$i: ${out(s"k$i")} — 7 'clean' tokens, classified kept")
      assert(out(s"d$i") == ((Some(false), Some(4L), Some(false))),
        s"d$i: ${out(s"d$i")} — 4 'junk' tokens, classified dropped")
    }
    assert(out("n1") == ((None, None, None)),
      s"NULL text: no label, no evidence, no prediction: ${out("n1")}")
    // z1: dropped by the teacher, zero vocab tokens -> prior-only score;
    // priors over the 9 labeled docs (n1 excluded): nk=4 ->
    // pri_keep = ln(5/11) < pri_drop = ln(6/11) -> prediction drop
    assert(out("z1") == ((Some(false), Some(0L), Some(false))),
      s"zero-evidence doc falls to the prior: ${out("z1")}")
    // hand-check one lp: c(clean|kept) = 7*4 = 28 = tot_keep, |V| = 2 ->
    // lp_keep(k) = ln(5/11) + 7*ln((28+1)/(28+2))
    val expected = BigDecimal(math.log(5.0 / 11.0) +
      7.0 * math.log(29.0 / 30.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val kRow = Corpus.qualityNbFrom(docs, vocab)
      .where(col("doc_id") === "k1").collect().head
    assert(kRow.getDouble(3) == expected,
      s"hand-computed lp_keep: ${kRow.getDouble(3)} vs $expected")
  }

  test("vocab ids are dense, unique, frequency-ordered") {
    val v = Corpus.buildVocab(spark, Sf).collect()
    val ids = v.map(_.getAs[Long]("token_id")).sorted
    assert(ids.toSeq == (1L to ids.length).toSeq, "ids must be dense from 1")
    val byId = v.sortBy(_.getAs[Long]("token_id"))
    val freqs = byId.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      "lower id must never have lower frequency")
  }

  test("encode_tokens round-trips token counts and flags OOV") {
    val enc = Corpus.encodeTokens(spark, Sf)
    val bad = enc.where(size(split(col("token_ids_csv"), ",")) =!= col("n_tokens"))
    assert(bad.count() == 0)
    assert(enc.where(col("n_oov") > col("n_tokens")).count() == 0)
    // encoding must cover every document
    assert(enc.count() == graft.sources.Tables.documents(spark, Sf).count())
  }

  test("train/test split keeps dup clusters together and near the target ratio") {
    val split = Corpus.trainTestSplit(spark, Sf)
    val mixedClusters = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .where(col("n_splits") > 1)
    assert(mixedClusters.count() == 0, "a dup cluster must not straddle the split")
    val n = split.count().toDouble
    val train = split.where(col("split") === "train").count().toDouble
    assert(train / n > 0.6 && train / n < 0.95, s"train fraction ${train / n}")
  }

  test("pack_sequences respects the token budget and covers every doc") {
    val packed = Corpus.packSequences(spark, Sf, maxTokens = 128)
    assert(packed.count() == graft.sources.Tables.documents(spark, Sf).count())
    val overs = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("fill"), count("*").as("n_docs"))
      .where(col("fill") > 128 && col("n_docs") > 1)
    assert(overs.count() == 0, "multi-doc bins must fit the budget")
  }

  test("pack_sequences bins are blocked by id range and partition-invariant") {
    // bin_id = (doc_id >> 5)·64 + bin-within-block: every doc's bin lives
    // in its own 32-doc id block, and bins never span blocks
    val packed = Corpus.packSequences(spark, Sf, maxTokens = 64)
    val stray = packed.where(
      shiftright(col("bin_id"), 6) =!= shiftright(col("doc_id"), 5))
    assert(stray.count() == 0, "a doc's bin must sit in its own id block")
    // data-independent of parallelism: the same packing at 1 partition
    val one = Corpus.packSequencesFrom(
      graft.sources.Tables.documents(spark, Sf).repartition(1), maxTokens = 64)
    assert(packed.exceptAll(one).count() == 0 && one.exceptAll(packed).count() == 0,
      "bin assignment must not depend on partitioning")
  }

  test("chunk_documents covers every token with the declared overlap") {
    val chunks = Corpus.chunkDocuments(spark, Sf, maxTokens = 64, overlap = 8)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"),
        graft.functions.TextFns.wsTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == docs.keySet, "every doc must be chunked")
    chunks.foreach { case (docId, rows) =>
      val byIdx = rows.sortBy(_.getAs[Long]("chunk_idx"))
      val n = docs(docId)
      // chunk starts advance by stride; the union covers [1, n]
      byIdx.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_idx") == i.toLong)
        assert(r.getAs[Long]("n_chunk_tokens") == math.min(64L, n - i * 56L))
      }
      val covered = byIdx.map(_.getAs[Long]("n_chunk_tokens")).zipWithIndex
        .map { case (len, i) => i * 56L + len }.max
      assert(covered == n, s"doc $docId: last chunk must reach token $n")
      // consecutive chunks share exactly `overlap` tokens of text
      byIdx.sliding(2).foreach {
        case Array(a, b) =>
          val aToks = a.getAs[String]("chunk_text").split(" ")
          val bToks = b.getAs[String]("chunk_text").split(" ")
          assert(aToks.takeRight(8).sameElements(bToks.take(8)),
            s"doc $docId chunks ${a.get(1)}/${b.get(1)} must overlap by 8 tokens")
        case _ =>
      }
    }
  }

  test("perplexity ranks out-of-distribution docs above common-token docs") {
    val out = Corpus.perplexityScore(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("perplexity"), r.getAs[Long]("n_oov"), r.getAs[Long]("n_tokens")))
      .toMap
    assert(out.size == graft.sources.Tables.documents(spark, Sf).count())
    // all-OOV docs must sit at the smoothed-floor perplexity, strictly
    // above the corpus-wide best (common tokens are modeled, OOV is not)
    val (allOov, partial) = out.values.partition { case (_, oov, n) => oov == n }
    if (allOov.nonEmpty && partial.nonEmpty) {
      val worstModeled = partial.map(_._1).max
      val floorPpl = allOov.map(_._1).min
      assert(floorPpl >= worstModeled * 0.999,
        s"all-OOV docs ($floorPpl) must not beat modeled docs ($worstModeled)")
    }
    // perplexity is positive and finite everywhere
    out.values.foreach { case (p, _, _) => assert(p > 0 && !p.isInfinite) }
  }

  test("decontaminate flags exactly the docs overlapping the eval set") {
    val out = Corpus.decontaminate(spark, Sf).collect()
    // only train docs appear
    assert(out.forall(_.getAs[Long]("doc_id") % 10 != 0))
    // flag agrees with the count, and both classes occur in the fixture
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_contaminated") ==
        (r.getAs[Long]("n_shared_ngrams") > 0))
    }
    // cross-check one flagged doc against a direct shingle intersection
    val flagged = out.filter(_.getAs[Boolean]("is_contaminated"))
    flagged.headOption.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val grams = graft.sources.Tables.documents(spark, Sf)
        .select(col("doc_id"),
          graft.operators.NearDup.wordShingles(col("text"), 8).as("g"))
      val mine = grams.where(col("doc_id") === docId)
        .select(explode(col("g"))).collect().map(_.getString(0)).toSet
      val evalG = grams.where(pmod(col("doc_id"), lit(10)) === 0)
        .select(explode(col("g"))).collect().map(_.getString(0)).toSet
      assert((mine & evalG).size.toLong == r.getAs[Long]("n_shared_ngrams"))
    }
  }

  test("decontaminate counts DISTINCT shared grams under duplicated rows") {
    import spark.implicits._
    // eval doc 10 shares its whole text with train doc 3; the train row
    // is delivered TWICE and the text's 16 tokens repeat its 8 words, so
    // the 9 gram windows hold only 8 DISTINCT grams (window 9 == window
    // 1). n_shared_ngrams must be that distinct count — occurrence
    // multiplicity would give 9 per row and 18 across the duplicate —
    // on BOTH duplicated output rows
    val shared = "a b c d e f g h a b c d e f g h"
    val docs = Seq(
      (3L, shared), (3L, shared),     // duplicated train row
      (7L, "x y z q w e r t unrelated train"),
      (10L, shared))                  // eval doc (doc_id % 10 == 0)
      .toDF("doc_id", "text")
    val out = Corpus.decontaminateFrom(docs).collect()
      .filter(_.getAs[Long]("doc_id") == 3L)
    assert(out.length == 2, s"one output row per delivered train row: ${out.length}")
    assert(out.forall(_.getAs[Long]("n_shared_ngrams") == 8L),
      s"distinct grams, not occurrences: ${out.map(_.getAs[Long]("n_shared_ngrams")).toSeq}")
  }

  test("decontaminate_bloom: one-sided vs the exact operator — no false " +
    "negatives, bounded false positives, planted overlap flags") {
    // real corpus: the maybe-set must COVER the exact contaminated set
    // (the Bloom guarantee), and per-doc maybe-counts dominate exact
    // counts gram-wise
    val exact = Corpus.decontaminate(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared_ngrams"), r.getAs[Boolean]("is_contaminated")))
      .toMap
    val bloom = Corpus.decontaminateBloom(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_maybe_ngrams"), r.getAs[Boolean]("is_flagged")))
      .toMap
    assert(bloom.keySet == exact.keySet, "same train-doc universe")
    exact.foreach { case (id, (nEx, cEx)) =>
      val (nBl, cBl) = bloom(id)
      assert(nBl >= nEx, s"doc $id: maybe-count $nBl < exact $nEx — " +
        "a Bloom can never miss a truly shared gram")
      assert(!cEx || cBl, s"doc $id: exact-contaminated but not flagged")
    }
    // false-positive budget: at 2^21 bits / 4 draws and this corpus's
    // eval-gram load, spurious flags must stay rare
    val fp = bloom.count { case (id, (_, c)) => c && !exact(id)._2 }
    assert(fp <= math.max(1, bloom.size / 50),
      s"$fp spurious flags of ${bloom.size} train docs — FP rate too high")
    // planted: eval doc 10 shares an 8-gram with train doc 3; train doc
    // 4 is disjoint → flagged / clean, and the shared gram count ≥ 1
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (4L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val planted = Corpus.decontaminateBloomFrom(docs,
      n = 8, mBits = Corpus.DecontBloomBits, k = Corpus.DecontBloomHashes)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_flagged")).toMap
    assert(planted == Map(3L -> true, 4L -> false), s"planted: $planted")
    // empty eval split: nothing can be contaminated, nothing flags
    val noEval = Corpus.decontaminateBloomFrom(
      docs.where(col("doc_id") =!= 10L), n = 8,
      mBits = Corpus.DecontBloomBits, k = Corpus.DecontBloomHashes)
      .collect()
    assert(noEval.forall(!_.getAs[Boolean]("is_flagged")))
  }

  test("quality_perplexity_bigram: word ORDER discriminates where the " +
    "unigram can't; counts and degenerate contracts") {
    import spark.implicits._
    import graft.sources.Tables
    // corpus dominated by the pattern "a b": docs X and Y carry the SAME
    // token multiset in different orders — unigram perplexity is blind
    // to that, the bigram model must score the in-model order lower
    val body = (1 to 20).map(_ => "a b").mkString(" ")
    val docs = ((1L to 8L).map(i => (i, body)) ++ Seq(
      (100L, "a b a b a b"), // X: in-model order
      (101L, "b b b a a a"), // Y: same multiset, rare bigrams
      (102L, "a qzx"))       // Z: OOV token → an unseen bigram
      ).toDF("doc_id", "text")
    // route through a temp dir: perplexityBigram reads via Tables +
    // the session vocab memo keyed on the dir
    val dir = "/tmp/graft_ppl_bi_fixture"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Corpus.perplexityBigram(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toMap
    val uni = Corpus.perplexityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(uni(100L) - uni(101L)) < 1e-9,
      s"unigram is order-blind: ${uni(100L)} vs ${uni(101L)}")
    assert(out(100L)._1 < out(101L)._1,
      s"bigram must prefer the in-model order: ${out(100L)} vs ${out(101L)}")
    // n_bigrams = tokens − 1; X and Y are in-model (the model sees its
    // own corpus), Z's OOV token makes its one bigram unseen
    assert(out(100L)._2 == 5L && out(101L)._2 == 5L)
    assert(out(100L)._3 == 0L, s"X's bigrams are all in-model: ${out(100L)}")
    assert(out(102L) == ((out(102L)._1, 1L, 1L)) && out(102L)._3 == 1L,
      s"Z's OOV bigram must count unseen: ${out(102L)}")
    assert(out(102L)._1 > out(100L)._1,
      s"the OOV doc must out-perplex the in-model doc: ${out(102L)}")
    // probabilities are < 1 → perplexity > 1; real corpus sanity too
    assert(out.values.forall(_._1 > 1.0))
    Corpus.releaseCache(spark)
    val corpus = Corpus.perplexityBigram(spark, SparkTest.Sf).collect()
    assert(corpus.nonEmpty && corpus.forall(_.getDouble(1) > 1.0))
    // every corpus doc with >= 2 tokens reports exactly tokens−1 bigrams
    val nTok = Tables.documents(spark, SparkTest.Sf)
      .where(col("text").isNotNull)
      .select(col("doc_id"), size(split(trim(lower(col("text"))), "\\s+"))
        .cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpus.foreach { r =>
      assert(r.getLong(2) == nTok(r.getLong(0)) - 1,
        s"n_bigrams must be tokens-1: $r vs ${nTok(r.getLong(0))}")
    }
  }

  test("sample_temperature: hand-computed apportionment, flattening " +
    "laws, exact-total invariant, τ=4 flatter than τ=2") {
    import spark.implicits._
    // token counts 1 / 4 / 16 → sqrt weights 1 / 2 / 4 (W = 7)
    val docs = Seq(
      (1L, "w", "a"),
      (2L, "w w w w", "b"),
      (3L, (1 to 16).map(_ => "w").mkString(" "), "c"))
      .toDF("doc_id", "text", "source")
    def targets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(1) -> r.getAs[Long]("target")).toMap
    // total 7: exact shares 1/2/4 are integral — no remainder slots
    val t7 = targets(Corpus.sampleTemperatureFrom(docs, tau = 2, total = 7))
    assert(t7 == Map("a" -> 1L, "b" -> 2L, "c" -> 4L), s"t7: $t7")
    // total 10: exact 10/7·(1,2,4) = (1.43, 2.86, 5.71); floors (1,2,5)
    // leave 2 slots → largest remainders b (.86) and c (.71) get them
    val t10raw = Corpus.sampleTemperatureFrom(docs, tau = 2, total = 10)
      .select("source", "target").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t10raw == Map("a" -> 1L, "b" -> 3L, "c" -> 6L), s"t10: $t10raw")
    // real corpus: targets sum EXACTLY to total; flattening vs the
    // proportional token share — the smallest source gains, the largest
    // loses; τ=4 is flatter than τ=2
    val corpus = graft.sources.Tables.documents(spark, Sf)
    def bySrc(tau: Int) = Corpus.sampleTemperature(spark, Sf, tau = tau,
      total = 60).select("source", "target").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (m2, m4) = (bySrc(2), bySrc(4))
    assert(m2.values.sum == 60L && m4.values.sum == 60L,
      s"targets must apportion the whole budget: $m2 / $m4")
    val cnt = corpus.where(col("text").isNotNull)
      .groupBy("source").agg(sum(size(split(trim(lower(col("text"))),
        "\\s+"))).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = cnt.values.sum.toDouble
    val (minS, maxS) = (cnt.minBy(_._2)._1, cnt.maxBy(_._2)._1)
    if (cnt(minS) != cnt(maxS)) {
      assert(m2(minS) / 60.0 >= cnt(minS) / tot - 1e-9,
        s"τ-sampling must not shrink the smallest source: $m2 vs $cnt")
      assert(m2(maxS) / 60.0 <= cnt(maxS) / tot + 1e-9,
        s"τ-sampling must not grow the largest source: $m2 vs $cnt")
      // flatter at τ=4: spread of targets shrinks (or stays)
      def spread(m: Map[String, Long]) = m.values.max - m.values.min
      assert(spread(m4) <= spread(m2), s"τ=4 flatter: $m4 vs $m2")
    }
    // determinism + per-source rank contiguity
    val run = Corpus.sampleTemperature(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1)
    val run2 = Corpus.sampleTemperature(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1)
    assert(run.sameElements(run2), "engine-stable sample")
    run.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length),
        "ranks contiguous per source")
    }
  }

  test("retrieval_eval: metric laws on the corpus; planted fixture " +
    "matches an independent BM25+NDCG reference to 1e-6") {
    val out = Corpus.retrievalEval(spark, Sf).collect()
      .map(r => r.getAs[Long]("qid") -> r).toMap
    assert(out.keySet == Corpus.RetrievalEvalQueries.map(_._1).toSet,
      "every eval query reports, including the no-hit one")
    Corpus.RetrievalEvalQueries.foreach { case (qid, _) =>
      val r = out(qid)
      val (nRel, mrr) = (r.getAs[Long]("n_rel"), r.getAs[Double]("mrr"))
      assert(mrr >= 0.0 && mrr <= 1.0, s"q$qid mrr out of range: $mrr")
      if (nRel == 0) {
        assert(mrr == 0.0 && r.isNullAt(r.fieldIndex("ndcg")),
          s"q$qid: no relevant docs → mrr 0, ndcg NULL")
      } else {
        val ndcg = r.getAs[Double]("ndcg")
        assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9,
          s"q$qid ndcg out of range: $ndcg")
      }
    }
    // the no-hit query is the degenerate row
    assert(out(5L).getAs[Long]("n_rel") == 0L)

    // planted fixture, checked against an INDEPENDENT plain-Scala
    // BM25 + MRR/NDCG reference (sums over ≤2 terms — order-identical)
    import spark.implicits._
    val fixture = Seq(
      (1L, "alpha beta gamma"),        // both terms, dl 3
      (2L, "alpha alpha beta"),        // tf(alpha)=2 → should outrank d1
      (3L, "alpha zzz yyy xxx"),       // partial match only
      (4L, "qqq www eee"))             // no match
      .toDF("doc_id", "text")
    val qs = Seq((1L, "alpha beta"), (2L, "absent"))
    val got = Corpus.retrievalEvalFrom(fixture, qs, topK = 10).collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("n_rel"), r.getAs[Double]("mrr"),
          Option(r.get(r.fieldIndex("ndcg"))).map(_.asInstanceOf[Double])))
      .toMap
    // reference: corpus N=4, total_len=13, avgdl=13/4; df(alpha)=3,
    // df(beta)=2; score(d) = Σ_t idf(t)·tnorm(t,d)
    def idf(df: Int) = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def tnorm(tf: Int, dl: Int) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (13.0 / 4)))
    val s1 = idf(3) * tnorm(1, 3) + idf(2) * tnorm(1, 3) // d1
    val s2 = idf(3) * tnorm(2, 3) + idf(2) * tnorm(1, 3) // d2
    val s3 = idf(3) * tnorm(1, 4)                        // d3
    assert(s2 > s1 && s1 > s3, "fixture must rank d2 > d1 > d3")
    // rel(q1) = {d1, d2} at ranks 2 and 1 → mrr 1, perfect prefix → ndcg
    // = (1/log2(2)+1/log2(3)) / itself = 1
    assert(got(1L) == ((2L, 1.0, Some(1.0))), s"q1: ${got(1L)}")
    assert(got(2L) == ((0L, 0.0, None)), s"q2: ${got(2L)}")
    // one more point where the FIRST hit is NOT rank 1: short high-tf
    // partial matchers outscore the long full matcher (dl-normalization
    // pushes it down); expected rank derived from the reference scores
    val fixture2 = Seq(
      (1L, "alpha alpha alpha"),                           // partial, tf 3
      (2L, "alpha beta f1 f2 f3 f4 f5 f6 f7 f8 f9 f10"),   // full, dl 12
      (3L, "beta beta gamma delta"))                       // partial (beta)
      .toDF("doc_id", "text")
    val got2 = Corpus.retrievalEvalFrom(fixture2,
      Seq((7L, "alpha beta")), topK = 10).collect().head
    def idf2(df: Int) = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def tn2(tf: Int, dl: Int) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (19.0 / 3)))
    val t1 = idf2(2) * tn2(3, 3)
    val t2 = idf2(2) * tn2(1, 12) + idf2(2) * tn2(1, 12)
    val t3 = idf2(2) * tn2(2, 4)
    assert(Set(t1, t2, t3).size == 3, "fixture scores must be distinct")
    val rankD2 = 1 + Seq(t1, t3).count(_ > t2)
    assert(rankD2 > 1, s"fixture2 intends the full matcher NOT first: " +
      s"$t1 / $t2 / $t3")
    // rel = {d2} → mrr = 1/rank; dcg = 1/log2(rank+1); idcg = 1/log2(2)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got2.getAs[Long]("n_rel") == 1L)
    assert(math.abs(got2.getAs[Double]("mrr") - r6(1.0 / rankD2)) < 2e-6,
      s"mrr: ${got2.getAs[Double]("mrr")} vs 1/$rankD2")
    val expNdcg = 1.0 / (math.log(rankD2 + 1.0) / math.log(2.0))
    assert(math.abs(got2.getAs[Double]("ndcg") - expNdcg) < 2e-6,
      s"ndcg: ${got2.getAs[Double]("ndcg")} vs $expNdcg")
  }

  test("mixture sample respects per-source targets, deterministic") {
    import graft.operators.Corpus
    val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val m = Corpus.sampleMixture(spark, Sf, weights, total = 10).collect()
    val bySrc = m.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // every stratum holds 25 docs at this sf — comfortably above the
    // targets — so the sample must hit them EXACTLY (an under-sampling
    // regression would pass a mere <= bound)
    val targets = Map("src0" -> 5, "src1" -> 3, "src2" -> 2)
    assert(bySrc == targets, s"per-source counts $bySrc != targets $targets")
    // ranks are contiguous 1..n per source
    m.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.sameElements(1L to rows.length))
    }
    // engine-stable: a second run picks the identical documents
    val m2 = Corpus.sampleMixture(spark, Sf, weights, total = 10).collect()
    assert(m.map(_.getLong(0)).sorted.sameElements(m2.map(_.getLong(0)).sorted))
  }

  test("mixture targets always sum to total (largest-remainder apportionment)") {
    import graft.operators.Corpus
    // three equal weights with total=10: independent round() would yield
    // 3+3+3 = 9; largest-remainder hands the leftover slot to the first
    // source by the deterministic name tie-break → 4/3/3
    val m = Corpus.sampleMixture(spark, Sf,
      Map("src0" -> 1.0, "src1" -> 1.0, "src2" -> 1.0), total = 10).collect()
    val bySrc = m.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(m.length == 10, s"mix must hold exactly `total` docs: $bySrc")
    assert(bySrc == Map("src0" -> 4, "src1" -> 3, "src2" -> 3), bySrc.toString)
  }

  test("stratified sample is deterministic and covers all strata") {
    val s1 = Corpus.stratifiedSample(spark, Sf)
    val s2 = Corpus.stratifiedSample(spark, Sf)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0,
      "same seed must give the same sample")
    val strata = s1.select("event_type").distinct().count()
    val all = graft.sources.Tables.events(spark, Sf)
      .select("event_type").distinct().count()
    assert(strata == all, "every stratum must survive sampling")
    val frac = s1.count().toDouble / graft.sources.Tables.events(spark, Sf).count()
    assert(frac > 0.03 && frac < 0.25, s"sampled fraction $frac far from 0.1")
  }

  test("bigram counts match an independent position-join computation") {
    import graft.functions.TextFns
    // cross-validate the zip-with-tail plan against a posexplode
    // self-join — a different plan computing the same statistic
    val docs = graft.sources.Tables.documents(spark, Sf)
      .where(col("text").isNotNull)
      .select(col("doc_id"), TextFns.wsTokens(lower(col("text"))).as("toks"))
    val pos = docs.select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "w")))
    val expected = pos.as("a").join(pos.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.p") === col("a.p") + 1)
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count("*").as("n_exp"))
    val got = Corpus.bigramCounts(spark, Sf, topN = 1000000)
    assert(got.join(expected, Seq("w1", "w2"), "full_outer")
      .where(col("n").isNull || col("n_exp").isNull || col("n") =!= col("n_exp"))
      .count() == 0, "zip-with-tail and position-join must agree exactly")
    // the top-N cut is a deterministic total order
    val top = Corpus.bigramCounts(spark, Sf, topN = 10).collect()
    assert(top.length == 10 && top.map(_.getLong(2)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("corpus stats aggregate the same tokens text_tokens reports") {
    val stats = Corpus.corpusStats(spark, Sf)
    val fromTokens = graft.sources.Tables.documents(spark, Sf)
      .where(col("text").isNotNull)
      .select(col("source"), col("lang"),
        graft.functions.TextFns.wsTokenCount(col("text")).as("t"))
      .groupBy("source", "lang").agg(sum("t").as("t_exp"))
    assert(stats.join(fromTokens, Seq("source", "lang"))
      .where(col("total_tokens") =!= col("t_exp")).count() == 0)
    val bad = stats.where(col("min_chars") > col("max_chars") ||
      col("avg_tokens") < 0 || col("n_docs") <= 0).count()
    assert(bad == 0)
  }

  test("corpus shuffle is a seeded permutation with dense per-shard positions") {
    val n = graft.sources.Tables.documents(spark, Sf).count()
    val s1 = Corpus.corpusShuffle(spark, Sf).cache()
    // a permutation: every doc exactly once
    assert(s1.count() == n && s1.select("doc_id").distinct().count() == n)
    // positions are dense 1..k within each shard (a sharded writer can
    // address them as file offsets)
    val holes = s1.groupBy("shard")
      .agg(count("*").as("k"), max("pos").as("mx"), min("pos").as("mn"))
      .where(col("mx") =!= col("k") || col("mn") =!= 1)
    assert(holes.count() == 0, "per-shard positions must be 1..k dense")
    // deterministic under the same seed, reordered under another
    val again = Corpus.corpusShuffle(spark, Sf)
      .withColumnRenamed("pos", "pos2").select("doc_id", "pos2", "shard")
    assert(s1.join(again, Seq("doc_id", "shard"))
      .where(col("pos") =!= col("pos2")).count() == 0)
    val other = Corpus.corpusShuffle(spark, Sf, seed = "epoch2")
      .withColumnRenamed("shard", "shard2").select("doc_id", "shard2")
    val moved = s1.join(other, "doc_id")
      .where(col("shard") =!= col("shard2")).count()
    assert(moved > n / 2, s"a new seed must reshuffle shard assignment: $moved")
    s1.unpersist()
  }

  test("length buckets bound their docs and account padding waste exactly") {
    val w = 32
    val b = Corpus.lengthBuckets(spark, Sf, width = w).collect()
    assert(b.nonEmpty)
    b.foreach { r =>
      val (bucket, nDocs) = (r.getLong(0), r.getLong(1))
      val (mn, mx) = (r.getLong(2), r.getLong(3))
      val (waste, frac) = (r.getLong(4), r.getDouble(5))
      assert(mn >= bucket * w && mx < (bucket + 1) * w,
        s"bucket $bucket tokens [$mn,$mx] outside its width-$w range")
      assert(waste >= 0 && waste <= nDocs * mx, s"waste $waste out of bounds")
      assert(frac >= 0.0 && frac < 1.0, s"waste_frac $frac out of [0,1)")
    }
    // the wasted tokens must equal the direct per-doc computation
    val direct = graft.sources.Tables.documents(spark, Sf)
      .where(col("text").isNotNull)
      .select(graft.functions.TextFns.wsTokenCount(col("text")).as("t"))
      .withColumn("bucket", floor(col("t") / lit(w)).cast("long"))
    val perBucketMax = direct.groupBy("bucket").agg(max("t").as("mx"))
    val expected = direct.join(perBucketMax, "bucket")
      .agg(sum(col("mx") - col("t"))).head().getLong(0)
    assert(b.map(_.getLong(4)).sum == expected,
      "summed waste must match the per-doc accounting")
  }

  test("tfidf keywords: score law, per-doc top-k, df consistency") {
    import graft.functions.TextFns
    val k = 5
    val out = Corpus.tfidfKeywords(spark, Sf, topK = k).cache()
    val docs = graft.sources.Tables.documents(spark, Sf)
      .where(col("text").isNotNull)
    val n = docs.count().toDouble
    // df cross-validated against an independent distinct-docs-per-term
    // computation (explode -> distinct -> count), a different plan shape
    val dfExp = docs
      .select(col("doc_id"), explode(TextFns.wsTokens(lower(col("text")))).as("term"))
      .where(length(col("term")) > 0)
      .distinct()
      .groupBy("term").agg(count("*").as("df_exp"))
    assert(out.join(dfExp, "term")
      .where(col("df") =!= col("df_exp")).count() == 0,
      "window-df and distinct-join-df must agree")
    // the score law holds cell-for-cell
    val bad = out.collect().filter { r =>
      val (tf, df, score) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      math.abs(score -
        BigDecimal(tf * math.log(1.0 + n / df))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) > 1e-9
    }
    assert(bad.isEmpty, s"score law violated: ${bad.take(3).mkString(";")}")
    // exactly k rows per doc (every doc has >= k distinct terms at sf0.001),
    // ranked descending
    val perDoc = out.groupBy("doc_id").agg(count("*").as("c"),
      max("rk").as("mx"), min("rk").as("mn"))
    assert(perDoc.where(col("c") =!= k || col("mx") =!= k || col("mn") =!= 1)
      .count() == 0, "each doc carries a dense rank 1..k")
    val inv = out.as("a").join(out.as("b"),
      col("a.doc_id") === col("b.doc_id") && col("a.rk") < col("b.rk") &&
        col("a.score") < col("b.score"))
    assert(inv.count() == 0, "rank order must follow score order")
    out.unpersist()
  }

  test("bm25 search matches a brute-force reference and its ranking laws") {
    import spark.implicits._
    // hand-built corpus: tf, df, and length normalization all bite
    val docs = Seq(
      (1L, "apple apple banana pear"),           // 2 hits, tf(apple)=2, dl 4
      (2L, "apple pear pear pear pear pear"),    // 1 hit, long doc penalized
      (3L, "banana banana banana"),              // 1 hit, short doc boosted
      (4L, "pear plum")                          // no hit: must be absent
    ).toDF("doc_id", "text")
    val out = Corpus.searchBm25From(docs, "banana apple", topK = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_terms"), r.getAs[Double]("score"),
          r.getAs[Long]("rk")))).toMap

    // brute-force reference with the operator's exact op order
    val (k1, b) = (1.2, 0.75)
    val toks = Seq(1L -> "apple apple banana pear",
      2L -> "apple pear pear pear pear pear", 3L -> "banana banana banana",
      4L -> "pear plum").map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq }
    val n = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val terms = Seq("apple", "banana") // sorted, deduped
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    val expect = toks.flatMap { case (id, tk) =>
      val dl = tk.size.toDouble
      val hits = terms.filter(tk.contains)
      if (hits.isEmpty) None else {
        val raw = terms.foldLeft(0.0) { (acc, t) =>
          val tf = tk.count(_ == t).toDouble
          if (tf == 0.0) acc + 0.0
          else {
            val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
            acc + idf * (tf * (k1 + 1.0) /
              (tf + k1 * ((1.0 - b) + (b * dl) / avgdl)))
          }
        }
        Some(id -> (hits.size.toLong,
          BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
      }
    }.toMap
    assert(out.keySet == expect.keySet, s"matched docs: $out vs $expect")
    expect.foreach { case (id, (nt, sc)) =>
      assert(out(id)._1 == nt, s"doc $id n_terms")
      assert(math.abs(out(id)._2 - sc) < 1e-9,
        s"doc $id score ${out(id)._2} vs reference $sc")
    }
    // rank law: dense 1..n in (score desc, doc_id) order
    val byRk = out.toSeq.sortBy(_._2._3)
    assert(byRk.map(_._2._3) == (1L to byRk.size), "dense ranks")
    assert(byRk.zip(byRk.tail).forall { case ((ida, (_, sa, _)), (idb, (_, sb, _))) =>
      sa > sb || (sa == sb && ida < idb) }, "rank follows (score desc, doc_id)")
    // the two-term doc must outrank the long one-term doc
    assert(out(1L)._3 < out(2L)._3, "additivity: two matched terms beat one")
    // topK cut bites
    assert(Corpus.searchBm25From(docs, "banana apple", topK = 2)
      .count() == 2)
    // an all-whitespace query is empty, not a crash, with the full schema
    val empty = Corpus.searchBm25From(docs, "   \t ", topK = 5)
    assert(empty.columns.toSeq == Seq("doc_id", "n_terms", "score", "rk"))
    assert(empty.count() == 0)
  }

  test("token budget keeps exactly the maximal md5-order prefix per source") {
    import org.apache.spark.unsafe.types.UTF8String
    val budget = 800L
    val out = Corpus.corpusTokenBudget(spark, Sf, budget).collect()
    // driver-side reference: straight per-source prefix over (mk, doc_id)
    val M = 2305843009213693951L
    def mk(id: Long): Long = java.lang.Long.remainderUnsigned(
      graft.expressions.Kernels.md5LowerOf(UTF8String.fromString(id.toString)), M)
    val docs = graft.sources.Tables.documents(spark, Sf)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFns.wsTokenCount(col("text")).as("n"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        Option(r.getAs[String]("source")), r.getAs[Long]("n")))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val ordered = ds.sortBy { case (id, _, _) => (mk(id), id) }
      var cum = 0L
      ordered.zipWithIndex.flatMap { case ((id, _, n), i) =>
        cum += n
        if (cum <= budget) Some(id -> ((src, n, cum, (i + 1).toLong)))
        else None
      }
    }.toMap
    assert(out.length == expect.size, s"${out.length} vs ${expect.size}")
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (src, n, cum, rk) = expect(id)
      assert(Option(r.getAs[String]("source")) == src)
      assert(r.getAs[Long]("n_tokens") == n, s"doc $id tokens")
      assert(r.getAs[Long]("cum_tokens") == cum, s"doc $id cum")
      assert(r.getAs[Long]("rk") == rk, s"doc $id rk")
    }
    // law: within a source the kept set is a PREFIX (cum monotone in rk,
    // never exceeding the budget) and the next doc would overflow
    out.groupBy(r => Option(r.getAs[String]("source"))).foreach {
      case (_, rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("rk"))
        assert(sorted.map(_.getAs[Long]("rk")).toSeq ==
          (1L to sorted.length).toSeq, "dense prefix ranks")
        assert(sorted.last.getAs[Long]("cum_tokens") <= budget)
    }
  }

  test("weighted sample: exact ES race replay and weight-proportional draw") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    // driver-side replay of the exponential race, same op order
    val M = 2305843009213693951L
    def key(docId: Long, w: Long): Double = {
      val hm = java.lang.Long.remainderUnsigned(
        graft.expressions.Kernels.md5LowerOf(
          UTF8String.fromString(docId.toString)), M)
      val u = (hm.toDouble + 1.0) / 2305843009213693953L.toDouble
      (0.0 - math.log(u)) / w.toDouble
    }
    // 2000 heavy (weight 100) + 2000 light (weight 1) docs
    val n = 4000
    val docs = (0 until n).map { i =>
      val w = if (i < 2000) 100L else 1L
      (i.toLong, "x" * w.toInt, w)
    }.toDF("doc_id", "text", "n_chars")
    val k = 500
    val out = Corpus.sampleWeightedFrom(docs, k).collect()
    assert(out.length == k)
    // exact differential: the operator's k docs are the k smallest keys
    val expect = (0 until n).map { i =>
      val w = if (i < 2000) 100L else 1L
      (i.toLong, key(i.toLong, w))
    }.sortBy { case (id, kk) => (kk, id) }.take(k)
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expect.map(_._1).toSet,
      "sampled set must equal the k smallest race keys")
    out.sortBy(_.getAs[Long]("rk")).zip(expect).foreach { case (r, (id, kk)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(math.abs(r.getAs[Double]("draw_key") -
        BigDecimal(kk).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-9)
    }
    // weight proportionality: inclusion ~ k·w/Σw ⇒ heavy ≈ 495 of 500
    val heavy = out.count(_.getAs[Long]("weight") == 100L)
    assert(heavy >= 470 && heavy <= 500,
      s"heavy-weight docs must dominate the draw ∝ weight, got $heavy/500")
    assert(out.forall(_.getAs[Long]("weight") > 0))
    // zero/NULL weights never sampled
    val withZero = docs.withColumn("n_chars",
      when(col("doc_id") < 3500, col("n_chars")).otherwise(lit(0L)))
    assert(Corpus.sampleWeightedFrom(withZero, 4000)
      .where(col("doc_id") >= 3500).count() == 0)
  }

  test("bpe_train: hand-computed merges, ties, overlap runs, early stop") {
    import spark.implicits._
    // (a,a) dominates (count 2 from "aa"×2); after merging it only (a,b)
    // remains; then every word is a single symbol → early stop at 2 of 12
    val tiny = Seq((1L, "aa aa ab", "s")).toDF("doc_id", "text", "source")
    val (tab, d0, _, _) = Corpus.bpeTrainCore(tiny, merges = 12)
    d0.unpersist()
    assert(tab == Seq((1, "a", "a", 2L), (2, "a", "b", 1L)),
      s"got $tab")
    // count ties break on (lft, rgt) byte order: (x,y) before (z,w)
    val tie = Seq((1L, "xy zw xy zw", "s")).toDF("doc_id", "text", "source")
    val (tab2, d2, _, _) = Corpus.bpeTrainCore(tie, merges = 2)
    d2.unpersist()
    assert(tab2.map(t => (t._2, t._3)) == Seq(("x", "y"), ("z", "w")))
    // overlapping run: [a,a,a,a] counts 3 adjacent pairs but merges
    // left-to-right non-overlapping to [aa,aa]
    val run = Seq((1L, "aaaa", "s")).toDF("doc_id", "text", "source")
    val (tab3, d3, dN3, _) = Corpus.bpeTrainCore(run, merges = 1)
    d3.unpersist()
    assert(tab3 == Seq((1, "a", "a", 3L)))
    assert(dN3.select("syms").as[Seq[String]].collect().toSeq ==
      Seq(Seq("aa", "aa")))
  }

  test("bpe: driver and distributed trainers are byte-identical") {
    import spark.implicits._
    // adversarial shape: heavy count ties + shared prefixes + long runs
    val rng = new scala.util.Random(7)
    val vocabTokens = Seq("aba", "abab", "bab", "aaaa", "cdcd", "dc", "ccc")
    val docs = (1L to 60L).map { i =>
      val words = Seq.fill(6)(vocabTokens(rng.nextInt(vocabTokens.length)))
      (i, words.mkString(" "), s"s${i % 3}")
    }.toDF("doc_id", "text", "source")
    val (tabDrv, a0, aN, _) = Corpus.bpeTrainCore(docs, merges = 8)
    val (tabDst, b0, bN, cut8) = Corpus.bpeTrainCore(docs, merges = 8,
      driverDictCap = 0L)
    assert(tabDrv == tabDst,
      s"merge tables diverge:\n  driver $tabDrv\n  dist   $tabDst")
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.select("word", "freq", "syms").collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getAs[scala.collection.Seq[String]](2).toSeq))
        .sortBy(_._1).toSeq
    assert(dump(aN) == dump(bN), "final dictionaries diverge")
    a0.unpersist(); b0.unpersist()
    // and on the real corpus: the full query path (driver gate) equals
    // the forced-distributed core
    val real = graft.sources.Tables.documents(spark, Sf)
    val (tabR, r0, _, cutR) = Corpus.bpeTrainCore(real, merges = 12,
      driverDictCap = 0L)
    r0.unpersist()
    val viaQuery = Corpus.bpeTrain(spark, Sf).collect()
      .map(r => (r.getAs[Long]("rank").toInt, r.getString(1), r.getString(2),
        r.getAs[Long]("cnt")))
    assert(viaQuery.toSeq == tabR, "query path diverges from distributed core")
    Corpus.freeCheckpoint(spark, cut8)
    Corpus.freeCheckpoint(spark, cutR)
  }

  test("budget_waterfill: water-filling laws — caps respected, budget exactly spent") {
    import spark.implicits._
    def doc(id: Long, n: Int, src: String) =
      (id, (1 to n).map(_ => "w").mkString(" "), src)
    val docs = Seq(doc(1, 10, "small"), doc(2, 50, "mid"),
      doc(3, 200, "big"), doc(4, 200, "big2"))
      .toDF("doc_id", "text", "source")
    // budget 160: 'small' saturates (cap 10 < candidate 40), then
    // level = (160-10)/3 = 50 — 'mid' sits exactly AT the level
    // (boundary-saturated), the two big sources are capped at 50
    val out = Corpus.budgetWaterfillFrom(docs, 160L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("small").getAs[Double]("alloc_tokens") == 10.0 &&
      out("small").getAs[Boolean]("is_saturated"))
    assert(out("mid").getAs[Double]("alloc_tokens") == 50.0 &&
      out("mid").getAs[Boolean]("is_saturated"))
    Seq("big", "big2").foreach { s =>
      assert(out(s).getAs[Double]("alloc_tokens") == 50.0 &&
        !out(s).getAs[Boolean]("is_saturated"), s"$s: ${out(s)}")
    }
    assert(out.values.map(_.getAs[Double]("alloc_tokens")).sum == 160.0,
      "the budget is spent exactly")
    // budget beyond total capacity: every source saturated, NULL level
    val all = Corpus.budgetWaterfillFrom(docs, 10000L).collect()
    assert(all.forall(r => r.getAs[Boolean]("is_saturated") &&
      r.isNullAt(r.fieldIndex("level")) &&
      r.getAs[Double]("alloc_tokens") == r.getAs[Long]("cap_tokens").toDouble))
    // budget below m × min cap: pure uniform split, nobody saturated
    val uni = Corpus.budgetWaterfillFrom(docs, 8L).collect()
    assert(uni.forall(r => r.getAs[Double]("alloc_tokens") == 2.0 &&
      !r.getAs[Boolean]("is_saturated")))
    // real corpus: allocations never exceed caps; spend == budget when
    // the budget is binding
    val real = Corpus.budgetWaterfill(spark, Sf).collect()
    assert(real.forall(r => r.getAs[Double]("alloc_tokens") <=
      r.getAs[Long]("cap_tokens").toDouble + 1e-9))
    val spend = real.map(_.getAs[Double]("alloc_tokens")).sum
    val total = real.map(_.getAs[Long]("cap_tokens")).sum.toDouble
    if (total > 26000.0) assert(math.abs(spend - 26000.0) < 1e-3,
      s"binding budget must be spent exactly: $spend")
    else assert(spend == total)
  }

  test("bpe distributed trainer survives a realistic merge budget (128 merges)") {
    import spark.implicits._
    // enough pair material that 128 merges never exhaust: 80 distinct
    // 10–14-char words over a 6-letter alphabet
    val rng = new scala.util.Random(13)
    val words = (0 until 80).map { _ =>
      (0 until (10 + rng.nextInt(5))).map(_ => ('a' + rng.nextInt(6)).toChar).mkString
    }
    val docs = (1L to 120L).map { i =>
      (i, Seq.fill(5)(words(rng.nextInt(words.length))).mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val (tabDrv, a0, aN, _) = Corpus.bpeTrainCore(docs, merges = 128)
    val (tabDst, b0, bN, cut128) = Corpus.bpeTrainCore(docs, merges = 128,
      driverDictCap = 0L)
    assert(tabDrv.length == 128,
      s"merge material must not exhaust before 128: ${tabDrv.length}")
    assert(tabDrv == tabDst,
      s"merge tables diverge at a realistic budget:\n  driver ${tabDrv.takeRight(5)}" +
        s"\n  dist   ${tabDst.takeRight(5)}")
    // the lineage cut every BpeCutEvery merges bounds the returned
    // dictionary's plan: at most BpeCutEvery nested merge kernels (the
    // un-cut form nests all 128 — the analysis blowup this pins against)
    val planMerges = "(?i)bpemerge|bpe_merge".r
      .findAllIn(bN.queryExecution.analyzed.toString).length
    assert(planMerges <= Corpus.BpeCutEvery,
      s"distributed dictionary plan nests $planMerges merge kernels — " +
        s"the per-${Corpus.BpeCutEvery}-merge lineage cut is not firing")
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.select("word", "freq", "syms").collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getAs[scala.collection.Seq[String]](2).toSeq))
        .sortBy(_._1).toSeq
    assert(dump(aN) == dump(bN), "final dictionaries diverge at 128 merges")
    a0.unpersist(); b0.unpersist()
    // the final lineage-cut RDD is returned for the caller to free —
    // before r16 it stayed in executor storage until session end
    assert(cut128.isDefined, "128 distributed merges must have cut lineage")
    assert(spark.sparkContext.getPersistentRDDs.contains(cut128.get),
      "the final cut must still be pinned while the dictionary is live")
    Corpus.freeCheckpoint(spark, cut128)
    assert(!spark.sparkContext.getPersistentRDDs.contains(cut128.get),
      "freeCheckpoint must release the final cut's storage")
  }

  test("bpe_encode: lossless symbol stream, token-count bounds, coverage") {
    import spark.implicits._
    val enc = Corpus.bpeEncode(spark, Sf).cache()
    val docs = graft.sources.Tables.documents(spark, Sf)
    // removing the separators must reproduce the letters-only word stream
    // reference stream folds with the operator's simple-mapping contract
    // (plain lower() would İ-diverge — the foldCase Scaladoc case)
    val words = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(split(trim(graft.functions.TextFns.foldCase(col("text"))),
          "\\s+")).as(Seq("pos", "word")))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words_ref"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("word")))),
          x => x.getField("word")), "").as("letters"))
    val joined = enc.join(words, Seq("doc_id")).cache()
    assert(joined.count() == enc.count(), "every encoded doc must have words")
    val broken = joined.where(
      regexp_replace(col("bpe_text"), " ", "") =!= col("letters"))
    assert(broken.count() == 0, "BPE must be a lossless segmentation")
    assert(joined.where(col("n_words") =!= col("n_words_ref")).count() == 0)
    // n_words ≤ n_bpe_tokens ≤ total letters
    assert(joined.where(col("n_bpe_tokens") < col("n_words")).count() == 0)
    assert(joined.where(
      col("n_bpe_tokens") > length(col("letters"))).count() == 0)
    // merges must actually bite: fewer BPE tokens than letters overall
    val (tok, let) = joined
      .agg(sum("n_bpe_tokens"), sum(length(col("letters"))))
      .as[(Long, Long)].first()
    assert(tok < let, s"12 merges must compress: $tok vs $let")
    joined.unpersist(); enc.unpersist()
  }

  test("durable BPE model: fit-free encode, frozen-word fallback, crash heal") {
    import spark.implicits._
    val store = "/tmp/graft_bpe_model"
    def wipe(pth: String): Unit = { new scala.reflect.io.Directory(
      new java.io.File(pth)).deleteRecursively(); () }
    Seq(store, store + "__bpe_tmp", store + "__swap_old", store + "_stage")
      .foreach(wipe)
    Corpus.writeBpeModel(spark, Sf, store)
    // merge table round-trips
    val m1 = Corpus.bpeTrain(spark, Sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getString(1), r.getString(2),
        r.getAs[Long]("cnt"))).sortBy(_._1).toSeq
    val m2 = Corpus.readBpeMerges(spark, store).collect()
      .map(r => (r.getAs[Long]("rank"), r.getString(1), r.getString(2),
        r.getAs[Long]("cnt"))).sortBy(_._1).toSeq
    assert(m1 == m2)
    // on the training corpus, the persisted-model encode IS the
    // in-session encode
    def dump(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens"), r.getAs[String]("bpe_text")))
      .sortBy(_._1).toSeq
    assert(dump(Corpus.bpeEncodeAgainst(spark, Sf, store)) ==
      dump(Corpus.bpeEncode(spark, Sf)))
    // frozen tokenizer on NOVEL words: the stored merges apply to the
    // character split — expectation replayed driver-side with the same
    // single-pass merge
    val novel = Seq((1L, "zzqq erer", "s")).toDF("doc_id", "text", "source")
    def applyAll(w: String): Seq[String] =
      m2.foldLeft(w.map(_.toString).toArray) { (s, m) =>
        Corpus.bpeMergeLocal(s, m._2, m._3) }.toSeq
    val exp = applyAll("zzqq") ++ applyAll("erer")
    val got = dump(Corpus.bpeEncodeAgainstFrom(spark, novel, store))
    assert(got == Seq((1L, 2L, exp.length.toLong, exp.mkString(" "))),
      s"expected $exp, got $got")
    // mid-swap crash: live dir set aside, tmp COMPLETE — a read heals
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + "__bpe_tmp"))
    assert(Corpus.readBpeMerges(spark, store).count() == m2.length.toLong)
    // a partial tmp next to the healed live store: a reader serves the
    // live store and never deletes the tmp (may be a live writer's);
    // the next writer entry cleans it
    val tmp = new org.apache.hadoop.fs.Path(store + "__bpe_tmp")
    fs.mkdirs(new org.apache.hadoop.fs.Path(tmp, "merges"))
    assert(Corpus.readBpeMerges(spark, store).count() == m2.length.toLong)
    assert(fs.exists(tmp), "a reader must never delete a tmp")
    Corpus.writeBpeModel(spark, Sf, store)
    assert(!fs.exists(tmp), "writer entry must clean partial tmp debris")
  }

  test("dedup_spans: planted repeated spans, positional fractions, short-doc rule") {
    import spark.implicits._
    val span = (1 to 20).map(i => s"w$i").mkString(" ")
    def uniq(i: Int) = (1 to 10).map(j => s"u${i}x$j").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq(1)} $span ${uniq(2)}", "s"),
      (2L, s"${uniq(3)} $span ${uniq(4)}", "s"),
      (3L, uniq(5), "s"),
      (4L, "tiny twin", "s"),
      (5L, "tiny twin", "s")).toDF("doc_id", "text", "source")
    val out = Corpus.dedupSpansFrom(docs, n = 15, minDocs = 2, flagFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 5)
    // doc 1: 40 tokens → 26 positional 15-grams; the shared 20-token span
    // occupies positions 10..29, so a gram is duplicated iff it starts in
    // [10, 15] — exactly 6 (boundary grams mix unique prefix/suffix tokens)
    assert(out(1L).getAs[Long]("n_grams") == 26L)
    assert(out(1L).getAs[Long]("n_dup_grams") == 6L)
    assert(!out(1L).getAs[Boolean]("is_flagged"), "6/26 is below the 0.5 flag")
    assert(out(2L).getAs[Long]("n_dup_grams") == 6L)
    assert(out(3L).getAs[Long]("n_grams") == 1L &&
      out(3L).getAs[Long]("n_dup_grams") == 0L)
    // byte-identical short docs collapse to one whole-doc gram each and
    // count each other: fraction exactly 1, flagged
    Seq(4L, 5L).foreach { id =>
      assert(out(id).getAs[Double]("dup_fraction") == 1.0)
      assert(out(id).getAs[Boolean]("is_flagged"))
    }
    // real corpus: bounds hold and the planted exact-dup docs flag
    val real = Corpus.dedupSpans(spark, Sf).collect()
    assert(real.forall(r =>
      r.getAs[Long]("n_dup_grams") <= r.getAs[Long]("n_grams")))
    assert(real.exists(_.getAs[Boolean]("is_flagged")),
      "the corpus's exact-dup docs must flag at fraction 1")
  }

  test("dedup_spans_removal: planted span excised from BOTH docs, order kept") {
    import spark.implicits._
    val span = (1 to 20).map(i => s"w$i").mkString(" ")
    def uniq(i: Int) = (1 to 10).map(j => s"u${i}x$j").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq(1)} $span ${uniq(2)}", "s"),
      (2L, s"${uniq(3)} $span ${uniq(4)}", "s"),
      (3L, uniq(5), "s"),
      (4L, "tiny twin", "s"),
      (5L, "tiny twin", "s")).toDF("doc_id", "text", "source")
    val out = Corpus.dedupSpansRemovalFrom(docs, n = 15, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 5)
    // docs 1/2: dup grams start in [10, 15] and each covers 15 tokens, so
    // the covered set is exactly positions 10..29 — the planted span, and
    // ONLY the planted span, excised from BOTH docs; survivors reassemble
    // in original order
    Seq(1L -> (uniq(1), uniq(2)), 2L -> (uniq(3), uniq(4))).foreach {
      case (id, (pre, post)) =>
        assert(out(id).getAs[Long]("n_tokens") == 40L)
        assert(out(id).getAs[Long]("n_tokens_kept") == 20L)
        assert(out(id).getAs[String]("clean_text") == s"$pre $post",
          s"doc $id must lose exactly the span: ${out(id)}")
    }
    // doc 3 shares nothing: untouched
    assert(out(3L).getAs[Long]("n_tokens_kept") == 10L)
    assert(out(3L).getAs[String]("clean_text") == uniq(5))
    // byte-identical short docs erase each other entirely (whole-doc
    // gram covers every position) but STAY in the output as empty docs
    Seq(4L, 5L).foreach { id =>
      assert(out(id).getAs[Long]("n_tokens") == 2L)
      assert(out(id).getAs[Long]("n_tokens_kept") == 0L)
      assert(out(id).getAs[String]("clean_text") == "")
    }
    // the audit verdict is PRESERVED next to the removal: same corpus,
    // non-destructive fractions still served (the dedup_spans contract)
    val audit = Corpus.dedupSpansFrom(docs, n = 15, minDocs = 2, flagFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(audit(1L).getAs[Long]("n_dup_grams") == 6L &&
      !audit(1L).getAs[Boolean]("is_flagged"))
    // removal ∘ audit fixpoint: after dropping fully-erased docs (the
    // downstream predicate — an empty string is one empty token and two
    // of them would trivially "share" the empty gram), re-auditing the
    // cleaned corpus finds NO remaining cross-doc repeated span (Lee
    // '21's postcondition)
    val cleaned = Corpus.dedupSpansRemovalFrom(docs, n = 15, minDocs = 2)
      .where(col("n_tokens_kept") > 0)
      .select(col("doc_id"), col("clean_text").as("text"))
    val re = Corpus.dedupSpansFrom(cleaned, n = 15, minDocs = 2).collect()
    assert(re.forall(_.getAs[Long]("n_dup_grams") == 0L),
      s"no repeated span may survive removal: ${re.mkString(";")}")
  }

  test("bpe_fertility: totals reconcile with bpe_encode, fertility bounds") {
    val fert = Corpus.bpeFertility(spark, Sf).collect()
    assert(fert.nonEmpty)
    fert.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0, s"a word is ≥1 token: $r")
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
    }
    val fw = fert.map(_.getAs[Long]("n_words")).sum
    val ft = fert.map(_.getAs[Long]("n_bpe_tokens")).sum
    val enc = Corpus.bpeEncode(spark, Sf)
      .agg(sum("n_words"), sum("n_bpe_tokens")).collect()(0)
    assert(fw == enc.getLong(0) && ft == enc.getLong(1),
      "per-source totals must equal the per-doc encoding's totals")
  }

  test("dsir_weights: driver-side replay, target ranking, smooth empty target") {
    import spark.implicits._
    // target (en) speaks {aa, bb}, background adds {cc, dd} — an en-like
    // doc must outscore a cc/dd doc, and the exact scores replay from the
    // published formula driver-side
    val docs = Seq(
      (1L, "aa aa bb", "en"),
      (2L, "aa bb bb", "en"),
      (3L, "cc cc dd", "xx"),
      (4L, "aa cc", "xx"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", when(col("doc_id") <= 2, "en").otherwise("xx"))
    val out = Corpus.dsirWeightsFrom(docs, targetLang = "en", minCount = 1,
      maxVocab = 1000).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_vocab_tokens"), r.getAs[Double]("log_ratio"))).toMap
    // replay: vocab = all 4 tokens; counts — tgt: aa 3, bb 3; bg: aa 4,
    // bb 3, cc 3, dd 1 (totals 6 and 11, V = 4)
    def pt(c: Long) = (c + 1.0) / (6.0 + 4.0)
    def pb(c: Long) = (c + 1.0) / (11.0 + 4.0)
    def lr(ct: Long, cb: Long) = math.log(pt(ct) / pb(cb))
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == rnd(2.0 * lr(3, 4) + 1.0 * lr(3, 3)))
    assert(out(3L)._2 == rnd(2.0 * lr(0, 3) + 1.0 * lr(0, 1)))
    // target-likeness ranks: pure-en docs above mixed above pure-xx
    assert(out(1L)._2 > out(4L)._2 && out(4L)._2 > out(3L)._2,
      s"ranking violated: $out")
    // empty target split degrades to uniform p_target, no crash
    val empt = Corpus.dsirWeightsFrom(docs, targetLang = "zz", minCount = 1,
      maxVocab = 1000).collect()
    assert(empt.length == 4)
    // real corpus: the raw sum is length-biased by design (DSIR scores
    // are unnormalized log ratios), so the corpus-level law is PER-TOKEN
    // discrimination — the en target's mean per-token ratio must exceed
    // the non-en mean
    val real = Corpus.dsirWeights(spark, Sf).cache()
    val langOf = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("lang"))
    val byLang = real.join(langOf, Seq("doc_id"))
      .groupBy(col("lang") === "en")
      .agg(avg(col("log_ratio") / col("n_vocab_tokens")).as("per_tok"))
      .collect().map(r => r.getBoolean(0) -> r.getAs[Double]("per_tok")).toMap
    assert(byLang(true) > byLang(false),
      s"en docs must out-score non-en per token: $byLang")
    real.unpersist()
  }

  test("token_zipf: exact power law recovered, r2 NULL on zero variance") {
    import spark.implicits._
    // freq(rank r) = 840/r for r = 1..8 — an EXACT Zipf corpus (all
    // integer frequencies), so the log-log OLS fit is slope −1, r² 1
    val zipfDocs = (1 to 8).map { r =>
      (r.toLong, (s"t$r " * (840 / r)).trim, "s0")
    }.toDF("doc_id", "text", "source")
    val fit = Corpus.tokenZipfFrom(zipfDocs, minCount = 2, topRanks = 200)
      .collect()
    assert(fit.length == 1)
    assert(fit(0).getAs[Long]("n_ranks") == 8L)
    assert(math.abs(fit(0).getAs[Double]("slope") + 1.0) < 1e-6,
      s"exact 1/r corpus must fit slope −1, got ${fit(0)}")
    assert(math.abs(fit(0).getAs[Double]("r2") - 1.0) < 1e-6)
    // all-equal frequencies: zero y-variance ⇒ slope 0, r² NULL
    val flat = (1 to 5).map { r => (r.toLong, s"u$r u$r", "s0") }
      .toDF("doc_id", "text", "source")
    val ffit = Corpus.tokenZipfFrom(flat, minCount = 2, topRanks = 200)
      .collect()(0)
    assert(math.abs(ffit.getAs[Double]("slope")) < 1e-6)
    assert(ffit.isNullAt(ffit.fieldIndex("r2")),
      "zero y-variance must yield NULL r², not a 0/0 artifact")
    // real corpus: every source fits a negative slope with r² ∈ (0, 1]
    val real = Corpus.tokenZipf(spark, Sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getAs[Double]("slope") < 0.0, s"non-negative slope: $r")
      val r2 = r.getAs[Double]("r2")
      assert(r2 > 0.0 && r2 <= 1.0, s"r² out of range: $r")
      assert(r.getAs[Long]("n_ranks") >= 3L && r.getAs[Long]("n_ranks") <= 200L)
    }
  }

  test("source_jsd: metric laws — identity, bounds, separation, coverage") {
    import spark.implicits._
    // A and B share the exact token distribution, C is disjoint text
    val docs = Seq(
      (1L, ("alpha beta gamma alpha beta " * 40).trim, "A"),
      (2L, ("alpha beta gamma alpha beta " * 40).trim, "B"),
      (3L, ("delta epsilon zeta delta epsilon " * 40).trim, "C"),
      (4L, ("delta epsilon zeta delta epsilon " * 40).trim, "C"))
      .toDF("doc_id", "text", "source")
    val jsd = Corpus.sourceJsdFrom(docs, minCount = 1, maxVocab = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("jsd_bits")).toMap
    assert(jsd.size == 3, "3 sources must emit C(3,2) pairs")
    assert(jsd(("A", "B")) == 0.0,
      "identical distributions must sit at exactly 0 bits")
    assert(jsd(("A", "C")) > 0.5 && jsd(("B", "C")) > 0.5,
      s"disjoint vocabularies must separate, got $jsd")
    assert(jsd(("A", "C")) == jsd(("B", "C")),
      "A≡B must be equidistant from C")
    // real corpus: complete pair coverage inside [0, 1]
    val real = Corpus.sourceJsd(spark, Sf).collect()
    val srcs = graft.sources.Tables.documents(spark, Sf)
      .where(col("text").isNotNull)
      .select("source").distinct().count()
    assert(real.length == (srcs * (srcs - 1) / 2).toInt)
    real.foreach { r =>
      val v = r.getAs[Double]("jsd_bits")
      assert(v >= 0.0 && v <= 1.0, s"JSD out of [0,1] bits: $r")
    }
  }

  test("bigram PMI: marginal consistency and the low-frequency floor") {
    val pmi = Corpus.bigramPmi(spark, Sf, minCount = 2, topN = 1000000).cache()
    // marginals cross-validated against groupBy aggregations of the full
    // (uncut) bigram relation — a join plan, not a window plan
    val pairs = Corpus.bigramCounts(spark, Sf, topN = 1000000)
    val m1 = pairs.groupBy("w1").agg(sum("n").as("n1_exp"))
    val m2 = pairs.groupBy("w2").agg(sum("n").as("n2_exp"))
    assert(pmi.join(m1, "w1").where(col("n1") =!= col("n1_exp")).count() == 0)
    assert(pmi.join(m2, "w2").where(col("n2") =!= col("n2_exp")).count() == 0)
    // every surviving pair respects the count floor
    assert(pmi.where(col("n12") < 2).count() == 0)
    // PMI law: recompute from the row's own counts
    val t = pairs.agg(sum("n")).head().getLong(0).toDouble
    val bad = pmi.collect().filter { r =>
      val (n12, n1, n2, p) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      math.abs(p - BigDecimal(math.log(n12 * t / (n1.toDouble * n2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) > 1e-9
    }
    assert(bad.isEmpty, s"PMI law violated: ${bad.take(3).mkString(";")}")
    pmi.unpersist()
  }

  test("ccnet_buckets: per-lang terciles ordered and balanced, full " +
    "coverage, head is the low-perplexity (clean) side") {
    val rows = Corpus.ccnetBuckets(spark, Sf).collect()
      .map(r => (r.getString(1), Option(r.get(2)).map(_ => r.getDouble(2)),
        Option(r.getString(3))))
    // every doc entity reports exactly once
    val nDocs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id").distinct().count()
    assert(rows.length == nDocs)
    // a doc has a bucket iff it has a perplexity
    rows.foreach { case (_, p, b) => assert(p.isDefined == b.isDefined) }
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byB = rs.flatMap(r => r._3.map(_ -> r._2.get))
        .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2) }
      if (byB.keySet == Set("head", "middle", "tail")) {
        // the defining order law: head below middle below tail
        assert(byB("head").max <= byB("middle").min,
          s"$lang: head must not exceed middle")
        assert(byB("middle").max <= byB("tail").min,
          s"$lang: middle must not exceed tail")
        // the sample covers the whole corpus at this sf → near-exact
        // tercile masses (ties at a cutpoint can shift a few docs)
        val n = byB.values.map(_.length).sum
        byB.values.foreach(v => assert(
          math.abs(v.length - n / 3.0) <= math.max(3, n * 0.05),
          s"$lang terciles must be balanced: ${byB.view.mapValues(_.length).toMap}"))
      }
    }
  }

  test("mine_hard_negatives: positives contain every query term, " +
    "negatives lack at least one, both roles present per query") {
    import graft.functions.TextFns
    val mined = Corpus.mineHardNegatives(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byQ = mined.groupBy(_._1)
    assert(byQ.keySet == Corpus.MineQueries.map(_._1).toSet,
      "every mining query yields rows on this corpus")
    // ground truth containment per doc
    val docToks = graft.sources.Tables.documents(spark, Sf)
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        TextFns.wsTokens(TextFns.foldCase(col("text"))).as("tk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toSet).toMap
    val terms = Corpus.MineQueries.toMap.map { case (q, s) =>
      q -> s.split("\\s+").toSet }
    mined.foreach { case (qid, role, _, docId) =>
      val hasAll = terms(qid).subsetOf(docToks(docId))
      if (role == "pos") assert(hasAll, s"pos $qid/$docId must match all terms")
      else assert(!hasAll, s"neg $qid/$docId must miss a term")
    }
    byQ.foreach { case (q, rows) =>
      assert(rows.count(_._2 == "pos") == 1, s"exactly one positive for $q")
      assert(rows.count(_._2 == "neg") > 0, s"negatives exist for $q")
    }
  }
}
