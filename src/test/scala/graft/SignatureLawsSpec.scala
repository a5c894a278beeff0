// calibration spec appended at the bottom of this suite (r16)
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Embeddings, NearDup}

/** Statistical laws of the signature kernels, checked against brute-force
  * ground truth on constructed corpora — the verification angle for
  * operators whose outputs are engine-specific (no SQL oracle).
  */
class SignatureLawsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("minhash signature agreement estimates true Jaccard (±0.15, 128 perms)") {
    import spark.implicits._
    val r = rng(7)
    // pairs with controlled overlap: share k of 60 tokens
    val cases = Seq(10, 30, 50).map { k =>
      val shared = (1 to k).map(i => s"s$i")
      val a = shared ++ (1 to (60 - k)).map(i => s"a$i")
      val b = shared ++ (1 to (60 - k)).map(i => s"b$i")
      (r.shuffle(a).mkString(" "), r.shuffle(b).mkString(" "))
    }
    val df = cases.toDF("ta", "tb").select(
      NearDup.minhashSig(NearDup.wordShingles(col("ta"), 1), 128).as("sa"),
      NearDup.minhashSig(NearDup.wordShingles(col("tb"), 1), 128).as("sb"),
      (size(array_intersect(NearDup.wordShingles(col("ta"), 1), NearDup.wordShingles(col("tb"), 1))).cast("double") /
        size(array_union(NearDup.wordShingles(col("ta"), 1), NearDup.wordShingles(col("tb"), 1))).cast("double")).as("trueJ"),
      (size(zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)).alias("z")) * lit(0)).as("dummy"))
    // estimated J = fraction of matching signature positions — via the
    // native kernel the LSH verify path uses, and the HOF formulation
    // (they must agree exactly: same definition)
    val est = df.select(col("trueJ"),
      (aggregate(zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1.0).otherwise(0.0)),
        lit(0.0), (acc, x) => acc + x) / lit(128.0)).as("estJ"),
      NearDup.minhashJaccard(col("sa"), col("sb")).as("kernelJ")).collect()
    est.foreach { row =>
      val (t, e) = (row.getDouble(0), row.getDouble(1))
      assert(math.abs(t - e) < 0.15, s"true=$t est=$e")
      assert(row.getDouble(2) == e, s"kernel must equal the HOF estimator: $row")
    }
  }

  test("simhash hamming distance orders pairs by similarity") {
    import spark.implicits._
    val base = (1 to 80).map(i => s"w$i")
    def text(change: Int) =
      (base.take(80 - change) ++ (1 to change).map(i => s"x$i")).mkString(" ")
    val df = Seq((0, text(0)), (5, text(5)), (40, text(40))).toDF("change", "t")
      .select(col("change"), NearDup.simhashSig(
        graft.functions.TextFns.wsTokens(lower(col("t")))).as("sig"))
    val sigs = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val h0 = java.lang.Long.bitCount(sigs(0) ^ sigs(0))
    val h5 = java.lang.Long.bitCount(sigs(0) ^ sigs(5))
    val h40 = java.lang.Long.bitCount(sigs(0) ^ sigs(40))
    assert(h0 == 0 && h5 < h40, s"hamming must grow with edits: $h0 $h5 $h40")
  }

  test("feature-hash embedding: cosine reflects textual overlap") {
    import spark.implicits._
    val shared = (1 to 50).map(i => s"c$i").mkString(" ")
    val df = Seq(
      ("orig", shared + " extra1 extra2"),
      ("near", shared + " other1 other2"),
      ("far", (1 to 52).map(i => s"z$i").mkString(" "))
    ).toDF("k", "t").select(col("k"), Embeddings.embedCol(col("t")).as("e"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val near = cos(m("orig"), m("near"))
    val far = cos(m("orig"), m("far"))
    assert(near > 0.7, s"overlapping docs must be similar, got $near")
    assert(far < 0.4, s"disjoint docs must be dissimilar, got $far")
    assert(near > far)
  }

  test("winnow fingerprints: shared substrings produce shared fingerprints") {
    import spark.implicits._
    val core = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      ("a", "PREFIX " + core),
      ("b", core + " SUFFIX"),
      ("c", "completely unrelated content with different characters entirely")
    ).toDF("k", "t").select(col("k"),
      org.apache.spark.sql.graft.Bridge.column(graft.expressions.WinnowFingerprints(
        org.apache.spark.sql.graft.Bridge.expression(lower(col("t"))), 5, 4)).as("fps"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val abShared = (m("a") & m("b")).size.toDouble / (m("a") | m("b")).size
    val acShared = (m("a") & m("c")).size.toDouble / (m("a") | m("c")).size
    assert(abShared > 0.5, s"docs sharing a long substring must share fingerprints: $abShared")
    assert(acShared < 0.1, s"unrelated docs must not: $acShared")
  }

  test("containment flags embedded docs asymmetrically, not their containers") {
    import spark.implicits._
    val inner = (1 to 40).map(i => s"inner$i").mkString(" ")
    val container = s"header text before $inner trailing boilerplate after"
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, inner), (2L, container), (3L, unrelated))
      .toDF("doc_id", "text")
    val out = graft.operators.NearDup.dedupContainmentFrom(docs, thr = 0.8)
      .collect().map(r => r.getLong(0) -> r).toMap
    // the embedded doc is flagged, pointing at its container
    assert(out(1L).getBoolean(4), s"inner doc must be contained: ${out(1L)}")
    assert(out(1L).getLong(2) == 2L)
    // the container shares the same fingerprints but relative to its OWN
    // (larger) fingerprint set — below threshold: asymmetry is the point
    assert(!out(2L).getBoolean(4), s"container must not be flagged: ${out(2L)}")
    assert(!out(3L).getBoolean(4), s"unrelated doc must not be flagged: ${out(3L)}")
  }

  test("incremental dedup flags batch docs already indexed; only batch rows surface") {
    import spark.implicits._
    def sigBase(docs: Seq[(Long, String)]) = {
      val sh = NearDup.wordShingles(col("text"), 3)
      docs.toDF("doc_id", "text").select(
        col("doc_id").as("id"),
        NearDup.minhashSig(sh, 128).as("sig"),
        NearDup.minhashBandKeys(sh, 32, 4).as("keys"))
    }
    val body = (1 to 50).map(i => s"tok$i").mkString(" ")
    val corpus = sigBase(Seq(
      (100L, body),
      (101L, (1 to 50).map(i => s"ref$i").mkString(" "))))
    val batch = sigBase(Seq(
      (1L, body + " tail1 tail2"),                       // near-copy of 100
      (2L, (1 to 50).map(i => s"new$i").mkString(" ")))) // genuinely new
    val out = graft.operators.NearDup.dedupIncrementalFrom(batch, corpus, thr = 0.8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L), s"one summary row per BATCH doc only: ${out.keySet}")
    assert(out(1L).getBoolean(4) && out(1L).getLong(2) == 100L,
      s"near-copy must be flagged against its indexed twin: ${out(1L)}")
    assert(!out(2L).getBoolean(4), s"new content must pass: ${out(2L)}")
  }

  test("on-disk signature index serves later-job increments without re-signing") {
    import spark.implicits._
    val idx = "/tmp/graft_sig_index"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(idx)).deleteRecursively()
    graft.operators.NearDup.writeSignatureIndex(spark, SparkTest.Sf, idx)
    assert(spark.read.parquet(s"$idx/docs").count() ==
      graft.sources.Tables.documents(spark, SparkTest.Sf).count())
    // a "later job": fresh docs checked against the store — one indexed
    // doc's near-copy and one new doc
    val indexed = graft.sources.Tables.documents(spark, SparkTest.Sf)
      .where(col("text").isNotNull)
      .orderBy(col("doc_id")).limit(1)
      .select(col("doc_id"), col("text")).head()
    val batch = Seq(
      (900001L, indexed.getString(1) + " tail tail"),
      (900002L, (1 to 50).map(i => s"zz$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.operators.NearDup
      .dedupIncrementalAgainst(spark, idx, batch, thr = 0.7)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(900001L).getBoolean(4) &&
      out(900001L).getLong(2) == indexed.getLong(0),
      s"near-copy of an indexed doc must be flagged: ${out(900001L)}")
    assert(!out(900002L).getBoolean(4), s"new content passes: ${out(900002L)}")
  }

  test("signature-index erasure: tombstone serving equals an index built without the subjects; compaction makes it physical") {
    import spark.implicits._
    import scala.reflect.io.Directory
    val idx = "/tmp/graft_sig_erase"
    val scratch = "/tmp/graft_sig_erase_scratch"
    Seq(idx, scratch).foreach(p =>
      new Directory(new java.io.File(p)).deleteRecursively())
    val docs = graft.sources.Tables.documents(spark, SparkTest.Sf)
    graft.operators.NearDup.writeSignatureIndex(spark, SparkTest.Sf, idx)
    // from-scratch reference: index built WITHOUT the subjects — the
    // word3 base is session-memoized, so filter its persisted relation
    // (same signatures by construction)
    val subjects = docs.where(pmod(col("doc_id"), lit(9L)) === 8L)
      .select(col("doc_id"))
    graft.operators.NearDup.eraseSignatureDocs(spark, idx, subjects)
    graft.operators.NearDup.eraseSignatureDocs(spark, idx, subjects) // replay
    val near = docs.where(col("text").isNotNull)
      .orderBy(col("doc_id")).limit(40)
      .collect().map(r => (900000L + r.getLong(0),
        r.getString(1) + " tail tail")).toSeq
    val batch = near.toDF("doc_id", "text")
    def verdicts(p: String) = graft.operators.NearDup
      .dedupIncrementalAgainst(spark, p, batch, thr = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toSet
    val erasedServe = verdicts(idx)
    // scratch = the store as if built without the subjects
    val baseMinus = graft.operators.Shuffles.distinctEntities(
      docs.where(col("doc_id").isNull ||
        pmod(col("doc_id"), lit(9L)) =!= 8L))
    graft.operators.NearDup.writeSignatureIndexFrom(
      baseMinus.where(col("text").isNotNull).select(
        col("doc_id").as("id"),
        graft.operators.NearDup.minhashSig(
          graft.operators.NearDup.wordShingles(col("text"), 3), 128).as("sig"),
        graft.operators.NearDup.minhashBandKeys(
          graft.operators.NearDup.wordShingles(col("text"), 3), 32, 4).as("keys")),
      scratch)
    assert(erasedServe == verdicts(scratch),
      "tombstone serving diverged from the minus-subjects rebuild")
    // at least one near-copy of a SUBJECT doc must have flipped clean
    // (the batch clones the first 40 docs; residue 8 appears among them)
    val flipped = near.filter(_._1 % 9 == (900000L + 8) % 9)
    assert(flipped.nonEmpty)
    // physical: compaction drops the subject rows and retires tombstones
    graft.operators.NearDup.compactSignatureIndex(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones").exists(),
      "tombstones must retire once physical")
    assert(spark.read.parquet(s"$idx/docs")
      .where(pmod(col("id"), lit(9L)) === 8L).count() == 0L)
    assert(spark.read.parquet(s"$idx/keys")
      .where(pmod(col("id"), lit(9L)) === 8L).count() == 0L)
    assert(verdicts(idx) == erasedServe, "compaction changed served verdicts")
  }

  test("bucketed key index partition-prunes a small increment's scan") {
    import spark.implicits._
    // reuses the index written by the previous test (rebuild if absent —
    // ScalaTest runs suites' tests in order, but don't depend on it)
    val idx = "/tmp/graft_sig_index"
    if (!new java.io.File(s"$idx/keys").exists())
      graft.operators.NearDup.writeSignatureIndex(spark, SparkTest.Sf, idx)
    val batch = Seq(
      (910001L, (1 to 40).map(i => s"pp$i").mkString(" ")),
      (910002L, (1 to 40).map(i => s"qq$i").mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id").as("id"),
        graft.operators.NearDup.minhashBandKeys(
          graft.operators.NearDup.wordShingles(col("text"), 3), 32, 4).as("keys"))
    val pruned = graft.operators.NearDup.prunedKeyIndex(spark, idx, batch)
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val filesRead = scan.metrics("numFiles").value
    def countFiles(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(countFiles).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    val totalFiles = countFiles(new java.io.File(s"$idx/keys"))
    // 2 docs × 32 band keys touch ≤ 64 of the 256 buckets; the corpus's
    // 16k keys populate (nearly) all of them — the flat layout would read
    // every file, the bucketed one must read under half
    assert(totalFiles > 100, s"corpus should populate most buckets: $totalFiles")
    assert(filesRead > 0 && filesRead <= 64,
      s"increment scan must prune to its own buckets: $filesRead of $totalFiles")
    assert(filesRead < totalFiles / 2,
      s"pruned read ($filesRead) must beat the flat layout ($totalFiles)")
  }

  test("signature index write is atomic: a crashed swap never splits the pair") {
    import spark.implicits._
    val idx = "/tmp/graft_sig_index_crash"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(idx)).deleteRecursively()
    def sigs(rows: Seq[(Long, String)]) = {
      val sh = graft.operators.NearDup.wordShingles(col("text"), 3)
      rows.toDF("doc_id", "text").select(col("doc_id").as("id"),
        graft.operators.NearDup.minhashSig(sh, 128).as("sig"),
        graft.operators.NearDup.minhashBandKeys(sh, 32, 4).as("keys"))
    }
    val v1 = sigs(Seq(1L -> (1 to 40).map(i => s"aa$i").mkString(" ")))
    graft.operators.NearDup.writeSignatureIndexFrom(v1, idx)
    val p = new org.apache.hadoop.fs.Path(idx)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash state: mid-swap — v2 tmp is COMPLETE (root _SUCCESS), the
    // live index was already set aside. The next increment must heal to
    // v2, not probe v1 keys against v2 docs or die on a missing path.
    val v2 = sigs(Seq(2L -> (1 to 40).map(i => s"bb$i").mkString(" ")))
    graft.operators.NearDup.writeSignatureIndexFrom(v2, idx + "_stage")
    fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + "__swap_old"))
    fs.rename(new org.apache.hadoop.fs.Path(idx + "_stage"),
      new org.apache.hadoop.fs.Path(idx + "__index_tmp"))
    val batch = Seq((900003L, (1 to 40).map(i => s"bb$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.operators.NearDup
      .dedupIncrementalAgainst(spark, idx, batch, thr = 0.7)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(900003L).getBoolean(4) && out(900003L).getLong(2) == 2L,
      s"healed index must be the complete v2 pair: ${out(900003L)}")
    // a partial tmp (no root _SUCCESS) next to a live index: a READER
    // serves the live index untouched and must NOT delete the tmp — it
    // cannot tell crash debris from a concurrent writeSignatureIndex's
    // in-flight output (the IVF/HLL store contract). The next WRITER
    // entry cleans it.
    val tmp2 = new org.apache.hadoop.fs.Path(idx + "__index_tmp")
    fs.mkdirs(new org.apache.hadoop.fs.Path(tmp2, "docs"))
    val out2 = graft.operators.NearDup
      .dedupIncrementalAgainst(spark, idx, batch, thr = 0.7)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out2(900003L).getBoolean(4), s"live index survives: ${out2(900003L)}")
    assert(fs.exists(tmp2),
      "a reader must never delete a tmp (it may be a live writer's)")
    graft.operators.NearDup.writeSignatureIndexFrom(v2, idx)
    assert(!fs.exists(tmp2), "writer entry must clean partial tmp debris")
  }

  test("bucket index is the exact upper-bound count, monotone, NaN-last") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val r = rng(11)
    val bounds = Array.fill(63)(r.nextDouble() * 100).sorted
    def idx(v: Double): Int =
      graft.expressions.BucketIndex.upperBound(
        ArrayData.toArrayData(bounds), v)
    // law: result == |{b : b <= v}| for arbitrary probes incl. the bounds
    val probes = Array.fill(200)(r.nextDouble() * 120 - 10) ++ bounds
    probes.foreach { v =>
      assert(idx(v) == bounds.count(_ <= v), s"upper bound wrong at $v")
    }
    // monotone in v; NaN routes to the last bucket (Spark sorts NaN greatest)
    val sortedProbes = probes.sorted
    sortedProbes.sliding(2).foreach { case Array(a, b) =>
      assert(idx(a) <= idx(b))
    }
    assert(idx(Double.NaN) == bounds.length)
    assert(idx(Double.NegativeInfinity) == 0)
    assert(idx(Double.PositiveInfinity) == bounds.length)
    // duplicate boundaries collapse their buckets consistently
    val dup = ArrayData.toArrayData(Array(1.0, 5.0, 5.0, 9.0))
    assert(graft.expressions.BucketIndex.upperBound(dup, 5.0) == 3)
    assert(graft.expressions.BucketIndex.upperBound(dup, 4.9) == 1)
  }

  test("adversarial boilerplate corpus: candidate pairs stay bounded, clones still found") {
    import spark.implicits._
    // the degenerate key distribution that turns an uncapped LSH band
    // join quadratic: 30% of docs share ONE template (identical body,
    // unique suffix) and 5% are byte-identical. An uncapped self-join on
    // the template's band keys alone emits C(300,2) = 44,850 pairs; the
    // hot-bucket cap (kn <= MaxBucket=64 keep-first) must drop those
    // keys while the kn >= 2 prefilter keeps the mostly-unique rest off
    // the join entirely. The byte-identical clones (50 docs, all keys
    // kn=50 <= 64) stay IN: C(50,2) = 1,225 pairs, every one a true dup.
    val boiler = Seq.fill(3)("release checklist all systems nominal " +
      "heartbeat check completed status green no anomalies detected in " +
      "the last collection window escalation not required on call " +
      "rotation unchanged dashboards quiet").mkString(" ")
    val clone = "identical boilerplate banner line repeated verbatim " +
      "across the whole fleet every shard every zone"
    val r = rng(7)
    def uniqueText(i: Int): String =
      Seq.fill(30)(s"w${r.nextInt(100000)}").mkString(" ")
    val docs = (0 until 1000).map { i =>
      val text =
        if (i % 20 == 7) clone
        else if (i % 10 < 3) s"$boiler unit $i of fleet ${i % 7}"
        else uniqueText(i)
      (i.toLong, text)
    }.toDF("id", "text")
    val sh = NearDup.wordShingles(col("text"), 3)
    val base = docs.select(col("id"),
      NearDup.minhashSig(sh, 128).as("sig"),
      NearDup.minhashBandKeys(sh, 32, 4).as("keys")).persist()
    try {
      val pairs = NearDup.scoredPairs(base, NearDup.minhashJaccard).persist()
      val nPairs = pairs.count()
      // bound: clone pairs (1,225) + whatever the capped template keys
      // admit (keep-first-64 per key -> <= C(64,2) per band) + noise.
      // An uncapped join would exceed 44,850 from the template alone.
      assert(nPairs <= 10000,
        s"candidate pairs must stay bounded under boilerplate skew: $nPairs")
      assert(nPairs >= 1225, s"clone pairs must survive the caps: $nPairs")
      // recall on the planted byte-identical clones: every clone doc is
      // flagged with estimated similarity 1.0 (identical signatures)
      val summary = NearDup.lshSummary(base, NearDup.minhashJaccard, 0.8)
      val cloneFlags = summary.where(col("doc_id") % 20 === 7)
      assert(cloneFlags.count() == 50)
      assert(cloneFlags.where(col("is_dup") && col("best_sim") === 1.0).count() == 50,
        "every byte-identical clone must be flagged at sim 1.0")
      // the 65% unique docs must produce NO false dup flags — random
      // 30-token texts share no 3-shingles, and the kn >= 2 prefilter
      // keeps their singleton keys off the join entirely
      val uniqFlags = summary.where(col("doc_id") % 20 =!= 7 && col("doc_id") % 10 >= 3)
      assert(uniqFlags.where(col("is_dup")).count() == 0,
        "unique docs must not be dragged into dup flags by hot-bucket noise")
      // DOCUMENTED TRADE, asserted so it can't drift silently: the
      // 300-doc template cluster's band keys are hot (kn > MaxBucket=64)
      // and DROPPED — pairwise LSH deliberately refuses the quadratic
      // cluster; a corpus like this is the dedup_lines / dedup_exact
      // path's job (boilerplate line removal + byte-identical grouping).
      // If keep-first capping replaces drop-hot someday, this bound and
      // the nPairs bound above are the numbers to re-derive.
      val tmplPairs = pairs
        .where(col("id_a") % 10 < 3 && col("id_a") % 20 =!= 7 &&
          col("id_b") % 10 < 3 && col("id_b") % 20 =!= 7).count()
      assert(tmplPairs < 44850L,
        s"template cluster must not pair quadratically: $tmplPairs")
    } finally { base.unpersist(); () }
  }

  test("boilerplate pair bound holds at bench scale (10x corpus)") {
    import spark.implicits._
    // The 1,000-doc bound above is asserted at sf0.01 size; bucket COUNT
    // grows with the corpus while the hot-bucket cap is per-bucket, so
    // this replays the same executed-plan assertion on an sf0.1-sized
    // replica (10,000 docs, same 30% template / 5% clone mix). Two
    // things change at this size, both by design:
    //  - the clone cluster is now 500 byte-identical docs, so its band
    //    keys cross MaxBucket=64 and are DROPPED like the template's —
    //    pairwise LSH refuses EVERY quadratic cluster regardless of
    //    whether it's boilerplate or clones; identical docs are
    //    dedup_exact's job, which runs first in the pipeline.
    //  - genuine near-dup PAIRS (the workload LSH exists for) must still
    //    be found: 100 planted pairs with ~1-token diffs, keys kn=2.
    // The pair bound itself must NOT scale with the corpus: same 10k
    // ceiling as the 1x test.
    val boiler = Seq.fill(3)("release checklist all systems nominal " +
      "heartbeat check completed status green no anomalies detected in " +
      "the last collection window escalation not required on call " +
      "rotation unchanged dashboards quiet").mkString(" ")
    val clone = "identical boilerplate banner line repeated verbatim " +
      "across the whole fleet every shard every zone"
    val r = rng(17)
    val pairBase = (0 until 100).map(g =>
      g -> Seq.fill(30)(s"p${g}x${r.nextInt(100000)}").mkString(" ")).toMap
    val docs = (0 until 10000).map { i =>
      val text =
        if (i % 100 == 13) pairBase(i / 100)
        else if (i % 100 == 14) pairBase(i / 100) + " tail"
        else if (i % 20 == 7) clone
        else if (i % 10 < 3) s"$boiler unit $i of fleet ${i % 7}"
        else Seq.fill(30)(s"w${r.nextInt(1000000)}").mkString(" ")
      (i.toLong, text)
    }.toDF("id", "text")
    val sh = NearDup.wordShingles(col("text"), 3)
    val base = docs.repartition(4).select(col("id"),
      NearDup.minhashSig(sh, 128).as("sig"),
      NearDup.minhashBandKeys(sh, 32, 4).as("keys")).persist()
    try {
      val nPairs = NearDup.scoredPairs(base, NearDup.minhashJaccard).count()
      info(s"10x boiler corpus: $nPairs candidate pairs (bound 10000; " +
        "uncapped template cluster alone would be C(3000,2) = 4,498,500)")
      assert(nPairs <= 10000,
        s"pair bound must not scale with the corpus: $nPairs at 10x")
      assert(nPairs >= 100, s"planted pairs must survive: $nPairs")
      val summary = NearDup.lshSummary(base, NearDup.minhashJaccard, 0.8)
      val planted = summary.where(col("doc_id") % 100 === 13 ||
        col("doc_id") % 100 === 14)
      assert(planted.count() == 200)
      assert(planted.where(col("is_dup")).count() == 200,
        "every planted near-dup pair member must be flagged")
      // the oversized clone cluster is REFUSED (hot keys dropped) — the
      // documented escalation boundary to dedup_exact, asserted so it
      // can't silently change shape
      val cloneFlags = summary.where(col("doc_id") % 20 === 7 &&
        col("doc_id") % 100 =!= 13 && col("doc_id") % 100 =!= 14)
      assert(cloneFlags.where(col("n_candidates") > 0).count() == 0,
        "a 500-copy clone cluster crosses the cap and must be refused " +
          "(dedup_exact's job), not partially paired")
    } finally { base.unpersist(); () }
  }

  test("minhash calibration: planted mid-similarity pairs spread the " +
    "error bands; laws hold (pairs conserved, both <= each side)") {
    import spark.implicits._
    // 30 pairs of docs sharing a prefix of 3-shingles with a per-pair
    // unique suffix — exact Jaccard lands mid-range (~0.45-0.65), where
    // the 128-perm estimate has real variance (SE ~ 0.035), unlike the
    // corpus's exact-dup candidates (err_band 0, trivially calibrated)
    val words = (0 until 40).map(i => s"w$i")
    val docs = (0 until 30).flatMap { p =>
      val shared = words.take(22).mkString(" ")
      val a = shared + " " + (0 until 12).map(j => s"a${p}x$j").mkString(" ")
      val b = shared + " " + (0 until 12).map(j => s"b${p}x$j").mkString(" ")
      Seq((p * 2L, a), (p * 2L + 1, b))
    }.toDF("doc_id", "text")
    val cal = NearDup.minhashCalibrationFrom(docs, 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val totalPairs = cal.map(_._2._1).sum
    assert(totalPairs >= 20, s"the shared prefixes must pair: $totalPairs")
    cal.foreach { case (band, (n, est, ex, both)) =>
      assert(band >= 0 && n > 0)
      assert(both <= math.min(est, ex),
        s"band $band: agreement bounded by each side")
    }
    // mid-similarity estimates genuinely differ from exact somewhere:
    // at least one pair outside band 0 OR a confusion asymmetry exists
    val spread = cal.exists(_._1 > 0) ||
      cal.exists { case (_, (_, est, ex, _)) => est != ex }
    assert(spread, s"mid-range similarities must show estimator noise: ${cal.mkString(";")}")
  }
}
