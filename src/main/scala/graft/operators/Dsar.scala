package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multi-store GDPR-article-17 orchestration — the missing top of the
  * governance story: the five per-store erasure legs (z-table / lexical /
  * IVF / signature / HLL) composed into ONE subject-set request, plus the
  * evidence relation a DSAR workflow files (per store: entities removed,
  * subject rows still present — zero — and entities surviving).
  *
  * The subject set is a USER relation; derived stores erase through the
  * ownership map (here the fixture rule `pmod(id, 20) = user`; in
  * production an ownership dimension joins subjects to their doc/vec
  * ids). Every leg is the store's own erase API — idempotent by content
  * key, replayed once here to prove the no-op — followed by the store's
  * physical compaction, so the evidence numbers measure PHYSICAL
  * absence, not tombstone bookkeeping. The HLL leg is the slice-rebuild
  * erasure ([[Sketches.eraseHllSubject]]): registers are
  * information-theoretically non-decrementable, so its evidence row
  * reports the estimate delta and a by-construction zero for subject
  * presence (no per-subject state exists to probe).
  *
  * Scale shape: each leg is the per-store cost its API already bounds
  * (tombstone writes are request-sized; compactions rewrite only touched
  * directories; the HLL rebuild is one slice). N subjects cost ONE
  * writer entry per store — the batch-erasure contract, orchestrated. */
object Dsar {

  /** The registered entry's subject users (events subjects directly;
    * doc/vec ownership via [[owned]]). */
  private val SubjectUsers = Seq(3L, 9L)
  private val OwnerMod = 20L

  /** The fixture ownership rule: entity `id` belongs to user
    * `pmod(id, 20)` — deterministic, SQL-replayable, and dense enough
    * that every subject owns entities in every store. */
  private def owned(idCol: Column): Column =
    SubjectUsers.map(u => pmod(idCol, lit(OwnerMod)) === lit(u))
      .reduce(_ || _)

  private case class Stores(z: String, lex: String, ivf: String,
      sig: String, hll: String, before: Map[String, Long])

  private val memo = scala.collection.concurrent.TrieMap.empty[
    (SparkSession, String), Stores]

  /** Net indexed-doc count of a lexical store: the stats relation's
    * n_docs sum (erasure legs land negative rows; compaction nets them
    * out — the sum is invariant across that rewrite). */
  private def lexNetDocs(spark: SparkSession, lex: String): Long =
    spark.read.parquet(s"$lex/stats")
      .agg(coalesce(sum(col("n_docs")), lit(0L))).head().getLong(0)

  /** Sum of per-group distinct-user estimates served from the HLL
    * store — the store's one queryable number. */
  private def hllEstSum(spark: SparkSession, hll: String): Long =
    Sketches.mergeHllEstimate(
        Seq(Sketches.readHllSketch(spark, hll)), "est")
      .agg(coalesce(sum(col("est")), lit(0L))).head().getLong(0)

  /** Distinct entity ids in the IVF assignment relation; 0 for the
    * legal empty-corpus store (partitionBy of zero rows writes no
    * bucket dirs — the read would fail, not return empty). */
  private def ivfVecCount(spark: SparkSession, ivf: String,
      pred: Option[Column] = None): Long = {
    if (graft.sources.StoreProtocol.subdirCount(spark, s"$ivf/assign",
        "bucket=") == 0) return 0L
    // NOT NULL mirrors the oracle's count(DISTINCT …) null-exclusion
    val d = spark.read.parquet(s"$ivf/assign")
      .where(col("vec_id").isNotNull)
    pred.fold(d)(d.where(_)).select(col("vec_id")).distinct().count()
  }

  /** Physical event-row count of a z-store (0 for the empty-corpus
    * store, whose data dir holds no fid dirs). */
  private def zRowCount(spark: SparkSession, z: String,
      pred: Option[Column] = None): Long = {
    if (graft.sources.StoreProtocol.subdirCount(spark, s"$z/data",
        "fid=") == 0) return 0L
    val d = spark.read.parquet(s"$z/data")
    pred.fold(d)(d.where(_)).count()
  }

  private def lexSubjectPostings(spark: SparkSession, lex: String): Long = {
    if (graft.sources.StoreProtocol.subdirCount(spark, s"$lex/postings",
        "tb=") == 0) return 0L
    spark.read.parquet(s"$lex/postings").where(owned(col("doc_id"))).count()
  }

  /** Build the five stores fresh, run the ONE subject-set DSAR across
    * all of them (each leg + its replay + physical compaction), and
    * remember the pre-erasure entity counts. Once per (session, dir) —
    * the erased-store entries' memoization convention. */
  private def buildAndErase(spark: SparkSession, dir: String): Stores = {
    memo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    memo.getOrElseUpdate((spark, dir), {
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(64)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val nonce = java.lang.Long.toHexString(
        new java.security.SecureRandom().nextLong())
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_dsar_${safe}_${key}_$nonce").getAbsolutePath
      val (z, lex, ivf, sig, hll) =
        (s"$root/z", s"$root/lex", s"$root/ivf", s"$root/sig", s"$root/hll")
      val ev = Tables.events(spark, dir)
      Relational.writeZorderTable(spark, dir, z)
      LexIndex.writeLexIndex(spark, dir, lex)
      val (assigned, cents) = Embeddings.seededAssignFor(spark, dir)
      Embeddings.writeIvfIndexFrom(assigned, cents, ivf)
      NearDup.writeSignatureIndexFrom(NearDup.word3Base(spark, dir), sig)
      Sketches.writeHllSketch(ev, col("event_type"), col("user_id"), hll)
      val before = Map(
        "zorder" -> zRowCount(spark, z),
        "lex" -> lexNetDocs(spark, lex),
        "ivf" -> ivfVecCount(spark, ivf),
        "sig" -> NearDup.readSigDocs(spark, sig)
          .where(col("id").isNotNull).select(col("id")).distinct().count(),
        "hll" -> hllEstSum(spark, hll))
      // ---- the one request, five legs (each replayed: content-keyed
      // no-op), then physical compaction everywhere one exists ----
      val sp = spark
      import sp.implicits._
      val subjects = SubjectUsers.toDF("user_id")
      Relational.eraseZorderSubjects(spark, z, subjects)
      Relational.eraseZorderSubjects(spark, z, subjects)
      val subjectDocs = Tables.documents(spark, dir)
        .where(owned(col("doc_id"))).select(col("doc_id"), col("text"))
      LexIndex.eraseLexDocs(spark, lex, subjectDocs)
      LexIndex.eraseLexDocs(spark, lex, subjectDocs)
      val subjectVecs = Tables.embeddings(spark, dir)
        .where(owned(col("vec_id"))).select(col("vec_id"))
      Embeddings.eraseIvfVectors(spark, ivf, subjectVecs)
      Embeddings.eraseIvfVectors(spark, ivf, subjectVecs)
      val subjectSigDocs = Tables.documents(spark, dir)
        .where(owned(col("doc_id"))).select(col("doc_id"))
      NearDup.eraseSignatureDocs(spark, sig, subjectSigDocs)
      NearDup.eraseSignatureDocs(spark, sig, subjectSigDocs)
      Sketches.eraseHllSubject(ev,
        col("user_id").isin(SubjectUsers.map(Long.box): _*),
        col("event_type"), col("user_id"), hll)
      Relational.compactZorderStore(spark, z)
      LexIndex.compactLexIndex(spark, lex)
      Embeddings.compactIvfIndex(spark, ivf)
      NearDup.compactSignatureIndex(spark, sig)
      Stores(z, lex, ivf, sig, hll, before)
    })
  }

  /** The registered `dsar_execute` query: the evidence relation of the
    * one-request multi-store DSAR — per store, entities removed
    * (before-minus-after, both MEASURED from the store), subject rows
    * still physically present (must be zero), and surviving entities
    * (untouched data must be exactly what a scratch build without the
    * subjects holds — the oracle derives every number from the raw
    * tables). */
  def dsarExecute(spark: SparkSession, dir: String): DataFrame = {
    val st = buildAndErase(spark, dir)
    val subjEv = col("user_id").isin(SubjectUsers.map(Long.box): _*)
    val zAfter = zRowCount(spark, st.z)
    val zSubj = zRowCount(spark, st.z, Some(subjEv))
    val lexAfter = lexNetDocs(spark, st.lex)
    val lexSubj = lexSubjectPostings(spark, st.lex)
    val ivfAfter = ivfVecCount(spark, st.ivf)
    val ivfSubj = ivfVecCount(spark, st.ivf, Some(owned(col("vec_id"))))
    val sigDocs = NearDup.readSigDocs(spark, st.sig)
      .where(col("id").isNotNull).select(col("id")).distinct()
    val sigAfter = sigDocs.count()
    val sigSubj = sigDocs.where(owned(col("id"))).count()
    val hllAfter = hllEstSum(spark, st.hll)
    val rows = Seq(
      ("zorder", st.before("zorder") - zAfter, zSubj, zAfter),
      ("lex", st.before("lex") - lexAfter, lexSubj, lexAfter),
      ("ivf", st.before("ivf") - ivfAfter, ivfSubj, ivfAfter),
      ("sig", st.before("sig") - sigAfter, sigSubj, sigAfter),
      // no per-subject HLL state exists to probe (registers are
      // non-decrementable; the leg is a rebuild) — zero by construction
      ("hll", st.before("hll") - hllAfter, 0L, hllAfter))
    val sp = spark
    import sp.implicits._
    rows.toDF("store", "entities_removed", "subject_rows_after",
      "entities_after")
  }
}
