package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecFns
import graft.operators.Embeddings
import graft.sources.Tables

/** Durable IVF index: persistence, fit-free serving, partition-pruned
  * reads, incremental append, and crash recovery — the ANN twin of the
  * signature-index laws (SignatureLawsSpec), and this engine's analog of
  * the reference's FAISS read_index/write_index/add_logs persistence
  * (/root/reference/src/vector_db/faiss_db.py:24-58). */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  private val Sf = "/root/testdata/sf0.01"

  private def corpusDf: DataFrame =
    Tables.embeddings(spark, Sf)
      .where(col("embedding").isNotNull && Embeddings.validEmb(col("embedding")))
      .select(col("vec_id"), VecFns.toDouble(col("embedding")).as("emb"),
        col("label"))

  private def queriesDf: DataFrame =
    corpusDf.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  private def wipe(path: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(path)).deleteRecursively()
    ()
  }

  test("persisted index serves the exact same results as the in-session fit") {
    val idx = "/tmp/graft_ivf_index"
    wipe(idx)
    Embeddings.writeIvfIndex(spark, Sf, idx)
    // same corpus + same seed -> the standalone fit behind the index and
    // the session-memoized fit behind annIvf converge to the same
    // centroids, so served results must be row-identical
    val served = rows(Embeddings.annIvfAgainst(spark, idx, queriesDf))
    val inSession = rows(Embeddings.annIvf(spark, Sf))
    assert(served == inSession,
      s"served-from-disk must equal the in-session fit: " +
        s"only-served=${(served -- inSession).take(3)} " +
        s"only-session=${(inSession -- served).take(3)}")
    assert(served.nonEmpty)
  }

  test("serving reads only the probed bucket partitions") {
    val idx = "/tmp/graft_ivf_index"
    if (!new java.io.File(s"$idx/centroids").exists())
      Embeddings.writeIvfIndex(spark, Sf, idx)
    // 2 queries x nprobe=4 touch <= 8 of the ~22 bucket directories
    val q2 = queriesDf.where(col("qid") < 2)
    val out = Embeddings.annIvfAgainst(spark, idx, q2, nprobe = 4)
    out.collect()
    // AQE wraps the executed tree in childless node shells
    // (AdaptiveSparkPlanExec / QueryStageExec) that TreeNode.collect
    // cannot see through - descend explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case qs: QueryStageExec => scans(qs.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    val scan = scans(out.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("assign")))
      .head
    val filesRead = scan.metrics("numFiles").value
    def countFiles(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(countFiles).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    val totalFiles = countFiles(new java.io.File(s"$idx/assign"))
    assert(totalFiles >= 16, s"sqrt-N centroids should fan out buckets: $totalFiles")
    assert(filesRead > 0 && filesRead <= 8,
      s"serve must prune to probed buckets: read $filesRead of $totalFiles")
  }

  test("append assigns against stored centroids and serves without a refit") {
    val idx = "/tmp/graft_ivf_index_app"
    wipe(idx)
    Embeddings.writeIvfIndex(spark, Sf, idx)
    // increment: an exact clone of an indexed vector (id 10042) - once
    // appended it must surface at cosine 1.0 for its donor query (the
    // clone's argmin bucket equals the donor's, which is always the
    // query's rank-1 probe)
    val donor = corpusDf.where(col("vec_id") === 42)
      .select(lit(10042L).as("vec_id"), col("emb"), col("label"))
    Embeddings.appendIvfIndex(spark, idx, donor)
    val q = corpusDf.where(col("vec_id") === 42)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val out = Embeddings.annIvfAgainst(spark, idx, q).collect()
    assert(out.exists(r => r.getLong(2) == 10042L && r.getDouble(3) == 1.0),
      s"appended clone must surface at cosine 1.0: ${out.mkString(";")}")
    // REPLAYED append (same logical batch twice): duplicate entity rows
    // land in the store; the serving path collapses them - the clone
    // appears ONCE in the top-k, not twice
    Embeddings.appendIvfIndex(spark, idx, donor)
    val ranked = Embeddings.annIvfAgainst(spark, idx, q).collect()
    assert(ranked.count(_.getLong(2) == 10042L) == 1,
      s"replayed append must not duplicate a neighbor: ${ranked.mkString(";")}")
    // and the rank column stays dense 1..k (no duplicate-row gaps)
    assert(ranked.map(_.getLong(1)).sorted.toSeq == (1L to ranked.length).toSeq)
  }

  test("an empty query batch serves the index result schema, not the caller's") {
    val idx = "/tmp/graft_ivf_index"
    if (!new java.io.File(s"$idx/centroids").exists())
      Embeddings.writeIvfIndex(spark, Sf, idx)
    // a caller whose qid is NOT a long: the empty and non-empty paths
    // must still agree column-for-column (vec_id stays the index's long,
    // qid keeps the caller's type)
    val qs = queriesDf.select(col("qid").cast("string").as("qid"), col("qemb"))
    val nonEmpty = Embeddings.annIvfAgainst(spark, idx, qs)
    val empty = Embeddings.annIvfAgainst(spark, idx, qs.limit(0))
    assert(empty.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      nonEmpty.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"empty=${empty.schema.simpleString} nonEmpty=${nonEmpty.schema.simpleString}")
    assert(empty.count() == 0)
    assert(nonEmpty.count() > 0)
  }

  test("a crashed full-index swap heals to one complete generation") {
    import spark.implicits._
    val idx = "/tmp/graft_ivf_index_crash"
    wipe(idx); wipe(idx + "_stage")
    def tinyCorpus(tag: Double) =
      (0 until 40).map { i =>
        val emb = Array.tabulate(Embeddings.Dim)(d =>
          math.sin(i * 17 + d) + tag)
        (i.toLong, emb, i.toLong % 3)
      }.toDF("vec_id", "emb", "label")
    def writeFrom(c: DataFrame, path: String): Unit = {
      val (assigned, cents) = Embeddings.ivfAssignFrom(c, k = 4)
      try Embeddings.writeIvfIndexFrom(assigned, cents, path)
      finally { assigned.unpersist(); () }
    }
    writeFrom(tinyCorpus(0.0), idx)
    val p = new org.apache.hadoop.fs.Path(idx)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash state: mid-swap - v2 tmp is COMPLETE (root _SUCCESS), live
    // index already set aside. The next read must heal to v2, never mix
    // v1 centroids with v2 assignments or die on a missing path.
    writeFrom(tinyCorpus(5.0), idx + "_stage")
    fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(idx + "__swap_old"))
    fs.rename(new org.apache.hadoop.fs.Path(idx + "_stage"),
      new org.apache.hadoop.fs.Path(idx + "__index_tmp"))
    val q = tinyCorpus(5.0).where(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val healed = Embeddings.annIvfAgainst(spark, idx, q, nprobe = 4)
    assert(healed.where(col("rk") === 1).collect().head.getDouble(3) > 0.9,
      "healed index must be the complete v2 generation (v1 vectors would " +
        "score far from a v2 query)")
    // a partial tmp (no root _SUCCESS) next to a live index: a READER
    // serves the live index untouched and must NOT delete the tmp - it
    // cannot tell crash debris from a concurrent writer's in-flight
    // output. The next WRITER entry cleans it.
    val tmp2 = new org.apache.hadoop.fs.Path(idx + "__index_tmp")
    fs.mkdirs(new org.apache.hadoop.fs.Path(tmp2, "centroids"))
    assert(Embeddings.annIvfAgainst(spark, idx, q, nprobe = 4).count() > 0)
    assert(fs.exists(tmp2),
      "a reader must never delete a tmp (it may be a live writer's)")
    writeFrom(tinyCorpus(5.0), idx) // writer entry: heals + rebuilds
    assert(!fs.exists(tmp2), "writer entry must clean partial tmp debris")
  }

  test("a crashed append resumes its move exactly once") {
    import spark.implicits._
    val idx = "/tmp/graft_ivf_index_appcrash"
    wipe(idx)
    def vecs(ids: Seq[Long]) = ids.map { i =>
      (i, Array.tabulate(Embeddings.Dim)(d => math.cos(i * 13 + d)), i % 3)
    }.toDF("vec_id", "emb", "label")
    val (assigned, cents) = Embeddings.ivfAssignFrom(vecs(0L until 30L), k = 4)
    try Embeddings.writeIvfIndexFrom(assigned, cents, idx)
    finally { assigned.unpersist(); () }
    // hand-build the crash state: a COMPLETE increment write (job
    // _SUCCESS present) that died before any file moved
    val inc = vecs(Seq(1000L, 1001L))
    Embeddings.assignAgainst(inc, spark.read.parquet(s"$idx/centroids"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(idx + "__append_tmp")
    val q = vecs(Seq(1000L)).select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val appTmp = new org.apache.hadoop.fs.Path(idx + "__append_tmp")
    // a READER is passive: it serves the last complete generation (no
    // crashed increment visible) and leaves the tmp alone - it may be a
    // concurrent writer's in-flight output
    val served = Embeddings.annIvfAgainst(spark, idx, q, nprobe = 4).collect()
    assert(!served.exists(r => r.getLong(2) == 1001L),
      "a reader must not see (or promote) a crashed increment")
    assert(fs.exists(appTmp), "a reader must never delete an append tmp")
    // the next WRITER entry resumes the crashed move, then lands its own
    // increment - both become visible at once
    Embeddings.appendIvfIndex(spark, idx, vecs(Seq(2000L)))
    val out = Embeddings.annIvfAgainst(spark, idx, q, nprobe = 4).collect()
    assert(out.exists(r => r.getLong(2) == 1001L),
      s"writer entry must promote the crashed increment: ${out.mkString(";")}")
    assert(!fs.exists(appTmp), "promoted append tmp must be gone")
    // appending to a MISSING index fails loudly, it cannot invent one
    intercept[IllegalArgumentException] {
      Embeddings.appendIvfIndex(spark, "/tmp/graft_ivf_nonexistent", inc)
    }
    ()
  }

  test("erasure: tombstone serving equals the same centroids minus the subjects; compaction makes it physical") {
    val idx = "/tmp/graft_ivf_erase"
    val scratch = "/tmp/graft_ivf_erase_scratch"
    wipe(idx); wipe(scratch)
    // ONE fit shared by both stores: identity must isolate the erasure,
    // never a refit (erase the vectors, keep the quantizer)
    val (assigned, cents) = Embeddings.ivfAssignFrom(corpusDf)
    try {
      Embeddings.writeIvfIndexFrom(assigned, cents, idx)
      Embeddings.writeIvfIndexFrom(assigned.where(
        pmod(col("vec_id"), lit(13L)) =!= 2L), cents, scratch)
    } finally { assigned.unpersist(); () }
    val subjects = corpusDf.where(pmod(col("vec_id"), lit(13L)) === 2L)
      .select(col("vec_id"))
    Embeddings.eraseIvfVectors(spark, idx, subjects)
    Embeddings.eraseIvfVectors(spark, idx, subjects) // replayed: no-op
    val q = corpusDf.where(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    def serve(p: String) = rows(Embeddings.annIvfAgainst(spark, p, q, nprobe = 4))
    val erased = serve(idx)
    assert(erased == serve(scratch),
      "tombstone serving diverged from the minus-subjects store")
    assert(erased.forall(_._3 % 13 != 2), "an erased vector surfaced")
    // the tombstone read path must broadcast-anti-join, never shuffle
    val plan = Embeddings.annIvfAgainst(spark, idx, q, nprobe = 4)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("Broadcast"),
      s"tombstone path must broadcast-anti-join:\n$plan")
    // physical: per-bucket two-phase rewrite, tombstones retire, serving
    // unchanged, no subject rows remain anywhere in the assign store
    Embeddings.compactIvfIndex(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones").exists(),
      "tombstones must retire once physical")
    assert(spark.read.parquet(s"$idx/assign")
      .where(pmod(col("vec_id"), lit(13L)) === 2L).count() == 0L,
      "erased subjects must have no physical rows after compaction")
    assert(serve(idx) == erased, "compaction changed served results")
  }
}
