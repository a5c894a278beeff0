package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFns

/** Durable inverted (lexical) index — the persisted serving store for the
  * BM25 retrieval family, completing the store quartet (signature index /
  * IVF index / HLL slices / BPE model; the reference persists its own
  * retrieval index the same way, faiss_db.py:24-35 read/write_index).
  * Without it every query batch re-scans and re-tokenizes the corpus
  * ([[Corpus.searchBm25]]'s contains() prefilter bounds the EXPLODE cost,
  * but the scan itself is still corpus-sized); against the store, serving
  * cost is ∝ the query's own term postings.
  *
  * Layout (one [[graft.sources.IO.publishStore]] generation — crash-safe
  * as a consistent pair, like every store here):
  *   path/stats       1 row (total_len, n_docs) — the corpus constants
  *   path/postings    (term, doc_id, tf, dl) directory-partitioned by
  *                    tb = md5_number_lower(term) mod [[TermBuckets]],
  *                    one file per non-empty bucket
  *
  * A query batch reads ONLY the bucket directories its own terms hash to
  * (≤ |terms| of [[TermBuckets]] — partition-pruned like the signature
  * index's key buckets), then ranks with the exact scoring tail the scan
  * path uses ([[Corpus.bm25Rank]]): served results are bit-identical to
  * [[Corpus.searchBm25]] over the indexed corpus, so one SQL oracle
  * checks both paths. df per term is derived from the pruned postings
  * themselves (the posting-row count IS the document frequency), so no
  * separate vocabulary relation has to stay consistent with the postings.
  *
  * Scale shape: the build is one tokenize+explode pass map-side combined
  * to (doc, term) — the same linear-shuffle cost build_vocab pays — and
  * serving never scans, never tokenizes, and collects nothing but the
  * ≤ |terms| bucket ids driving the pruning predicate. A fixed query
  * batch against a 16× corpus index reads 16× bigger BUCKETS of the
  * query's terms only — ScaleProbe pins the ≈flat serving wall clock.
  */
object LexIndex {

  /** Postings partition fan-out: 256 directories keeps the pruning
    * ratio high for interactive term counts (|terms| ≪ buckets) without
    * drowning the store in directories — the signature-index constant. */
  val TermBuckets = 256

  /** Column-side term bucket — the pinned md5 family, so the driver twin
    * below replays it exactly. Int-typed: parquet partition discovery
    * reads the directory values back as ints, and the pruning literals
    * must match that type. */
  private[graft] def bucketCol(term: Column): Column =
    Sketches.md5mod(term, TermBuckets.toLong).cast("int")

  /** Driver twin of [[bucketCol]] for the query's literal terms. */
  private[graft] def bucketOf(term: String): Int =
    java.lang.Long.remainderUnsigned(
      graft.expressions.Kernels.md5LowerOf(
        org.apache.spark.unsafe.types.UTF8String.fromString(term)),
      TermBuckets.toLong).toInt

  /** Build + persist the inverted index for a corpus. */
  def writeLexIndex(spark: SparkSession, dir: String, path: String): Unit =
    writeLexIndexFrom(Tables.documents(spark, dir), path)

  private[graft] def writeLexIndexFrom(documents: DataFrame,
      path: String): Unit = {
    val spark = documents.sparkSession
    val docs = documents.where(col("text").isNotNull)
    val toks = TextFns.wsTokens(TextFns.foldCase(col("text")))
    graft.sources.IO.publishStore(spark, path, "__lex_tmp") { tmp =>
      // corpus constants over ALL docs (dl = raw whitespace-token count,
      // the searchBm25 definition — an empty text is one empty token)
      docs.select(size(toks).cast("long").as("dl"))
        .agg(sum(col("dl")).cast("long").as("total_len"),
          count(lit(1)).cast("long").as("n_docs"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stats")
      docs.select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
          explode(col("toks")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).cast("long").as("tf"), max(col("dl")).as("dl"))
        .withColumn("tb", bucketCol(col("term")))
        // one file per bucket directory (the repartition key IS the
        // partition key), not numShufflePartitions files in each
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$tmp/postings")
    }
  }

  /** Serve a BM25 query from a persisted [[writeLexIndex]] store — no
    * corpus scan, no tokenization: the postings read partition-prunes to
    * the ≤ |terms| buckets the query's terms hash to, df comes from the
    * pruned postings, and the ranking is [[Corpus.bm25Rank]] verbatim.
    * Result ≡ [[Corpus.searchBm25]] on the indexed corpus. */
  def searchBm25Against(spark: SparkSession, path: String, query: String,
      topK: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val fs = graft.sources.IO.readableStore(spark, path, "__lex_tmp")
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/stats")),
      s"no lexical index at $path (write one with writeLexIndex)")
    val terms = Corpus.bm25Terms(query)
    val postings = spark.read.parquet(s"$path/postings")
    // an all-whitespace query has no terms: empty result, index-typed
    // schema (the searchBm25 empty-branch contract)
    if (terms.isEmpty)
      return postings.select(col("doc_id"),
        lit(null).cast("long").as("n_terms"),
        lit(null).cast("double").as("score"),
        lit(null).cast("long").as("rk")).limit(0)
    val tbs = terms.map(bucketOf).distinct.sorted
    val tf = postings
      .where(col("tb").isin(tbs.map(Int.box): _*)) // partition pruning
      .where(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    val dfRel = broadcast(
      tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df")))
    val stats = broadcast(spark.read.parquet(s"$path/stats"))
    Corpus.bm25Rank(tf, dfRel, stats, terms, topK, k1, b)
  }

  /** Session memo of a built index per corpus dir: the registered
    * `_served` queries build the store ONCE per (session, corpus) under
    * the JVM temp dir and every later call serves from it — the
    * train-once / serve-many shape the store exists for. */
  private val servedMemo =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), String]

  def servedIndexPath(spark: SparkSession, dir: String): String = {
    servedMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    servedMemo.getOrElseUpdate((spark, dir), {
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val path = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_lex_$safe").getAbsolutePath
      // a new session always rebuilds (publishStore swaps atomically), so
      // a stale store from an earlier JVM can never serve this session
      writeLexIndex(spark, dir, path)
      path
    })
  }
}
