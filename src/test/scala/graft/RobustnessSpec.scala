package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextFns, VecFns}
import graft.operators.{Embeddings, NearDup, TextOps}

/** Null/empty/degenerate input behavior of the column-level functions —
  * at 100 TB every pathological row shape exists somewhere. */
class RobustnessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  private def one[T](c: org.apache.spark.sql.Column, text: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq(Option(text)).toDF("text").select(c.as("v")).head()
  }

  test("redaction passes nulls through and handles empty strings") {
    assert(one(TextFns.redactPii(col("text")), null).isNullAt(0))
    assert(one(TextFns.redactPii(col("text")), "").getString(0) == "")
    assert(one(TextFns.redactSecrets(col("text")), "").getString(0) == "")
  }

  test("embedCol: empty text yields the zero vector, null stays null") {
    val z = one(Embeddings.embedCol(col("text")), "")
    assert(z.getSeq[Double](0).forall(_ == 0.0))
    assert(one(Embeddings.embedCol(col("text")), null).isNullAt(0))
  }

  test("shingles of short/empty text degrade to a single shingle") {
    assert(one(NearDup.wordShingles(col("text"), 3), "only two").getSeq[String](0) == Seq("only two"))
    assert(one(NearDup.charShingles(col("text"), 5), "abc").getSeq[String](0) == Seq("abc"))
    assert(one(NearDup.wordShingles(col("text"), 3), null).isNullAt(0))
  }

  test("simhash/minhash of empty token lists are defined and deterministic") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq.empty[String]).toDF("toks")
      .select(NearDup.simhashSig(col("toks")).as("s"),
        NearDup.minhashSig(col("toks"), 8).as("m"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == rows(1).getLong(0))
    assert(rows(0).getSeq[Long](1) == rows(1).getSeq[Long](1))
  }

  test("vector kernels: mismatched lengths use the shorter prefix, nulls propagate") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    assert(df.select(VecFns.dot(col("a"), col("b"))).head().getDouble(0) == 14.0)
    val n = Seq((Option.empty[Seq[Double]], Option(Seq(1.0))))
      .toDF("a", "b").select(VecFns.dot(col("a"), col("b")))
    assert(n.head().isNullAt(0))
  }

  test("morton key is bijective on 16-bit pairs and preserves quadrant order") {
    import graft.expressions.BitInterleave.{morton, spread}
    val r = new scala.util.Random(13)
    val pairs = Seq.fill(2000)((r.nextInt(1 << 16), r.nextInt(1 << 16)))
    // injective: distinct pairs -> distinct keys (spread is invertible)
    assert(pairs.distinct.map { case (a, b) => morton(a, b) }.distinct.size ==
      pairs.distinct.size)
    // the two operands occupy disjoint bit positions
    pairs.foreach { case (a, b) =>
      assert((spread(a) & (spread(b) << 1)) == 0L)
      assert(morton(a, b) == (spread(a) | (spread(b) << 1)))
    }
    // quadrant locality: every key of the low-low quadrant sorts before
    // any key of the high-high quadrant (the property file pruning uses)
    val lo = for (a <- 0 until 8; b <- 0 until 8) yield morton(a, b)
    val hi = for (a <- 8 until 16; b <- 8 until 16) yield morton(a, b)
    assert(lo.max < hi.min, s"${lo.max} !< ${hi.min}")
  }

  test("lang_id tolerates empty and whitespace-only text") {
    val r = one(TextOps.langIdCol(col("text")), "   ")
    assert(r.getString(0) != null) // some deterministic label, no crash
    assert(one(TextOps.langIdCol(col("text")), null).isNullAt(0) ||
      one(TextOps.langIdCol(col("text")), null).getString(0) != null)
    // "" is the ANSI landmine: length 0 means the CJK ratio is 0/0 — the
    // guarded branch must fall through to the stopword tie → "en" (the
    // oracle path: DuckDB 0/0 → NULL, NULL > 0.3 not true, same ELSE)
    assert(one(TextOps.langIdCol(col("text")), "").getString(0) == "en")
  }

  test("validEmb admits exactly the finite full-dimension vectors") {
    import spark.implicits._
    val dim = Embeddings.EmbeddingDim
    val good = Seq.fill(dim)(0.5)
    val cases: Seq[(Seq[Double], Boolean, String)] = Seq(
      (good, true, "clean"),
      (Seq.fill(dim)(0.0), true, "all-zero is VALID (zero-norm guards handle it downstream)"),
      (good.updated(0, Double.NaN), false, "NaN element"),
      (good.updated(dim - 1, Double.PositiveInfinity), false, "Inf element"),
      (Seq.empty[Double], false, "empty"),
      (good.take(dim / 2), false, "truncated"))
    cases.foreach { case (v, expect, why) =>
      val got = Seq(Tuple1(v)).toDF("embedding")
        .select(Embeddings.validEmb(col("embedding")).as("ok"))
        .head().getBoolean(0)
      assert(got == expect, why)
    }
    // a NULL element invalidates the vector (nullable list cells)
    val withNull = Seq(Tuple1(good.init.map(Option(_)) :+ Option.empty[Double]))
      .toDF("embedding")
      .select(Embeddings.validEmb(col("embedding")).as("ok"))
      .head()
    assert(withNull.isNullAt(0) || !withNull.getBoolean(0), "NULL element")
  }

  test("value percentiles rank only the finite values; NaN/Inf still count rows") {
    import spark.implicits._
    // 1..100 plus planted NaN/±Inf/out-of-range: percentiles must equal
    // the finite subset's (both engines exclude non-finite from the rank
    // base — Spark would sort NaN greatest, DuckDB drops NaN but keeps
    // Inf, so neither native behavior can match the other), n_events
    // counts every row, and the job must not abort under ANSI
    val finite = (1 to 100).map(i => ("a", i.toDouble))
    val weird = Seq(("a", Double.NaN), ("a", Double.PositiveInfinity),
      ("a", Double.NegativeInfinity))
    val out = graft.operators.Relational.valuePercentilesFrom(
        (finite ++ weird).toDF("event_type", "value"))
      .collect().head
    val ref = graft.operators.Relational.valuePercentilesFrom(
        finite.toDF("event_type", "value"))
      .collect().head
    Seq(1, 2, 3).foreach { i =>   // columns: (event_type, p50, p90, p99, avg_value, n_events)
      assert(out.getDouble(i) == ref.getDouble(i),
        s"percentile col $i: ${out.getDouble(i)} vs finite-only ${ref.getDouble(i)}")
    }
    assert(out.getLong(5) == 103L, s"n_events counts all rows: ${out.getLong(5)}")
  }

  test("long-document axis: a 10^6-token doc survives the per-doc buffers; " +
      "chunk -> encode composition stays green") {
    import spark.implicits._
    import graft.operators.Corpus
    // one multi-MB doc (10^6 letters-only tokens, cycled 8-word
    // vocabulary) — the pathological single document that pressures every
    // per-doc aggregation buffer: bpe_encode's collect_list, the dsir
    // per-doc fold, dedup_spans' gram explosion
    val n = 1000000
    val vocab = Array("alpha", "bravo", "charlie", "delta",
      "echo", "foxtrot", "golf", "hotel")
    val sb = new java.lang.StringBuilder(n * 8)
    var i = 0
    while (i < n) { if (i > 0) sb.append(' '); sb.append(vocab(i % 8)); i += 1 }
    val docs = Seq((1L, sb.toString, "s", "en"),
      (2L, "bravo charlie tiny", "s", "de"))
      .toDF("doc_id", "text", "source", "lang")
    // tokenizer trained elsewhere (the serving contract); the 8 novel
    // words take the frozen-merge fallback on every occurrence
    val model = "/tmp/graft_longdoc_bpe"
    Corpus.writeBpeModel(spark, SparkTest.Sf, model)

    // (a) the designed mitigation — chunk, then encode the chunks: every
    // buffer is bounded by maxTokens, not by document length
    val chunks = Corpus.chunkDocumentsFrom(docs, maxTokens = 512, overlap = 8)
      .select(concat(col("doc_id"), col("chunk_idx")).cast("long").as("doc_id"),
        col("chunk_text").as("text"), col("n_chunk_tokens"))
      .persist()
    // doc 2 (3 tokens) is exactly one chunk; the rest are the big doc's
    val nChunks = chunks.count() - 1
    assert(nChunks == math.ceil((n - 8).toDouble / 504).toLong,
      s"chunk count: $nChunks")
    val encChunks = Corpus.bpeEncodeAgainstFrom(spark, chunks, model)
    val encTotal = encChunks.agg(sum("n_words")).collect()(0).getLong(0)
    // chunks overlap by 8 tokens: each boundary re-encodes 8 words
    assert(encTotal == n + 8L * (nChunks - 1) + 3L,
      s"chunked encode must cover every token: $encTotal")
    chunks.unpersist()

    // (b) survival pin for the UNCHUNKED path: one 10^6-struct
    // aggregation buffer (sorted reassembly) — bounded by doc length by
    // design, and an 8g driver survives 10^6; chunk_documents remains
    // the documented mitigation for docs beyond that
    val whole = Corpus.bpeEncodeAgainstFrom(spark, docs, model)
      .where(col("doc_id") === 1L).collect().head
    assert(whole.getAs[Long]("n_words") == n.toLong)
    assert(whole.getAs[Long]("n_bpe_tokens") >= n.toLong)

    // (c) the gram explosion collapses map-side: the cycled vocabulary
    // yields only 8 distinct 15-grams for the big doc, so the (doc, gram)
    // relation is tiny even though 10^6 positional grams exploded
    val spans = Corpus.dedupSpansFrom(docs, n = 15, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(spans(1L).getAs[Long]("n_grams") == (n - 14).toLong)
    assert(spans(1L).getAs[Long]("n_dup_grams") == 0L,
      "nothing cross-doc repeats here")

    // (d) the dsir per-doc fold runs over DISTINCT vocab tokens (8 for
    // the big doc), never the raw token stream
    val dsir = Corpus.dsirWeightsFrom(docs, targetLang = "en", minCount = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(dsir(1L).getAs[Long]("n_vocab_tokens") == n.toLong)
  }
}
