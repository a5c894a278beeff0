package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFns

/** Text-analysis operators for the training-data pipeline (SURVEY.md §2,
  * rows 21, 29-32): exact dedup, token counting, quality scoring.
  *
  * Everything is per-row expression work inside whole-stage codegen plus at
  * most one map-side-combined groupBy — scan-bound at 100 TB.
  */
object TextOps {

  /** Exact dedup by content fingerprint: groupBy-min over md5(text).
    * One shuffle on the 16-byte digest (not the full text), keep-first by
    * doc_id — the distributed form of preprocessor.py:30-43's seen-set.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min("doc_id").as("first_doc_id"),
        count("*").as("n_copies"),
        min("n_chars").as("n_chars"))

  /** C4-style line-level cleaning (the public-corpus hygiene pass of
    * Raffel et al. '20 §2.2): keep lines with ≥ `minWords` words (and,
    * when `requirePunct`, a terminal-punctuation ending); the document
    * verdict additionally drops lorem-ipsum and brace-bearing docs
    * (template/code leakage). Emits the cleaned text plus raw/kept line
    * counts and an `is_kept` flag — dropping is a downstream predicate,
    * never destructive here. Pure per-row expression work (split →
    * filter → rejoin), zero shuffles; scan-bound at any scale.
    *
    * `requirePunct` defaults off for the registered query: the synthetic
    * corpus is single-line and unpunctuated, so the punctuation rule
    * would be vacuous there (a spec exercises it on planted multi-line
    * docs); the word-count rule splits the corpus ~35/65. */
  def cleanC4(spark: SparkSession, dir: String, minWords: Int = 40,
      requirePunct: Boolean = false): DataFrame =
    cleanC4From(Tables.documents(spark, dir), minWords, requirePunct)

  private[graft] def cleanC4From(docs: DataFrame, minWords: Int = 40,
      requirePunct: Boolean = false): DataFrame = {
    def lineOk(l: Column): Column = {
      val words = size(split(trim(l), "\\s+")) >= minWords
      if (requirePunct) words && trim(l).rlike("[.!?\"']$") else words
    }
    val kept = filter(split(col("text"), "\n"), lineOk _)
    docs.select(col("doc_id"),
      size(split(col("text"), "\n")).cast("long").as("n_lines_raw"),
      size(kept).cast("long").as("n_lines_kept"),
      array_join(kept, "\n").as("clean_text"),
      coalesce(size(kept) >= 1 &&
        !TextFns.foldCase(col("text")).contains("lorem ipsum") &&
        !col("text").contains("{"), lit(false)).as("is_kept"))
  }

  /** Gopher-rules quality filter (Rae et al. 2021, §A1.1) — the
    * canonical per-rule verdict the composite [[textQuality]] score
    * doesn't expose: word-count window, mean-word-length window,
    * symbol-to-word ratio, bullet-/ellipsis-line fractions,
    * alphabetic-word fraction, and the ≥2-distinct-stopwords test, each
    * as its own boolean next to the conjunction — a curation run reads
    * WHICH rule killed a doc, not just that one did. Non-destructive
    * verdict rows like [[cleanC4]]; a NULL text is `is_kept` false with
    * NULL rule columns, identically in both engines.
    *
    * Pure per-row expression work over one scan — zero shuffles; every
    * count is an integer and every fraction one IEEE division, so the
    * oracle matches bit-for-bit (the [[textQuality]] contract). The
    * distinct-stopword count filters the 10-word engine stopword
    * inventory against the doc's tokens (never the reverse —
    * `array_intersect` multiplicity semantics differ across engines). */
  def qualityGopher(spark: SparkSession, dir: String, minWords: Int = 50,
      maxWords: Int = 100000): DataFrame =
    qualityGopherFrom(Tables.documents(spark, dir), minWords, maxWords)

  /** The ≥2-distinct-stopwords rule runs over the engine's 10-word
    * English stopword inventory ([[graft.functions.TextFns.EnStops]],
    * shared with stopwordHits/lang_id) rather than Gopher's original
    * 8-word list — derived, not copied, so "one stopword vocabulary
    * engine-wide" is enforced by construction. */
  private[graft] val GopherStops: Seq[String] = TextFns.EnStops

  /** The seven Gopher rule columns over a text column, plus the word
    * count and mean word length — ONE definition shared by the
    * [[qualityGopherFrom]] report and the [[Corpus.qualityNb]] teacher
    * labels, so the rule engine and the classifier it trains can never
    * disagree on what "kept" means. */
  private[graft] def gopherRules(text: Column, minWords: Int,
      maxWords: Int): (Column, Column, Seq[Column], Column) = {
    val words = TextFns.wsTokens(TextFns.foldCase(text))
    val nWords = size(words).cast("long")
    val nWordsD = nWords.cast("double")
    // Σ token lengths ≡ chars left after removing all whitespace (the
    // fold is 1:1 so raw-text lengths equal folded-token lengths)
    val meanLen = length(regexp_replace(text, "\\s", ""))
      .cast("double") / nWordsD
    val symbolRatio = size(regexp_extract_all(text,
      lit("(#|\\.\\.\\.|…)"), lit(0))).cast("double") / nWordsD
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val bulletFrac = size(filter(lines,
      l => trim(l).rlike("^[-*•]"))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines,
      l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nLines
    val alphaFrac = size(filter(words,
      w => w.rlike("[a-z]"))).cast("double") / nWordsD
    val nStops = size(filter(
      array(GopherStops.map(lit): _*), s => array_contains(words, s)))
    val rules = Seq(
      nWords >= minWords && nWords <= maxWords,
      meanLen >= lit(3.0) && meanLen <= lit(10.0),
      symbolRatio <= lit(0.1),
      bulletFrac <= lit(0.9),
      ellipsisFrac <= lit(0.3),
      alphaFrac >= lit(0.8),
      nStops >= lit(2))
    val verdict = coalesce(rules.reduce(_ && _), lit(false))
    (nWords, meanLen, rules, verdict)
  }

  /** The Gopher verdict alone, for consumers that train on it. */
  private[graft] def gopherKept(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column =
    gopherRules(text, minWords, maxWords)._4

  private[graft] def qualityGopherFrom(docs: DataFrame, minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val (nWords, meanLen, rules, verdict) =
      gopherRules(col("text"), minWords, maxWords)
    docs.select(col("doc_id"), nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      rules(0).as("ok_word_count"), rules(1).as("ok_mean_word_len"),
      rules(2).as("ok_symbol_ratio"), rules(3).as("ok_bullet_lines"),
      rules(4).as("ok_ellipsis_lines"), rules(5).as("ok_alpha_words"),
      rules(6).as("ok_stopwords"),
      verdict.as("is_kept"))
  }

  /** Token counting: whitespace tokens + BPE-ish pre-tokens + chars. */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextFns.wsTokenCount(col("text")).as("n_ws_tokens"),
        TextFns.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_m"))

  /** Quality scoring: alpha/upper/digit/space/stopword ratios and a
    * composite score. All ratios derive from raw counts in one expression
    * evaluated identically by the oracle, so doubles match bit-for-bit.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val nChars = length(t).cast("double")
    val nWs = TextFns.wsTokenCount(t).cast("double")
    val alpha = TextFns.charClassCount(t, "[A-Za-z]").cast("double")
    val upper = TextFns.charClassCount(t, "[A-Z]").cast("double")
    val digit = TextFns.charClassCount(t, "[0-9]").cast("double")
    val space = TextFns.charClassCount(t, "\\s").cast("double")
    val stop = TextFns.stopwordHits(t).cast("double")
    // NULL on a zero denominator, matching DuckDB's x/0 → NULL — under
    // ANSI a plain divide ABORTS the job on the first empty-string doc.
    // nChars is 0 exactly for "" (nWs can't be: split of an empty trim
    // yields one empty token), so the char ratios and the quality score
    // are NULL for empty docs in both engines.
    def div0(n: Column, d: Column): Column =
      when(d === lit(0.0), lit(null).cast("double")).otherwise(n / d)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      round(div0(alpha, nChars), 4).as("alpha_ratio"),
      round(div0(upper, nChars), 4).as("upper_ratio"),
      round(div0(digit, nChars), 4).as("digit_ratio"),
      round(div0(space, nChars), 4).as("space_ratio"),
      round(div0(stop, nWs), 4).as("stop_ratio"),
      round(div0(nChars, nWs), 4).as("avg_token_len"),
      round(lit(0.4) * div0(alpha, nChars) + lit(0.3) * least(lit(1.0), nWs / lit(50.0)) +
        lit(0.3) * div0(stop, nWs), 4).as("quality_score"))
  }

  /** Stopword inventories for the n-gram/stopword language-ID heuristic.
    * Listed in priority order — earlier languages win score ties. */
  val LangStops: Seq[(String, Seq[String])] = Seq(
    ("en", Seq("the", "and", "of", "to", "in", "is", "it", "you", "that", "for")),
    ("fr", Seq("le", "la", "les", "de", "et", "un", "une", "est", "pour", "que")),
    ("es", Seq("el", "los", "las", "y", "es", "para", "por", "con", "del", "una")),
    ("de", Seq("der", "die", "das", "und", "ist", "von", "zu", "mit", "ein", "nicht")))

  /** RE2-compatible word-boundary pattern counting a language's stopword
    * occurrences — the identical pattern runs in the DuckDB oracle. */
  def stopRe(stops: Seq[String]): String = "\\b(" + stops.mkString("|") + ")\\b"

  /** Language ID: CJK char ratio decides zh; otherwise the language whose
    * stopwords occur most often wins (ties → priority order). Pure per-row
    * regex expression work — a scan at any corpus size, and byte-identical
    * semantics to the SQL oracle.
    */
  def langIdCol(text: Column): Column = {
    val lo = TextFns.foldCase(text)
    val cjk = TextFns.charClassCount(text, "[\\x{4e00}-\\x{9fff}]").cast("double")
    val scored = LangStops.zipWithIndex.map { case ((lang, stops), i) =>
      struct(
        size(regexp_extract_all(lo, lit(stopRe(stops)), lit(0))).as("score"),
        lit(LangStops.size - i).as("prio"), lit(lang).as("lang"))
    }
    // empty text: an ANSI 0/0 divide would abort the job; force the
    // ratio to 0 so the stopword branch decides (all scores 0 → tie →
    // priority order → "en"). Identical to the oracle, where DuckDB's
    // 0/0 yields NULL, NULL > 0.3 is not true, and its CASE falls
    // through the same way. CaseWhen branches evaluate lazily per row,
    // so the divide can't fire on the empty-text rows.
    val cjkRatio = when(length(text) === 0, lit(0.0))
      .otherwise(cjk / length(text).cast("double"))
    when(cjkRatio > 0.3, lit("zh"))
      .otherwise(greatest(scored: _*).getField("lang"))
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // NULL text → NULL prediction (the oracle's NULL comparisons would
      // otherwise fall through its CASE to an arbitrary language)
      .select(col("doc_id"),
        when(col("text").isNotNull, langIdCol(col("text"))).as("pred_lang"),
        col("lang").as("labeled_lang"))

  /** Language-ID evaluation harness — the measured form of "is the
    * classifier good enough to route documents" (retrieval_eval's
    * pairing for the lang_id leg): the full confusion matrix of
    * predicted vs labeled language plus per-labeled-class recall share.
    * NULL prediction (NULL text) and any unexpected labeled value are
    * real matrix cells — an eval that drops them overstates accuracy.
    * One scan + one |langs|²-bounded aggregation; the recall window runs
    * over the matrix relation only. */
  def langIdEval(spark: SparkSession, dir: String): DataFrame = {
    val m = langId(spark, dir)
      .groupBy(col("labeled_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val byLabel = Window.partitionBy(col("labeled_lang"))
    m.withColumn("labeled_total", sum(col("n_docs")).over(byLabel))
      .select(col("labeled_lang"), col("pred_lang"), col("n_docs"),
        col("labeled_total"),
        (col("labeled_lang") <=> col("pred_lang")).as("correct"),
        round(col("n_docs").cast("double") /
          col("labeled_total").cast("double"), 6).as("share"))
  }

  /** Repetition quality filter (the Gopher-rules family): fraction of
    * duplicate lines and duplicate tokens within each document —
    * boilerplate, scraped templates, and degenerate generations score
    * high and get dropped before training. Pure per-row expression work
    * (split, distinct, ratio): a scan at any corpus size, no shuffle.
    * NULL text propagates to NULL ratios in both engines. Per-row ratios
    * are run-order independent, so rounding is safe (SURVEY §5).
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    textRepetitionFrom(Tables.documents(spark, dir))

  private[graft] def textRepetitionFrom(docs: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val toks = TextFns.wsTokens(TextFns.foldCase(col("text")))
    def dupRatio(arr: Column): Column =
      round(lit(1.0) -
        size(array_distinct(arr)).cast("double") / size(arr).cast("double"), 4)
    docs.select(
      col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      dupRatio(lines).as("dup_line_ratio"),
      dupRatio(toks).as("dup_token_ratio"))
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03): rolling
    * k-gram hashes, per-window minima, the distinct minima set is the
    * fingerprint ([[graft.expressions.WinnowFingerprints]], a one-pass
    * native kernel); also folded to one 64-bit digest for cheap equality.
    */
  def docFingerprint(spark: SparkSession, dir: String, k: Int = 5, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val meta = Bridge.column(graft.expressions.WinnowMeta(
      Bridge.expression(TextFns.foldCase(col("text"))), k, w))
    // distinct-entity delivery contract, like every signature operator —
    // with the same kernel-parallelism rationale as the NearDup bases
    // (the winnow kernel grinds every char 5-gram of every doc)
    graft.operators.Shuffles.distinctEntities(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), meta.as("m"))
      // md5 of the sorted fingerprint CSV — a digest both engines can
      // recompute (xxhash64 of an ARRAY hashes Spark's internal layout,
      // which no SQL oracle can mirror)
      .select(col("doc_id"),
        md5(col("m.fps_csv")).as("fingerprint"),
        col("m.n_fps").as("n_fingerprints"))
  }

  /** Per-source PII exposure profile — the audit a corpus needs BEFORE
    * redaction ships ([[graft.functions.TextFns.redactPii]] /
    * `redactSecrets` are the fix; this is the measurement): per source,
    * how many documents contain each PII class and how many total
    * occurrences. The patterns are the reference's own
    * (preprocessor.py:10-11, llm_processor.py:108-109), RE2-compatible so
    * the oracle applies byte-identical regexes. Pure codegen'd scan
    * expressions into one map-side-combined groupBy over |sources| rows —
    * scan-bound at 100 TB. The synthetic corpus is PII-free by
    * construction, so the registered query's counts are all zero (the
    * zero relation is still hash-compared); a spec plants every class
    * and asserts the counts. */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    piiScanFrom(Tables.documents(spark, dir), col("source"))

  private[graft] def piiScanFrom(docs: DataFrame, by: Column): DataFrame = {
    def hits(re: String): Column =
      size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long")
    docs
      .where(col("text").isNotNull)
      .select(by.as("source"),
        hits(TextFns.EmailRe).as("n_email"),
        hits(TextFns.CardRe).as("n_card"),
        hits(TextFns.ApiKeyRe).as("n_api_key"),
        hits(TextFns.TokenRe).as("n_token"))
      .groupBy("source")
      .agg(count("*").as("n_docs"),
        sum(when(col("n_email") + col("n_card") + col("n_api_key") +
          col("n_token") > 0, 1L).otherwise(0L)).cast("long").as("n_docs_pii"),
        sum("n_email").cast("long").as("n_email"),
        sum("n_card").cast("long").as("n_card"),
        sum("n_api_key").cast("long").as("n_api_key"),
        sum("n_token").cast("long").as("n_token"))
  }

  /** Cross-source contamination: exact-duplicate texts appearing under
    * MORE THAN ONE source — the overlap a mixture-weight decision must
    * know about (a doc counted in two sources double-weights its tokens
    * and breaks held-out-by-source evaluation). Same one-digest-shuffle
    * shape as [[dedupExact]] (text never shuffles); the sources list is
    * aggregated sorted+distinct so the output is deterministic. EMPTY on
    * the synthetic corpus by design (hash-compared empty — the
    * template_novelty pattern); a spec plants cross-source dups. */
  def dedupCrossSource(spark: SparkSession, dir: String): DataFrame =
    dedupCrossSourceFrom(Tables.documents(spark, dir))

  private[graft] def dedupCrossSourceFrom(docs: DataFrame): DataFrame =
    docs
      .where(col("text").isNotNull)
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min("doc_id").as("first_doc_id"),
        count("*").as("n_copies"),
        countDistinct("source").as("n_sources"),
        array_join(array_sort(collect_set(col("source"))), ",").as("sources"))
      .where(col("n_sources") > 1)

  /** Corpus-level boilerplate line removal — the exact-line-dedup stage
    * of RefinedWeb/Falcon-style pipelines (and C4's three-sentence rule's
    * blunter cousin): a (trimmed) line occurring in MORE than `maxDocs`
    * distinct documents is boilerplate (nav bars, cookie banners, license
    * headers) and is removed from EVERY document; surviving lines
    * reassemble in original order. Distinct from [[cleanC4]], which
    * judges each line inside its own document only.
    *
    * Scale shape: the counting side shuffles distinct (doc, line-HASH)
    * pairs — 8-byte xxhash64 keys, never raw line text — map-side
    * combined twice (distinct, then count); the removal is a left-anti
    * join on the hash key (AQE broadcasts the boilerplate set when small
    * — it usually is: boilerplate is few distinct lines at high
    * frequency). Only the ordered reassembly shuffles line text, keyed
    * on doc_id — the same unavoidable shuffle corpus_shuffle pays. A
    * 2⁻⁶⁴-per-pair hash collision removes an innocent line; at corpus
    * scale that trade buys a pure-fixed-width counting exchange.
    *
    * Empty lines are preserved verbatim (they are structure, not
    * boilerplate) and never counted. A doc whose every line is removed
    * stays in the output with clean_text = ''. */
  /** Corpus-level source-pair overlap matrix: the exact Jaccard between
    * every two sources' word-3-shingle SETS — the contamination
    * diagnostic one runs before trusting a held-out-by-source split or a
    * mixture weight (two "independent" crawls sharing 40% of their
    * n-grams are one source wearing two names). Complements
    * [[dedupCrossSource]] (doc-level duplicate listing) with the
    * corpus-level statistic.
    *
    * Scale shape: the pairwise work is NEVER doc-pairs — one corpus
    * tokenize pass explodes to (source, gram-HASH) and collapses to the
    * distinct set (8-byte [[Sketches.md5mod]] keys shuffle, raw shingles
    * never do — the dedup_lines trade, and the same pinned md5 family
    * the oracle replays with `md5_number_lower % m`); set sizes and the
    * gram-keyed self-join both run on that collapsed relation behind a
    * lazy lineage cut (one documents scan). A gram shared by S sources
    * joins into C(S,2) pairs — bounded by the |sources|² output itself,
    * not the corpus. Output is the full |sources|² /2 grid (overlap 0
    * included: "these two sources share nothing" is the answer the split
    * designer wants stated, not omitted). */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlapFrom(Tables.documents(spark, dir))

  /** The distinct (source, gram-hash) set behind a lazy lineage cut —
    * shared by [[sourceOverlapFrom]] and [[sourceCommunitiesFrom]] so
    * the overlap matrix and the communities built on it read ONE
    * documents pass and one definition of "gram". */
  private[graft] def sourceGrams(docs: DataFrame): DataFrame = docs
    .where(col("source").isNotNull && col("text").isNotNull)
    .select(col("source"),
      explode(NearDup.wordShingles(col("text"), 3)).as("g"))
    .select(col("source"),
      Sketches.md5mod(col("g"), 2305843009213693951L).as("gh"))
    .distinct()
    .localCheckpoint(false) // sizes + pair join: one documents scan

  private[graft] def sourceSizes(sg: DataFrame): DataFrame =
    sg.groupBy(col("source")).agg(count(lit(1)).cast("long").as("n"))

  private[graft] def sourceInter(sg: DataFrame): DataFrame =
    sg.as("a")
      .join(sg.as("b"),
        col("a.gh") === col("b.gh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).cast("long").as("shared"))

  private[graft] def sourceOverlapFrom(docs: DataFrame): DataFrame = {
    val sg = sourceGrams(docs)
    val sizes = sourceSizes(sg)
    val inter = sourceInter(sg)
    val pairs = sizes
      .select(col("source").as("source_a"), col("n").as("grams_a"))
      .join(sizes.select(col("source").as("source_b"), col("n").as("grams_b")),
        col("source_a") < col("source_b"))
    val shared = coalesce(col("shared"), lit(0L))
    pairs.join(broadcast(inter), Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        col("grams_a"), col("grams_b"), shared.as("n_shared"),
        // union >= 1: every source in the grid owns >= 1 gram
        round(shared.cast("double") /
          (col("grams_a") + col("grams_b") - shared).cast("double"), 6)
          .as("jaccard"))
  }

  /** Source-community detection: fixed-budget min-label components over
    * the [[sourceOverlapFrom]] graph — the actionable form of the
    * overlap matrix ("these five crawls are one corpus wearing five
    * names"); composition of two operators through ONE shared gram
    * relation. Edges are source pairs with Jaccard ≥ 1/10, tested as
    * the exact INTEGER inequality 10·shared ≥ union (no float boundary
    * can flip an edge between engines). Components, NOT weighted LPA:
    * the intended verdict is the transitive closure of "shares ≥10% of
    * its grams", and synchronous LPA provably never merges a symmetric
    * 2-node pair on an even budget (it swaps labels forever — this
    * operator's own spec caught that); min-label is monotone and merges
    * any diameter-≤rounds component deterministically. Isolated and
    * sub-threshold sources keep their own name. Scale: everything after
    * the shared gram cut is |sources|-sized. */
  def sourceCommunities(spark: SparkSession, dir: String,
      rounds: Int = Graphs.LpaRounds): DataFrame =
    sourceCommunitiesFrom(Tables.documents(spark, dir), rounds)

  private[graft] def sourceCommunitiesFrom(docs: DataFrame,
      rounds: Int): DataFrame = {
    val sg = sourceGrams(docs)
    val sizes = sourceSizes(sg)
    val edges = sourceInter(sg)
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n").as("ga"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n").as("gb"))), Seq("source_b"))
      .where(col("shared") * 10 >= col("ga") + col("gb") - col("shared"))
      .select(col("source_a").as("u"), col("source_b").as("v"))
    val labels = Graphs.minLabelComponents(edges, rounds)
    sizes.select(col("source"))
      .join(broadcast(labels.withColumnRenamed("node", "source")),
        Seq("source"), "left")
      .select(col("source"),
        coalesce(col("label"), col("source")).as("community"))
  }

  /** Character-level Shannon entropy over the ASCII [a-z0-9 ] alphabet —
    * the classic gibberish/low-diversity signal next to [[textQuality]]'s
    * ratio heuristics and [[textRepetition]]'s n-gram dup rate: keyboard
    * mash and single-char floods score near 0 bits, natural English sits
    * ~4. Alphabet restricted to ASCII by CONTRACT: per-char splitting is
    * UTF-16 code units on the JVM and codepoints in the oracle engine —
    * an astral char would diverge; [a-z0-9 ] (post-[[TextFns.foldCase]])
    * is identical on both. ln(2) enters as the one shared double literal
    * (two libms may round ln(2) differently; a literal can't).
    *
    * Per-row work is the ONE-PASS native [[graft.expressions.CharEntropy]]
    * kernel (codegen'd byte scan; the original higher-order-function
    * formulation evaluated interpreted at O(len·|alphabet|) per row —
    * the r16 bench caught it at 18.8 s and the kernel rule at the top of
    * TextSigExpressions.scala applied); zero shuffles, scan-bound at any
    * scale. */
  def textEntropy(spark: SparkSession, dir: String): DataFrame =
    textEntropyFrom(Tables.documents(spark, dir))

  private[graft] def textEntropyFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val ln2 = lit(0.6931471805599453) // the double nearest ln 2, verbatim
    val st = Bridge.column(graft.expressions.CharEntropy(
      Bridge.expression(TextFns.foldCase(col("text")))))
    val n = st.getField("n_ascii")
    docs.select(col("doc_id"),
      when(col("text").isNotNull, n).as("n_ascii"),
      when(col("text").isNotNull, st.getField("n_distinct")).as("n_distinct"),
      // + 0.0 canonicalizes the single-char corner: the oracle's
      // list_reduce SEEDS its fold with the first term and yields
      // -(1·ln 1) = -0.0 where a 0.0-init fold yields +0.0 — adding 0.0
      // maps -0.0 -> +0.0 and is exact everywhere else; mirrored in SQL
      when(col("text").isNotNull && n > 0,
        round(st.getField("h") / ln2 + lit(0.0), 4)).as("entropy_bits"))
  }

  def dedupLines(spark: SparkSession, dir: String, maxDocs: Int = 2): DataFrame =
    dedupLinesFrom(Tables.documents(spark, dir), maxDocs)

  private[graft] def dedupLinesFrom(docs: DataFrame, maxDocs: Int): DataFrame = {
    val d = docs.where(col("text").isNotNull).select(col("doc_id"), col("text"))
    val lines = d
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("key", trim(col("line")))
      .withColumn("hk", xxhash64(col("key")))
    val boiler = lines.where(col("key") =!= "")
      .select(col("doc_id"), col("hk")).distinct()
      .groupBy("hk").agg(count("*").as("nd"))
      .where(col("nd") > maxDocs)
      .select("hk")
    // empty-key lines can't match: their hash is never counted into boiler
    val kept = lines.join(boiler, Seq("hk"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(count("*").as("n_lines_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("clean_text"))
    d.select(col("doc_id"),
        size(split(col("text"), "\n")).cast("long").as("n_lines_raw"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines_raw"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
