package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text functions: redaction, tokenization, quality signals.
  *
  * Re-expresses the reference's per-record Python regex work
  * (/root/reference/src/preprocessing/preprocessor.py:9-27,
  * /root/reference/src/llm/llm_processor.py:105-110) as codegen'd Catalyst
  * expressions — `regexp_replace` / `regexp_extract_all` run inside
  * whole-stage codegen, so redaction of 100 TB of logs is a pure scan
  * pipeline with zero shuffles.
  *
  * All patterns are kept RE2-compatible so the DuckDB oracle can apply the
  * byte-identical pattern.
  */
object TextFns {
  /** preprocessor.py:10 */
  val EmailRe = "[\\w.-]+@[\\w.-]+"
  /** preprocessor.py:11 — 13-16 digit card numbers with optional separators */
  val CardRe = "\\b(?:\\d[ -]*?){13,16}\\b"
  /** llm_processor.py:108 */
  val ApiKeyRe = "(?i)api[_-]?key\\s*[:=]\\s*\\w+"
  /** llm_processor.py:109 */
  val TokenRe = "(?i)token\\s*[:=]\\s*\\w+"
  /** Coarse BPE-ish pre-tokenizer: letter runs | digit runs | single symbol */
  val BpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  /** The engine's English stopword inventory — ONE list engine-wide:
    * [[EnStopRe]] (quality scoring via [[stopwordHits]]) and the Gopher
    * ≥2-distinct-stopwords rule both derive from this Seq, so the
    * inventories cannot drift apart. (Lang-id keeps its own per-language
    * discriminative lists — a different job than quality scoring.) */
  val EnStops: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  /** Word-boundary alternation over [[EnStops]]. */
  val EnStopRe: String = "\\b(" + EnStops.mkString("|") + ")\\b"

  /** PII redaction as applied by LogPreprocessor.clean_log. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailRe, "[REDACTED_EMAIL]"),
      CardRe, "[REDACTED_CARD]")

  /** Secret redaction as applied by LLMProcessor._redact before prompts. */
  def redactSecrets(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[REDACTED_EMAIL]"),
        ApiKeyRe, "api_key=[REDACTED]"),
      TokenRe, "token=[REDACTED]")

  /** Whitespace tokens (trim first so neither engine emits edge empties). */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** Case normalization with an engine-pinned Unicode contract: the
    * SIMPLE (one-to-one) Unicode lowercase mapping.
    *
    * JVM `lower` applies the full case mapping, DuckDB/utf8proc the
    * simple one; they disagree on exactly two lowercase paths — U+0130 İ
    * (full: i + combining dot U+0307; simple: plain i) and capital sigma
    * Σ (JVM is context-sensitive, word-final Σ → ς; utf8proc always
    * emits σ). Pinning the SIMPLE mapping makes the oracle side plain
    * `lower(text)` and keeps the Spark side regex-free: `translate` is a
    * per-codepoint 1:1 map (no regex machinery, one pass), so the 100 TB
    * token path pays two cheap char-map passes, not two regex scans.
    * Pre-mapping the CAPITALS İ → i and Σ → σ before lower neutralizes
    * the JVM's one unconditional multi-char lowercase mapping and its
    * one context-sensitive one at the source — and touches nothing
    * else: an input that already contains a final ς stays ς in both
    * engines (lower() is the identity on it). For every character whose
    * simple and full mappings agree this IS plain `lower`.
    *
    * Applies at EVERY site whose lowered text meets a DuckDB `lower` —
    * tokenizers, shingles/fingerprints, stopword scoring, lang-id, and
    * keyword `contains` haystacks — not just the token paths: a JVM
    * lower of "İt" is i+U+0307+t, which `\bit\b` and contains("it")
    * silently fail to match while the oracle's simple lower matches. */
  def foldCase(c: Column): Column =
    lower(translate(c, "İΣ", "iσ"))

  /** Driver-side twin of [[foldCase]] for search NEEDLES. A needle
    * lowered with the JVM full mapping (İ → i+U+0307, word-final Σ → ς)
    * can never match a simple-folded haystack; pre-translating the two
    * divergent capitals makes `toLowerCase` coincide with the simple
    * mapping, so needle and haystack fold identically. Embed THIS form
    * in the oracle SQL too — both engines then compare the same bytes. */
  def foldCase(s: String): String =
    s.replace('İ', 'i').replace('Σ', 'σ')
      .toLowerCase(java.util.Locale.ROOT)

  def wsTokenCount(c: Column): Column = size(wsTokens(c)).cast("long")

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeRe), lit(0))).cast("long")

  /** Count of characters matching a single-char regex class. */
  def charClassCount(c: Column, clsRe: String): Column =
    size(regexp_extract_all(c, lit(clsRe), lit(0))).cast("long")

  def stopwordHits(c: Column): Column =
    size(regexp_extract_all(foldCase(c), lit(EnStopRe), lit(0))).cast("long")
}
