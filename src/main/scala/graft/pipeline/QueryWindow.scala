package graft.pipeline

/** Query-string-facing ingest-window config — the reference's callers
  * don't rebuild the NRQL from parts when given an explicit window; they
  * rewrite the SINCE/UNTIL/LIMIT clauses inside the query string itself
  * (/root/reference/main.py:19-27). This is that surface for deployments
  * carrying a raw query template, plus the inverse ([[parse]]) that lifts
  * a window out of such a string onto [[GraftConfig]] — which remains the
  * primary engine-side API (the string form exists for compatibility with
  * reference-style callers, not as the preferred configuration path).
  */
object QueryWindow {
  // main.py:21-23's strip set: any SINCE ... (UNTIL ...), any LIMIT n,
  // any relative-time remnant, then whitespace collapse. Deliberate
  // strengthenings over the reference regexes (which corrupt realistic
  // templates): a window operand may be a quoted multi-word timestamp
  // ('2024-01-02 00:00:00' — the form [[rewrite]] itself emits) or a
  // relative "N unit[s] ago" phrase — `[^ ]+` alone strips only to the
  // first space, orphaning the rest of the clause; and the remnant
  // sweeper accepts singular units and minutes/weeks, not just
  // "hours|days".
  // Every strip pattern carries a quote-parity lookahead: a match must be
  // followed by an EVEN number of single quotes, i.e. it sits outside any
  // string literal — otherwise the sweepers would edit inside a WHERE
  // literal like `note = 'seen 1 minute ago'` and silently change the
  // predicate. (Matches that legitimately contain a whole quoted operand
  // keep parity, so they still strip.)
  private val OutsideQuotes = "(?=(?:[^']*'[^']*')*[^']*$)"
  private val Unit = "(?:second|minute|hour|day|week|month|year)s?"
  private val Operand = s"(?:'[^']*'|\\d+\\s*$Unit\\s+ago|[^ ]+)"
  // \s+ after the keywords, not a single literal space: a double space or
  // tab would otherwise strand the keyword while the sweepers eat its
  // operand, colliding with the appended clause ("SINCE SINCE '...'")
  private val SinceUntil =
    s"(?i)SINCE\\s+$Operand(\\s+UNTIL\\s+$Operand)?$OutsideQuotes".r
  // a standalone UNTIL (valid NRQL without SINCE) must strip too, or the
  // rewrite would orphan the bare keyword
  private val UntilOnly = s"(?i)UNTIL\\s+$Operand$OutsideQuotes".r
  // LIMIT MAX is valid NRQL alongside numeric limits
  private val LimitN = s"(?i)LIMIT\\s+(?:\\d+|MAX)$OutsideQuotes".r
  private val Ago = s"(?i)(\\d+\\s*)?$Unit\\s+ago$OutsideQuotes".r
  private val Ws = "\\s+".r

  /** Rewrite a query template to an explicit window: strip any existing
    * window clauses, collapse whitespace, append `SINCE '<from>' UNTIL
    * '<to>' LIMIT n` (main.py:19-27 semantics). */
  def rewrite(query: String, fromTime: String, toTime: String,
      limit: Int = 1000): String = {
    val stripped = Ws.replaceAllIn(
      Ago.replaceAllIn(LimitN.replaceAllIn(UntilOnly.replaceAllIn(
        SinceUntil.replaceAllIn(query, ""), ""), ""), ""), " ").trim
    s"$stripped SINCE '$fromTime' UNTIL '$toTime' LIMIT $limit"
  }

  /** Lift SINCE '<ts>' UNTIL '<ts>' LIMIT n out of a query string onto the
    * engine config; fields absent from the string keep `base`'s values.
    * The same quote-parity guard the [[rewrite]] sweepers carry: a
    * SINCE/UNTIL/LIMIT phrase INSIDE a string literal (`note = 'set
    * LIMIT 5 ago'`) is data, not a window clause, and must not be lifted.
    * A numeric limit beyond Int range keeps `base.limitCount` (toIntOption,
    * not toInt — an unparseable limit must not throw). */
  def parse(query: String, base: GraftConfig = GraftConfig()): GraftConfig = {
    val sinceR = s"(?i)SINCE\\s+'([^']+)'$OutsideQuotes".r
    val untilR = s"(?i)UNTIL\\s+'([^']+)'$OutsideQuotes".r
    val limitR = s"(?i)LIMIT\\s+(\\d+)$OutsideQuotes".r
    base.copy(
      sinceTs = sinceR.findFirstMatchIn(query).map(_.group(1)).getOrElse(base.sinceTs),
      untilTs = untilR.findFirstMatchIn(query).map(_.group(1)).getOrElse(base.untilTs),
      limitCount = limitR.findFirstMatchIn(query).flatMap(_.group(1).toIntOption)
        .getOrElse(base.limitCount))
  }
}
