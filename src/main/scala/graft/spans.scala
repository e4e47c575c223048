package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Column DSL over span structs — the engine's equivalent of the
 * reference's SpanArray kernels (`array/span.py`). Everything here is a
 * pure Catalyst expression tree: whole-stage-codegen friendly, no UDFs.
 */
object spans {

  /** Build a span struct column from begin/end columns. */
  def span(begin: Column, end: Column): Column =
    struct(begin.cast("int").as("begin"), end.cast("int").as("end"))

  def span(begin: Int, end: Int): Column = span(lit(begin), lit(end))

  /** Token-span struct with both token and char offsets. */
  def tokenSpan(beginTok: Column, endTok: Column, begin: Column, end: Column): Column =
    struct(beginTok.cast("int").as("begin_tok"), endTok.cast("int").as("end_tok"),
      begin.cast("int").as("begin"), end.cast("int").as("end"))

  /**
   * Span overlap predicate (reference: array/span.py:226-242, 1061-1094).
   * Identical zero-length spans count as overlapping; otherwise overlap is
   * NOT (disjoint). Callers must additionally require same-document.
   */
  def overlaps(a: Column, b: Column): Column =
    (a("begin") === b("begin") && a("end") === b("end")) ||
      !(b("begin") >= a("end") || b("end") <= a("begin"))

  /** `a` contains `b` (reference: array/span.py:244-252, 1096-1116). */
  def containsSpan(a: Column, b: Column): Column =
    b("begin") >= a("begin") && b("end") <= a("end")

  /** `a` strictly before `b` (reference: array/span.py:175-201). */
  def before(a: Column, b: Column): Column = a("end") <= b("begin")

  /** Minimal span covering both (Span.__add__, array/span.py:76-101). */
  def spanAdd(a: Column, b: Column): Column =
    span(least(a("begin"), b("begin")), greatest(a("end"), b("end")))

  /** GroupBy aggregate: minimal span covering the group
    * (the reference's span `sum` reduce, array/span.py:816-842). */
  def spanSum(s: Column): Column =
    struct(min(s("begin")).as("begin"), max(s("end")).as("end"))

  /**
   * Text covered by the span, given the document text column
   * (array/span.py:994-1014). SQL substring is 1-based.
   */
  def coveredText(text: Column, s: Column): Column =
    substring(text, s("begin") + 1, s("end") - s("begin"))

  /** Lowercased covered text — the dictionary-matching key
    * (array/span.py:1016-1029). */
  def normalizedCoveredText(text: Column, s: Column): Column =
    lower(coveredText(text, s))

  /** `before[covered]after` context window (array/span.py:254-269). */
  def context(text: Column, s: Column, numChars: Int): Column = concat(
    substring(text, greatest(lit(1), s("begin") + 1 - numChars),
      least(s("begin"), lit(numChars))),
    lit("["), coveredText(text, s), lit("]"),
    substring(text, s("end") + 1, lit(numChars)))

  /**
   * Reference string form of a span — `[begin, end): 'covered'`
   * (Span.__repr__, array/span.py:146-153; TokenSpan keeps char offsets
   * under its default USE_TOKEN_OFFSETS_IN_REPR=False,
   * array/token_span.py:188-200). A NULL span renders as `NA`. The covered
   * text is whitespace-collapsed and word-truncated to 80 chars exactly as
   * `textwrap.shorten(·, 80)`: the longest word-boundary prefix of length
   * ≤ 74 (80 minus the ` [...]` placeholder) followed by the placeholder,
   * or the bare placeholder when even the first word overflows. The greedy
   * prefix is one substring+regexp (strip the word crossing position 75),
   * equivalent to shorten's wrap(max_lines=1) drop-from-the-end loop.
   */
  def spanToString(text: Column, s: Column): Column = {
    val collapsed = regexp_replace(trim(coveredText(text, s)), "\\s+", " ")
    val prefix = rtrim(regexp_replace(substring(collapsed, 1, 75), "[^ ]*$", ""))
    val short = when(length(collapsed) <= 80, collapsed)
      .otherwise(when(length(prefix) > 0, concat(prefix, lit(" [...]")))
        .otherwise(lit("[...]")))
    when(s.isNull, lit("NA"))
      .otherwise(format_string("[%d, %d): '%s'", s("begin"), s("end"), short))
  }

  /** Null-span test (reference sentinel begin==end==-1 → SQL NULL,
    * array/span.py:718-723). */
  def spanIsNa(s: Column): Column = s.isNull

  /** Shift a span by a constant offset — `unpack_semijoin`
    * (spanner/join.py:206-244). */
  def shift(s: Column, offset: Column): Column =
    span(s("begin") + offset, s("end") + offset)
}
