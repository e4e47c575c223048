package graft

import org.apache.spark.sql.types._

/**
 * Core data model for the span-analytics engine.
 *
 * Design (SURVEY.md §1, §7.3): spans are plain `StructType` columns —
 * `struct<begin:int, end:int>` char offsets, half-open `[begin, end)` —
 * carried next to a `doc_id` column. Document text lives in a normalized
 * `documents(doc_id, text, ...)` table instead of the reference's per-array
 * StringTable dictionary (reference: array/span.py:337-411,
 * array/thing_table.py:31-150). A NULL struct is "not a span" (the
 * reference's begin==end==-1 sentinel, array/span.py:109-118); SQL null
 * propagation then matches the reference's "all NAs equal / skip" rules.
 *
 * Token spans materialize both token offsets (`begin_tok`, `end_tok`,
 * half-open in token ids) and char offsets at construction, as the
 * reference derives lazily (array/token_span.py:859-892).
 */
object types {

  /** Char-offset span struct: [begin, end) over the doc's text. */
  val spanType: StructType = StructType(Seq(
    StructField("begin", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))

  /** Token span struct: token ids [begin_tok, end_tok) + derived char span. */
  val tokenSpanType: StructType = StructType(Seq(
    StructField("begin_tok", IntegerType, nullable = false),
    StructField("end_tok", IntegerType, nullable = false),
    StructField("begin", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))

  /** Scalar span for typed Datasets / driver-side assertions. */
  case class Span(begin: Int, end: Int)

  case class TokenSpan(begin_tok: Int, end_tok: Int, begin: Int, end: Int)

  /** One row of a tokens relation (output of [[operators.Tokenize]]). */
  case class Token(doc_id: Long, token_id: Int, begin: Int, end: Int, text: String)

  /** Standard tokens-relation schema. */
  val tokensSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("token_id", IntegerType, nullable = false),
    StructField("span", spanType, nullable = false),
    StructField("text", StringType, nullable = false)))
}
