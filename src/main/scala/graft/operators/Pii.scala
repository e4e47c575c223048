package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction for training-data hygiene: flag and mask
 * emails, IPv4 addresses, US-style phone and SSN shapes before a corpus
 * is released to training. (Green-field: the reference has no PII
 * tooling; this is standard large-corpus pipeline practice.)
 *
 * Everything is a codegen'd projection over `regexp_extract_all` /
 * `regexp_replace` — shuffle-free, partition-local, scales linearly with
 * the scan. Patterns deliberately stick to the regex subset whose
 * semantics agree between Java regex (Spark) and RE2 (differential SQL
 * engines): character classes, bounded repetition, and `\b` word
 * boundaries only — no backrefs or lookaround.
 */
object Pii {

  /** type tag → (pattern, replacement token). Redaction applies in this
    * order; the tokens contain no digits so a replacement can never
    * create a match for a later pattern. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP4>"))

  /** Match count of one PII type in a text column; NULL text counts 0
    * (size() of a null array would yield null/-1, poisoning report sums). */
  def count(text: Column, pattern: String): Column =
    when(text.isNull, lit(0))
      .otherwise(size(regexp_extract_all(text, lit(pattern), lit(0))))

  /** Text with every PII occurrence masked by its type token. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /**
   * Per-document PII report: one `n_<type>` count per pattern (counted
   * on the ORIGINAL text, so counts are independent of redaction order)
   * plus the redacted text. Single narrow projection; no shuffle.
   */
  def scan(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val counts = Patterns.map { case (name, pat, _) =>
      count(col(textCol), pat).as(s"n_$name")
    }
    docs.select(col(idCol) +: counts :+
      redact(col(textCol)).as("redacted"): _*)
  }
}
