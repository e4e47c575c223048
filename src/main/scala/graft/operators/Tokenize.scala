package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic regex tokenizer with the same behavior as the reference's
 * `simple_tokenizer()` (reference: io/spacy.py:48-72): text splits on all
 * whitespace; every ASCII punctuation character (Python `string.punctuation`)
 * is its own single-character token; maximal runs of remaining characters are
 * word tokens. This is the tokenizer the reference recommends for dictionary
 * and regex matching, and dictionary matching REQUIRES the same tokenizer on
 * dict and text (spanner/extract.py:52-55).
 *
 * Output relation: `doc_id, token_id (dense 0..n-1 per doc), span
 * struct<begin,end>, text` — one row per token. The operator is a narrow
 * map+generate (no shuffle): each document row explodes into its tokens on
 * the executor that read it, so it scales linearly with input splits.
 */
object Tokenize {

  /** ASCII punctuation (Python string.punctuation) as regex char-class body. */
  val PunctClass = """!-/:-@\[-`{-~"""

  /** One token = run of non-space non-punct chars, or a single punct char. */
  val TokenPattern = s"[^\\s$PunctClass]+|[$PunctClass]"

  private val compiled = java.util.regex.Pattern.compile(TokenPattern)

  /** Find (begin, end) char offsets of all tokens in a string. Single
    * manual scan (round-21 optimization — shared classifier tables with
    * the TokenizeGenerator hot loop; TokenizerParitySpec pins equality
    * to the regex form). */
  def tokenOffsets(text: String): Seq[(Int, Int)] = {
    if (text == null) return Seq.empty
    import org.apache.spark.sql.graft.TokenizeGenerator.{isPunct, isSpace}
    val n = text.length
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    while (pos < n) {
      if (isSpace(text.charAt(pos))) pos += 1
      else {
        val b = pos
        if (isPunct(text.charAt(pos))) pos += 1
        else {
          pos += 1
          while (pos < n && !isSpace(text.charAt(pos)) &&
            !isPunct(text.charAt(pos))) pos += 1
        }
        buf += ((b, pos))
      }
    }
    buf.toSeq
  }

  /** The regex form tokenOffsets replaced — kept as the parity reference
    * for TokenizerParitySpec. */
  private[graft] def tokenOffsetsRegex(text: String): Seq[(Int, Int)] = {
    if (text == null) return Seq.empty
    val m = compiled.matcher(text)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (m.find()) buf += ((m.start, m.end))
    buf.toSeq
  }

  /**
   * Tokenize a documents relation into the standard tokens relation.
   * `make_tokens` parity (reference: io/spacy.py:75-90). One native
   * Generator pass per document (see expressions/TokenizeGenerator.scala):
   * no UDF boxing, no per-token re-substring of the document.
   */
  def tokens(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      org.apache.spark.sql.graft.TokenizeGenerator(col(textCol)))

  /** Tokens + normalized (lowercase) text — the dictionary-matching key. */
  def normalizedTokens(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    tokens(docs, textCol, idCol).withColumn("normalized_text", lower(col("text")))
}
