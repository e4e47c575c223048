// Bridge package: see PortableHash.scala — Column↔Expression construction
// requires sql-package access in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst `Generator` for the engine tokenizer: one input document
 * row → one output row per token `(token_id, span struct<begin,end>,
 * text)`, lateral-view style.
 *
 * Replaces the UDF + posexplode + covered-text-substring chain: the UDF
 * path converts UTF8String→String, builds a Seq of Span case classes,
 * round-trips them through the encoder, explodes, and then re-substrings
 * the document per token. Here one pass over the document emits compact
 * InternalRows directly — no case-class reflection, no second substring
 * expression — which matters because ~25 declared queries start from this
 * relation. Generators run inside GenerateExec (eval-mode body, codegen'd
 * consumers), so CodegenFallback here does not break the surrounding
 * whole-stage pipeline.
 *
 * Offsets are CHAR offsets (reference semantics, io/spacy.py:48-72) — the
 * matcher runs on the decoded string, not UTF-8 bytes.
 */
case class TokenizeGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def elementSchema: StructType = StructType(Seq(
    StructField("token_id", IntegerType, nullable = false),
    StructField("span", graft.types.spanType, nullable = false),
    StructField("text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      // Hand-rolled single-pass scanner (round-21 optimization): this
      // generator anchors ~40 declared queries, several of which derive
      // the token relation 3-6x inside one plan, so its per-char cost is
      // the engine's hottest loop. The regex NFA walk it replaces spent
      // ~3x the CPU for the same tokenization; the alternation
      // `[^\s P]+ | [P]` over fixed ASCII classes is exactly: skip \s
      // runs, emit single-char punctuation tokens, emit maximal runs of
      // everything else (TokenizerParitySpec pins equality to the regex
      // on adversarial inputs).
      val s = t.asInstanceOf[UTF8String].toString
      val n = s.length
      new Iterator[InternalRow] {
        private var pos = 0
        private var id = 0
        private def skipSpace(): Unit = {
          while (pos < n && TokenizeGenerator.isSpace(s.charAt(pos))) pos += 1
        }
        skipSpace()
        override def hasNext: Boolean = pos < n
        override def next(): InternalRow = {
          val b = pos
          if (TokenizeGenerator.isPunct(s.charAt(pos))) pos += 1
          else {
            pos += 1
            while (pos < n && !TokenizeGenerator.isSpace(s.charAt(pos)) &&
              !TokenizeGenerator.isPunct(s.charAt(pos))) pos += 1
          }
          val e = pos
          val row = InternalRow(id, InternalRow(b, e),
            UTF8String.fromString(s.substring(b, e)))
          id += 1
          skipSpace()
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeGenerator =
    copy(child = newChild)
}

object TokenizeGenerator {

  /** ASCII punctuation table — the char-class bodies of
    * Tokenize.TokenPattern (`!-/ :-@ [-` {-~`), i.e. Python
    * string.punctuation. */
  private val punctTable: Array[Boolean] = Array.tabulate(128)(i =>
    (i >= 33 && i <= 47) || (i >= 58 && i <= 64) ||
      (i >= 91 && i <= 96) || (i >= 123 && i <= 126))

  @inline def isPunct(c: Char): Boolean = c < 128 && punctTable(c)

  /** Java regex `\s` parity: ASCII-only [ \t\n\f\r]. */
  @inline def isSpace(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** Column wrapper: `df.select(col("doc_id"), TokenizeGenerator(col("text")))`
    * yields columns token_id, span, text. */
  def apply(text: Column): Column =
    ExpressionUtils.column(TokenizeGenerator(ExpressionUtils.expression(text)))
}
