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
      val s = t.asInstanceOf[UTF8String].toString
      val m = TokenizeGenerator.pattern.matcher(s)
      val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var i = 0
      while (m.find()) {
        val b = m.start
        val e = m.end
        buf += InternalRow(i, InternalRow(b, e),
          UTF8String.fromString(s.substring(b, e)))
        i += 1
      }
      buf
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeGenerator =
    copy(child = newChild)
}

object TokenizeGenerator {

  /** Same pattern as Tokenize.TokenPattern (simple_tokenizer parity). */
  private val pattern = java.util.regex.Pattern.compile(
    graft.operators.Tokenize.TokenPattern)

  /** Column wrapper: `df.select(col("doc_id"), TokenizeGenerator(col("text")))`
    * yields columns token_id, span, text. */
  def apply(text: Column): Column =
    ExpressionUtils.column(TokenizeGenerator(ExpressionUtils.expression(text)))
}
