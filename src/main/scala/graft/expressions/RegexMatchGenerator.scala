// Bridge package: see PortableHash.scala — Column↔Expression construction
// requires sql-package access in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst `Generator` for regex extraction (`extract_regex`,
 * reference: spanner/extract.py:240-261): one input document row → one
 * output row per non-overlapping regex match, `(span struct<begin,end>,
 * match text)`, lateral-view style.
 *
 * Replaces the UDF + explode chain: the UDF path converts
 * UTF8String→String, builds a Seq of Span case classes, round-trips them
 * through the encoder, explodes, and then re-substrings the document per
 * match through a separate covered-text expression. Here one matcher pass
 * over the document emits compact InternalRows carrying the span AND the
 * matched text — no case-class reflection, no second substring pass.
 * Generators run inside GenerateExec (eval-mode body, codegen'd
 * consumers), so CodegenFallback does not break the surrounding
 * whole-stage pipeline (same contract as [[TokenizeGenerator]]).
 *
 * The pattern must be foldable (it is compiled once per executor at first
 * eval); offsets are CHAR offsets on the decoded string, reference
 * semantics (spanner/extract.py:252-257).
 */
case class RegexMatchGenerator(left: Expression, right: Expression)
    extends BinaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"regex_matches requires (string, string), got (${left.dataType}, ${right.dataType})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("regex_matches pattern must be a constant")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("span", graft.types.spanType, nullable = false),
    StructField("match", StringType, nullable = false)))

  @transient private lazy val pattern: java.util.regex.Pattern = {
    val p = right.eval(null)
    require(p != null, "regex_matches pattern must not be null")
    java.util.regex.Pattern.compile(p.asInstanceOf[UTF8String].toString)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = left.eval(input)
    if (t == null) Iterator.empty
    else {
      val s = t.asInstanceOf[UTF8String].toString
      val m = pattern.matcher(s)
      val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      while (m.find()) {
        buf += InternalRow(InternalRow(m.start, m.end),
          UTF8String.fromString(m.group()))
      }
      buf
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RegexMatchGenerator = copy(left = newLeft, right = newRight)
}

object RegexMatchGenerator {

  /** Column wrapper: `df.select(col("doc_id"),
    * RegexMatchGenerator(col("text"), "\\d+"))` yields columns span, match. */
  def apply(text: Column, pattern: String): Column =
    ExpressionUtils.column(RegexMatchGenerator(
      ExpressionUtils.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(pattern), StringType)))
}
