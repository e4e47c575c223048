// Bridge package: AbstractDataType / ExpressionUtils are private[sql], and
// building Column from a catalyst Expression requires sql-package access in
// Spark 4 — the standard pattern for native-expression libraries.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for the engine's 31-base polynomial rolling
 * hash mod 2^31-1 (the portable fingerprint every dedup stage builds on).
 *
 * Implemented as a codegen'd `UnaryExpression` rather than a Scala UDF so
 * it stays inside whole-stage codegen: no UDF closure invocation, no
 * UTF8String→String conversion per row — the generated Java folds over
 * the UTF-8 bytes in place. ASCII corpora hash identically to the
 * char-based kernel (TextAnalysis.hashString) and to the SQL oracle's
 * `ascii()` fold; both sides of that equivalence are tested.
 */
case class PortableHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    PortableHash.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.PortableHash.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableHash =
    copy(child = newChild)
}

object PortableHash {

  /** Fold over the UTF-8 bytes. For ASCII input this equals the char fold
    * in TextAnalysis.hashString; both match the SQL oracle's ascii() fold. */
  def hashUtf8(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31 + (s.getByte(i) & 0xff)) % 2147483647L
      i += 1
    }
    h
  }

  /** Column wrapper: the engine's public surface for the expression. */
  def apply(c: Column): Column = ExpressionUtils.column(PortableHash(ExpressionUtils.expression(c)))
}

/**
 * Wide (~62-bit) portable fingerprint: two independent polynomial rolling
 * hashes (bases 31 and 131, both mod 2^31-1) folded over the UTF-8 bytes
 * in ONE pass and packed as `h31 * (2^31-1) + h131`. The single 31-bit
 * [[PortableHash]] domain saturates sketches around tens of millions of
 * distinct values (birthday collisions); this widens the domain to ~2^62
 * for cardinality sketches while staying exactly mirrorable in the SQL
 * oracle (two ascii() folds and one BIGINT multiply-add).
 */
case class WideHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    WideHash.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.WideHash.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): WideHash =
    copy(child = newChild)
}

object WideHash {

  def hashUtf8(s: UTF8String): Long = {
    val n = s.numBytes()
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      h1 = (h1 * 31 + b) % 2147483647L
      h2 = (h2 * 131 + b) % 2147483647L
      i += 1
    }
    h1 * 2147483647L + h2
  }

  def apply(c: Column): Column = ExpressionUtils.column(WideHash(ExpressionUtils.expression(c)))
}
