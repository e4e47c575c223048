// Bridge package: see PortableHash.scala — Column↔Expression construction
// requires sql-package access in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expression for cosine similarity over `array<double>` —
 * the inner kernel of every ANN scoring and embedding-dedup verify stage.
 *
 * A codegen'd `BinaryExpression` instead of a Scala UDF: the generated
 * Java reads the unsafe array data in place — no Seq boxing, no closure
 * call per row — and stays inside whole-stage codegen. The fold is the
 * same interleaved left-to-right double accumulation as the UDF it
 * replaces (and as the SQL oracle's list_reduce), so results are
 * bit-identical. Contract kept from the UDF: null input or zero norm
 * yields 0.0 (never null), matching the reference's treatment of
 * degenerate vectors.
 */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) 0.0
    else CosineSim.cos(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val le = left.genCode(ctx)
    val re = right.genCode(ctx)
    ev.copy(code = code"""
      ${le.code}
      ${re.code}
      double ${ev.value} = 0.0;
      if (!${le.isNull} && !${re.isNull}) {
        ${ev.value} = org.apache.spark.sql.graft.CosineSim.cos(${le.value}, ${re.value});
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Interleaved single-pass fold: dot, |a|², |b|² accumulated left to
    * right — identical arithmetic to the replaced UDF / SQL oracle. */
  def cos(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dab = 0.0
    var daa = 0.0
    var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dab += x * y
      daa += x * x
      dbb += y * y
      i += 1
    }
    val d = math.sqrt(daa) * math.sqrt(dbb)
    if (d > 0) dab / d else 0.0
  }

  /** Column wrapper: the engine's public surface for the expression. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
