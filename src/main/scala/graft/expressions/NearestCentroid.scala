// Bridge package: see PortableHash.scala — Column↔Expression construction
// requires sql-package access in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/**
 * Nearest-centroid assignment against a small fixed centroid matrix —
 * the inner kernel of the k-means coarse quantizer (fit iterations and
 * final assignment alike).
 *
 * A native expression instead of the previous `array_min(array(struct(
 * aggregate(zip_with(...)))))` composition: that tree carried k×dim
 * literals through every analyzer/optimizer pass and one lambda
 * resolution per centroid, so with k=8, dim=64 each k-means ACTION paid
 * seconds of pure plan overhead before touching a row (q94 measured 14 s
 * on 2,000 vectors — all planning, no data). Here the matrix rides along
 * as one referenced object, the tree is a single node, and the generated
 * code is a two-level primitive loop — constant plan cost, and the per-row
 * cost a JIT-friendly k×dim multiply-add, which is also what a
 * 1000-executor scan wants.
 *
 * Arithmetic parity (strict-oracle contract): per centroid the squared-L2
 * distance is the same left-to-right fold over dims as the replaced
 * `aggregate(zip_with(...))` and the DuckDB oracle's `list_reduce`; ties
 * go to the smallest cid (the replaced lexicographic struct-min). Null
 * vector → null struct. A vector whose length differs from the centroid
 * dim is an error (the old form silently yielded a null distance).
 */
case class NearestCentroid(child: Expression, cents: Seq[(Int, Seq[Double])])
    extends UnaryExpression with ExpectsInputTypes {

  require(cents.nonEmpty, "centroid matrix must not be empty")

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  @transient private lazy val ids: Array[Int] = cents.map(_._1).toArray
  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_._2.toArray).toArray

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroid.nearest(v.asInstanceOf[ArrayData], ids, matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cids", ids, "int[]")
    val matRef = ctx.addReferenceObj("cents", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.NearestCentroid.nearest($v, $idsRef, $matRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** (d, cid) of the nearest centroid; same fold order and tie-break as
    * the SQL oracle (left fold per dim, ties to smallest cid). */
  def nearest(vec: ArrayData, ids: Array[Int], matrix: Array[Array[Double]]): InternalRow = {
    var bestD = Double.MaxValue
    var bestCid = Int.MaxValue
    var j = 0
    while (j < matrix.length) {
      val c = matrix(j)
      if (vec.numElements() != c.length)
        throw new IllegalArgumentException(
          s"vector length ${vec.numElements()} != centroid dim ${c.length}")
      var d = 0.0
      var i = 0
      while (i < c.length) {
        val x = vec.getDouble(i) - c(i)
        d += x * x
        i += 1
      }
      if (d < bestD || (d == bestD && ids(j) < bestCid)) {
        bestD = d
        bestCid = ids(j)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestCid))
  }

  /** Column wrapper: the engine's public surface for the expression. */
  def apply(vec: Column, cents: Seq[(Int, Array[Double])]): Column =
    ExpressionUtils.column(NearestCentroid(
      ExpressionUtils.expression(vec), cents.map { case (c, v) => (c, v.toSeq) }))
}
