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
 * Two-level (coarse cell → fine centroid) nearest-centroid assignment —
 * the O(√k)-per-row scale path for k-means assignment at large k.
 *
 * [[NearestCentroid]] is O(k·dim) per row, which is the right kernel while
 * k is small — but the SemDeDup operating rule grows k WITH the corpus
 * (cluster size is the knob), so single-level assignment cost is N×k ∝ N²
 * at a fixed cluster size. Measured: the 100x scale-smoke tier read 38x
 * for 10x data + 10x k on the single-level path. Here the fine centroids
 * are pre-grouped into coarse cells (a driver-side k-means over the k×dim
 * matrix — matrix-small by construction); each row scans the coarse cells
 * (O(√k)), probes the `nprobe` nearest, and takes the argmin over only
 * their members (O(nprobe·√k) expected) — the classic IVF trick applied
 * to the assignment stage itself.
 *
 * Approximation contract: a vector near a coarse-cell boundary may miss
 * the global argmin when `nprobe` is small; `nprobe` = number of coarse
 * cells makes the result EXACTLY [[NearestCentroid]] over the full fine
 * set (the property the spec pins). Deterministic for fixed inputs: probe
 * order and both argmins tie-break to the smallest id, same fold order as
 * the single-level kernel.
 */
case class NearestCentroidTwoLevel(child: Expression,
    coarse: Seq[(Int, Seq[Double])], fine: Seq[(Int, Int, Seq[Double])],
    nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(coarse.nonEmpty, "coarse cells must not be empty")
  require(fine.nonEmpty, "fine centroid matrix must not be empty")
  require(nprobe >= 1, "nprobe must be >= 1")
  require(fine.map(_._1).toSet == coarse.map(_._1).toSet,
    "every coarse cell must carry at least one fine centroid and vice versa")

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  @transient private lazy val coarseIds: Array[Int] = coarse.map(_._1).toArray
  @transient private lazy val coarseMat: Array[Array[Double]] =
    coarse.map(_._2.toArray).toArray
  // fine members indexed by coarse SLOT (position in `coarse`)
  @transient private lazy val grouped: Map[Int, Seq[(Int, Seq[Double])]] =
    fine.groupBy(_._1).view.mapValues(_.map(f => (f._2, f._3))).toMap
  @transient private lazy val fineIds: Array[Array[Int]] =
    coarseIds.map(c => grouped(c).map(_._1).toArray)
  @transient private lazy val fineMat: Array[Array[Array[Double]]] =
    coarseIds.map(c => grouped(c).map(_._2.toArray).toArray)

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroidTwoLevel.nearest(v.asInstanceOf[ArrayData],
      coarseMat, fineIds, fineMat, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmRef = ctx.addReferenceObj("coarseMat", coarseMat, "double[][]")
    val fiRef = ctx.addReferenceObj("fineIds", fineIds, "int[][]")
    val fmRef = ctx.addReferenceObj("fineMat", fineMat, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.NearestCentroidTwoLevel" +
        s".nearest($v, $cmRef, $fiRef, $fmRef, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidTwoLevel =
    copy(child = newChild)
}

object NearestCentroidTwoLevel {

  private def sqDist(vec: ArrayData, c: Array[Double]): Double = {
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
    d
  }

  /** (d, cid) of the nearest fine centroid within the `nprobe` nearest
    * coarse cells; both argmins tie-break to the smallest index/cid (same
    * fold order as [[NearestCentroid.nearest]]). */
  def nearest(vec: ArrayData, coarseMat: Array[Array[Double]],
      fineIds: Array[Array[Int]], fineMat: Array[Array[Array[Double]]],
      nprobe: Int): InternalRow = {
    val n = coarseMat.length
    val cd = new Array[Double](n)
    var j = 0
    while (j < n) { cd(j) = sqDist(vec, coarseMat(j)); j += 1 }
    val used = new Array[Boolean](n)
    var bestD = Double.MaxValue
    var bestCid = Int.MaxValue
    var p = 0
    val probes = math.min(nprobe, n)
    while (p < probes) {
      // next unprobed coarse cell (smallest distance, ties smallest slot);
      // when every remaining distance is NaN/+Inf (degenerate vector) fall
      // back to the smallest unprobed slot so the row degrades to the same
      // (MaxValue, Int.MaxValue) sentinel as NearestCentroid instead of
      // crashing — full-probe parity must hold on junk inputs too
      var slot = -1
      var slotD = Double.MaxValue
      var s = 0
      while (s < n) {
        if (!used(s)) {
          if (cd(s) < slotD) { slotD = cd(s); slot = s }
          else if (slot < 0) slot = s
        }
        s += 1
      }
      used(slot) = true
      val ids = fineIds(slot)
      val mat = fineMat(slot)
      var f = 0
      while (f < mat.length) {
        val d = sqDist(vec, mat(f))
        if (d < bestD || (d == bestD && ids(f) < bestCid)) {
          bestD = d
          bestCid = ids(f)
        }
        f += 1
      }
      p += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestCid))
  }

  /** Column wrapper: the engine's public surface for the expression. */
  def apply(vec: Column, coarse: Seq[(Int, Array[Double])],
      fine: Seq[(Int, Int, Array[Double])], nprobe: Int): Column =
    ExpressionUtils.column(NearestCentroidTwoLevel(
      ExpressionUtils.expression(vec),
      coarse.map { case (c, v) => (c, v.toSeq) },
      fine.map { case (c, cid, v) => (c, cid, v.toSeq) }, nprobe))
}
