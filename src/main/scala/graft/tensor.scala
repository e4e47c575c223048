package graft

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Tensor-column surface (reference: array/tensor.py). A "tensor" column is
 * `array<float>` (1-D, e.g. embeddings) or nested arrays for N-D; rows all
 * share a shape. Elementwise ops are higher-order functions (`transform`/
 * `zip_with`) so they stay in Tungsten; axis-0 reductions are typed
 * `Aggregator`s with a mutable vector buffer (partial aggregation =
 * map-side combine, one shuffle of one vector per partition).
 */
object tensor {

  // ---- elementwise (reference: array/tensor.py:208-248, 640-693) ----

  def vecAdd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
  def vecSub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)
  def vecMul(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x * y)
  def vecDiv(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x / y)
  def vecScale(a: Column, s: Column): Column = transform(a, x => x * s)
  def vecAbs(a: Column): Column = transform(a, x => abs(x))
  def vecNeg(a: Column): Column = transform(a, x => -x)

  // ---- reductions along the row (axis 1) ----

  def vecSum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column = vecSum(vecMul(a, b))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm2(a) * norm2(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  // ---- axis-0 (cross-row) reductions (reference: array/tensor.py:618-630) ----

  private def seqOp(f: (Double, Double) => Double)(buf: Array[Double],
      v: Seq[Float]): Array[Double] = {
    if (buf.isEmpty) v.map(_.toDouble).toArray
    else { var i = 0; while (i < buf.length) { buf(i) = f(buf(i), v(i)); i += 1 }; buf }
  }

  private def combOp(f: (Double, Double) => Double)(a: Array[Double],
      b: Array[Double]): Array[Double] = {
    if (a.isEmpty) b else if (b.isEmpty) a
    else { var i = 0; while (i < a.length) { a(i) = f(a(i), b(i)); i += 1 }; a }
  }

  private def mkAgg(f: (Double, Double) => Double) =
    new Aggregator[Seq[Float], Array[Double], Seq[Double]] {
      def zero: Array[Double] = Array.empty
      def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = seqOp(f)(b, v)
      def merge(a: Array[Double], b: Array[Double]): Array[Double] = combOp(f)(a, b)
      def finish(r: Array[Double]): Seq[Double] = r.toSeq
      def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
      def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
    }

  /** Elementwise sum across rows: the reference's tensor `sum` along axis 0. */
  val sumVec: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(mkAgg(_ + _), ExpressionEncoder[Seq[Float]]())

  val maxVec: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(mkAgg(math.max), ExpressionEncoder[Seq[Float]]())

  val minVec: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(mkAgg(math.min), ExpressionEncoder[Seq[Float]]())

  /** Mean along axis 0: sumVec / count, composed at call sites. */
  def meanVec(c: Column, n: Column): Column =
    transform(sumVec(c), x => x / n)
}
