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

  /**
   * Cosine similarity; 0 when either vector has zero norm or is null.
   * A native codegen'd Catalyst expression (see
   * expressions/CosineSim.scala): reads unsafe array data in place inside
   * whole-stage codegen — no Seq boxing, no UDF closure call per row —
   * with the same left-to-right double fold as the SQL oracle's
   * list_reduce, so results are bit-identical. (History: the interpreted
   * zip_with/aggregate tree was the q17-q19 hotspot; a fused Scala UDF
   * fixed that, and the native expression removes the remaining
   * boxing/closure overhead.) Float-array inputs are cast to double
   * (exact) here — a no-op for already-double arrays.
   */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.CosineSim(
      a.cast("array<double>"), b.cast("array<double>"))

  // ---- axis-0 (cross-row) reductions (reference: array/tensor.py:618-630) ----

  private def seqOp(f: (Double, Double) => Double, init: Double => Double = identity)(
      buf: Array[Double], v: Seq[Float]): Array[Double] = {
    if (buf.isEmpty) v.map(x => init(x.toDouble)).toArray
    else { var i = 0; while (i < buf.length) { buf(i) = f(buf(i), init(v(i))); i += 1 }; buf }
  }

  private def combOp(f: (Double, Double) => Double)(a: Array[Double],
      b: Array[Double]): Array[Double] = {
    if (a.isEmpty) b else if (b.isEmpty) a
    else { var i = 0; while (i < a.length) { a(i) = f(a(i), b(i)); i += 1 }; a }
  }

  private def mkAgg(f: (Double, Double) => Double, init: Double => Double = identity) =
    new Aggregator[Seq[Float], Array[Double], Seq[Double]] {
      def zero: Array[Double] = Array.empty
      def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = seqOp(f, init)(b, v)
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

  /** Elementwise sum of squares along axis 0 — the second moment that,
    * with sumVec and a count, yields var/std (tensor `std`/`var` along
    * axis 0, reference: array/tensor.py:618-630; numpy ddof=0). */
  val sumSqVec: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(mkAgg(_ + _, x => x * x), ExpressionEncoder[Seq[Float]]())

  /** Population variance along axis 0 from the two moment vectors:
    * E[x²] − E[x]². */
  def varVec(sumSq: Column, sum: Column, n: Column): Column =
    zip_with(sumSq, sum, (ss, s) => ss / n - (s / n) * (s / n))

  def stdVec(sumSq: Column, sum: Column, n: Column): Column =
    transform(varVec(sumSq, sum, n), x => sqrt(x))

  // ---- argmin/argmax along axis 0 (reference: array/tensor.py:618-630) ----

  private def mkArgAgg(better: (Double, Double) => Boolean) =
    new Aggregator[(Long, Seq[Float]), (Array[Long], Array[Double]), Seq[Long]] {
      def zero: (Array[Long], Array[Double]) = (Array.empty, Array.empty)
      def reduce(b: (Array[Long], Array[Double]),
          in: (Long, Seq[Float])): (Array[Long], Array[Double]) = {
        val (id, v) = in
        if (b._1.isEmpty) (Array.fill(v.length)(id), v.map(_.toDouble).toArray)
        else {
          var i = 0
          while (i < v.length) {
            val x = v(i).toDouble
            // ties break toward the smaller id — deterministic under any
            // partitioning / merge order
            if (better(x, b._2(i)) || (x == b._2(i) && id < b._1(i))) {
              b._2(i) = x; b._1(i) = id
            }
            i += 1
          }
          b
        }
      }
      def merge(a: (Array[Long], Array[Double]),
          b: (Array[Long], Array[Double])): (Array[Long], Array[Double]) = {
        if (a._1.isEmpty) b else if (b._1.isEmpty) a
        else {
          var i = 0
          while (i < a._1.length) {
            if (better(b._2(i), a._2(i)) || (b._2(i) == a._2(i) && b._1(i) < a._1(i))) {
              a._2(i) = b._2(i); a._1(i) = b._1(i)
            }
            i += 1
          }
          a
        }
      }
      def finish(r: (Array[Long], Array[Double])): Seq[Long] = r._1.toSeq
      def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
        ExpressionEncoder[(Array[Long], Array[Double])]()
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }

  /** Per-dimension id of the row with the minimum value (axis-0 argmin;
    * the reference returns positional indices — here the caller's id
    * column plays that role). Usage: argminVec(col("id"), col("vec")). */
  val argminVec: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(mkArgAgg(_ < _), ExpressionEncoder[(Long, Seq[Float])]())

  val argmaxVec: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(mkArgAgg(_ > _), ExpressionEncoder[(Long, Seq[Float])]())

  // ---- any/all along axis 0 (reference: array/tensor.py:504-533) ----

  private def mkBoolAgg(f: (Boolean, Boolean) => Boolean) =
    new Aggregator[Seq[Boolean], Array[Boolean], Seq[Boolean]] {
      def zero: Array[Boolean] = Array.empty
      def reduce(b: Array[Boolean], v: Seq[Boolean]): Array[Boolean] = {
        if (b.isEmpty) v.toArray
        else { var i = 0; while (i < b.length) { b(i) = f(b(i), v(i)); i += 1 }; b }
      }
      def merge(a: Array[Boolean], b: Array[Boolean]): Array[Boolean] = {
        if (a.isEmpty) b else if (b.isEmpty) a
        else { var i = 0; while (i < a.length) { a(i) = f(a(i), b(i)); i += 1 }; a }
      }
      def finish(r: Array[Boolean]): Seq[Boolean] = r.toSeq
      def bufferEncoder: Encoder[Array[Boolean]] = ExpressionEncoder[Array[Boolean]]()
      def outputEncoder: Encoder[Seq[Boolean]] = ExpressionEncoder[Seq[Boolean]]()
    }

  /** Per-dimension OR across rows of a boolean-array column. */
  val anyVec: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(mkBoolAgg(_ || _), ExpressionEncoder[Seq[Boolean]]())

  /** Per-dimension AND across rows of a boolean-array column. */
  val allVec: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(mkBoolAgg(_ && _), ExpressionEncoder[Seq[Boolean]]())

  // ---- elementwise comparisons (reference: array/tensor.py:640-693) ----

  def vecEq(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x === y)
  def vecLt(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x < y)
  def vecLe(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x <= y)
  def vecGt(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x > y)
  def vecGe(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x >= y)

  // ---- N-dimensional tensors (reference: array/tensor.py:282-316) ----
  //
  // The reference's TensorArray holds an ndarray per row; here an N-d
  // tensor is a struct<data: array<double>, shape: array<int>> — flat
  // row-major data plus explicit shape, the same layout numpy uses
  // internally. Everything below is pure higher-order-function expression
  // trees (codegen'd, no UDF): reshape is metadata-only, slicing is
  // stride arithmetic, and axis reductions are sequential left folds —
  // deterministic element order, so a SQL oracle's list_reduce replays
  // them bit-identically. Row-level values stay bounded (one document's /
  // one group's tensor), matching the reference's per-cell ndarrays.

  /** Construct a tensor struct from flat row-major data + shape. */
  def ndTensor(data: Column, shape: Column): Column =
    struct(data.cast("array<double>").as("data"), shape.cast("array<int>").as("shape"))

  /** Number of elements a shape implies. */
  private def numel(shape: Column): Column =
    aggregate(shape, lit(1), (acc, d) => acc * d)

  /**
   * Reshape: same flat data, new shape; null when the element counts
   * disagree (NA semantics, like every other malformed-span/tensor op).
   */
  def reshape(t: Column, newShape: Column): Column =
    when(numel(newShape) === size(t("data")),
      ndTensor(t("data"), newShape))

  /**
   * Slice along axis 0: tensor `t[i]` with shape = shape[1:]. A 1-D
   * tensor slices to a scalar-shaped ([] shape) single-element tensor.
   * Null when the index is out of range.
   */
  def ndSlice(t: Column, i: Column): Column = {
    // NB: slice length must stay clear of Int.MaxValue — Spark's Slice
    // computes start+length and overflows silently to an empty array.
    val innerShape = slice(t("shape"), lit(2), greatest(size(t("shape")) - 1, lit(1)))
    val stride = numel(innerShape)
    when(i >= 0 && i < element_at(t("shape"), 1),
      ndTensor(slice(t("data"), i * stride + 1, stride), innerShape))
  }

  /** Scalar element at a 2-D index (row-major). */
  def ndGet2d(t: Column, r: Column, c: Column): Column =
    element_at(t("data"), (r * element_at(t("shape"), 2) + c + 1).cast("int"))

  /**
   * Axis-0 sum of a 2-D tensor [n, m] → length-m vector: for each column
   * c, a sequential fold over rows 0..n-1 (row-major stride walk).
   */
  def ndSumAxis0(t: Column): Column = {
    val n = element_at(t("shape"), 1)
    val m = element_at(t("shape"), 2)
    transform(sequence(lit(0), m - 1), c =>
      aggregate(sequence(lit(0), n - 1), lit(0.0),
        (acc, r) => acc + element_at(t("data"), (r * m + c + 1).cast("int"))))
  }

  /** Axis-1 sum of a 2-D tensor [n, m] → length-n vector (per-row fold). */
  def ndSumAxis1(t: Column): Column = {
    val n = element_at(t("shape"), 1)
    val m = element_at(t("shape"), 2)
    transform(sequence(lit(0), n - 1), r =>
      aggregate(sequence(lit(0), m - 1), lit(0.0),
        (acc, c) => acc + element_at(t("data"), (r * m + c + 1).cast("int"))))
  }

  /**
   * Aggregate a group of (key, vector) rows into ONE 2-D tensor
   * [n_rows, dim], rows ordered by key — how a document's per-token BERT
   * window outputs pack into the reference's [tokens × dims] TensorArray
   * cell. Use inside `groupBy(...).agg(...)`; group size is bounded by
   * the entity (document), exactly like the reference's per-cell ndarray.
   */
  def pack2d(key: Column, vec: Column): Column = {
    val lst = sort_array(collect_list(struct(key.as("k"),
      vec.cast("array<double>").as("v"))))
    ndTensor(flatten(transform(lst, x => x("v"))),
      array(size(lst), coalesce(size(element_at(lst, 1)("v")), lit(0))))
  }
}
