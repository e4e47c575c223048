package graft

import org.apache.spark.sql.functions._

/** Axis-0 tensor reductions (reference: array/tensor.py:504-533, 618-693). */
class TensorSpec extends GraftSuite {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, -2.0f, 3.0f)),
      (1L, Seq(2.0f, 0.0f, 3.0f)),
      (2L, Seq(0.0f, 4.0f, 3.0f))).toDF("id", "v")
  }

  test("sumSq / var / std along axis 0") {
    val r = df.agg(
      tensor.sumVec(col("v")).as("s"),
      tensor.sumSqVec(col("v")).as("ss"),
      count(lit(1)).as("n"))
    val row = r.select(
      tensor.varVec(col("ss"), col("s"), col("n")).as("var"),
      tensor.stdVec(col("ss"), col("s"), col("n")).as("std")).head()
    val vr = row.getSeq[Double](0)
    // numpy: np.var([[1,-2,3],[2,0,3],[0,4,3]], axis=0) = [2/3, 56/9, 0]
    assert(math.abs(vr(0) - 2.0 / 3) < 1e-12)
    assert(math.abs(vr(1) - 56.0 / 9) < 1e-12)
    assert(math.abs(vr(2)) < 1e-12)
    assert(math.abs(row.getSeq[Double](1)(1) - math.sqrt(56.0 / 9)) < 1e-12)
  }

  test("argmin/argmax with deterministic tie-break toward smaller id") {
    val row = df.agg(
      tensor.argminVec(col("id"), col("v")).as("mn"),
      tensor.argmaxVec(col("id"), col("v")).as("mx")).head()
    assert(row.getSeq[Long](0) == Seq(2L, 0L, 0L)) // col3 all-equal → id 0
    assert(row.getSeq[Long](1) == Seq(1L, 2L, 0L))
  }

  test("any/all along axis 0") {
    val row = df.agg(
      tensor.anyVec(transform(col("v"), x => x > 2.5f)).as("any"),
      tensor.allVec(transform(col("v"), x => x >= 0.0f)).as("all")).head()
    assert(row.getSeq[Boolean](0) == Seq(false, true, true))
    assert(row.getSeq[Boolean](1) == Seq(true, false, true))
  }

  test("elementwise comparisons") {
    import spark.implicits._
    val d = Seq((Seq(1.0f, 5.0f), Seq(2.0f, 5.0f))).toDF("a", "b")
    val r = d.select(tensor.vecLt(col("a"), col("b")).as("lt"),
      tensor.vecEq(col("a"), col("b")).as("eq"),
      tensor.vecGe(col("a"), col("b")).as("ge")).head()
    assert(r.getSeq[Boolean](0) == Seq(true, false))
    assert(r.getSeq[Boolean](1) == Seq(false, true))
    assert(r.getSeq[Boolean](2) == Seq(false, true))
  }

  // ---- N-d tensors (flat data + shape; reference array/tensor.py:282-316) ----

  test("ndTensor/reshape round trip, invalid reshape is null") {
    import spark.implicits._
    val d = Seq(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)).toDF("flat")
    val t = d.select(tensor.ndTensor(col("flat"), array(lit(2), lit(3))).as("t"))
    val r = t.select(col("t")("data"), col("t")("shape"),
      tensor.reshape(col("t"), array(lit(3), lit(2)))("shape").as("rs"),
      tensor.reshape(col("t"), array(lit(4), lit(2))).as("bad")).head()
    assert(r.getSeq[Double](0) == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    assert(r.getSeq[Int](1) == Seq(2, 3))
    assert(r.getSeq[Int](2) == Seq(3, 2))
    assert(r.isNullAt(3))
  }

  test("ndSlice walks axis 0 with row-major strides; out-of-range is null") {
    import spark.implicits._
    val d = Seq(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)).toDF("flat")
    val t = d.select(tensor.ndTensor(col("flat"), array(lit(2), lit(3))).as("t"))
    val r = t.select(
      tensor.ndSlice(col("t"), lit(1))("data").as("row1"),
      tensor.ndSlice(col("t"), lit(1))("shape").as("shape1"),
      tensor.ndSlice(col("t"), lit(2)).as("oob"),
      tensor.ndGet2d(col("t"), lit(1), lit(2)).as("x12")).head()
    assert(r.getSeq[Double](0) == Seq(4.0, 5.0, 6.0))
    assert(r.getSeq[Int](1) == Seq(3))
    assert(r.isNullAt(2))
    assert(r.getDouble(3) == 6.0)
  }

  test("2-D axis reductions match numpy semantics") {
    import spark.implicits._
    val d = Seq(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)).toDF("flat")
    val t = d.select(tensor.ndTensor(col("flat"), array(lit(2), lit(3))).as("t"))
    val r = t.select(tensor.ndSumAxis0(col("t")).as("a0"),
      tensor.ndSumAxis1(col("t")).as("a1")).head()
    assert(r.getSeq[Double](0) == Seq(5.0, 7.0, 9.0)) // column sums
    assert(r.getSeq[Double](1) == Seq(6.0, 15.0))     // row sums
  }

  test("pack2d aggregates ordered rows into one [n, dim] tensor per group") {
    import spark.implicits._
    val rows = Seq((0L, 1L, Seq(10.0f, 11.0f)), (0L, 0L, Seq(1.0f, 2.0f)),
      (1L, 0L, Seq(5.0f, 6.0f)))
      .toDF("g", "k", "v")
    val t = rows.groupBy("g").agg(tensor.pack2d(col("k"), col("v")).as("t"))
    val m = t.collect().map(r => (r.getLong(0), r.getStruct(1))).toMap
    // group 0: rows ordered by k → [[1,2],[10,11]], shape [2,2]
    assert(m(0L).getSeq[Double](0) == Seq(1.0, 2.0, 10.0, 11.0))
    assert(m(0L).getSeq[Int](1) == Seq(2, 2))
    assert(m(1L).getSeq[Int](1) == Seq(1, 2))
    // slicing the packed tensor recovers the original row vector
    val s = t.filter(col("g") === 0)
      .select(tensor.ndSlice(col("t"), lit(1))("data")).head()
    assert(s.getSeq[Double](0) == Seq(10.0, 11.0))
  }
}
