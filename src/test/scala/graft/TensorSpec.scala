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
}
