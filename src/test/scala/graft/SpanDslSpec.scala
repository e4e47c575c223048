package graft

import org.apache.spark.sql.functions._
import graft.spans._

/** Span predicate/projection laws, ported from the reference's scalar and
  * vectorized span kernels (reference: array/span.py, test_span.py). */
class SpanDslSpec extends GraftSuite {
  import spark.implicits._

  private def pred(aB: Int, aE: Int, bB: Int, bE: Int, f: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Boolean =
    Seq((aB, aE, bB, bE)).toDF("ab", "ae", "bb", "be")
      .select(f(span(col("ab"), col("ae")), span(col("bb"), col("be"))).as("r"))
      .head.getBoolean(0)

  test("overlaps: reference semantics incl. zero-length spans") {
    // disjoint
    assert(!pred(0, 3, 3, 5, overlaps))
    assert(!pred(3, 5, 0, 3, overlaps))
    // plain overlap
    assert(pred(0, 4, 3, 5, overlaps))
    assert(pred(3, 5, 0, 4, overlaps))
    // containment
    assert(pred(0, 10, 3, 5, overlaps))
    // identical zero-length spans DO overlap (array/span.py:226-242)
    assert(pred(3, 3, 3, 3, overlaps))
    // zero-length at boundary of non-zero span: begin >= end → no overlap
    assert(!pred(0, 3, 3, 3, overlaps))
    // zero-length strictly inside
    assert(pred(0, 5, 3, 3, overlaps))
  }

  test("containsSpan and before") {
    assert(pred(0, 10, 3, 5, containsSpan))
    assert(pred(0, 10, 0, 10, containsSpan))
    assert(!pred(3, 5, 0, 10, containsSpan))
    assert(pred(0, 3, 3, 5, before))
    assert(!pred(0, 4, 3, 5, before))
  }

  test("coveredText / normalized / context / spanAdd") {
    val df = Seq(("Hello, World!", 7, 12)).toDF("text", "b", "e")
      .select(col("text"), span(col("b"), col("e")).as("s"))
    val r = df.select(
      coveredText(col("text"), col("s")).as("cov"),
      normalizedCoveredText(col("text"), col("s")).as("norm"),
      context(col("text"), col("s"), 3).as("ctx"),
      spanAdd(col("s"), span(lit(0), lit(5))).as("sum")).head
    assert(r.getString(0) == "World")
    assert(r.getString(1) == "world")
    assert(r.getString(2) == "o, [World]!")
    assert(r.getStruct(3).getInt(0) == 0 && r.getStruct(3).getInt(1) == 12)
  }

  test("spanSum aggregate = minimal covering span (array/span.py:816-842)") {
    val df = Seq((1L, 3, 5), (1L, 10, 12), (1L, 0, 2)).toDF("doc_id", "b", "e")
      .select(col("doc_id"), span(col("b"), col("e")).as("s"))
    val r = df.groupBy("doc_id").agg(spanSum(col("s")).as("sum")).head.getStruct(1)
    assert(r.getInt(0) == 0 && r.getInt(1) == 12)
  }

  test("null span propagates (NA semantics, array/span.py:109-118)") {
    val df = Seq((Some(1), Some(3)), (None, None)).toDF("b", "e")
      .select(when(col("b").isNotNull, span(col("b"), col("e"))).as("s"))
    assert(df.filter(spanIsNa(col("s"))).count() == 1)
    // predicates on null spans yield null, which filters drop
    val joined = df.as("a").crossJoin(df.as("b"))
      .filter(overlaps(col("a.s"), col("b.s")))
    assert(joined.count() == 1) // only the non-null pair
  }
}
