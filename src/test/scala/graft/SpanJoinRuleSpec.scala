package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import graft.operators.SpanJoin
import graft.plans.SpanJoinRewrite

/** The SpanJoinRewrite optimizer rule: a naive declarative overlap join
  * must produce the blocked equi-join plan with unchanged results. */
class SpanJoinRuleSpec extends GraftSuite {
  import spark.implicits._

  private def spanDf(rows: Seq[(Long, Int, Int)]) =
    rows.toDF("doc_id", "b", "e")
      .select(col("doc_id"), spans.span(col("b"), col("e")).as("span"))

  private val lhs = spanDf(Seq((0L, 0, 10), (0L, 8, 20), (0L, 30, 40), (1L, 0, 5),
    (1L, 5, 5), (2L, 100, 130)))
  private val rhs = spanDf(Seq((0L, 5, 12), (0L, 19, 31), (1L, 5, 5), (1L, 4, 6),
    (2L, 0, 3), (2L, 129, 200)))

  private def naive = lhs.as("f").join(rhs.as("s"),
    col("f.doc_id") === col("s.doc_id") &&
      spans.overlaps(col("f.span"), col("s.span")))
    .select(col("f.doc_id"), col("f.span").as("first"), col("s.span").as("second"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("first")("begin"), col("first")("end"),
        col("second")("begin"), col("second")("end"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("rewrite result == unrewritten result == explicit overlapJoin") {
    val withRule = canon(naive)
    val noRule = spark.conf.set(SpanJoinRewrite.EnabledConf, "false")
    val without = try canon(naive)
    finally spark.conf.set(SpanJoinRewrite.EnabledConf, "true")
    assert(withRule == without)
    assert(withRule.nonEmpty)
    val explicit = canon(SpanJoin.overlapJoin(lhs, rhs))
    assert(withRule == explicit)
  }

  test("rewritten plan joins on the generated block key") {
    val plan = naive.queryExecution.optimizedPlan.toString
    assert(plan.contains("__graft_blk"), s"rule did not fire:\n$plan")
    assert(plan.contains("explode"), s"no block explode in plan:\n$plan")
  }

  test("no-equality overlap join escapes the nested-loop plan") {
    val single = lhs.filter(col("doc_id") === 0L)
    val singleR = rhs.filter(col("doc_id") === 0L)
    val cross = single.as("f").join(singleR.as("s"),
      spans.overlaps(col("f.span"), col("s.span")))
    cross.collect()
    val exec = cross.queryExecution.executedPlan.toString
    assert(!exec.contains("BroadcastNestedLoopJoin"),
      s"expected block equi-join, got nested loop:\n$exec")
    // results still exact vs the disabled-rule nested-loop join
    spark.conf.set(SpanJoinRewrite.EnabledConf, "false")
    val expect = try cross.count()
    finally spark.conf.set(SpanJoinRewrite.EnabledConf, "true")
    assert(cross.count() == expect)
  }

  test("duplicate input rows keep reference multiplicity (one pair per row pair)") {
    val dupL = lhs.union(lhs.filter(col("doc_id") === 0L)) // doc-0 spans twice
    val n = dupL.as("f").join(rhs.as("s"),
      col("f.doc_id") === col("s.doc_id") &&
        spans.overlaps(col("f.span"), col("s.span"))).count()
    spark.conf.set(SpanJoinRewrite.EnabledConf, "false")
    val expect = try dupL.as("f").join(rhs.as("s"),
      col("f.doc_id") === col("s.doc_id") &&
        spans.overlaps(col("f.span"), col("s.span"))).count()
    finally spark.conf.set(SpanJoinRewrite.EnabledConf, "true")
    assert(n == expect)
  }

  test("malformed spans (begin > end) run and match the unrewritten join") {
    // Sequence(start, stop, 1) throws on start > stop; the rewrite widens
    // its block bounds with least/greatest so a begin>end row degrades to
    // a candidate the residual filter judges — never a runtime error.
    val badL = spanDf(Seq((0L, 10, 5), (0L, 0, 10), (0L, 10, 5)))
    val badR = spanDf(Seq((0L, 10, 5), (0L, 4, 12), (0L, 200, 100)))
    def q = badL.as("f").join(badR.as("s"),
      col("f.doc_id") === col("s.doc_id") &&
        spans.overlaps(col("f.span"), col("s.span")))
      .select(col("f.doc_id"), col("f.span").as("first"), col("s.span").as("second"))
    val withRule = canon(q)
    assert(q.queryExecution.optimizedPlan.toString.contains("__graft_blk"))
    spark.conf.set(SpanJoinRewrite.EnabledConf, "false")
    val without = try canon(q)
    finally spark.conf.set(SpanJoinRewrite.EnabledConf, "true")
    assert(withRule == without)
    assert(withRule.nonEmpty) // identical malformed spans still pair up
  }

  test("joins without the overlap shape are untouched") {
    val plain = lhs.as("f").join(rhs.as("s"), col("f.doc_id") === col("s.doc_id"))
    assert(!plain.queryExecution.optimizedPlan.toString.contains("__graft_blk"))
    // contains-only predicate (no overlap disjunction) also untouched
    val containsOnly = lhs.as("f").join(rhs.as("s"),
      col("f.doc_id") === col("s.doc_id") &&
        spans.containsSpan(col("f.span"), col("s.span")))
    assert(!containsOnly.queryExecution.optimizedPlan.toString.contains("__graft_blk"))
  }

  test("overlap + contains residual composes (contain_join shape)") {
    val cj = lhs.as("f").join(rhs.as("s"),
      col("f.doc_id") === col("s.doc_id") &&
        spans.overlaps(col("f.span"), col("s.span")) &&
        spans.containsSpan(col("f.span"), col("s.span")))
      .select(col("f.doc_id"), col("f.span").as("first"), col("s.span").as("second"))
    assert(cj.queryExecution.optimizedPlan.toString.contains("__graft_blk"))
    val explicit = canon(SpanJoin.containJoin(lhs, rhs))
    assert(canon(cj) == explicit)
  }
}
