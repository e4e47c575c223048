package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange
import graft.operators.{Dedup, Iob, TextAnalysis}

/** Physical-plan shape claims for the scale-sensitive operators: what the
  * Scaladoc promises ("shuffle-free", "input read once") asserted against
  * the actual executed plan, so a regression in plan shape fails CI even
  * while results stay correct. */
class PlanShapeSpec extends GraftSuite {
  import spark.implicits._

  test("hashSplit plans as a pure projection — no Exchange, no aggregate") {
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val plan = TextAnalysis.hashSplit(docs).queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      s"expected shuffle-free split assignment, got:\n$plan")
  }

  test("prfScores reads the gold subtree once (ReusedExchange in final plan)") {
    val pred = (0L until 200L).map(i => (i % 20, i, i + 1, "K"))
      .toDF("doc_id", "b", "e", "ent_type")
      .select(col("doc_id"), spans.tokenSpan(col("b"), col("e"), col("b"), col("e")).as("span"),
        col("ent_type"))
    val gold = pred.filter(col("span")("begin_tok") % 3 === 0)
    val out = Iob.prfScores(pred, gold)
    out.collect() // finalize the adaptive plan
    val finalPlan = out.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") || finalPlan.contains("ReusedQueryStage"),
      s"expected the gold aggregation exchange to be reused, got:\n$finalPlan")
  }

  test("dupClusters rounds scale with diameter, not input size") {
    // a star graph (hub 0) converges in ONE propagation round regardless of
    // spoke count — the shape near-dup clusters actually have
    val star = (1L until 50L).map(i => (0L, i)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(star)
    assert(out.filter(col("cluster_id") === 0L).count() == 50)
  }
}
