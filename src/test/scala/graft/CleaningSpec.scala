package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, Iob, SpanJoin}

/**
 * Reference-semantics goldens for the corpus-cleaning surface
 * (cleaning/analysis.py, io/conll.py:1461-1516) and unpack_semijoin
 * (spanner/join.py:206-244).
 */
class CleaningSpec extends GraftSuite {
  import spark.implicits._

  private def ents(rows: (Long, Int, Int, String)*) =
    rows.toSeq.toDF("doc_id", "bt", "et", "ent_type")
      .select(col("doc_id"),
        graft.spans.tokenSpan(col("bt"), col("et"), lit(0), lit(0)).as("span"),
        col("ent_type"))

  test("flag_suspicious_labels agreement semantics (analysis.py:210-284)") {
    // gold: A, B;  model m1: A, C;  model m2: A
    val gold = ents((0L, 0, 1, "A"), (0L, 2, 3, "B"))
    val m1 = ents((0L, 0, 1, "A"), (0L, 4, 5, "C"))
    val m2 = ents((0L, 0, 1, "A"))
    val r = Cleaning.flagSuspiciousLabels(Seq("m1" -> m1, "m2" -> m2), gold)
      .select(col("span")("begin_tok").as("bt"), col("ent_type"),
        col("in_gold"), col("count"), col("models"))
      .collect().map(x => (x.getInt(0), x.getString(1), x.getBoolean(2),
        x.getLong(3), x.getSeq[String](4).toList)).toSet
    assert(r == Set(
      (0, "A", true, 2L, List("GOLD", "m1", "m2")),  // gold + both models agree
      (2, "B", true, 0L, List("GOLD")),              // gold, no model found it
      (4, "C", false, 1L, List("m1"))))              // model-only element
    // presentation splits: low-agreement gold first / high-agreement extras
    val flagged = Cleaning.flagSuspiciousLabels(Seq("m1" -> m1, "m2" -> m2), gold)
    assert(Cleaning.inGold(flagged).head.getAs[Long]("count") == 0L)
    assert(Cleaning.notInGold(flagged).head.getAs[String]("ent_type") == "C")
  }

  test("prfScores exact-match precision/recall/F1 (io/conll.py:1461-1516)") {
    val gold = ents((0L, 0, 1, "A"), (0L, 2, 3, "B"), (1L, 0, 1, "A"))
    val pred = ents((0L, 0, 1, "A"), (0L, 4, 5, "C"))
    val r = Iob.prfScores(pred, gold)
      .select("doc_id", "tp", "n_pred", "n_gold", "precision", "recall", "f1")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getDouble(4), x.getDouble(5), x.getDouble(6)))).toMap
    assert(r(0L) == ((1L, 2L, 2L, 0.5, 0.5, 0.5)))
    // doc 1: no predictions at all → P = R = F1 = 0
    assert(r(1L) == ((0L, 0L, 1L, 0.0, 0.0, 0.0)))
  }

  test("unpack_semijoin shifts spans by the region offset (join.py:206-244)") {
    val model = Seq((7L, 5, 10, 100)).toDF("doc_id", "b", "e", "off")
      .select(col("doc_id"), graft.spans.span(col("b"), col("e")).as("span"), col("off"))
    val r = SpanJoin.unpackSemijoin(model, "span", "off")
      .select(col("span")("begin"), col("span")("end")).head
    assert((r.getInt(0), r.getInt(1)) == (105, 110))
  }
}
