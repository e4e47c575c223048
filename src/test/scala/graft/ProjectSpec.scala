package graft

import org.apache.spark.sql.functions._
import graft.operators.Project

/**
 * `lemmatize` golden (reference: spanner/test_project.py:25-33): per-token
 * spans map to their lemmas; the lemma values are annotator input (the
 * reference gets them from SpaCy), the operator under test is the
 * span→token alignment + ordered join.
 */
class ProjectSpec extends GraftSuite {

  private val lemmas = Seq("if", "Barbie", "be", "so", "popular", ",", "why",
    "do", "you", "have", "to", "buy", "Barbie", "'s", "friend", "?")

  test("lemmatize golden (test_project.py): one span per token") {
    import spark.implicits._
    val features = lemmas.zipWithIndex
      .map { case (l, i) => (0L, i, l) }.toDF("doc_id", "token_id", "lemma")
    val spansDf = lemmas.indices
      .map(i => (0L, i)).toDF("doc_id", "bt")
      .select(col("doc_id"),
        graft.spans.tokenSpan(col("bt"), col("bt") + 1, lit(0), lit(0)).as("span"))
    val got = Project.lemmatize(spansDf, features)
      .select(col("span")("begin_tok"), col("lemmas")).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).map(_._2)
    assert(got.toSeq == lemmas)
  }

  test("lemmatize joins multi-token spans in token order") {
    import spark.implicits._
    val features = lemmas.zipWithIndex
      .map { case (l, i) => (0L, i, l) }.toDF("doc_id", "token_id", "lemma")
    val spansDf = Seq((0L, 1, 5), (0L, 12, 15)).toDF("doc_id", "bt", "et")
      .select(col("doc_id"),
        graft.spans.tokenSpan(col("bt"), col("et"), lit(0), lit(0)).as("span"))
    val got = Project.lemmatize(spansDf, features)
      .select(col("span")("begin_tok"), col("lemmas")).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1, "Barbie be so popular"), (12, "Barbie 's friend")))
  }
}
