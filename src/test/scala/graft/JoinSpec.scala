package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Extract, SpanJoin, Tokenize}

/** Span-join goldens ported from reference spanner/test_join.py. Reference
  * goldens use SpaCy token numbering (which tokenizes newlines); assertions
  * here are on covered text, which is tokenizer-independent. */
class JoinSpec extends GraftSuite {
  import spark.implicits._

  def docs = Seq((0L, MontyText)).toDF("doc_id", "text")
  def toks = Tokenize.normalizedTokens(docs)
  /** [A-Z][a-z]* single-token matches — the _CAPS_WORD relation. */
  def capsWord = Extract.extractRegexTok(docs, toks, "[A-Z][a-z]*")
  /** [Tt]he single-token matches — the _THE relation. */
  def the = Extract.extractRegexTok(docs, toks, "[Tt]he")

  private def pairs(df: DataFrame): Seq[(String, String)] =
    df.select(
        graft.spans.coveredText(lit(MontyText), col("first")).as("f"),
        graft.spans.coveredText(lit(MontyText), col("second")).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

  test("adjacent_join gap=0 golden (test_join.py:66-81)") {
    val r = pairs(SpanJoin.adjacentJoin(the, capsWord))
    assert(r == Seq("Brave", "Knights", "Pure", "Round", "Wise").map(("the", _)))
  }

  test("adjacent_join with min/max gap on a controlled fixture") {
    // tokens at positions i: first = {2}, second = {3,4,5,6,7,9}
    def ts(doc: Long, xs: Seq[Int]) = xs.toDF("i").select(lit(doc).as("doc_id"),
      graft.spans.tokenSpan(col("i"), col("i") + 1, col("i") * 2, col("i") * 2 + 1).as("span"))
    val first = ts(0L, Seq(2))
    val second = ts(0L, Seq(3, 4, 5, 6, 7, 9)).unionByName(ts(1L, Seq(3)))
    // gap in [1,3]: second.begin_tok ∈ {4,5,6}, same doc only
    val r = SpanJoin.adjacentJoin(first, second, minGap = 1, maxGap = 3)
      .select(col("second")("begin_tok")).as[Int].collect().sorted
    assert(r.toSeq == Seq(4, 5, 6))
  }

  /** The shared join argument (test_join.py:123-138): char spans of
    * "Knights of the Round Table", "searching for", "In" ×2,
    * "Lancelot the Brave". */
  private def joinArg: DataFrame = {
    val items = Seq("Knights of the Round Table", "searching for", "In", "In",
      "Lancelot the Brave")
    val offs = items.map { s => val b = MontyText.indexOf(s); (b, b + s.length) }
    offs.toDF("b", "e").select(lit(0L).as("doc_id"),
      graft.spans.span(col("b"), col("e")).as("span"))
  }

  test("overlap_join golden, left spans longer (test_join.py:166-180)") {
    val r = pairs(SpanJoin.overlapJoin(joinArg, capsWord))
    assert(r == Seq(
      ("In", "In"), ("In", "In"),
      ("Knights of the Round Table", "Knights"),
      ("Knights of the Round Table", "Round"),
      ("Knights of the Round Table", "Table"),
      ("Lancelot the Brave", "Brave"),
      ("Lancelot the Brave", "Lancelot")))
  }

  test("overlap_join golden, right spans longer (test_join.py:182-197)") {
    val r = pairs(SpanJoin.overlapJoin(capsWord, joinArg))
    assert(r == Seq(
      ("Brave", "Lancelot the Brave"),
      ("In", "In"), ("In", "In"),
      ("Knights", "Knights of the Round Table"),
      ("Lancelot", "Lancelot the Brave"),
      ("Round", "Knights of the Round Table"),
      ("Table", "Knights of the Round Table")))
  }

  test("overlap_join empty inputs (test_join.py:221-235)") {
    val empty = joinArg.limit(0)
    assert(SpanJoin.overlapJoin(empty, joinArg).count() == 0)
    assert(SpanJoin.overlapJoin(joinArg, empty).count() == 0)
    assert(SpanJoin.overlapJoin(empty, empty).count() == 0)
  }

  test("contain_join goldens (test_join.py:252-295)") {
    val r1 = pairs(SpanJoin.containJoin(joinArg, capsWord))
    assert(r1 == Seq(
      ("In", "In"), ("In", "In"),
      ("Knights of the Round Table", "Knights"),
      ("Knights of the Round Table", "Round"),
      ("Knights of the Round Table", "Table"),
      ("Lancelot the Brave", "Brave"),
      ("Lancelot the Brave", "Lancelot")))
    val r2 = pairs(SpanJoin.containJoin(capsWord, joinArg))
    assert(r2 == Seq(("In", "In"), ("In", "In")))
  }

  test("joins never cross documents") {
    val d2 = Seq((0L, "aaa bbb"), (1L, "aaa bbb")).toDF("doc_id", "text")
    val t2 = Tokenize.normalizedTokens(d2)
    val w = Extract.extractRegexTok(d2, t2, "[ab]+")
    // overlap join of a doc-0-only relation with everything
    val left = w.filter(col("doc_id") === 0L)
    assert(SpanJoin.overlapJoin(left, w).select("doc_id").distinct().count() == 1)
  }
}
