package graft

import org.apache.spark.sql.functions._
import graft.operators.{Align, Consolidate, Tokenize}

class ConsolidateAlignSpec extends GraftSuite {
  import spark.implicits._

  test("consolidate left_to_right golden (test_consolidate.py:28-44)") {
    // "Is it weird in here, or is it just me?"
    val spansIn = Seq((0, 3), (2, 3), (3, 3), (1, 3), (0, 4), (5, 7), (6, 9), (8, 9))
    val df = spansIn.zipWithIndex.map { case ((b, e), ix) => (0L, b, e, ix) }
      .toDF("doc_id", "b", "e", "ix")
      .select(col("doc_id"), graft.spans.span(col("b"), col("e")).as("s"), col("ix"))
    val kept = Consolidate.consolidate(df, on = "s")
      .select("ix").as[Int].collect().sorted
    assert(kept.toSeq == Seq(4, 5, 7))
  }

  test("consolidate is per-document and keeps non-span columns") {
    val df = Seq((0L, 0, 5, "a"), (0L, 3, 8, "b"), (1L, 3, 8, "c"))
      .toDF("doc_id", "b", "e", "tag")
      .select(col("doc_id"), graft.spans.span(col("b"), col("e")).as("span"), col("tag"))
    val kept = Consolidate.consolidate(df).select("tag").as[String].collect().sorted
    assert(kept.toSeq == Seq("a", "c"))
  }

  test("align_to_tokens: spans snap to token ids (token_span.py:729-802)") {
    val docs = Seq((0L, "In AD 932, King Arthur")).toDF("doc_id", "text")
    val toks = Tokenize.tokens(docs)
    // "AD 932" = tokens 1..2 (inclusive begin, exclusive end → end_tok 3)
    val sp = Seq((3, 9)).toDF("b", "e").select(lit(0L).as("doc_id"),
      graft.spans.span(col("b"), col("e")).as("span"))
    val r = Align.alignToTokens(toks, sp).select(
      col("span")("begin_tok"), col("span")("end_tok"),
      col("span")("begin"), col("span")("end")).head
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == (1, 3, 3, 9))
  }

  test("align_to_tokens rejects misaligned spans like the reference") {
    val docs = Seq((0L, "In AD 932")).toDF("doc_id", "text")
    val toks = Tokenize.tokens(docs)
    val sp = Seq((4, 9)).toDF("b", "e").select(lit(0L).as("doc_id"),
      graft.spans.span(col("b"), col("e")).as("span"))
    // default matches the reference's ValueError
    assertThrows[IllegalArgumentException] {
      Align.alignToTokens(toks, sp).collect()
    }
    // scale path opt-out: misaligned spans drop silently
    assert(Align.alignToTokens(toks, sp, validate = false).count() == 0)
  }
}
