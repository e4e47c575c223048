package graft

import org.apache.spark.sql.functions._
import graft.operators.{Extract, Tokenize}

/** Extract-operator goldens ported from reference spanner/test_extract.py.
  * The fixture text is the SystemT test dictionary joined with spaces, on
  * which the engine tokenizer agrees with the reference's tokenizer. */
class ExtractSpec extends GraftSuite {
  import spark.implicits._

  /** test_data/io/test_systemt/test.dict lines joined by " "
    * (reference: spanner/test_extract.py:33-40). */
  val DictText = "Dictionary Entry Entry Help me! I am trapped In a Haiku factory! Save me before they"

  def docs = Seq((0L, DictText)).toDF("doc_id", "text")
  def toks = Tokenize.normalizedTokens(docs)

  test("tokenizer: simple_tokenizer parity — punct chars are single tokens") {
    val t = toks.orderBy("token_id").select("text").as[String].collect()
    assert(t.toSeq == Seq("Dictionary", "Entry", "Entry", "Help", "me", "!", "I",
      "am", "trapped", "In", "a", "Haiku", "factory", "!", "Save", "me", "before", "they"))
    // offsets reconstruct the text slices
    val bad = toks.filter(
      graft.spans.coveredText(lit(DictText), col("span")) =!= col("text")).count()
    assert(bad == 0)
  }

  test("extract_regex golden (test_extract.py:162-180)") {
    val r = Extract.extractRegex(docs, "[A-Z][^y]+y")
      .orderBy(col("span")("begin"))
      .select(col("span")("begin"), col("span")("end"), col("match"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(r.toSeq == Seq(
      (0, 10, "Dictionary"), (11, 16, "Entry"), (17, 22, "Entry"),
      (23, 63, "Help me! I am trapped In a Haiku factory"),
      (65, 84, "Save me before they")))
  }

  test("extract_regex_tok len=1 golden (test_extract.py:103-132)") {
    val r = Extract.extractRegexTok(docs, toks, ".*y$")
      .orderBy(col("span")("begin"))
      .select(col("span")("begin"), col("span")("end"), col("match"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(r.toSeq == Seq((0, 10, "Dictionary"), (11, 16, "Entry"),
      (17, 22, "Entry"), (56, 63, "factory"), (80, 84, "they")))
  }

  test("extract_regex_tok len=2 golden (test_extract.py:134-158)") {
    val r = Extract.extractRegexTok(docs, toks, ".*y$", 2, 2)
      .orderBy(col("span")("begin"))
      .select(col("span")("begin"), col("span")("end"), col("match"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(r.toSeq == Seq((0, 16, "Dictionary Entry"), (11, 22, "Entry Entry"),
      (50, 63, "Haiku factory"), (73, 84, "before they")))
  }

  test("create_dict + extract_dict golden (test_extract.py:42-101)") {
    val entries = Seq("Dictionary Entry", "Entry", "Help me! I am trapped",
      "In a Haiku factory!", "Save me before they").toDF("entry")
    val dict = Extract.createDict(entries)
    val got = dict.select(col("toks")).as[Seq[String]].collect().toSet
    assert(got == Set(
      Seq("dictionary", "entry"), Seq("entry"),
      Seq("help", "me", "!", "i", "am", "trapped"),
      Seq("in", "a", "haiku", "factory", "!"),
      Seq("save", "me", "before", "they")))

    // extractDict no longer imposes the reference's global output sort
    // (scale: ordering is the caller's choice) — sort on collect instead.
    val r = Extract.extractDict(docs, toks, dict)
      .select(col("span")("begin"), col("span")("end"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(r.toSeq.sorted == Seq((0, 16), (11, 16), (17, 22), (23, 44), (45, 64), (65, 84)))
  }

  test("extract_dict window-lookahead edge cases") {
    // entries sharing a first token at several lengths; entry running past
    // the end of the document must not match (lead() nulls fail equality)
    val d = Seq((0L, "key agg")).toDF("doc_id", "text")
    val t = graft.operators.Tokenize.normalizedTokens(d)
    val dict = Extract.createDict(
      Seq("key", "key agg", "key agg overflow").toDF("entry"))
    val r = Extract.extractDict(d, t, dict)
      .select(col("span")("begin_tok"), col("span")("end_tok"),
        col("span")("begin"), col("span")("end"))
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getInt(3)))
    assert(r.toSeq.sorted == Seq((0, 1, 0, 3), (0, 2, 0, 7)))
  }

  test("extract_dict never matches across token_id gaps (filtered tokens)") {
    // The reference extends matches by token-id arithmetic
    // (spanner/extract.py:169-182), so a multi-token entry cannot bridge a
    // removed token. Drop the middle token of "key noise agg" and require
    // that "key agg" does NOT match even though the rows are now adjacent.
    val d = Seq((0L, "key noise agg")).toDF("doc_id", "text")
    val t = graft.operators.Tokenize.normalizedTokens(d)
      .filter(col("normalized_text") =!= "noise")
    val dict = Extract.createDict(Seq("key", "key agg").toDF("entry"))
    val r = Extract.extractDict(d, t, dict)
      .select(col("span")("begin_tok"), col("span")("end_tok"))
      .collect().map(x => (x.getInt(0), x.getInt(1)))
    assert(r.toSeq == Seq((0, 1))) // only the single-token "key" match
  }

  test("extract_split goldens (test_extract.py:182-246)") {
    val doc = "This is a test. This is also a test."
    val d = Seq((0L, doc)).toDF("doc_id", "text")
    def splitsOf(pts: Seq[(Int, Int)]) =
      pts.toDF("b", "e").select(lit(0L).as("doc_id"),
        graft.spans.span(col("b"), col("e")).as("span"))
    def run(pts: Seq[(Int, Int)]) =
      Extract.extractSplit(d, splitsOf(pts)).orderBy(col("span")("begin"))
        .select(col("span")("begin"), col("span")("end"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq

    // Split in the middle at int offsets (zero-length spans)
    assert(run(Seq((15, 15), (20, 20))) == Seq((0, 15), (15, 20), (20, 36)))
    // Split at the edges
    assert(run(Seq((0, 0), (10, 10), (36, 36))) == Seq((0, 10), (10, 36)))
    // Duplicate splits
    assert(run(Seq((15, 15), (15, 15))) == Seq((0, 15), (15, 36)))
    // Split on spans — discard split-covered text
    assert(run(Seq((15, 16), (20, 24))) == Seq((0, 15), (16, 20), (24, 36)))
    // Out-of-order spans give the same answer
    assert(run(Seq((20, 24), (15, 16))) == Seq((0, 15), (16, 20), (24, 36)))
    // No split points → whole document
    assert(run(Seq.empty) == Seq((0, 36)))
  }
}
