package graft

import org.apache.spark.sql.functions._
import graft.sources.WatsonNlu

/**
 * Watson NLU parsing against the reference's own checked-in response
 * fixtures (reference: test_data/io/test_watson responses, exercised by
 * io/watson/test_nlu.py). Goldens below are values read directly from the
 * fixture JSON.
 */
class WatsonSpec extends GraftSuite {

  private def fixture(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/reference/test_data/io/test_watson/$name")))

  private lazy val basic = {
    import spark.implicits._
    Seq((0L, fixture("basic_response.txt"))).toDF("doc_id", "response")
  }
  private lazy val mentions = {
    import spark.implicits._
    Seq((0L, fixture("mentions_response.txt"))).toDF("doc_id", "response")
  }

  test("syntax frame: tokens + sentence containment (test_nlu.py syntax goldens)") {
    val syn = WatsonNlu.syntax(basic).collect()
    assert(syn.length == 35)
    val first = WatsonNlu.syntax(basic).orderBy(col("span")("begin")).head()
    assert(first.getStruct(1).getInt(0) == 0 && first.getStruct(1).getInt(1) == 2)
    assert(first.getString(2) == "SCONJ" && first.getString(3) == "if")
    // every token lands inside exactly one of the 4 sentences
    val bad = WatsonNlu.syntax(basic).filter(col("sentence").isNull).count()
    assert(bad == 0)
    assert(WatsonNlu.syntax(basic).select("sentence").distinct().count() == 4)
  }

  test("entities frame (basic_response)") {
    val e = WatsonNlu.entities(basic).collect()
    assert(e.length == 1)
    val r = e.head
    assert(r.getString(1) == "Location" && r.getString(2) == "Alaska")
    assert(r.getLong(6) == 1L && math.abs(r.getDouble(7) - 0.999498) < 1e-9)
  }

  test("entity_mentions frame: one row per mention with span (mentions_response)") {
    val m = WatsonNlu.entityMentions(mentions)
      .select(col("text"), col("span")("begin"), col("span")("end"), col("confidence"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .sortBy(x => (x._2))
    assert(m.toSeq == Seq(
      ("Steven Wright", 64, 77, 0.998251),
      ("Alaska", 138, 144, 0.999498),
      ("Steven Wright", 177, 190, 0.998251)))
  }

  test("keywords frame (basic_response)") {
    val k = WatsonNlu.keywords(basic).select("text", "count", "relevance").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(-_._3)
    assert(k.toSeq == Seq(
      ("Bermuda Triangle", 1L, 0.994976),
      ("Santa Claus", 1L, 0.947765),
      ("warm weather", 1L, 0.820549)))
  }

  test("relations frame with argument spans (basic_response)") {
    val r = WatsonNlu.relations(basic).head()
    assert(r.getString(1) == "managerOf")
    assert(math.abs(r.getDouble(3) - 0.244055) < 1e-9)
    assert(r.getStruct(4).getInt(0) == 48 && r.getStruct(4).getInt(1) == 51)
    assert(r.getStruct(5).getInt(0) == 52 && r.getStruct(5).getInt(1) == 59)
    assert(r.getString(6) == "Person" && r.getString(7) == "Person")
  }

  test("semantic_roles frame (basic_response)") {
    val roles = WatsonNlu.semanticRoles(basic)
      .select("subject_text", "action_normalized").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(roles.toSet == Set(
      ("Barbie", "be"), ("you", "have to buy"), ("The Bermuda Triangle", "tire")))
  }

  test("make_span_from_entities greedy scan (io/watson/nlu.py:531-576)") {
    import spark.implicits._
    val docs = Seq((0L, "the cat sat on the cat mat")).toDF("doc_id", "text")
    val ents = Seq((0L, 0, "cat"), (0L, 1, "cat"), (0L, 2, "dog"))
      .toDF("doc_id", "ent_idx", "text")
    val got = WatsonNlu.makeSpanFromEntities(docs, ents)
      .select(col("entity"), col("span")("begin"), col("span")("end"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sortBy(_._2)
    // second "cat" matches at the next occurrence after the first; "dog" drops
    assert(got.toSeq == Seq(("cat", 4, 7), ("cat", 19, 22)))
  }
}
