package graft

import org.apache.spark.sql.functions._
import graft.operators.PosTagger
import graft.sources.{Conll, Spacy}

/** The trained spaCy-host adapter: fit a real Spark ML POS tagger on the
  * engine's own CoNLL-U reader output (reference fixture with Universal
  * POS labels) and drive makeTokensAndFeatures with it. */
class PosTaggerSpec extends GraftSuite {

  private lazy val labeled = Conll.conllU(spark,
    "/root/reference/test_data/io/test_conll/conll_u_test1.txt")
    .select("text", "upostag")

  test("tagger fits the fixture and generalizes its regularities") {
    val m = PosTagger.train(labeled)
    assert(m.labels.length >= 8) // UPOS inventory of the fixture
    // self-fit accuracy: a real learner must beat the majority class by far
    val rows = labeled.collect().map(r => (r.getString(0), r.getString(1)))
    val acc = rows.count { case (w, p) => m.tag(w) == p }.toDouble / rows.length
    val majority = rows.groupBy(_._2).values.map(_.length).max.toDouble / rows.length
    assert(acc > 0.9, s"self-fit accuracy $acc")
    assert(acc > majority + 0.2, s"acc $acc vs majority $majority")
    // learned regularities, not memorization: unseen inflections
    assert(m.tag("warehouses") == "NOUN" || m.tag("warehouse") == "NOUN")
    assert(m.tag(",") == "PUNCT")
  }

  test("trained annotator drives makeTokensAndFeatures") {
    import spark.implicits._
    val m = PosTagger.train(labeled)
    val docs = Seq((0L, "The judge nominated two individuals on Tuesday."))
      .toDF("doc_id", "text")
    val out = Spacy.makeTokensAndFeatures(docs, PosTagger.annotator(m))
      .select("token_id", "text", "pos").as[(Int, String, String)]
      .collect().sortBy(_._1)
    assert(out.map(_._2).toSeq ==
      Seq("The", "judge", "nominated", "two", "individuals", "on", "Tuesday", "."))
    val pos = out.map(x => x._2 -> x._3).toMap
    assert(pos("The") == "DET")      // high-frequency closed-class word
    assert(pos(".") == "PUNCT")
    assert(pos("nominated") == "VERB") // appears inflected in the fixture
  }
}
