package graft

import org.apache.spark.sql.functions._
import graft.operators.Iob
import graft.sources.Conll

/** CoNLL reader goldens ported from reference io/test_conll.py, using the
  * reference's checked-in fixture files (read-only). */
class ConllSpec extends GraftSuite {
  import spark.implicits._

  val Fixture = "/root/reference/test_data/io/test_conll/conll03_test.txt"

  lazy val toks = Conll.conll2003(spark, Fixture,
    columnNames = Seq("ent"), iobColumns = Seq(true))

  test("conll_2003 token offsets + IOB2 correction golden (test_conll.py:77-133)") {
    assert(toks.select("doc_num").distinct().count() == 2)
    val doc0 = toks.filter(col("doc_num") === 0).orderBy("token_id")
      .select(col("span")("begin"), col("span")("end"), col("text"),
        col("ent_iob"), col("ent_type"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getString(3), Option(r.getString(4)).orNull))
    val expected = Seq(
      (0, 3, "Who", "O", null), (4, 6, "is", "O", null),
      (7, 14, "General", "B", "PER"), (15, 22, "Failure", "I", "PER"),
      (23, 24, "(", "O", null), (24, 27, "and", "O", null),
      (28, 31, "why", "O", null), (32, 34, "is", "B", "FOO"),
      (35, 37, "he", "B", "BAR"), (38, 45, "reading", "O", null),
      (46, 48, "my", "O", null), (49, 53, "hard", "B", "FAB"),
      (54, 58, "disk", "B", "FAB"), (58, 59, ")", "O", null),
      (59, 60, "?", "O", null), (61, 63, "If", "O", null),
      (64, 70, "Barbie", "B", "PER"), (71, 73, "is", "O", null),
      (74, 76, "so", "O", null), (77, 84, "popular", "O", null),
      (84, 85, ",", "O", null), (86, 89, "why", "O", null),
      (90, 92, "do", "O", null), (93, 96, "you", "O", null),
      (97, 101, "have", "O", null), (102, 104, "to", "O", null),
      (105, 108, "buy", "O", null), (109, 115, "Barbie", "B", "PER"),
      (115, 117, "'s", "O", null), (118, 125, "friends", "O", null),
      (125, 126, "?", "O", null))
    assert(doc0.toSeq == expected)
  }

  test("document text reconstruction matches reference golden") {
    val docs = Conll.documents(toks).orderBy("doc_num")
      .select("text").as[String].collect()
    assert(docs(0) ==
      "Who is General Failure (and why is he reading my hard disk)?\n" +
      "If Barbie is so popular, why do you have to buy Barbie's friends?")
    assert(docs(1) == "-DOCSTART-\nI'd kill for a Nobel Peace Prize.")
  }

  test("iob_to_spans sessionization (io/conll.py:856-938)") {
    val ents = Iob.iobToSpans(toks.filter(col("doc_num") === 0))
      .orderBy(col("span")("begin_tok"))
      .select(col("span")("begin_tok"), col("span")("end_tok"), col("ent_type"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(ents.toSeq == Seq((2, 4, "PER"), (7, 8, "FOO"), (8, 9, "BAR"),
      (11, 12, "FAB"), (12, 13, "FAB"), (16, 17, "PER"), (27, 28, "PER")))
  }

  test("spans_to_iob round-trips iob_to_spans") {
    val doc0 = toks.filter(col("doc_num") === 0)
    val ents = Iob.iobToSpans(doc0)
    val tagged = Iob.spansToIob(doc0.drop("ent_iob", "ent_type"), ents)
      .orderBy("token_id").select("ent_iob", "ent_type")
      .collect().map(r => (r.getString(0), Option(r.getString(1)).orNull))
    val orig = doc0.orderBy("token_id").select("ent_iob", "ent_type")
      .collect().map(r => (r.getString(0), Option(r.getString(1)).orNull))
    assert(tagged.toSeq == orig.toSeq)
  }

  test("conll_2003_output aligns tags to corpus tokens (io/conll.py:508-587)") {
    val out = Conll.conll2003Output(spark, toks,
      "/root/reference/test_data/io/test_conll/conll03_output.txt")
    assert(out.count() == toks.count())
    // First token of doc 0 is tagged I-BAND in the output file → B after IOB2
    val first = out.filter(col("doc_num") === 0 && col("token_id") === 0)
      .select("ent_iob", "ent_type").head
    assert((first.getString(0), first.getString(1)) == ("B", "BAND"))
    // The fold-offset prefix sum must not plan an UNPARTITIONED window:
    // fold totals accumulate through the triangular self-join, so every
    // window in the plan is partitioned (by fold or doc) — no stage sorts
    // the whole relation in one task.
    val globalWindows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"unpartitioned window in conll2003Output plan:\n${globalWindows.mkString}")
  }

  test("conll_u reader: offsets, metadata, head re-pointing (io/conll.py:1078-1177)") {
    val u = Conll.conllU(spark,
      "/root/reference/test_data/io/test_conll/conll_u_test1.txt")
    val s0 = u.filter(col("doc_num") === 0 && col("sentence")("begin_tok") === 0)
      .orderBy("token_id")
    val r = s0.select("text", "lemma", "upostag", "head").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2),
        if (x.isNullAt(3)) -1 else x.getInt(3)))
    // "From the AP comes this story :" — heads are 1-based in-sentence,
    // re-pointed to 0-based doc token ids; root (0) → null (-1 here)
    assert(r.toSeq == Seq(
      ("From", "from", "ADP", 2), ("the", "the", "DET", 2),
      ("AP", "AP", "PROPN", 3), ("comes", "come", "VERB", -1),
      ("this", "this", "DET", 5), ("story", "story", "NOUN", 3),
      (":", ":", "PUNCT", 3)))
    // metadata column carried per sentence
    val sid = s0.select("sentence_id").distinct().as[String].collect()
    assert(sid.toSeq == Seq(
      "weblog-blogspot.com_nominations_20041117172713_ENG_20041117_172713-0001"))
  }

  test("conll_u predicate-args mode (CoNLL-09, io/conll.py:292-306)") {
    val u = Conll.conllU(spark,
      "/root/reference/test_data/io/test_conll/conll_09_test1.conllu",
      hasPredicateArgs = true)
    // sentence 2, token 'fall': fill-pred flag in deps, sense in misc,
    // no entry in the predicate column
    val fall = u.filter(col("text") === "fall" && col("deps") === "Y").head()
    assert(fall.getAs[String]("misc") == "fall.01")
    assert(fall.getAs[String]("predicate") == null)
    // 'Exchange' carries A1 in the first extra (predicate) column
    val exch = u.filter(col("text") === "Exchange").head()
    assert(exch.getAs[String]("predicate") == "A1")
    assert(exch.getSeq[String](exch.fieldIndex("pred_args")).length == 4)
    // first sentence has no extra fields → empty args
    val no = u.filter(col("text") === "Monday").head()
    assert(no.getAs[String]("predicate") == null)
    assert(no.getSeq[String](no.fieldIndex("pred_args")).isEmpty)
  }

  test("conll_u separate_sentences_by_doc (io/conll.py:1082)") {
    val whole = Conll.conllU(spark,
      "/root/reference/test_data/io/test_conll/conll_u_test1.txt")
    val perSent = Conll.conllU(spark,
      "/root/reference/test_data/io/test_conll/conll_u_test1.txt",
      separateSentencesByDoc = true)
    val nSent = whole.select(col("doc_id"), col("sentence")("begin_tok"))
      .distinct().count()
    assert(perSent.select("doc_id").distinct().count() == nSent)
    assert(perSent.count() == whole.count())
    // every per-sentence doc starts its tokens and offsets at 0
    assert(perSent.filter(col("token_id") === 0).count() == nSent)
    assert(perSent.filter(col("token_id") === 0 &&
      col("span")("begin") =!= 0).count() == 0)
  }

  test("make_iob_tag_categories label order and ids (io/conll.py:1238-1260)") {
    // reference doctest: entity_types=["PER"] → ["O", "B-PER", "I-PER"]
    assert(Iob.makeIobTagCategories(Seq("PER")) == Seq("O", "B-PER", "I-PER"))
    // B-* block before I-* block, types in given order within each block
    assert(Iob.makeIobTagCategories(Seq("PER", "LOC")) ==
      Seq("O", "B-PER", "B-LOC", "I-PER", "I-LOC"))
  }

  test("add_token_classes composite labels + ids (io/conll.py:1262-1302)") {
    import spark.implicits._
    val toks = Seq(
      (0L, 0, "O", null.asInstanceOf[String]),
      (0L, 1, "B", "PER"),
      (0L, 2, "I", "PER"),
      (0L, 3, "B", "LOC"),
      (0L, 4, "O", null.asInstanceOf[String]))
      .toDF("doc_id", "token_id", "ent_iob", "ent_type")
    val cats = Iob.makeIobTagCategories(Seq("PER", "LOC"))
    val out = Iob.addTokenClasses(toks, cats).orderBy("token_id")
      .select("token_class", "token_class_id").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(out.toSeq == Seq(("O", 0), ("B-PER", 1), ("I-PER", 3), ("B-LOC", 2), ("O", 0)))
    // a label outside the domain surfaces as a NULL id, not a wrong id
    val bad = Iob.addTokenClasses(
      Seq((0L, 0, "B", "ORG")).toDF("doc_id", "token_id", "ent_iob", "ent_type"), cats)
    assert(bad.head().isNullAt(bad.columns.indexOf("token_class_id")))
    // categories must lead with "O" (the reference's id-0 contract)
    intercept[IllegalArgumentException] {
      Iob.addTokenClasses(toks, Seq("B-PER", "O"))
    }
  }

  test("decode_class_labels inverts add_token_classes (io/conll.py:1313-1323)") {
    import spark.implicits._
    val toks = Seq(
      (0L, 0, "O", null.asInstanceOf[String]),
      (0L, 1, "B", "PER"),
      (0L, 2, "I", "PER"),
      (0L, 3, "B", "LOC"))
      .toDF("doc_id", "token_id", "ent_iob", "ent_type")
    val classed = Iob.addTokenClasses(toks, Iob.makeIobTagCategories(Seq("PER", "LOC")))
      .select("doc_id", "token_id", "token_class")
    val decoded = Iob.decodeClassLabels(classed).orderBy("token_id")
      .select("ent_iob", "ent_type").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(decoded.toSeq == Seq(("O", null), ("B", "PER"), ("I", "PER"), ("B", "LOC")))
    // reference takes split("-")[1]: only the SECOND dash-field is the type
    val odd = Iob.decodeClassLabels(Seq((0L, "I-A-B")).toDF("doc_id", "token_class"))
      .select("ent_iob", "ent_type").head()
    assert((odd.getString(0), odd.getString(1)) == (("I", "A")))
  }
}
