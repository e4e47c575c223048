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

  test("create_f1_score_report_iob per-type report quirks (analysis.py:69-170)") {
    // corpus: A@{1,2,3}, B@{10,11}; predicted: A@{1,2,4,5}, B@{10}, C@{20}
    val corpus = Seq((0L, 1, "A"), (0L, 2, "A"), (0L, 3, "A"),
      (0L, 10, "B"), (0L, 11, "B")).toDF("doc_id", "tok", "ent_type")
    val pred = Seq((0L, 1, "A"), (0L, 2, "A"), (0L, 4, "A"), (0L, 5, "A"),
      (0L, 10, "B"), (0L, 20, "C")).toDF("doc_id", "tok", "ent_type")
    val r = Cleaning.f1ScoreReportIob(pred, corpus, Seq("doc_id", "tok"))
      .collect().map(x => x.getString(0) -> x).toMap
    def d(row: org.apache.spark.sql.Row, i: Int): Double = row.getDouble(i)
    // A: tp=2 pp=4 ap=3; B: tp=1 pp=1 ap=2
    assert(d(r("A"), 1) == 0.5 && math.abs(d(r("A"), 2) - 2.0 / 3) < 1e-12)
    assert(math.abs(d(r("A"), 3) - 4.0 / 7) < 1e-12 && d(r("A"), 4) == 3.0)
    assert(d(r("B"), 1) == 1.0 && d(r("B"), 2) == 0.5)
    // C has no gold entities and no TP: pandas NaN -> engine NULL
    assert(r("C").isNullAt(1) && r("C").isNullAt(2) && r("C").isNullAt(3)
      && r("C").isNullAt(4))
    // Micro: sums skip the nulls -> tp=3 pp=6 ap=5
    assert(d(r("Micro-avg"), 1) == 0.5 && d(r("Micro-avg"), 2) == 0.6)
    assert(math.abs(d(r("Micro-avg"), 3) - 6.0 / 11) < 1e-12
      && d(r("Micro-avg"), 4) == 5.0)
    // Macro QUIRK: averages per-type rows AND the Micro row (skipna);
    // support reports the Micro total
    assert(math.abs(d(r("Macro-avg"), 1) - 2.0 / 3) < 1e-12)
    assert(math.abs(d(r("Macro-avg"), 2) - 53.0 / 90) < 1e-12)
    assert(math.abs(d(r("Macro-avg"), 3) - 6360.0 / 10170) < 1e-12)
    assert(d(r("Macro-avg"), 4) == 5.0)
  }

  test("simple + ensemble f1 reports (analysis.py:108-133,172-207)") {
    val corpus = Seq((0L, 1, "A"), (0L, 2, "A"), (0L, 3, "A"),
      (0L, 10, "B"), (0L, 11, "B")).toDF("doc_id", "tok", "ent_type")
    val pred = Seq((0L, 1, "A"), (0L, 2, "A"), (0L, 4, "A"), (0L, 5, "A"),
      (0L, 10, "B"), (0L, 20, "C")).toDF("doc_id", "tok", "ent_type")
    val s = Cleaning.f1ScoreReportSimple(pred, corpus, Seq("doc_id", "tok")).head
    assert(s.getDouble(0) == 0.5 && s.getDouble(1) == 0.6
      && math.abs(s.getDouble(2) - 6.0 / 11) < 1e-12)
    // zero predictions -> all-zero row (reference early return)
    val z = Cleaning.f1ScoreReportSimple(pred.limit(0), corpus,
      Seq("doc_id", "tok")).head
    assert(z.getDouble(0) == 0.0 && z.getDouble(1) == 0.0 && z.getDouble(2) == 0.0)
    val e = Cleaning.f1ReportEnsembleIob(
        Seq("imperfect" -> pred, "perfect" -> corpus), corpus, Seq("doc_id", "tok"))
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(math.abs(e("imperfect") - 6.0 / 11) < 1e-12 && e("perfect") == 1.0)
  }

  test("align_model_outputs_to_tokens joins on (fold, doc_num, token_id) " +
      "and verifies integrity (analysis.py:288-328)") {
    val toks = Seq(("tr", 0L, 0, 0, 3, "B", "A"), ("tr", 0L, 1, 4, 7, "O", null),
      ("tr", 1L, 0, 0, 2, "O", null))
      .toDF("fold", "doc_num", "token_id", "b", "e", "ent_iob", "ent_type")
      .select(col("fold"), col("doc_num"), col("token_id"),
        graft.spans.span(col("b"), col("e")).as("span"),
        col("ent_iob"), col("ent_type"))
    val preds = Seq(("tr", 0L, 0, "B", "A"), ("tr", 0L, 1, "B", "X"))
      .toDF("fold", "doc_num", "token_id", "predicted_iob", "predicted_type")
    val r = Cleaning.alignModelOutputsToTokens(toks, preds)
      .select("doc_num", "token_id", "ent_iob", "predicted_iob", "predicted_type")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getString(2),
        x.getString(3), x.getString(4))).toSet
    // doc 1 has no predictions -> inner join drops it
    assert(r == Set((0L, 0, "B", "B", "A"), (0L, 1, "O", "B", "X")))
    // verify_integrity=True: duplicate prediction keys throw
    val dup = preds.union(preds.limit(1))
    intercept[IllegalArgumentException] {
      Cleaning.alignModelOutputsToTokens(toks, dup)
    }
  }

  test("spanToString matches Span.__repr__ + textwrap.shorten goldens " +
      "(span.py:146-153)") {
    // expected strings computed with CPython textwrap.shorten(covered, 80)
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val cases = Seq(
      (0, 5, "[0, 5): 'alpha'"),
      (16, 22, "[16, 22): 'delta'"), // trailing space in covered -> trimmed
      (0, 100, "[0, 100): 'alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa lambda mu nu xi [...]'"),
      (6, 104, "[6, 104): 'beta gamma delta epsilon zeta eta theta iota " +
        "kappa lambda mu nu xi omicron [...]'"),
      (0, 105, "[0, 105): 'alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa lambda mu nu xi [...]'"))
    val got = cases.map { case (b, e, _) => (b, e) }
      .toDF("b", "e").withColumn("text", lit(text))
      .select(graft.spans.spanToString(col("text"),
        graft.spans.span(col("b"), col("e"))).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._3))
    // whitespace collapse + NULL span -> NA
    val extra = Seq(("a  b   c", false), ("a  b   c", true))
      .toDF("text", "nullSpan")
      .select(graft.spans.spanToString(col("text"),
        when(!col("nullSpan"), graft.spans.span(lit(0), lit(8)))).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(extra == Seq("[0, 8): 'a b c'", "NA"))
  }

  test("csvPrep hand-labeling sheets (analysis.py:331-396)") {
    val counts = Seq(
      (2L, true, "dev", 0L, 0, 5, "PER"),
      (0L, true, "dev", 1L, 6, 10, "ORG"),   // low-agreement gold -> first
      (3L, false, "dev", 0L, 13, 18, "LOC"), // high-agreement miss -> first
      (1L, false, "test", 2L, 0, 10, "LOC"))
      .toDF("count", "in_gold", "fold", "doc_num", "b", "e", "ent_type")
      .withColumn("text", lit("first second third fourth fifth"))
      .withColumn("span", graft.spans.span(col("b"), col("e")))
    val (inG, notG) = Cleaning.csvPrep(counts, "count")
    assert(inG.columns.toSeq == Seq("count", "fold", "doc_offset",
      "corpus_span", "corpus_ent_type", "error_type", "correct_span",
      "correct_ent_type", "notes", "time_started", "time_stopped",
      "time_elapsed"))
    assert(notG.columns.toSeq == Seq("count", "fold", "doc_offset",
      "model_span", "model_ent_type", "error_type", "corpus_span",
      "corpus_ent_type", "correct_span", "correct_ent_type", "notes",
      "time_started", "time_stopped", "time_elapsed"))
    val gotIn = inG.collect().map(r => (r.getLong(0), r.getLong(2),
      r.getString(3), r.getString(4), r.getString(5))).toSeq
    // ascending agreement; blanks empty; span in reference string form
    assert(gotIn == Seq(
      (0L, 1L, "[6, 10): 'seco'", "ORG", ""),
      (2L, 0L, "[0, 5): 'first'", "PER", "")))
    val gotNot = notG.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getString(3), r.getString(4))).toSeq
    // descending agreement
    assert(gotNot == Seq(
      (3L, "dev", 0L, "[13, 18): 'third'", "LOC"),
      (1L, "test", 2L, "[0, 10): 'first seco'", "LOC")))
    assert(notG.collect().forall(r =>
      Seq(5, 6, 7, 8, 9, 10, 11, 12, 13).forall(i => r.getString(i) == "")))
  }

  test("combineRawSpansDocs merges folds into spans; ToMatch semi-joins (preprocess.py)") {
    import spark.implicits._
    // two folds of IOB-tagged tokens: doc 0 has one K entity (tokens 1-2),
    // doc 5 has one K entity (token 0)
    def tok(doc: Long, id: Int, iob: String, typ: String) =
      (doc, id, iob, Option(typ).filter(_.nonEmpty))
    val train = Seq(tok(0L, 0, "O", ""), tok(0L, 1, "B", "K"), tok(0L, 2, "I", "K"))
      .toDF("doc_id", "token_id", "ent_iob", "ent_type")
      .select(col("doc_id"), col("token_id"), col("ent_iob"), col("ent_type"),
        spans.tokenSpan(col("token_id"), col("token_id") + 1,
          col("token_id") * 3, col("token_id") * 3 + 2).as("span"))
    val test_ = Seq(tok(5L, 0, "B", "K"), tok(5L, 1, "O", ""))
      .toDF("doc_id", "token_id", "ent_iob", "ent_type")
      .select(col("doc_id"), col("token_id"), col("ent_iob"), col("ent_type"),
        spans.tokenSpan(col("token_id"), col("token_id") + 1,
          col("token_id") * 3, col("token_id") * 3 + 2).as("span"))
    val merged = Cleaning.combineRawSpansDocs(
      Seq("train" -> train, "test" -> test_))
    val rows = merged.select(col("fold"), col("doc_num"),
        col("span")("begin_tok"), col("span")("end_tok"), col("ent_type"))
      .as[(String, Long, Int, Int, String)].collect().toSet
    assert(rows == Set(("train", 0L, 1, 3, "K"), ("test", 5L, 0, 1, "K")))
    // to-match keeps only listed (fold, doc_num) pairs
    val m = Seq(("test", 5L)).toDF("fold", "doc_num")
    val matched = Cleaning.combineRawSpansDocsToMatch(
      Seq("train" -> train, "test" -> test_), m)
      .select("fold", "doc_num").as[(String, Long)].collect().toSeq
    assert(matched == Seq(("test", 5L)))
  }

  test("classificationReport matches a hand-computed sklearn report (analysis.py:41-66)") {
    import spark.implicits._
    // gold [K K V O O O], pred [K V V O O X]: exercises a perfect-precision
    // label (K), a pred-only label with zero gold rows (X, zero_division=0),
    // and all three summary rows
    val df = Seq(("K", "K"), ("K", "V"), ("V", "V"),
      ("O", "O"), ("O", "O"), ("O", "X")).toDF("gold", "pred")
    val r = Cleaning.classificationReport(df, "gold", "pred")
      .as[(String, Double, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    def near(a: (Double, Double, Double, Double),
        b: (Double, Double, Double, Double)): Boolean =
      Seq(a._1 - b._1, a._2 - b._2, a._3 - b._3, a._4 - b._4)
        .forall(d => math.abs(d) < 1e-9)
    assert(r.keySet == Set("K", "O", "V", "X", "accuracy", "macro avg", "weighted avg"))
    assert(near(r("K"), (1.0, 0.5, 2.0 / 3, 2.0)))
    assert(near(r("O"), (1.0, 2.0 / 3, 0.8, 3.0)))
    assert(near(r("V"), (0.5, 1.0, 2.0 / 3, 1.0)))
    assert(near(r("X"), (0.0, 0.0, 0.0, 0.0))) // zero_division=0
    // accuracy row: the transposed report's scalar fills all four columns
    assert(near(r("accuracy"), (4.0 / 6, 4.0 / 6, 4.0 / 6, 4.0 / 6)))
    assert(near(r("macro avg"), (0.625, (0.5 + 2.0 / 3 + 1.0) / 4,
      (2.0 / 3 + 0.8 + 2.0 / 3) / 4, 6.0)))
    assert(near(r("weighted avg"), (5.5 / 6, 4.0 / 6,
      (2.0 / 3 * 2 + 0.8 * 3 + 2.0 / 3) / 6, 6.0)))
  }

  test("accuracyByDocument + globalAccuracy reference parity (io/conll.py:1461-1542)") {
    def fents(rows: (String, Long, Int, Int, String)*) =
      rows.toSeq.toDF("fold", "doc_num", "bt", "et", "ent_type")
        .select(col("fold"), col("doc_num"),
          graft.spans.tokenSpan(col("bt"), col("et"), lit(0), lit(0)).as("span"),
          col("ent_type"))
    // train/0: gold A,B; pred A,C → tp=1, ext=2, ent=2
    // train/1: gold A;   pred B   → tp=0, ext=1, ent=1 (F1 NULL: 0/0)
    // test/0:  gold A,A (dup); pred A,A → multiset tp=4 (pandas merge)
    val gold = fents(("train", 0L, 0, 1, "A"), ("train", 0L, 2, 3, "B"),
      ("train", 1L, 0, 1, "A"),
      ("test", 0L, 0, 1, "A"), ("test", 0L, 0, 1, "A"))
    val pred = fents(("train", 0L, 0, 1, "A"), ("train", 0L, 4, 5, "C"),
      ("train", 1L, 2, 3, "B"),
      ("test", 0L, 0, 1, "A"), ("test", 0L, 0, 1, "A"))
    val byDoc = Cleaning.accuracyByDocument(gold, pred)
    val r = byDoc.select("fold", "doc_num", "num_true_positives",
        "num_extracted", "num_entities", "precision", "recall", "F1")
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4),
          Option(x.get(5)), Option(x.get(6)), Option(x.get(7))))).toMap
    assert(r(("train", 0L)) ==
      ((1L, 2L, 2L, Some(0.5), Some(0.5), Some(0.5))))
    // tp=0: precision/recall 0, F1 = 0/0 → NULL (pandas NaN)
    assert(r(("train", 1L)) == ((0L, 1L, 1L, Some(0.0), Some(0.0), None)))
    // duplicate gold rows: pandas-merge multiset semantics → tp = 2·2
    assert(r(("test", 0L)) == ((4L, 2L, 2L, Some(2.0), Some(2.0), Some(2.0))))
    // global micro-average: sums first (5, 5, 5), ratios after
    val g = Cleaning.globalAccuracy(byDoc).head
    assert((g.getLong(0), g.getLong(1), g.getLong(2)) == ((5L, 5L, 5L)))
    assert((g.getDouble(3), g.getDouble(4), g.getDouble(5)) == ((1.0, 1.0, 1.0)))
  }

  test("unpack_semijoin shifts spans by the region offset (join.py:206-244)") {
    val model = Seq((7L, 5, 10, 100)).toDF("doc_id", "b", "e", "off")
      .select(col("doc_id"), graft.spans.span(col("b"), col("e")).as("span"), col("off"))
    val r = SpanJoin.unpackSemijoin(model, "span", "off")
      .select(col("span")("begin"), col("span")("end")).head
    assert((r.getInt(0), r.getInt(1)) == (105, 110))
  }
}
