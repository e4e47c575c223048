package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.spans

/**
 * IOB/IOB2 tag machinery (reference: io/conll.py). The reference implements
 * these with sequential Python loops; here they are pure window + aggregate
 * plans (SURVEY §2.5/§2.8) — distributed, codegen-friendly, one shuffle on
 * doc_id.
 */
object Iob {

  /**
   * IOB1 → IOB2 correction (`_iob_to_iob2`, reference: io/conll.py:590-646):
   * an `I` tag becomes `B` when it starts an entity — previous tag `O` (or
   * none), previous token a different entity type, or a sentence boundary.
   *
   * Requires columns: doc_id, token_id, `<name>_iob`, `<name>_type`, and a
   * sentence-begin column (`sentence.begin_tok` by default).
   */
  def iobToIob2(tokens: DataFrame, name: String = "ent",
      sentenceBeginCol: String = "sentence.begin_tok"): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("token_id")
    val iob = col(s"${name}_iob")
    val prevIob = lag(col(s"${name}_iob"), 1).over(w)
    val prevType = lag(col(s"${name}_type"), 1).over(w)
    val prevSent = lag(col(sentenceBeginCol), 1).over(w)
    tokens.withColumn(s"${name}_iob",
      when(iob === "I" &&
        (prevIob.isNull || prevIob === "O" ||
          !(col(s"${name}_type") <=> prevType) ||
          !(col(sentenceBeginCol) <=> prevSent)), "B")
        .otherwise(iob))
  }

  /**
   * IOB2 tags → entity token spans (`iob_to_spans`, reference:
   * io/conll.py:856-938). The reference's iterative prefix-expansion becomes
   * sessionization: a running count of non-`I` tags assigns each token a
   * segment id; segments whose first tag is `B` are entities. Entities
   * extend through `I` tags regardless of the `I` token's type, and the
   * entity type is the `B` token's type — both reference behaviors.
   *
   * Requires: doc_id, token_id, span (char span), `<iobCol>`, `<typeCol>`.
   * Output: doc_id, span struct<begin_tok,end_tok,begin,end>, ent_type.
   */
  def iobToSpans(tokens: DataFrame, iobCol: String = "ent_iob",
      typeCol: String = "ent_type"): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("token_id")
    tokens
      .withColumn("__seg",
        sum(when(col(iobCol) === "I", 0).otherwise(1)).over(w))
      .filter(col(iobCol).isin("B", "I"))
      .groupBy(col("doc_id"), col("__seg"))
      .agg(
        min("token_id").as("begin_tok"),
        (max("token_id") + 1).as("end_tok"),
        min_by(col(iobCol), col("token_id")).as("__first_tag"),
        min_by(col(typeCol), col("token_id")).as("ent_type"),
        min(col("span")("begin")).as("b"),
        max(col("span")("end")).as("e"))
      .filter(col("__first_tag") === "B")
      .select(col("doc_id"),
        spans.tokenSpan(col("begin_tok"), col("end_tok"), col("b"), col("e")).as("span"),
        col("ent_type"))
  }

  /**
   * Entity spans → per-token IOB2 tags (`spans_to_iob`, reference:
   * io/conll.py:941-1021): tag `B` at the entity's first token, `I`
   * inside, `O` elsewhere.
   *
   * Exactly one output row per token, like the reference: a token covered
   * by several (overlapping, unconsolidated) entities keeps the smallest
   * (begin_tok, end_tok, ent_type) — deterministic, no join fan-out.
   * Each entity EXPLODES its token range (entities are short; the blowup
   * is the covered tokens themselves), the winner per token is ONE
   * partial-aggregatable min(struct), and tokens left-join the winners on
   * (doc_id, token_id) — a hash-joinable key. This replaces a doc_id-only
   * containment theta-join (candidates = tokens × entities per document,
   * quadratic in doc length) followed by a per-token row_number window
   * (a full extra sort-shuffle).
   *
   * `entities`: doc_id, span struct with begin_tok/end_tok, ent_type.
   * Output: `tokens` + ent_iob, ent_type.
   */
  def spansToIob(tokens: DataFrame, entities: DataFrame): DataFrame = {
    val best = entities.select(col("doc_id").as("e_doc_id"),
        col("span")("begin_tok").as("e_begin"), col("span")("end_tok").as("e_end"),
        col("ent_type").as("e_type"))
      .filter(col("e_end") > col("e_begin")) // empty spans cover no token
      .withColumn("t_tok", explode(sequence(col("e_begin"), col("e_end") - 1)))
      .groupBy(col("e_doc_id"), col("t_tok"))
      .agg(min(struct(col("e_begin"), col("e_end"), col("e_type"))).as("e"))
    tokens.join(best,
        col("doc_id") === col("e_doc_id") && col("token_id") === col("t_tok"),
        "left")
      .withColumn("ent_iob",
        when(col("token_id") === col("e")("e_begin"), "B")
          .when(col("e")("e_begin").isNotNull, "I")
          .otherwise("O"))
      .withColumn("ent_type", col("e")("e_type"))
      .drop("e_doc_id", "t_tok", "e")
  }

  /**
   * All composite token-class labels for an entity-type domain
   * (`make_iob_tag_categories`, reference: io/conll.py:1238-1260):
   * `"O"` first, then `B-<type>` for every type, then `I-<type>` —
   * the label's position in the list IS its integer id.
   */
  def makeIobTagCategories(entityTypes: Seq[String]): Seq[String] =
    "O" +: (for (x <- Seq("B", "I"); y <- entityTypes) yield s"$x-$y")

  /**
   * Add `token_class` (composite string label, `"O"` or `"<iob>-<type>"`)
   * and `token_class_id` (its integer id) columns (`add_token_classes`,
   * reference: io/conll.py:1262-1302).
   *
   * The label↔id mapping is a literal `map` expression — pure codegen'd
   * projection, no join, no shuffle, no driver state: the categorical
   * domain is tiny by contract (it is a model's output layer). Labels
   * outside `categories` yield NULL ids, surfacing domain drift instead
   * of silently inventing an id (the reference raises KeyError there).
   *
   * Unlike the reference, `categories` is required: its fallback derives
   * the domain from data-appearance order (conll.py:1291-1296), which is
   * not reproducible on a distributed shuffle. Callers wanting a derived
   * domain compute it explicitly (one tiny distinct-agg) and sort it.
   */
  def addTokenClasses(tokens: DataFrame, categories: Seq[String],
      iobCol: String = "ent_iob", typeCol: String = "ent_type"): DataFrame = {
    require(categories.nonEmpty && categories.head == "O",
      s"categories must start with 'O' (got ${categories.take(3).mkString(",")}...)")
    val labelToId = map(categories.zipWithIndex.flatMap {
      case (l, i) => Seq(lit(l), lit(i))
    }: _*)
    tokens
      .withColumn("token_class", when(col(iobCol) === "O", lit("O"))
        .otherwise(concat_ws("-", col(iobCol), col(typeCol))))
      .withColumn("token_class_id", element_at(labelToId, col("token_class")))
  }

  /**
   * Inverse of [[addTokenClasses]] (`decode_class_labels`, reference:
   * io/conll.py:1313-1323): split composite `"B-TYPE"`/`"I-TYPE"` labels
   * back into `(ent_iob, ent_type)` columns; `"O"` decodes to
   * `("O", NULL)`. Mirrors the reference's `t.split("-")[1]` — only the
   * SECOND dash-field becomes the type. Pure codegen projection, no
   * shuffle.
   */
  def decodeClassLabels(df: DataFrame, classCol: String = "token_class",
      iobCol: String = "ent_iob", typeCol: String = "ent_type"): DataFrame =
    df.withColumn(iobCol, when(col(classCol) === "O", lit("O"))
        .otherwise(substring(col(classCol), 1, 1)))
      .withColumn(typeCol, when(col(classCol) === "O", lit(null).cast("string"))
        .otherwise(element_at(split(col(classCol), "-"), 2)))

  /**
   * Per-document precision/recall/F1 of predicted vs gold entity spans
   * (reference: io/conll.py:1461-1516): true positives are the exact-match
   * inner join on (doc, span, type).
   */
  def prfScores(predicted: DataFrame, gold: DataFrame): DataFrame = {
    // ONE scan per input (the naive tp/np/ng formulation instantiates the
    // predicted and gold subtrees twice each — expensive when they are
    // derived relations, e.g. a window+groupBy over a tokenized corpus):
    // gold collapses to per-(doc, span, type) counts `g`; the multiset
    // inner-join TP count is then sum(__gc) over matching pred rows, and
    // n_pred stays exact because the join key is unique in `g` (no
    // fan-out). n_gold reuses the same `g` subtree — its shuffle is
    // deduplicated by Spark's ReuseExchange, so gold is read once.
    val g = gold.groupBy("doc_id", "span", "ent_type").agg(count(lit(1)).as("__gc"))
    val perDoc = predicted.join(g, Seq("doc_id", "span", "ent_type"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pred"), sum(coalesce(col("__gc"), lit(0L))).as("tp"))
    val ng = g.groupBy("doc_id").agg(sum("__gc").as("n_gold"))
    perDoc.join(ng, Seq("doc_id"), "full")
      .na.fill(0, Seq("tp", "n_pred", "n_gold"))
      .withColumn("precision", when(col("n_pred") > 0, col("tp") / col("n_pred")).otherwise(lit(0.0)))
      .withColumn("recall", when(col("n_gold") > 0, col("tp") / col("n_gold")).otherwise(lit(0.0)))
      .withColumn("f1", when(col("precision") + col("recall") > 0,
        lit(2) * col("precision") * col("recall") / (col("precision") + col("recall")))
        .otherwise(lit(0.0)))
  }
}
