package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Tokenize

/**
 * SpaCy-style token features (`make_tokens_and_features`, reference:
 * io/spacy.py:93-152). The reference runs a real SpaCy language model per
 * document; the engine hosts an arbitrary annotator the same way it hosts
 * BERT (mapPartitions, one annotator instance per partition, documents
 * streamed through). No SpaCy exists in this sandbox, so the default is a
 * clearly-marked deterministic stub producing the same SCHEMA — swap in a
 * JNI/external-process annotator without touching the plan.
 *
 * `left`/`right` neighbor token ids (io/spacy.py:144-151) and the sentence
 * column (io/spacy.py:155-174) are pure window/containment plans added on
 * top, not annotator work.
 */
object Spacy {

  /** Per-token features as produced by the annotator. */
  case class TokFeat(begin: Int, end: Int, lemma: String, pos: String,
    tag: String, dep: String, head: Int, shape: String,
    entIob: String, entType: String, isAlpha: Boolean, isStop: Boolean)

  type Annotator = String => Seq[TokFeat]

  /** spaCy-style word shape (x/X/d classes). One definition for every
    * annotator so stub and trained hosts can't drift apart. */
  def wordShape(t: String): String =
    t.replaceAll("[a-z]", "x").replaceAll("[A-Z]", "X").replaceAll("[0-9]", "d")

  /** Rule-derived bookkeeping (lemma/shape/flags) shared by the stub and
    * by trained annotators that only replace the POS decision — the one
    * place these rules live, so hosts stay interchangeable. */
  def ruleFeat(text: String, b: Int, e: Int, pos: String): TokFeat = {
    val t = text.substring(b, e)
    TokFeat(b, e, t.toLowerCase.replaceAll("s+$", ""), pos, pos, "dep", 0,
      wordShape(t), "O", null, t.matches("[A-Za-z]+"),
      graft.operators.TextAnalysis.StopwordsEn.contains(t.toLowerCase))
  }

  /** Deterministic STUB annotator: engine tokenizer + rule-based features
    * (the real thing is a SpaCy pipeline behind the same signature). */
  val stubAnnotator: Annotator = (text: String) => {
    if (text == null) Seq.empty
    else Tokenize.tokenOffsets(text).map { case (b, e) =>
      val t = text.substring(b, e)
      val isStop = graft.operators.TextAnalysis.StopwordsEn.contains(t.toLowerCase)
      val pos = if (isStop) "DET" else if (t.length > 4) "NOUN" else "X"
      ruleFeat(text, b, e, pos)
    }
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("token_id", IntegerType),
    StructField("span", graft.types.spanType),
    StructField("text", StringType),
    StructField("lemma", StringType),
    StructField("pos", StringType),
    StructField("tag", StringType),
    StructField("dep", StringType),
    StructField("head", IntegerType),
    StructField("shape", StringType),
    StructField("ent_iob", StringType),
    StructField("ent_type", StringType),
    StructField("is_alpha", BooleanType),
    StructField("is_stop", BooleanType),
    StructField("sentence", graft.types.tokenSpanType)))

  /**
   * One row per token with the reference's feature schema
   * (io/spacy.py:128-143). The stub emits one sentence per document
   * (whole-doc token span); a real annotator's sentence boundaries slot
   * into the same column.
   */
  def makeTokensAndFeatures(docs: DataFrame, annotator: Annotator = stubAnnotator,
      addLeftAndRight: Boolean = false): DataFrame = {
    val in = docs.select(col("doc_id").cast("long"), col("text"))
    val base = in.mapPartitions { rows =>
      rows.flatMap { r =>
        val docId = r.getLong(0)
        val text = r.getString(1)
        val feats = annotator(text)
        val n = feats.length
        val docLen = if (text == null) 0 else text.length
        feats.zipWithIndex.map { case (f, i) =>
          Row(docId, i, Row(f.begin, f.end), text.substring(f.begin, f.end),
            f.lemma, f.pos, f.tag, f.dep, f.head, f.shape, f.entIob, f.entType,
            f.isAlpha, f.isStop, Row(0, n, 0, docLen))
        }
      }
    }(Encoders.row(outSchema))
    if (!addLeftAndRight) base
    else {
      // left/right = lag/lead over (doc, token order) — io/spacy.py:144-151
      val w = Window.partitionBy("doc_id").orderBy("token_id")
      base.withColumn("left", lag("token_id", 1).over(w))
        .withColumn("right", lead("token_id", 1).over(w))
    }
  }
}
