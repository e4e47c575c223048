package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.StringIndexer
import org.apache.spark.mllib.feature.HashingTF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Spacy

/**
 * REAL trained annotator for the pluggable spaCy-style host
 * (`Spacy.Annotator`, sources/Spacy.scala): a multinomial logistic
 * regression POS tagger trained with Spark ML on any labeled token
 * relation — e.g. the engine's own CoNLL-U reader output, whose `upostag`
 * column carries Universal POS labels. A real spaCy pipeline is a native
 * Python artifact (unavailable in this JVM-only build by design); this
 * closes the host seam with genuinely learned weights behind the exact
 * `String => Seq[TokFeat]` signature an external-process or JNI spaCy
 * adapter would use.
 *
 * Features per token: lowercase identity, 3/2-char suffixes, word shape,
 * and coarse character-class flags, hashed to a fixed-width TF vector.
 * The fitted model travels to executors inside the annotator closure
 * (coefficient matrix ≈ numFeatures × numLabels — megabytes, not the
 * corpus), so tagging stays a narrow mapPartitions like every host.
 */
object PosTagger {

  /** Feature strings for one token (shared by train and inference). */
  private[operators] def feats(w: String): Seq[String] = {
    val lower = w.toLowerCase
    val shape = Spacy.wordShape(w)
    Seq(s"w=$lower",
      s"s3=${lower.takeRight(3)}", s"s2=${lower.takeRight(2)}",
      s"sh=$shape",
      s"up=${w.headOption.exists(_.isUpper)}",
      s"num=${w.forall(_.isDigit)}",
      s"pun=${w.matches("\\p{Punct}+")}")
  }

  /** A fitted tagger: label strings + the predict function. The mllib
    * HashingTF hashes a single token's feature bag on either side of the
    * train/inference boundary (the ml variant only transforms Datasets). */
  case class Model(labels: Array[String],
      predict: org.apache.spark.ml.linalg.Vector => Double,
      hash: HashingTF) extends Serializable {
    def tag(word: String): String =
      labels(predict(hash.transform(feats(word)).asML).toInt)
  }

  /**
   * Fit on a labeled token relation (`wordCol`, `posCol` columns; rows
   * with NULL labels are dropped). Deterministic for fixed input: the
   * single-partition training set gives LBFGS a stable gradient order.
   */
  def train(labeled: DataFrame, wordCol: String = "text",
      posCol: String = "upostag", numFeatures: Int = 1 << 14): Model = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val hash = new HashingTF(numFeatures)
    val rows = labeled.select(col(wordCol).cast("string"), col(posCol).cast("string"))
      .filter(col(wordCol).isNotNull && col(posCol).isNotNull)
      .as[(String, String)].coalesce(1)
      .map { case (w, p) => (hash.transform(feats(w)).asML, p) }
      .toDF("features", "pos")
    val indexer = new StringIndexer().setInputCol("pos").setOutputCol("label")
      .setStringOrderType("alphabetAsc").fit(rows)
    val prepared = indexer.transform(rows)
    val lr = new LogisticRegression().setMaxIter(60).setRegParam(1e-4)
      .setFamily("multinomial").fit(prepared)
    Model(indexer.labelsArray(0), lr.predict _, hash)
  }

  /** Adapt a fitted tagger to the Spacy host: engine tokenizer for
    * offsets, model-predicted `pos`/`tag`, the shared rule bookkeeping
    * (Spacy.ruleFeat) for the remaining feature columns. */
  def annotator(model: Model): Spacy.Annotator = (text: String) => {
    if (text == null) Seq.empty
    else Tokenize.tokenOffsets(text).map { case (b, e) =>
      Spacy.ruleFeat(text, b, e, model.tag(text.substring(b, e)))
    }
  }
}
