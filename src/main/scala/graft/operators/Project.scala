package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Span projection operators (`lemmatize`, reference: spanner/project.py:36-66).
 */
object Project {

  /**
   * Replace each token span's covered text by the space-joined lemmas of its
   * tokens (`lemmatize`, reference: spanner/project.py:36-66). The reference
   * iterates spans in Python and indexes the token-features frame; here each
   * span EXPLODES its `[begin_tok, end_tok)` range (spans are token-bounded,
   * so the blowup is exactly the tokens being projected) and equi-joins
   * tokens on (doc_id, token_id) — a plain hash-joinable key, unlike the
   * doc_id-only range join it replaces, whose candidate set was
   * spans × tokens PER DOCUMENT (quadratic in doc length). Order is
   * restored inside the aggregate with `array_sort` over (token_id, lemma)
   * structs (no per-group sort pass).
   *
   * @param spansDf  relation with doc_id + a token-span column `on`
   *                 (struct with begin_tok/end_tok); rows must be distinct
   * @param tokenFeatures tokens relation with doc_id, token_id and `lemmaCol`
   * @return spansDf columns + `lemmas` (space-joined, token order)
   */
  def lemmatize(spansDf: DataFrame, tokenFeatures: DataFrame, on: String = "span",
      lemmaCol: String = "lemma"): DataFrame = {
    val toks = tokenFeatures.select(col("doc_id").as("t_doc_id"),
      col("token_id").as("t_tok"), col(lemmaCol).as("t_lemma"))
    spansDf
      // empty spans have no tokens: dropped by the inner join either way,
      // filtered here so sequence() never sees a descending range
      .filter(col(on)("end_tok") > col(on)("begin_tok"))
      .withColumn("__tok",
        explode(sequence(col(on)("begin_tok"), col(on)("end_tok") - 1)))
      .join(toks, col("doc_id") === col("t_doc_id") && col("__tok") === col("t_tok"))
      .groupBy(spansDf.columns.toIndexedSeq.map(col): _*)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("t_tok"), col("t_lemma").as("l")))),
        x => x("l")), " ").as("lemmas"))
  }
}
