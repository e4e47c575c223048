package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-cleaning toolkit (reference: cleaning/analysis.py) — the
 * label-error analysis the reference is known for (CoNLL label-correction
 * papers): correlate the entities predicted by an ensemble of models with
 * the corpus "gold" labels and rank elements by model agreement.
 */
object Cleaning {

  /**
   * Agreement counts between model predictions and gold labels
   * (`flag_suspicious_labels`, reference: cleaning/analysis.py:210-284).
   *
   * Semantics follow the reference exactly: gold rows contribute 0 to the
   * agreement count and set `in_gold`; each model row contributes 1; rows
   * are grouped over (alignCols..., label) with in_gold = any, count = sum,
   * models = list of agreeing model names. The reference then splits/sorts
   * for presentation (`split_doc`); here sorting is the caller's choice
   * (`inGold` / `notInGold` helpers below) — a global sort is an
   * all-to-one exchange the 100 TB path doesn't want by default.
   *
   * Model names are collected SORTED (the reference preserves concat
   * order; a distributed groupBy has no stable input order, so sorted is
   * the deterministic equivalent).
   *
   * @param models ordered (name, predictions) pairs; each predictions
   *               DataFrame needs alignCols + labelCol
   * @param gold   gold-label DataFrame with the same columns
   */
  def flagSuspiciousLabels(models: Seq[(String, DataFrame)], gold: DataFrame,
      alignCols: Seq[String] = Seq("doc_id", "span"),
      labelCol: String = "ent_type"): DataFrame = {
    val pick = (alignCols :+ labelCol).map(col)
    val g = gold.select(pick: _*)
      .withColumn("__model", lit("GOLD"))
      .withColumn("__in_gold", lit(true)).withColumn("__cnt", lit(0L))
    val ms = models.map { case (name, df) =>
      df.select(pick: _*)
        .withColumn("__model", lit(name))
        .withColumn("__in_gold", lit(false)).withColumn("__cnt", lit(1L))
    }
    ms.foldLeft(g)(_ unionByName _)
      .groupBy((alignCols :+ labelCol).map(col): _*)
      .agg(
        max(col("__in_gold")).as("in_gold"),
        sum(col("__cnt")).as("count"),
        sort_array(collect_list(col("__model"))).as("models"))
  }

  /** Elements in the gold standard with LOW model agreement — likely
    * label errors (reference in_gold split, analysis.py:275-279). */
  def inGold(flagged: DataFrame): DataFrame =
    flagged.filter(col("in_gold")).orderBy(col("count").asc)

  /** Elements NOT in the gold standard with HIGH model agreement — likely
    * missing labels (reference not_in_gold split, analysis.py:280-283). */
  def notInGold(flagged: DataFrame): DataFrame =
    flagged.filter(!col("in_gold")).orderBy(col("count").desc)

  /**
   * Merge per-fold corpora into one DataFrame with leading `fold` column
   * (`combine_folds`, reference: io/conll.py:1437-1458). The reference
   * stacks per-document pandas frames; the engine's corpora are already
   * single DataFrames with doc ids, so this is a tagged unionByName.
   */
  def combineFolds(folds: Seq[(String, DataFrame)]): DataFrame =
    folds.map { case (name, df) => df.select((lit(name).as("fold") +: df.columns.toIndexedSeq.map(col)): _*) }
      .reduce(_ unionByName _)
}
