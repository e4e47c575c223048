package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tensor

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths:
 *  - brute-force cosine top-k: broadcast the (small) query set, score every
 *    corpus row, per-query top-k via window. Exact; linear in corpus size,
 *    embarrassingly parallel — the right baseline even at scale when the
 *    query set is small.
 *  - LSH-bucketed top-k: sign-LSH buckets (with single-bit probing) shrink
 *    the candidate set per query; approximate but sub-linear work.
 */
object Similarity {

  /**
   * Exact brute-force cosine top-k. `queries` is broadcast; ties broken by
   * corpus id for determinism. Output: query_id, vec_id, cos, rank.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val q = queries.select(col(queryIdCol), col(vecCol).as("q_vec"))
    val scored = corpus.select(col(idCol), col(vecCol).as("c_vec"))
      .crossJoin(broadcast(q))
      .withColumn("cos", round(tensor.cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(queryIdCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }

  /**
   * Approximate top-k via sign-LSH: candidates share the query's bucket or
   * any single-bit-flip neighbor; exact cosine re-rank inside candidates.
   * Recall < 1 by construction; the scale path when queries are many.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      nPlanes: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val cb = corpus.select(col(idCol), col(vecCol).as("c_vec"),
      Dedup.signBucket(col(vecCol), nPlanes).as("bucket"))
    val qb = queries.select(col(queryIdCol), col(vecCol).as("q_vec"),
      Dedup.signBucket(col(vecCol), nPlanes).as("qbucket"))
    // probe: query also looks in all single-bit-flip buckets
    val probed = qb.select(col(queryIdCol), col("q_vec"), explode(array(
      (col("qbucket") +: (0 until nPlanes).map(p =>
        col("qbucket").bitwiseXOR(lit(1L << p)))): _*)).as("bucket"))
    val w = Window.partitionBy(queryIdCol).orderBy(col("cos").desc, col(idCol))
    probed.join(cb, Seq("bucket"))
      .dropDuplicates(queryIdCol, idCol)
      .withColumn("cos", round(tensor.cosine(col("q_vec"), col("c_vec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }
}
