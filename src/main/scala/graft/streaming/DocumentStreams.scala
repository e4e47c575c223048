package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/**
 * Streaming document-ingest cleaning — the LLM-pipeline counterpart of
 * EventStreams (green-field; the reference has no streaming surface): a
 * continuously-arriving document stream is quality-filtered and
 * content-deduplicated before landing in the corpus.
 *
 * The SAME plan runs in batch (backfills, the declared query) and
 * streaming: quality scoring is a narrow expression, and the dedup is
 * `dropDuplicatesWithinWatermark` on the content hash in streaming mode —
 * state for a key is dropped once the watermark passes it, so state size
 * is bounded by the dedup horizon, not the corpus (the unbounded
 * `dropDuplicates` alternative would grow state forever at 100 TB/day).
 */
object DocumentStreams {

  /**
   * Quality-filter + exact-content-dedup.
   *
   * @param docs       columns: `text`; streaming inputs also need an
   *                   `event_time` timestamp column for the watermark
   * @param minQuality drop documents scoring below this ([[TextAnalysis.qualityScore]])
   * @param watermark  Some(horizon) on a streaming input — dedup state is
   *                   bounded to the horizon; None = batch (global dedup)
   * @return input rows that survive, plus `quality` and `text_key` columns
   */
  def cleanDocs(docs: DataFrame, minQuality: Double = 0.3,
      watermark: Option[String] = None): DataFrame = {
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      .withColumn("text_key", md5(col("text")))
    watermark match {
      case Some(w) => scored.withWatermark("event_time", w)
        .dropDuplicatesWithinWatermark("text_key")
      case None => scored.dropDuplicates("text_key")
    }
  }
}
