package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed-storage helpers — the co-location lever for 100 TB pipelines.
 *
 * Every span operator keys its shuffles by `doc_id` (tokens ⋈ spans,
 * window functions, per-document aggregation). Writing the hot relations
 * bucketed by `doc_id` moves that shuffle from every query to the write:
 * Catalyst recognizes matching bucket specs and plans same-key joins and
 * aggregations with NO Exchange on the bucketed side(s). At 1000
 * executors that is the difference between an all-to-all of the token
 * stream per query and none.
 */
object Storage {

  /**
   * Persist `df` as a bucketed+sorted table. Joins/groupBys on
   * `bucketCol` between tables written with the same spec are
   * exchange-free.
   */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String = "doc_id", buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /**
   * Append `df` to an existing table written by [[writeBucketed]], with
   * the SAME bucket spec — Spark hash-buckets the appended rows into a
   * new file per (written task, bucket), so bucket pruning and
   * co-located joins keep holding over the union of all appends. This is
   * the incremental-index lever: a new batch lands as its own bucketed
   * files (cost ∝ batch), the existing index files are never rewritten,
   * and a probe still opens only the probed buckets' files across every
   * append generation.
   */
  def appendBucketed(df: DataFrame, table: String,
      bucketCol: String = "doc_id", buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /**
   * Compact an appended table back to ONE FILE PER BUCKET.
   *
   * [[appendBucketed]] lands one new file per (write task, bucket) per
   * batch — the right write-side economics (existing files never
   * rewritten, cost ∝ batch), but a 24/7 ingest accumulates files
   * linearly in batch count until listing + parquet-footer overhead
   * dominates even a bucket-pruned read. Compaction is the standard
   * answer: rewrite the table's rows bucketed under the SAME spec, with
   * the rows pre-partitioned BY THE BUCKET COLUMN into `buckets`
   * partitions — `repartition(n, col)` and the bucketed writer share
   * Spark's HashPartitioning bucket-id arithmetic, so every row of
   * bucket b lands in exactly one task and the write emits exactly one
   * file per non-empty bucket.
   *
   * The swap is two catalog operations (drop + rename), not a data
   * copy: the compacted relation is written to a fresh sibling
   * directory as `<table>_compact`, the original table is dropped
   * (external — its files are removed best-effort afterwards), and the
   * temp table is renamed into place. Readers that resolved the table
   * BEFORE the swap keep reading the old snapshot's files (deleted
   * last); new resolutions see the compacted spec-identical table, so
   * bucket pruning and co-located joins are unchanged (StorageSpec
   * asserts row parity and SelectedBucketsCount across the swap).
   */
  def compactBuckets(spark: SparkSession, table: String,
      bucketCol: String = "doc_id", buckets: Int = 32): Unit = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.functions.col
    val meta = spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
    val oldPath = java.nio.file.Paths.get(meta.location)
    val newPath = oldPath.resolveSibling(
      oldPath.getFileName.toString + s"_c${System.nanoTime()}")
    val tmp = table + "_compact"
    spark.table(table)
      .repartition(buckets, col(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .option("path", newPath.toString)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    // old generation's files: best-effort removal, AFTER the swap
    try {
      java.nio.file.Files.walk(oldPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Exception => () }
  }

  /**
   * Pin bucketed scans ON for the session. Every graft table is bucketed
   * DELIBERATELY (co-located joins, or bucket-pruned index probes).
   * Spark's DisableUnnecessaryBucketedScan rule models only the join/agg
   * co-location benefit — under a broadcast join it silently reverts to a
   * non-bucketed scan and thereby LOSES bucket pruning ("Bucketed: false
   * (disabled by query planner)"), turning a probe that should open 1 of
   * N shards into a full index read. Call ONCE at session initialization
   * (the graft harness mains and test fixture all do); [[readTable]] does
   * not mutate session config.
   */
  def pinBucketedScans(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")

  /** Read a table written by [[writeBucketed]]/[[appendBucketed]]. Assumes
   *  [[pinBucketedScans]] was applied at session init (bucket pruning is
   *  lost otherwise — a perf hazard, never a correctness one). */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
