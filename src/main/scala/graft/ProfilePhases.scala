package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the self-updating ingest loops (optimization
  * round diagnostics): times each sequential step of q173's lifecycle so
  * driver-side latency is attributable to a phase, not guessed. */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Storage.pinBucketedScans(spark)
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    for (rep <- 1 to reps) {
      println(s"== q173 lifecycle rep $rep")
      val out = java.nio.file.Files.createTempDirectory("graft_prof_takedown")
      val suf = out.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
      val idxTbl = "prof_q173_idx_" + suf
      val corTbl = "prof_q173_cor_" + suf
      val tsTbl = "prof_q173_ts_" + suf
      val batch1 = d.filter(col("doc_id") % 7 === 3).select("doc_id", "text")
      val batch2 = d.filter(col("doc_id") % 7 === 5).select("doc_id", "text")
      val corpus0 = d.filter(col("doc_id") % 21 === 0).select("doc_id", "text")
      val (tmplIdx, tmplCor) = t("seed templates") {
        val i = "prof_selfseed_idx_" + suf
        val c = "prof_selfseed_cor_" + suf
        sources.Storage.writeBucketed(
          operators.Dedup.lshBandIndex(corpus0, k = 8, bands = 4, shingleK = 3),
          i, s"$out/tmpl_idx", bucketCol = "key", buckets = 8)
        sources.Storage.writeBucketed(corpus0, c, s"$out/tmpl_cor",
          bucketCol = "doc_id", buckets = 8)
        (i, c)
      }
      t("cloneTable idx") {
        sources.Storage.cloneTable(spark, tmplIdx, idxTbl, s"$out/idx") }
      t("cloneTable cor") {
        sources.Storage.cloneTable(spark, tmplCor, corTbl, s"$out/cor") }
      val p1 = t("probe1 plan build") {
        streaming.DocumentStreams.probeStoredIndex(batch1, idxTbl, corTbl,
          threshold = 0.7, k = 8, bands = 4, shingleK = 3,
          tombstoneTable = Some(tsTbl))
      }
      if (rep == 1) java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/q173_probe1_plan.txt"),
        p1.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val r1 = t("probe1 localCheckpoint") { p1.localCheckpoint(true) }
      t("absorb1 (2 appends)") {
        streaming.DocumentStreams.updateStoredIndex(batch1, idxTbl, corTbl,
          k = 8, bands = 4, shingleK = 3)
      }
      t("recordDeletions") {
        streaming.DocumentStreams.recordDeletions(
          d.filter((col("doc_id") % 21 === 0 || col("doc_id") % 7 === 3) &&
              col("doc_id") % 2 === 0).select("doc_id"), tsTbl, s"$out/ts")
      }
      val p2 = t("probe2 plan build") {
        streaming.DocumentStreams.probeStoredIndex(batch2, idxTbl, corTbl,
          threshold = 0.7, k = 8, bands = 4, shingleK = 3,
          tombstoneTable = Some(tsTbl))
      }
      if (rep == 1) java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/q173_probe2_plan.txt"),
        p2.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val r2 = t("probe2 localCheckpoint") { p2.localCheckpoint(true) }
      t("absorb2 (2 appends)") {
        streaming.DocumentStreams.updateStoredIndex(batch2, idxTbl, corTbl,
          k = 8, bands = 4, shingleK = 3)
      }
      t("union+noop sink") {
        r1.unionByName(r2).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
