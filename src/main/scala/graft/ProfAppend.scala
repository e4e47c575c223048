package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-timing of the bucketed append path (the self-updating loops'
  * write half): attributes the ~0.4 s/append driver latency between
  * write job, commit protocol, and catalog work, and A/Bs the
  * commit-protocol knobs. */
object ProfAppend {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    for (a <- args.lift(1)) {
      if (a.contains("v2")) {
        b.config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      }
      if (a.contains("nosuccess")) {
        b.config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Storage.pinBucketedScans(spark)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val batch = d.filter(col("doc_id") % 7 === 3).select("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft_profappend")
    val tbl = "prof_append_" + out.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
    graft.sources.Storage.writeBucketed(batch, tbl, s"$out/t",
      bucketCol = "doc_id", buckets = 8)
    // warm
    graft.sources.Storage.appendBucketed(batch, tbl, "doc_id", 8)
    val n = 10
    val t0 = System.nanoTime()
    for (_ <- 1 to n)
      graft.sources.Storage.appendBucketed(batch, tbl, "doc_id", 8)
    val per = (System.nanoTime() - t0) / 1e9 / n
    println(f"[append] mode=${args.lift(1).getOrElse("default")}%-12s per-append $per%6.3f s")
    spark.stop()
  }
}
