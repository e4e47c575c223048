package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Optimization-round profiler: for each named query, dump
 * `explain("formatted")` to a file and run it N times through the noop
 * sink with a listener that prints per-job wall and per-stage task-time
 * breakdowns — the local stand-in for the Spark UI's stage table
 * (spark.ui is disabled in the bench harness).
 *
 * Usage: runMain graft.ProfileQueries <outDir> <reps> <name>[,<name>...]
 *        [sfDir]
 */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
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
    new java.io.File(outDir).mkdirs()

    // per-job / per-stage timing listener
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, (System.nanoTime(),
          Option(e.properties).map(_.getProperty("spark.job.description", ""))
            .getOrElse("")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(e.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms >= 20) lines.add(f"    job ${e.jobId}%4d ${ms / 1000}%8.3f s  $desc")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val run = si.taskMetrics.executorRunTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val shr = si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6
        val shw = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
        if (run >= 0.05)
          lines.add(f"      stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"run=$run%8.3f cpu=$cpu%8.3f shufR=$shr%8.2fMB shufW=$shw%8.2fMB  " +
            si.name.take(80))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val mk = SparkEntry.queries(name)
      // plan dump (initial adaptive plan — what a code change perturbs)
      val df = mk(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_plan.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"== $name (plan -> $outDir/${name}_plan.txt)")
      var best = Double.MaxValue
      for (r <- 1 to reps) {
        lines.clear()
        spark.sparkContext.setJobDescription(s"$name rep $r")
        val t0 = System.nanoTime()
        mk(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        // give the listener bus a moment to drain before printing
        Thread.sleep(300)
        println(f"  rep $r: $sec%8.3f s")
        if (r == reps) { // print breakdown of the LAST (warmest) rep
          val it = lines.iterator()
          while (it.hasNext) println(it.next())
        }
      }
      println(f"  BEST $name $best%8.3f s")
    }
    spark.stop()
  }
}
