package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-22 attribution of the self-updating loops' per-append latency:
  * splits each ~0.4 s bucketed `saveAsTable` append into JOB wall (time
  * between the first job start and last job end Spark actually ran) and
  * DRIVER-side residue (analysis/planning/commit/catalog — everything
  * outside any job), and A/Bs the append against cheaper write shapes so
  * the expensive ingredient is named, not guessed:
  *   noop        — compute the batch, discard (no write machinery)
  *   parquet     — plain non-bucketed path write (no catalog)
  *   bucketedApp — Storage.appendBucketed (the loops' real shape)
  * Input is localCheckpointed first so none of the forms pays the docs
  * scan — the numbers isolate the WRITE path itself. */
object ProfAppendDetail {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
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

    // job-time listener: wall covered by at least one running job
    val jobWall = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) {
          jobWall.addAndGet(System.nanoTime() - s)
          jobCount.incrementAndGet()
        }
      }
    })

    val d = spark.read.parquet(s"$dir/documents.parquet")
    val batch = d.filter(col("doc_id") % 7 === 3).select("doc_id", "text")
      .localCheckpoint(true)
    val out = java.nio.file.Files.createTempDirectory("graft_profappend2")
    val suf = out.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")

    def timed(label: String)(f: => Unit): Unit = {
      // settle listener
      Thread.sleep(50)
      val jw0 = jobWall.get(); val jc0 = jobCount.get()
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      val wall = (System.nanoTime() - t0) / 1e9 / reps
      Thread.sleep(100) // let job-end events drain
      val jw = (jobWall.get() - jw0) / 1e9 / reps
      val jc = (jobCount.get() - jc0).toDouble / reps
      println(f"  [apd] $label%-34s wall $wall%6.3f s  jobs $jc%4.1f  " +
        f"job-wall $jw%6.3f s  driver-residue ${wall - jw}%6.3f s")
    }

    // warm every shape once
    val tbl = "prof_apd_" + suf
    graft.sources.Storage.writeBucketed(batch, tbl, s"$out/t", "doc_id", 8)
    graft.sources.Storage.appendBucketed(batch, tbl, "doc_id", 8)
    batch.write.format("noop").mode("overwrite").save()
    batch.write.mode("overwrite").parquet(s"$out/plain")
    val tblU = "prof_apd_u_" + suf
    batch.write.option("path", s"$out/u").saveAsTable(tblU)
    batch.write.mode("append").saveAsTable(tblU)

    timed("noop (compute only)") {
      batch.write.format("noop").mode("overwrite").save()
    }
    timed("plain parquet path append") {
      batch.write.mode("append").parquet(s"$out/plain")
    }
    timed("saveAsTable append UNbucketed") {
      batch.write.mode("append").saveAsTable(tblU)
    }
    timed("appendBucketed (loops' shape)") {
      graft.sources.Storage.appendBucketed(batch, tbl, "doc_id", 8)
    }
    // the index-side shape: derive band rows from the batch then append
    val idxTbl = "prof_apd_idx_" + suf
    graft.sources.Storage.writeBucketed(
      operators.Dedup.lshBandIndex(batch, k = 8, bands = 4, shingleK = 3),
      idxTbl, s"$out/idx", bucketCol = "key", buckets = 8)
    timed("appendBucketed lshBandIndex(batch)") {
      graft.sources.Storage.appendBucketed(
        operators.Dedup.lshBandIndex(batch, k = 8, bands = 4, shingleK = 3),
        idxTbl, bucketCol = "key", buckets = 8)
    }
    // clone cost (the loops' per-run setup)
    timed("cloneTable of the bucketed table") {
      graft.sources.Storage.cloneTable(spark, tbl, "prof_apd_cl_" + suf,
        s"$out/cl")
    }
    // clone sub-step attribution: file copy vs DROP vs CREATE DDL
    locally {
      import org.apache.spark.sql.catalyst.TableIdentifier
      val catalog = spark.sessionState.catalog
      val meta = catalog.getTableMetadata(TableIdentifier(tbl))
      val bs = meta.bucketSpec.get
      val srcLoc = new org.apache.hadoop.fs.Path(meta.location)
      val conf = spark.sessionState.newHadoopConf()
      var tCopy = 0.0; var tDrop = 0.0; var tCreate = 0.0
      var i = 0
      while (i < reps) {
        val dst = s"prof_apd_cs_${suf}_$i"
        val dstLoc = new org.apache.hadoop.fs.Path(s"$out/cs$i")
        val fs = dstLoc.getFileSystem(conf)
        val t0 = System.nanoTime()
        org.apache.hadoop.fs.FileUtil.copy(
          srcLoc.getFileSystem(conf), srcLoc, fs, dstLoc, false, true, conf)
        val t1 = System.nanoTime()
        val bucketCols = bs.bucketColumnNames.map(c => s"`$c`").mkString(", ")
        val sortCols = bs.sortColumnNames.map(c => s"`$c`").mkString(", ")
        val sc = if (bs.sortColumnNames.nonEmpty) s"SORTED BY ($sortCols)" else ""
        spark.sql(
          s"""CREATE TABLE `$dst` (${meta.schema.toDDL})
             |USING parquet
             |CLUSTERED BY ($bucketCols) $sc INTO ${bs.numBuckets} BUCKETS
             |LOCATION '${dstLoc.toString}'""".stripMargin)
        val t2 = System.nanoTime()
        spark.sql(s"DROP TABLE `$dst`")
        val t3 = System.nanoTime()
        tCopy += (t1 - t0) / 1e9; tCreate += (t2 - t1) / 1e9
        tDrop += (t3 - t2) / 1e9
        i += 1
      }
      println(f"  [apd] clone substeps: copy ${tCopy / reps}%6.3f s  " +
        f"createDDL ${tCreate / reps}%6.3f s  dropDDL ${tDrop / reps}%6.3f s")
    }
    spark.stop()
  }
}
