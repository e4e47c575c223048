package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. Each query is fully
  * materialized through the noop sink — a bare `count()` would let Catalyst
  * prune the projections being measured. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet paths once so the alphabetically-first
    // query doesn't absorb session startup in its measurement.
    try {
      spark.range(100000).selectExpr("sum(id)").write.format("noop")
        .mode("overwrite").save()
      spark.read.parquet(s"$sfDir/region.parquet").write.format("noop")
        .mode("overwrite").save()
    } catch { case _: Throwable => }
    // Min-of-N per query: a single hot run on a shared host lets one noisy
    // neighbor fail the perf gate (round-4 postmortem: 20 phantom >2x
    // regressions on byte-identical plans). The min across passes is the
    // best estimate of the plan's intrinsic cost. A wall-clock deadline
    // caps extra passes so a genuinely slow host still finishes pass 1
    // and reports, instead of timing out with no artifact. Malformed env
    // values fall back to the defaults (a bad knob must not kill the
    // artifact this machinery exists to protect).
    // Default deadline sized so that a full cold pass (~270 s over the
    // 90-query surface) still leaves room for a complete hot pass 2
    // (~80 s): 300 s proved too tight in practice — pass 2 died mid-way
    // through the cheap queries and the artifact degraded to a single
    // cold pass, which reads as a phantom 2x regression.
    val reps = scala.util.Try(sys.env("SPARK_GRAFT_REPS").toInt).getOrElse(3).max(1)
    val deadlineSec =
      scala.util.Try(sys.env("SPARK_GRAFT_DEADLINE_SEC").toDouble).getOrElse(450.0)
    val queries = SparkEntry.queries
    // Local-iteration filter (unset when the driver runs), same contract
    // as Verify's: only bench queries whose name matches the regex.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val names = queries.keys.toSeq.sorted
      .filter(n => only.forall(_.findFirstIn(n).isDefined))
    val best = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.SortedSet.empty[String]
    val benchT0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - benchT0) / 1e9
    var pass = 1
    var ran = 0
    var deadlineHit = false
    // Pass order: pass 1 runs sorted (stable, cache-friendly vs the warmup).
    // Passes >= 2 run by DESCENDING pass-1 time, so when a later pass is cut
    // short by the deadline the heaviest plans — exactly the ones whose cold
    // pass-1 numbers are least trustworthy — get their second sample first.
    var order = names
    while (pass <= reps && !deadlineHit && (pass == 1 || elapsed < deadlineSec)) {
      for (name <- order if !deadlineHit) {
        // Pass 1 always runs every query (so each gets at least one
        // measurement); later passes stop mid-pass at the deadline — the
        // per-query min stays valid, a pass is not a unit of measurement.
        if (pass > 1 && elapsed >= deadlineSec) deadlineHit = true
        else {
          val t0 = System.nanoTime()
          // A failed run must not feed best(name): a 0.1s exception would
          // otherwise read as the query's best time and mask the failure.
          val ok =
            try { queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
            }
          val sec = (System.nanoTime() - t0) / 1e9
          if (ok) {
            best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
            System.err.println(f"[bench] pass $pass $name%-24s $sec%8.2f s (best ${best(name)}%.2f)")
          } else failed += name
        }
      }
      if (!deadlineHit) ran = pass
      order = names.sortBy(n => -best.getOrElse(n, Double.MaxValue))
      pass += 1
    }
    // Queries that never succeeded are reported in "failed", not as times.
    val okNames = names.filter(best.contains)
    val qs = okNames.map { k => "\"" + k + "\":" + best(k) }
      .mkString("{", ",", "}")
    val failedJson = failed.filterNot(best.contains)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (okNames.nonEmpty) okNames.map(best).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","passes":$ran}""")
    spark.stop()
  }
}
