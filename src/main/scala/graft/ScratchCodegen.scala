package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Round-22 scratch: count QualityStatsExpr evaluations in the generated
  * whole-stage code for filter+project consumers, and A/B the
  * Catalyst `With` (common-expression) wrapper that dedups them at the
  * optimizer level. Throwaway diagnostics, like ScratchProf. */
object ScratchCodegen {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
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
    val d = spark.read.parquet(s"$dir/documents.parquet")

    import org.apache.spark.sql.graft.Cse

    // With-wrapped qualityScore: same arithmetic, struct bound once.
    // Field order: n_chars, n_punct, n_words, word_len_sum, n_stop_en.
    def qualityScoreW(text: Column): Column = {
      val stc = org.apache.spark.sql.graft.QualityStatsExpr(text)
      Cse.bind(stc) { st =>
        val nWords = st("n_words").cast("double")
        val lengthCredit = least(nWords / 200.0, lit(1.0))
        val pr = when(st("n_chars") > 0,
          st("n_punct").cast("double") / st("n_chars")).otherwise(lit(0.0))
        val punctPenalty = greatest(lit(0.0), lit(1.0) - pr * 5)
        val mwl = when(st("n_words") > 0,
          st("word_len_sum").cast("double") / st("n_words")).otherwise(lit(0.0))
        val wordShape = when(mwl >= 2 && mwl <= 12, 1.0).otherwise(0.5)
        val sr = when(st("n_words") > 0,
          st("n_stop_en").cast("double") / st("n_words")).otherwise(lit(0.0))
        val stopCredit = when(sr > 0.05, 1.0).otherwise(0.7)
        round(lengthCredit * 0.4 + punctPenalty * 0.2 + wordShape * 0.2 +
          stopCredit * 0.2, 4)
      }
    }

    def cleanShape(q: Column) = d
      .withColumn("quality", q)
      .filter(col("quality") >= 0.3)
      .withColumn("text_key", md5(col("text")))
      .dropDuplicates("text_key")

    def time(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 5) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"  [scg] $label%-28s best $best%6.3f s")
    }

    def countStatsOf(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val code = org.apache.spark.sql.execution.debug.codegenString(
        df.queryExecution.executedPlan)
      val n = "statsOf\\(".r.findAllIn(code).size
      println(s"  [scg] $label generated statsOf call sites: $n")
    }

    val plain = cleanShape(operators.TextAnalysis.qualityScore(col("text")))
    val cse = cleanShape(qualityScoreW(col("text")))
    countStatsOf(plain, "plain")
    countStatsOf(cse, "with-cse")
    // value parity before timing
    val a = plain.select("doc_id", "quality").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = cse.select("doc_id", "quality").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    println(s"  [scg] parity: ${a == b} (${a.size} rows)")
    time("plain", plain)
    time("with-cse", cse)
    spark.stop()
  }
}
