package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the CoNLL export/re-read queries: times each
  * phase of q58 separately so floor regressions can be localized
  * (VERDICT r7 "what's wrong" #1). Not part of the declared surface. */
object ProfileConll {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Storage.pinBucketedScans(spark)

    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - s) / 1e9}%.3f s")
      r
    }

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 3).foreach { pass =>
      println(s"---- pass $pass ----")
      val outC = java.nio.file.Files.createTempDirectory("prof_c").toString
      val outT = java.nio.file.Files.createTempDirectory("prof_t").toString
      val tdf = docs.filter(col("doc_id") < SparkEntry.ConllRoundtripCap)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n"),
          posexplode(split(col("text"), " ")).as(Seq("token_id", "text")))
      val bt = col("token_id") - (col("token_id") % 10)
      val rel = tdf.select(lit("f0").as("fold"),
        col("doc_id").cast("int").as("doc_num"), col("token_id"), col("text"),
        struct(bt.cast("int").as("begin_tok"),
          least(bt + 10, col("n")).cast("int").as("end_tok")).as("sentence"),
        lit("O").as("ent_iob"), lit(null).cast("string").as("ent_type"))
      t("write2003WithTags") {
        sources.Conll.write2003WithTags(rel, outC, outT,
          when(col("text") === "key", "I-KEY").otherwise("O"),
          Seq("ent"), Seq(true), docstart = true, maxDocsPerFile = 64)
      }
      val parsed = t("conll2003 parse+count") {
        val p = sources.Conll.conll2003(spark,
          sources.Conll.writtenFilesGlob(outC), Seq("ent"), Seq(true))
        p.count(); p
      }
      val refolded = t("refold+count") {
        val r = sources.Conll.refold(parsed, outC); r.count(); r
      }
      t("conll2003Output+count") {
        sources.Conll.conll2003Output(spark, refolded,
          sources.Conll.writtenFilesGlob(outT), "ent").count()
      }
      t("full q58 once") {
        SparkEntry.queries("q58_conll_output")(spark, sfDir).count()
      }
      t("full q57 once") {
        SparkEntry.queries("q57_conllu_roundtrip")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
