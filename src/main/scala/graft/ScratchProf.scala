package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Throwaway fragment timings for the optimization round: attribute the
  * ~1.2 s single-task subtree CPU seen in the cleaning/BERT families to
  * a specific operator in the chain. */
object ScratchProf {
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
    def t(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 4) {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"  [frag] $label%-44s $best%7.3f s")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def toks = Tokenize.normalizedTokens(d)
    t("docs scan")(d)
    t("tokenize")(Tokenize.tokens(d))
    t("tokenize+normalized")(toks)
    t("tokens filter isin")(toks.filter(col("text").isin("key", "value")))
    t("tokens filter+agg(doc,tok,type)")(
      toks.filter(col("text").isin("key", "value"))
        .select(col("doc_id"), col("token_id").as("tok"),
          when(col("text") === "key", "K").otherwise("V").as("ent_type"))
        .groupBy("doc_id", "tok", "ent_type").agg(count(lit(1))))
    t("tokens groupBy type count")(
      toks.groupBy("normalized_text").agg(count(lit(1))))
    val tagged = toks
      .withColumn("ent_iob", when(col("text") === "key", "B")
        .when(col("text") === "value", "I").otherwise("O"))
      .withColumn("ent_type", when(col("text") === "key", lit("K")))
    t("iobToSpans(tagged)")(Iob.iobToSpans(tagged))
    t("makeBertTokens")(Bert.makeBertTokens(d))
    t("q105 corpusEnts agg only")(
      toks.filter(col("text").isin("key", "value"))
        .select(col("doc_id"), col("token_id").as("tok"),
          when(col("text") === "key", "K").otherwise("V").as("ent_type"))
        .groupBy("ent_type").agg(count(lit(1))))
    t("explode(words) native + agg")(
      d.select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1))))
    t("explode(words) REGEX + agg")(
      d.select(col("doc_id"), explode(TextAnalysis.wordsRegex(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1))))
    locally {
      import spark.implicits._
      t("bm25 native")(TextAnalysis.bm25TopK(d,
        Seq((0, "spark"), (0, "join"), (1, "window")).toDF("query_id", "term"),
        k = 10))
    }
    spark.stop()
  }
}
