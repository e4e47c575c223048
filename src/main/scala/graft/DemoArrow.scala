package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.ArrowInterop

/** Interchange demo: extract spans from the sf0.001 corpus, export them as
  * Feather V2 with the reference's Arrow extension tags, re-read, and print
  * both schemas. `args(0)` overrides the output dir (default /tmp). A pandas
  * user points `pyarrow.ipc.open_file` / `pd.read_feather` at the same file. */
object DemoArrow {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_arrow_demo")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val spans = operators.Extract.extractRegex(docs, "s[a-z]+")
      .join(docs.select(col("doc_id"), col("text").as("target_text")), "doc_id")
      .select(col("doc_id"), col("span"), col("target_text"), col("match"))
    ArrowInterop.writeFeather(spans.repartition(2), out, Map("span" -> "target_text"))
    val back = ArrowInterop.readFeather(spark, s"$out/part-*.feather")
    println(s"[demo-arrow] wrote ${new java.io.File(out).list().length} files to $out")
    back.printSchema()
    println(s"[demo-arrow] rows=${back.count()}")
    back.orderBy("doc_id", "span.begin").show(5, truncate = false)

    // Token-span interchange (single-tokenization form): token-grained
    // matches over ONE document, exported with the TextExtensionsTokenSpan
    // tag + shared-tokenization dictionary.
    val d0 = docs.orderBy("doc_id").limit(1)
    val toks0 = operators.Tokenize.tokens(d0)
    val tokenSpans = operators.Extract
      .extractRegexTok(d0, toks0, "[a-z]+ [a-z]+", 2, 2)
      .join(toks0.groupBy("doc_id").agg(
        sort_array(collect_list(col("span"))).as("toks")), "doc_id")
      .join(d0.select(col("doc_id"), col("text").as("target_text")), "doc_id")
      .select(col("doc_id"), col("span"), col("toks"), col("target_text"),
        col("match"))
    ArrowInterop.writeFeather(tokenSpans.coalesce(1), s"$out-ts",
      tokenSpanCols = Map("span" -> (("toks", "target_text"))))
    val backTs = ArrowInterop.readFeather(spark, s"$out-ts/part-*.feather")
    println(s"[demo-arrow] token-span file at $out-ts")
    backTs.printSchema()
    println(s"[demo-arrow] token-span rows=${backTs.count()}")
    backTs.orderBy("span.begin_tok").show(5, truncate = false)
    spark.stop()
  }
}
