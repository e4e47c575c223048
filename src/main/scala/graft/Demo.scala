package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end smoke driver: runs the flagship spanner pipeline (tokenize →
  * dictionary extract → adjacent join → consolidate → covered text) against
  * the driver testdata. Usage: sbt "runMain graft.Demo [sfDir]". */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = Tokenize.normalizedTokens(docs)
    println("TOKEN COUNT: " + toks.count())
    toks.show(5, truncate = false)

    val dictDf = Extract.createDict(
      Seq("hash join", "table scan", "sort merge").toDF("entry"))
    val matches = Extract.extractDict(docs, toks, dictDf)
    println("DICT MATCHES: " + matches.count())
    matches.show(3, truncate = false)

    val joinWord = Extract.extractRegexTok(docs, toks, "join")
    val anyWord = Extract.extractRegexTok(docs, toks, "[a-z]+")
    val adj = SpanJoin.adjacentJoin(joinWord, anyWord)
    println("ADJACENT (word after 'join'): " + adj.count())

    val cons = Consolidate.consolidate(matches)
    println("CONSOLIDATED: " + cons.count())
    cons.join(docs, "doc_id")
      .select(col("doc_id"), spans.coveredText(col("text"), col("span")).as("covered"))
      .show(8, truncate = false)

    val ov = SpanJoin.overlapJoin(matches, joinWord)
    println("OVERLAP (dict match x 'join' token): " + ov.count())
    spark.stop()
  }
}
