package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Smoke driver for the CoNLL readers: parse a corpus, reconstruct doc text,
  * extract entities, score model output. Usage:
  * sbt "runMain graft.DemoConll [conllFile] [outputFile]" */
object DemoConll {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse(
      "/root/reference/test_data/io/test_conll/conll03_test.txt")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-demo-conll")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Iob
    import graft.sources.Conll

    val toks = Conll.conll2003(spark, corpus,
      columnNames = Seq("ent"), iobColumns = Seq(true))
    println("TOKENS: " + toks.count())
    toks.orderBy("doc_num", "token_id").show(8, truncate = false)

    println("DOCUMENTS:")
    Conll.documents(toks).orderBy("doc_num").show(20, 60)

    val ents = Iob.iobToSpans(toks)
    println("ENTITIES: " + ents.count())
    ents.orderBy(col("doc_id"), col("span")("begin_tok")).show(10, truncate = false)

    args.lift(1).foreach { outFile =>
      val out = Conll.conll2003Output(spark, toks, outFile)
      val scores = Iob.prfScores(Iob.iobToSpans(out), ents)
      println("P/R/F1 of output file vs gold:")
      scores.show(truncate = false)
    }
    spark.stop()
  }
}
