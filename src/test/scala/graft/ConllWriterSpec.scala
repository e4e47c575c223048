package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Conll

/** Distributed CoNLL writers: reference fixture → write → re-read must
  * reproduce the exact token relation (the writers are the readers'
  * inverse; the reference's own guidance is to write tagged corpora back
  * out, io/conll.py:320-323). */
class ConllWriterSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d.toString
  }

  private def key2003(df: DataFrame) =
    df.select(col("doc_num"), col("token_id"),
      col("span")("begin"), col("span")("end"), col("text"),
      col("sentence")("begin_tok"), col("sentence")("end_tok"),
      col("ent_iob"), col("ent_type"))
      .collect().map(_.toSeq).toSet

  test("write2003 round-trips the reference fixture relation") {
    val toks = Conll.conll2003(spark,
      "/root/reference/test_data/io/test_conll/conll03_test.txt",
      columnNames = Seq("ent"), iobColumns = Seq(true))
    val out = tmp("graft_w2003")
    // The fixture relation already carries its -DOCSTART- separator as a
    // token row, so the writer must not add headers of its own.
    Conll.write2003(toks, out, Seq("ent"), Seq(true), docstart = false)
    val back = Conll.conll2003(spark, Conll.writtenFilesGlob(out),
      Seq("ent"), Seq(true))
    assert(key2003(back) == key2003(toks))
  }

  test("write2003 docstart headers delimit documents on re-read") {
    // Three docs without DOCSTART rows: the writer's headers are the only
    // thing marking the boundaries.
    val rel = Seq(
      ("f0", 0, 0, "alpha", 0, 2, "B", "K"), ("f0", 0, 1, "beta", 0, 2, "I", "K"),
      ("f0", 1, 0, "gamma", 0, 1, "O", null),
      ("f0", 2, 0, "delta", 0, 2, "O", null), ("f0", 2, 1, "eps", 0, 2, "B", "K"))
      .toDF("fold", "doc_num", "token_id", "text", "bt", "et", "ent_iob", "ent_type")
      .withColumn("sentence", struct(col("bt").as("begin_tok"), col("et").as("end_tok")))
    val out = tmp("graft_w2003h")
    Conll.write2003(rel, out, Seq("ent"), Seq(true))
    val back = Conll.conll2003(spark, Conll.writtenFilesGlob(out),
      Seq("ent"), Seq(true))
    assert(back.select("doc_num").distinct().count() == 3)
    // each doc: token 0 is the header, original tokens follow in order
    val d0 = back.filter(col("doc_num") === 0).orderBy("token_id")
      .select("text", "ent_iob", "ent_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(d0.toSeq == Seq(("-DOCSTART-", "O", null),
      ("alpha", "B", "K"), ("beta", "I", "K")))
  }

  test("writeU round-trips the reference CoNLL-U fixture relation") {
    val u = Conll.conllU(spark,
      "/root/reference/test_data/io/test_conll/conll_u_test1.txt")
    val out = tmp("graft_wu")
    Conll.writeU(u, out)
    val back = Conll.conllU(spark, Conll.writtenFilesGlob(out))
    def k(df: DataFrame) = df.select(col("doc_num"), col("token_id"),
      col("span")("begin"), col("span")("end"), col("text"),
      col("sentence")("begin_tok"), col("sentence")("end_tok"),
      col("lemma"), col("upostag"), col("xpostag"), col("features"),
      col("head"), col("deprel"), col("deps"), col("misc"),
      col("sentence_id"), col("paragraph_id"), col("doc"))
      .collect().map(_.toSeq).toSet
    assert(k(back) == k(u))
  }

  test("write2003 multi-file folds + refold round-trip the exact relation") {
    // 5 docs, maxDocsPerFile=2 → 3 ordered part files in one fold; refold
    // must restore the logical (fold, doc_num) keys across the file split.
    val rel = (0 until 5).flatMap { d =>
      Seq(("f0", d, 0, s"tok${d}a", 0, 2, "B", "K"),
        ("f0", d, 1, s"tok${d}b", 0, 2, "I", "K"))
    }.toDF("fold", "doc_num", "token_id", "text", "bt", "et", "ent_iob", "ent_type")
      .withColumn("sentence", struct(col("bt").as("begin_tok"), col("et").as("end_tok")))
    val out = tmp("graft_w2003m")
    Conll.write2003(rel, out, Seq("ent"), Seq(true), maxDocsPerFile = 2)
    val files = new java.io.File(s"$out/fold=f0").listFiles()
      .map(_.getName).filter(_.startsWith("part-")).sorted
    assert(files.toSeq == Seq("part-00000.txt", "part-00001.txt", "part-00002.txt"))
    val back = Conll.refold(Conll.conll2003(spark, Conll.writtenFilesGlob(out),
      Seq("ent"), Seq(true)))
    assert(back.select("fold").distinct().collect().map(_.getString(0)).toSeq == Seq("f0"))
    // doc 0..4 in order; each doc = header token + 2 original tokens
    val byDoc = back.filter(col("text").startsWith("tok"))
      .select(col("doc_num"), col("text"), col("ent_iob"), col("ent_type"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(byDoc == (0 until 5).flatMap { d =>
      Seq((d, s"tok${d}a", "B", "K"), (d, s"tok${d}b", "I", "K"))
    }.toSet)
    // doc_id is the canonical hash of the RESTORED keys
    val ids = back.select("doc_num", "doc_id").distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val expected = back.sparkSession.range(5)
      .select(col("id").cast("int").as("doc_num"),
        xxhash64(lit("f0"), col("id").cast("int")).as("h"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(ids == expected)
  }

  test("sidecar refold equals aggregate refold across folds, buckets, escaping") {
    // two folds (one with a path-escaped char), 5 docs each, 2 docs/file →
    // 3 part files + 3 .docs sidecars per fold; both refold paths must
    // restore identical logical keys
    val rel = (for (f <- Seq("train", "dev:set"); d <- 0 until 5) yield Seq(
      (f, d, 0, s"${f.take(1)}${d}a", 0, 2, "B", "K"),
      (f, d, 1, s"${f.take(1)}${d}b", 0, 2, "I", "K"))).flatten
      .toDF("fold", "doc_num", "token_id", "text", "bt", "et", "ent_iob", "ent_type")
      .withColumn("sentence", struct(col("bt").as("begin_tok"), col("et").as("end_tok")))
    val out = tmp("graft_w2003s")
    Conll.write2003(rel, out, Seq("ent"), Seq(true), maxDocsPerFile = 2)
    val sidecars = new java.io.File(s"$out/fold=train").listFiles()
      .map(_.getName).filter(_.endsWith(".docs")).sorted
    assert(sidecars.toSeq == Seq(".part-00000.txt.docs", ".part-00001.txt.docs",
      ".part-00002.txt.docs"))
    val rd = Conll.conll2003(spark, Conll.writtenFilesGlob(out), Seq("ent"), Seq(true))
    def k(df: DataFrame) = df.select("fold", "doc_num", "doc_id", "token_id", "text")
      .collect().map(_.toSeq).toSet
    val viaSidecar = Conll.refold(rd, out)
    assert(k(viaSidecar) == k(Conll.refold(rd)))
    assert(viaSidecar.select("fold").distinct().collect().map(_.getString(0)).toSet ==
      Set("train", "dev:set"))
    assert(viaSidecar.filter(col("text") === "d3a")
      .select("doc_num").head.getInt(0) == 3)
  }

  test("write2003 keeps doc boundaries when first/last tokens were filtered out") {
    // doc 1's token 0 was removed upstream (e.g. stopword filter): the
    // -DOCSTART- header must still be emitted at its first PRESENT token,
    // or doc 1 silently merges into doc 0 on re-read
    val rel = Seq(
      ("f0", 0, 0, "a0", 0, 2, "O", null.asInstanceOf[String]),
      ("f0", 0, 1, "a1", 0, 2, "O", null.asInstanceOf[String]),
      ("f0", 1, 1, "b1", 1, 2, "O", null.asInstanceOf[String]))
      .toDF("fold", "doc_num", "token_id", "text", "bt", "et", "ent_iob", "ent_type")
      .withColumn("sentence", struct(col("bt").as("begin_tok"), col("et").as("end_tok")))
    val out = tmp("graft_w2003f")
    Conll.write2003(rel, out, Seq("ent"), Seq(true))
    val back = Conll.conll2003(spark, Conll.writtenFilesGlob(out), Seq("ent"), Seq(true))
      .filter(col("text").startsWith("a") || col("text").startsWith("b"))
    val byDoc = back.select("doc_num", "text").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(byDoc == Set((0, "a0"), (0, "a1"), (1, "b1")))
  }

  test("conll2003Output aligns tags across escaped fold names") {
    // raw order is "a-b" < "a:b" but on disk fold=a%3Ab < fold=a-b: the
    // fold offsets must follow the ESCAPED (path) order the tag lines
    // were numbered in, or every tag lands on the wrong token
    val rel = Seq(("a-b", 0, 10L, 0, "x"), ("a-b", 0, 10L, 1, "y"),
      ("a:b", 0, 11L, 0, "z"))
      .toDF("fold", "doc_num", "doc_id", "token_id", "text")
      .withColumn("sentence",
        struct(lit(0).as("begin_tok"), lit(2).as("end_tok")))
    val tags = Seq(("a-b", 0, 0, 0, "O"), ("a-b", 0, 1, 0, "I-AB"),
      ("a:b", 0, 0, 0, "I-COLON"))
      .toDF("fold", "doc_num", "pos", "sub", "line")
    val out = tmp("graft_esc")
    Conll.writeLines(tags, out)
    val got = Conll.conll2003Output(spark, rel, Conll.writtenFilesGlob(out), "ent")
      .select("fold", "token_id", "ent_iob", "ent_type").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == Set(("a-b", 0, "O", null), ("a-b", 1, "B", "AB"),
      ("a:b", 0, "B", "COLON")))
  }

  test("null-typed B/I tags round-trip exactly (empty type reads back null)") {
    val rel = Seq(("f0", 0, 0, "alpha", 0, 1, "B", null.asInstanceOf[String]))
      .toDF("fold", "doc_num", "token_id", "text", "bt", "et", "ent_iob", "ent_type")
      .withColumn("sentence", struct(col("bt").as("begin_tok"), col("et").as("end_tok")))
    val out = tmp("graft_w2003n")
    Conll.write2003(rel, out, Seq("ent"), Seq(true), docstart = false)
    val back = Conll.conll2003(spark, Conll.writtenFilesGlob(out), Seq("ent"), Seq(true))
    val r = back.select("text", "ent_iob", "ent_type").collect().head
    assert(r.getString(0) == "alpha" && r.getString(1) == "B" && r.isNullAt(2))
  }

  test("writeU renders absent head/IOB columns as missing values, not errors") {
    val rel = Seq(("f0", 0, 0, "alpha", 0, 1), ("f0", 0, 1, "beta", 0, 1))
      .toDF("fold", "doc_num", "token_id", "text", "bt", "et")
      .withColumn("sentence", struct(col("bt").as("begin_tok"), col("et").as("end_tok")))
    val out = tmp("graft_wu_absent")
    // columnNames includes head + an IOB field; the relation has neither.
    Conll.writeU(rel, out, columnNames = Seq("lemma", "head", "ent"),
      iobColumns = Seq(false, false, true), metadataFields = Map.empty)
    val content = spark.sparkContext
      .wholeTextFiles(Conll.writtenFilesGlob(out)).collect().head._2
    val fields = content.split("\n").head.split("\t")
    assert(fields.toSeq == Seq("1", "alpha", "_", "0", "_"))
  }

  test("writeLines lays out one directory per fold, lines in key order") {
    val lines = Seq(
      ("fa", 0, 0, 0, "a0"), ("fa", 1, 0, 0, "a1"),
      ("fb", 0, 0, 0, "b0"), ("fb", 0, 1, 0, "b1"))
      .toDF("fold", "doc_num", "pos", "sub", "line")
    val out = tmp("graft_lines")
    Conll.writeLines(lines, out)
    val fa = spark.sparkContext.wholeTextFiles(s"$out/fold=fa/part-*").collect()
    val fb = spark.sparkContext.wholeTextFiles(s"$out/fold=fb/part-*").collect()
    assert(fa.length == 1 && fa.head._2 == "a0\na1\n")
    assert(fb.length == 1 && fb.head._2 == "b0\nb1\n")
  }
}
