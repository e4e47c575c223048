package graft

import org.apache.spark.sql.functions._
import graft.sources.ArrowInterop

/**
 * TRUE cross-language Arrow interop: engine-written Feather files read
 * back by REAL pyarrow (scripts/arrow_check.py), which verifies the
 * reference's extension tags (arrow_conversion.py:46-118, 304-336), the
 * storage layouts, and the decoded values against an expected parquet
 * relation — upgrading the self-round-trip evidence in
 * [[SerializationSpec]] to the actual pandas-user path. Cancels (does
 * not fail) if python3/pyarrow are unavailable on the host.
 */
class ArrowPythonSpec extends GraftSuite {

  private def havePython: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import pyarrow")
        .redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  test("pyarrow reads engine feather: tags, layouts, and values match") {
    assume(havePython, "python3 + pyarrow not available")
    import spark.implicits._
    val dump = java.nio.file.Files.createTempDirectory("graft_arrow_py").toString

    // spans + tensors (same fixtures as SerializationSpec)
    val spansDf = Seq(
      (0L, 0, 3, "key agg row", Seq(1.0f, 2.5f)),
      (1L, 4, 8, "slow fast", Seq(-3.0f, 0.25f)),
      (2L, 0, 4, "slow fast", Seq(7.0f, -1.0f)))
      .toDF("doc_id", "b", "e", "text", "vec")
      .select(col("doc_id"), graft.spans.span(col("b"), col("e")).as("span"),
        col("text"),
        expr("substring(text, b + 1, e - b)").as("match"))
    ArrowInterop.writeFeather(spansDf.repartition(2), s"$dump/spans",
      spanCols = Map("span" -> "text"))
    spansDf.select(col("doc_id"), col("span")("begin").as("begin"),
        col("span")("end").as("end"), col("text").as("target_text"), col("match"))
      .coalesce(1).write.parquet(s"$dump/spans_expected")

    val tensorsDf = Seq((0L, Seq(1.0f, 2.5f)), (1L, Seq(-3.0f, 0.25f)),
      (2L, Seq(7.0f, -1.0f))).toDF("row_id", "vec")
    ArrowInterop.writeFeather(tensorsDf.coalesce(1), s"$dump/tensors")
    tensorsDf.coalesce(1).write.parquet(s"$dump/tensors_expected")

    // single-tokenization token spans
    val textA = "key agg row"
    val toksA = Seq(graft.types.Span(0, 3), graft.types.Span(4, 7),
      graft.types.Span(8, 11))
    val tsBase = Seq((0L, 0, 1, 0, 3), (1L, 1, 3, 4, 11), (2L, 0, 3, 0, 11))
      .toDF("row_id", "bt", "et", "b", "e")
    val tsDf = tsBase.select(col("row_id"),
      graft.spans.tokenSpan(col("bt"), col("et"), col("b"), col("e")).as("ts"),
      typedLit(toksA).as("toks"), lit(textA).as("text"))
    ArrowInterop.writeFeather(tsDf.coalesce(1), s"$dump/tokenspan",
      tokenSpanCols = Map("ts" -> (("toks", "text"))))
    tsBase.withColumn("text", lit(textA))
      .coalesce(1).write.parquet(s"$dump/tokenspan_expected")

    // multi-tokenization token spans (two docs, two tokenizations, one file)
    val textB = "slow fast"
    val toksB = Seq(graft.types.Span(0, 4), graft.types.Span(5, 9))
    val tsmDf = Seq((0L, 0, 1, "A", 0, 3), (1L, 1, 3, "A", 4, 11),
      (2L, 0, 2, "B", 0, 9), (3L, 1, 2, "B", 5, 9))
      .toDF("row_id", "bt", "et", "which", "b", "e")
      .select(col("row_id"),
        graft.spans.tokenSpan(col("bt"), col("et"), lit(0), lit(0)).as("ts"),
        when(col("which") === "A", typedLit(toksA)).otherwise(typedLit(toksB))
          .as("toks"),
        when(col("which") === "A", lit(textA)).otherwise(lit(textB)).as("text"),
        col("bt").as("bt0"), col("et").as("et0"), col("b"), col("e"))
    ArrowInterop.writeFeather(
      tsmDf.select("row_id", "ts", "toks", "text").coalesce(1),
      s"$dump/tokenspan_multi", tokenSpanCols = Map("ts" -> (("toks", "text"))))
    tsmDf.select(col("row_id"), col("bt0").as("bt"), col("et0").as("et"),
        col("b"), col("e"), col("text"))
      .coalesce(1).write.parquet(s"$dump/tokenspan_multi_expected")

    // drive the python differential
    val script = new java.io.File("scripts/arrow_check.py").getAbsolutePath
    val pb = new ProcessBuilder("python3", script, dump).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    withClue(s"arrow_check.py output:\n$out") {
      // rc==134 (SIGABRT) is pyarrow's interpreter-teardown race, which can
      // only fire after the script has printed its verdicts; accept it iff
      // every differential check reported PASS.
      assert(rc == 0 || rc == 134)
      assert(out.contains("PASS spans") && out.contains("PASS tensors") &&
        out.contains("PASS tokenspan") && out.contains("PASS tokenspan_multi"))
    }
  }

  test("engine reads pyarrow-written feather (the reference's serialized layout)") {
    assume(havePython, "python3 + pyarrow not available")
    val dump = java.nio.file.Files.createTempDirectory("graft_arrow_pyw").toString
    val script = new java.io.File("scripts/arrow_check.py").getAbsolutePath
    val p = new ProcessBuilder("python3", script, "--write", dump)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    withClue(s"arrow_check.py --write output:\n$out") {
      val wrc = p.waitFor()
      assert((wrc == 0 || wrc == 134) && out.contains("WROTE pywritten"))
    }

    // span + tensor file: extension tags and dictionary text written by
    // plain pyarrow, decoded by the engine reader
    val back = ArrowInterop.readFeather(spark, s"$dump/pywritten/part-*.feather")
    val exp = spark.read.parquet(s"$dump/pywritten_expected")
    val got = back.select(col("doc_id"), col("span")("begin").as("begin"),
        col("span")("end").as("end"), col("span_target_text"),
        col("vec").cast("array<float>"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val want = exp.select(col("doc_id"), col("begin"), col("end"),
        col("target_text"), col("vec"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(got == want)

    // PARQUET form (reference array/test_span.py:489-498): the same
    // reference-layout table written via pyarrow's to_parquet path; the
    // engine's native parquet reader consumes the storage relation
    // (dictionary-encoded target text decodes to plain strings)
    val backPq = spark.read.parquet(s"$dump/pyparquet")
    val gotPq = backPq.select(col("doc_id"),
        col("span")("span_begins").as("begin"),
        col("span")("span_ends").as("end"),
        col("span")("target_text").as("target_text"),
        col("vec").cast("array<float>"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val wantPq = exp.select(col("doc_id"), col("begin"), col("end"),
        col("target_text"), col("vec"))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(gotPq == wantPq)

    // token-span file in the reference's single-tokenization layout:
    // token ids back exactly, char offsets re-derived from the shared
    // tokenization dictionary entry
    val backTs = ArrowInterop.readFeather(spark, s"$dump/pywritten_ts/part-*.feather")
    val expTs = spark.read.parquet(s"$dump/pywritten_ts_expected")
    val gotTs = backTs.select(col("row_id"),
        col("ts")("begin_tok"), col("ts")("end_tok"),
        col("ts")("begin"), col("ts")("end"), col("ts_target_text"))
      .orderBy("row_id").collect().map(_.toString).toSeq
    val wantTs = expTs.select(col("row_id"), col("bt"), col("et"),
        col("b"), col("e"), col("text"))
      .orderBy("row_id").collect().map(_.toString).toSeq
    assert(gotTs == wantTs)
  }
}
