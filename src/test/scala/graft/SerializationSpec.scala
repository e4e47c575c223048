package graft

import org.apache.spark.sql.functions._

/**
 * Parquet round-trip of the engine's extension-typed columns — the
 * interchange layer (SURVEY §1.5). The reference serializes spans/tensors
 * via custom Arrow extension types (array/arrow_conversion.py); the
 * engine's span/token-span STRUCT columns and array<float> tensors are
 * plain Parquet types, so round-trip (and cross-engine readability — the
 * DuckDB oracle reads every Verify output) comes for free.
 */
class SerializationSpec extends GraftSuite {

  test("span / token-span / tensor columns round-trip parquet exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ser").toString
    val df = Seq(
      (0L, 0, 5, 0, 1, Seq(1.0f, 2.5f, -3.0f)),
      (1L, 3, 9, 1, 3, Seq(0.0f, -1.5f, 7.25f)))
      .toDF("doc_id", "b", "e", "bt", "et", "vec")
      .select(col("doc_id"),
        graft.spans.span(col("b"), col("e")).as("span"),
        graft.spans.tokenSpan(col("bt"), col("et"), col("b"), col("e")).as("tok_span"),
        col("vec"))
    df.write.mode("overwrite").parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    // parquet reads everything back nullable; names and types must match
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", ""))).toSeq
    assert(shape(back.schema) == shape(df.schema))
    val a = df.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = back.orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b)
    // null span (the reference's "not a span") survives as a null struct
    val withNull = df.withColumn("span",
      when(col("doc_id") === 1, col("span")))
    withNull.write.mode("overwrite").parquet(s"$dir/n")
    val nulls = spark.read.parquet(s"$dir/n")
      .filter(col("span").isNull).count()
    assert(nulls == 1)
  }

  test("feather: span + tensor extension columns round-trip with tags") {
    import spark.implicits._
    import graft.sources.ArrowInterop
    val dir = java.nio.file.Files.createTempDirectory("graft_feather").toString
    val df = Seq(
      (0L, 0, 3, "key agg row", Seq(1.0f, 2.5f)),
      (1L, 4, 8, "slow fast", Seq(-3.0f, 0.25f)),
      (2L, 0, 4, "slow fast", Seq(7.0f, -1.0f))) // repeated text → shared dict entry
      .toDF("doc_id", "b", "e", "text", "vec")
      .select(col("doc_id"), graft.spans.span(col("b"), col("e")).as("span"),
        col("text"), col("vec"))
    ArrowInterop.writeFeather(df.repartition(2), s"$dir/f",
      spanCols = Map("span" -> "text"))
    val back = ArrowInterop.readFeather(spark, s"$dir/f/part-*.feather")
    // schema: span struct + decoded dictionary text + tensor array
    assert(back.schema.fieldNames.toSeq ==
      Seq("doc_id", "span", "span_target_text", "vec"))
    val got = back.orderBy("doc_id").collect().map { r =>
      (r.getLong(0), r.getStruct(1).getInt(0), r.getStruct(1).getInt(1),
        r.getString(2), r.getSeq[Float](3))
    }.toSeq
    assert(got == Seq((0L, 0, 3, "key agg row", Seq(1.0f, 2.5f)),
      (1L, 4, 8, "slow fast", Seq(-3.0f, 0.25f)),
      (2L, 0, 4, "slow fast", Seq(7.0f, -1.0f))))
  }

  test("feather files carry the reference's extension tags on disk") {
    import spark.implicits._
    import graft.sources.ArrowInterop
    import scala.collection.JavaConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_feather2").toString
    val df = Seq((0L, 1, 2, "t", Seq(0.5f))).toDF("doc_id", "b", "e", "text", "vec")
      .select(col("doc_id"), graft.spans.span(col("b"), col("e")).as("span"),
        col("text"), col("vec"))
    ArrowInterop.writeFeather(df.coalesce(1), s"$dir/f", Map("span" -> "text"))
    val f = new java.io.File(s"$dir/f").listFiles()
      .filter(_.getName.endsWith(".feather")).head
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val ch = java.nio.channels.FileChannel.open(f.toPath)
    val rd = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
    val fields = rd.getVectorSchemaRoot.getSchema.getFields.asScala
      .map(fl => fl.getName -> fl.getMetadata.asScala.get("ARROW:extension:name")).toMap
    rd.close(); ch.close(); alloc.close()
    assert(fields("span").contains("TextExtensionsSpan"))
    assert(fields("vec").contains("TextExtensionsTensor"))
    assert(fields("doc_id").isEmpty)
    // storage layout: span struct children named per the reference
    val alloc2 = new org.apache.arrow.memory.RootAllocator()
    val ch2 = java.nio.channels.FileChannel.open(f.toPath)
    val rd2 = new org.apache.arrow.vector.ipc.ArrowFileReader(ch2, alloc2)
    val spanField = rd2.getVectorSchemaRoot.getSchema.getFields.asScala
      .find(_.getName == "span").get
    val childNames = spanField.getChildren.asScala.map(_.getName).toSeq
    val ttDict = spanField.getChildren.asScala
      .find(_.getName == "target_text").get.getDictionary
    rd2.close(); ch2.close(); alloc2.close()
    assert(childNames == Seq("span_begins", "span_ends", "target_text"))
    assert(ttDict != null) // dictionary-encoded target text
  }

  test("feather: token-span extension column round-trips with tag + tokens dictionary") {
    import spark.implicits._
    import graft.sources.ArrowInterop
    import scala.collection.JavaConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_feather_ts").toString
    // one document, one tokenization (the reference's single-tokenization
    // form — multi-doc is NotImplementedError in arrow_conversion.py:219-221)
    val text = "key agg row"
    val toks = Seq((0, 3), (4, 7), (8, 11)) // "key" "agg" "row"
    val df = Seq(
      (0L, 0, 1, 0, 3),   // token span "key"
      (1L, 1, 3, 4, 11),  // token span "agg row"
      (2L, 0, 3, 0, 11))  // whole text
      .toDF("row_id", "bt", "et", "b", "e")
      .select(col("row_id"),
        graft.spans.tokenSpan(col("bt"), col("et"), col("b"), col("e")).as("ts"),
        typedLit(toks.map { case (b, e) => graft.types.Span(b, e) }).as("toks"),
        lit(text).as("text"))
    ArrowInterop.writeFeather(df.coalesce(1), s"$dir/f",
      tokenSpanCols = Map("ts" -> (("toks", "text"))))
    // on-disk: the reference's tag + storage children + dictionary-encoded tokens
    val f = new java.io.File(s"$dir/f").listFiles()
      .filter(_.getName.endsWith(".feather")).head
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val ch = java.nio.channels.FileChannel.open(f.toPath)
    val rd = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
    val tsField = rd.getVectorSchemaRoot.getSchema.getFields.asScala
      .find(_.getName == "ts").get
    val tag = tsField.getMetadata.asScala.get("ARROW:extension:name")
    val childNames = tsField.getChildren.asScala.map(_.getName).toSeq
    val toksDict = tsField.getChildren.asScala
      .find(_.getName == "tokens").get.getDictionary
    rd.close(); ch.close(); alloc.close()
    assert(tag.contains("TextExtensionsTokenSpan"))
    assert(childNames == Seq("token_begins", "token_ends", "tokens"))
    assert(toksDict != null) // dictionary-encoded shared tokenization
    // round-trip: token ids back exactly, char offsets re-derived from the
    // tokens dictionary, target text from the nested text dictionary
    val back = ArrowInterop.readFeather(spark, s"$dir/f/part-*.feather")
    assert(back.schema.fieldNames.toSeq == Seq("row_id", "ts", "ts_target_text"))
    val got = back.orderBy("row_id").collect().map { r =>
      val s = r.getStruct(1)
      (r.getLong(0), s.getInt(0), s.getInt(1), s.getInt(2), s.getInt(3),
        r.getString(2))
    }.toSeq
    assert(got == Seq(
      (0L, 0, 1, 0, 3, text), (1L, 1, 3, 4, 11, text), (2L, 0, 3, 0, 11, text)))
    // a span row with no tokenization is unserializable in ANY form:
    // the writer must refuse it loudly
    val bad = df.withColumn("toks",
      when(col("row_id") === 0L, col("toks")))
    val err = intercept[org.apache.spark.SparkException] {
      ArrowInterop.writeFeather(bad.coalesce(1), s"$dir/bad",
        tokenSpanCols = Map("ts" -> (("toks", "text"))))
    }
    assert(err.getMessage.contains("no tokenization") ||
      Option(err.getCause).exists(_.getMessage.contains("no tokenization")))
  }

  test("feather: multi-tokenization token-span file round-trips (beyond the reference's single form)") {
    import spark.implicits._
    import graft.sources.ArrowInterop
    import scala.collection.JavaConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_feather_tsm").toString
    // two documents with different texts AND different tokenizations in
    // ONE file — the form arrow_conversion.py:219-221 raises
    // NotImplementedError on; our writer dictionary-encodes one entry per
    // distinct (text, tokens) and points each row at its own.
    val textA = "key agg row" // tokens "key" "agg" "row"
    val toksA = Seq(graft.types.Span(0, 3), graft.types.Span(4, 7),
      graft.types.Span(8, 11))
    val textB = "slow fast" // tokens "slow" "fast"
    val toksB = Seq(graft.types.Span(0, 4), graft.types.Span(5, 9))
    val df = Seq(
      (0L, 0, 1, "A"), // "key"
      (1L, 1, 3, "A"), // "agg row"
      (2L, 0, 2, "B"), // "slow fast"
      (3L, 1, 2, "B")) // "fast"
      .toDF("row_id", "bt", "et", "which")
      .select(col("row_id"),
        graft.spans.tokenSpan(col("bt"), col("et"), lit(0), lit(0)).as("ts"),
        when(col("which") === "A", typedLit(toksA)).otherwise(typedLit(toksB))
          .as("toks"),
        when(col("which") === "A", lit(textA)).otherwise(lit(textB)).as("text"))
    ArrowInterop.writeFeather(df.coalesce(1), s"$dir/f",
      tokenSpanCols = Map("ts" -> (("toks", "text"))))
    // single file, TWO outer-dictionary entries
    val f = new java.io.File(s"$dir/f").listFiles()
      .filter(_.getName.endsWith(".feather")).head
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val ch = java.nio.channels.FileChannel.open(f.toPath)
    val rd = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
    rd.loadNextBatch()
    val tsField = rd.getVectorSchemaRoot.getSchema.getFields.asScala
      .find(_.getName == "ts").get
    val dictId = tsField.getChildren.asScala
      .find(_.getName == "tokens").get.getDictionary.getId
    val nEntries = rd.lookup(dictId).getVector.getValueCount
    rd.close(); ch.close(); alloc.close()
    assert(nEntries == 2)
    // char offsets re-derived from each row's OWN tokenization; target
    // text resolved per row from the nested text dictionary
    val back = ArrowInterop.readFeather(spark, s"$dir/f/part-*.feather")
    val got = back.orderBy("row_id").collect().map { r =>
      val s = r.getStruct(1)
      (r.getLong(0), s.getInt(0), s.getInt(1), s.getInt(2), s.getInt(3),
        r.getString(2))
    }.toSeq
    assert(got == Seq(
      (0L, 0, 1, 0, 3, textA), (1L, 1, 3, 4, 11, textA),
      (2L, 0, 2, 0, 9, textB), (3L, 1, 2, 5, 9, textB)))
    // batch-boundary coverage: the writer slices one buffered partition
    // into 8192-row record batches, and each batch's rows must index the
    // buf-parallel entry array at off + i (a bare i would silently remap
    // every row after the first batch onto batch-1 tokenizations)
    val big = spark.range(9000).toDF("row_id")
      .select(col("row_id"),
        graft.spans.tokenSpan(lit(0), lit(1), lit(0), lit(0)).as("ts"),
        when(col("row_id") % 2 === 0, typedLit(toksA)).otherwise(typedLit(toksB))
          .as("toks"),
        when(col("row_id") % 2 === 0, lit(textA)).otherwise(lit(textB)).as("text"))
    ArrowInterop.writeFeather(big.coalesce(1), s"$dir/big",
      tokenSpanCols = Map("ts" -> (("toks", "text"))))
    val bigBack = ArrowInterop.readFeather(spark, s"$dir/big/part-*.feather")
      .select(col("row_id"), col("ts")("end").as("e"), col("ts_target_text").as("t"))
      .collect()
    assert(bigBack.length == 9000)
    // token (0,1) of A = "key" -> char end 3; of B = "slow" -> char end 4
    assert(bigBack.forall { r =>
      if (r.getLong(0) % 2 == 0) r.getInt(1) == 3 && r.getString(2) == textA
      else r.getInt(1) == 4 && r.getString(2) == textB
    })
  }

  test("tokens relation round-trips and re-joins with documents") {
    import spark.implicits._
    val docs = Seq((0L, "key agg row"), (1L, "slow fast")).toDF("doc_id", "text")
    val toks = operators.Tokenize.tokens(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_ser2").toString
    toks.write.mode("overwrite").parquet(s"$dir/toks")
    val back = spark.read.parquet(s"$dir/toks")
    val covered = back.join(docs.withColumnRenamed("text", "__t"), "doc_id")
      .select(graft.spans.coveredText(col("__t"), col("span")).as("c"), col("text"))
      .collect()
    assert(covered.forall(r => r.getString(0) == r.getString(1)))
  }
}
