package graft.sources

import scala.collection.JavaConverters._
import scala.collection.mutable
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.{ListVector, StructVector}
import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Arrow IPC (Feather V2) interchange with the reference's pandas
 * extension types (reference: array/arrow_conversion.py).
 *
 * The reference serializes spans as an Arrow extension type named
 * `TextExtensionsSpan` whose storage is
 * `struct<span_begins: int, span_ends: int, target_text: dictionary<string>>`
 * (arrow_conversion.py:46-81, 121-148) and tensors as `TextExtensionsTensor`
 * whose storage is `list<primitive>` with the element shape JSON-encoded in
 * the extension metadata (arrow_conversion.py:304-336). This writer emits
 * exactly those storage layouts with the standard
 * `ARROW:extension:name` / `ARROW:extension:metadata` field tags, so a
 * pandas user reading the file with the reference package installed gets
 * `SpanArray` / `TensorArray` columns back; without it, pyarrow still
 * surfaces the tagged storage. The reader accepts the same tags (from this
 * writer or from files the reference wrote via feather).
 *
 * Scale shape: the writer is a narrow `foreachPartition` — one
 * `part-NNNNN.feather` per task, dictionary built per file from that
 * partition's documents (bounded), batches of `BatchRows`. The reader
 * parallelizes over files and streams record batches. Neither funnels the
 * relation through the driver; the driver only reads one file's SCHEMA.
 */
object ArrowInterop {

  private val ExtName = "ARROW:extension:name"
  private val ExtMeta = "ARROW:extension:metadata"
  val SpanExt = "TextExtensionsSpan"
  val TensorExt = "TextExtensionsTensor"
  val TokenSpanExt = "TextExtensionsTokenSpan"
  private val BatchRows = 8192

  // ---------------------------------------------------------------- write

  /**
   * Write `df` as Feather V2 files `path/part-NNNNN.feather` (one per
   * partition). `spanCols` maps a span struct column (begin/end ints) to
   * the string column holding its target text; the pair is folded into
   * one `TextExtensionsSpan` extension column with dictionary-encoded
   * text. Numeric-array columns become `TextExtensionsTensor` (element
   * shape = first row's length). Supported scalars: int, long, float,
   * double, string, boolean.
   */
  def writeFeather(df: DataFrame, path: String,
      spanCols: Map[String, String] = Map.empty,
      tokenSpanCols: Map[String, (String, String)] = Map.empty): Unit = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    root.getFileSystem(spark.sessionState.newHadoopConf()).delete(root, true)
    val schema = df.schema
    val textOf = spanCols // span col -> text col
    val textCols = spanCols.values.toSet ++
      tokenSpanCols.values.flatMap { case (toks, text) => Seq(toks, text) }
    // Session Hadoop conf must travel with the task: spark.hadoop.*
    // settings (credentials, defaultFS) are invisible to a bare
    // `new Configuration()` on an executor.
    val sconf = new org.apache.spark.SerializableWritable(
      spark.sessionState.newHadoopConf())
    df.rdd.foreachPartition { it =>
      // partition id from the task context — stable file naming
      val pid = org.apache.spark.TaskContext.get().partitionId()
      if (it.hasNext)
        writePartition(it, schema, textOf, tokenSpanCols, textCols, root, pid,
          sconf.value)
    }
  }

  private def writePartition(rows: Iterator[Row], schema: StructType,
      textOf: Map[String, String], tsOf: Map[String, (String, String)],
      textCols: Set[String],
      rootPath: org.apache.hadoop.fs.Path, pid: Int,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val alloc = new RootAllocator()
    try {
      val fs = rootPath.getFileSystem(conf)
      fs.mkdirs(rootPath)
      val out = fs.create(new org.apache.hadoop.fs.Path(rootPath, f"part-$pid%05d.feather"), true)

      // Buffer the partition (bounded: one task's split) so the per-file
      // target-text dictionary can be built before the schema is written —
      // the same order the reference builds its StringTable first.
      val buf = rows.toArray
      val dictValues = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, Int]]
      // per token-span column: buf-parallel outer-dictionary entry index
      // (-1 where the row carries no tokenization), built alongside the
      // dictionaries below and consumed by fillVector
      val tsRowEntry = mutable.HashMap.empty[String, Array[Int]]
      textOf.foreach { case (spanCol, textCol) =>
        val m = mutable.LinkedHashMap.empty[String, Int]
        val ti = schema.fieldIndex(textCol)
        buf.foreach { r =>
          if (!r.isNullAt(ti)) {
            val t = r.getString(ti)
            if (!m.contains(t)) m(t) = m.size
          }
        }
        dictValues(spanCol) = m
      }

      // Field tree + dictionaries
      val provider = new DictionaryProvider.MapDictionaryProvider()
      val dictVecs = mutable.ArrayBuffer.empty[FieldVector]
      var dictId = 0L
      val outFields = schema.fields.filterNot(f => textCols(f.name)).map { f =>
        f.dataType match {
          case _: StructType if tsOf.contains(f.name) =>
            // TextExtensionsTokenSpan (arrow_conversion.py:86-118,
            // 199-245): storage struct<token_begins, token_ends, tokens>
            // where `tokens` dictionary-encodes the tokenization — a
            // list<span storage struct> with its own target_text
            // dictionary inside. The reference implements only the
            // SINGLE-tokenization form (multi-document files raise
            // NotImplementedError, arrow_conversion.py:219-221). This
            // writer generalizes it: one outer-dictionary entry per
            // DISTINCT (target text, token list) in the file, each row's
            // `tokens` index pointing at its own tokenization. A file
            // whose rows all share one tokenization serializes exactly as
            // the reference's form (one entry, all indices 0), so the
            // single form stays interchange-compatible.
            val (toksCol, textCol) = tsOf(f.name)
            val toksIdx = schema.fieldIndex(toksCol)
            val textIdx = schema.fieldIndex(textCol)
            val spanIdx = schema.fieldIndex(f.name)
            val entryIdx = mutable.LinkedHashMap.empty[(String, Seq[Row]), Int]
            val rowEntry = new Array[Int](buf.length)
            buf.zipWithIndex.foreach { case (r, i) =>
              if (r.isNullAt(toksIdx)) {
                require(r.isNullAt(spanIdx),
                  s"token span column ${f.name}: row carries a span but no " +
                    s"tokenization ($toksCol is null)")
                rowEntry(i) = -1
              } else {
                val key = (if (r.isNullAt(textIdx)) null else r.getString(textIdx),
                  r.getSeq[Row](toksIdx))
                rowEntry(i) = entryIdx.getOrElseUpdate(key, entryIdx.size)
              }
            }
            // entryIdx may legitimately be empty (every row in this write
            // partition carries a null tokenization — e.g. a sparse column
            // after repartition): emit 0-entry dictionaries and all-null
            // indices rather than failing the job.
            tsRowEntry(f.name) = rowEntry
            // inner dictionary: the distinct target texts across tokenizations
            val texts = mutable.LinkedHashMap.empty[String, Int]
            entryIdx.keysIterator.foreach { case (t, _) =>
              if (t != null && !texts.contains(t)) texts(t) = texts.size
            }
            val innerEnc = new DictionaryEncoding(dictId, false,
              new ArrowType.Int(32, true))
            dictId += 1
            val textVec = new VarCharVector("target_text_values", alloc)
            textVec.allocateNew(math.max(texts.size, 1))
            texts.foreach { case (t, i) => textVec.setSafe(i, t.getBytes("UTF-8")) }
            textVec.setValueCount(texts.size)
            dictVecs += textVec
            provider.put(new Dictionary(textVec, innerEnc))
            // outer dictionary: one list entry per distinct tokenization
            val outerEnc = new DictionaryEncoding(dictId, false,
              new ArrowType.Int(32, true))
            dictId += 1
            val tokensValuesField = new Field("tokens_values",
              FieldType.nullable(ArrowType.List.INSTANCE),
              Seq(new Field("item", FieldType.nullable(ArrowType.Struct.INSTANCE),
                Seq(
                  new Field("span_begins",
                    FieldType.nullable(new ArrowType.Int(32, true)), null),
                  new Field("span_ends",
                    FieldType.nullable(new ArrowType.Int(32, true)), null),
                  new Field("target_text",
                    new FieldType(true, new ArrowType.Int(32, true), innerEnc,
                      null), null)
                ).asJava)).asJava)
            val tokensVec = tokensValuesField.createVector(alloc)
              .asInstanceOf[ListVector]
            tokensVec.allocateNew()
            val tsv = tokensVec.getDataVector.asInstanceOf[StructVector]
            val tbv = tsv.getChild("span_begins").asInstanceOf[IntVector]
            val tev = tsv.getChild("span_ends").asInstanceOf[IntVector]
            val ttv = tsv.getChild("target_text").asInstanceOf[IntVector]
            var tokPos = 0
            entryIdx.keysIterator.zipWithIndex.foreach { case ((text, toks), e) =>
              val start = tokensVec.startNewValue(e)
              assert(start == tokPos,
                s"token span column ${f.name}: list offset drift ($start != $tokPos)")
              toks.foreach { t =>
                tsv.setIndexDefined(tokPos)
                tbv.setSafe(tokPos, t.getInt(t.fieldIndex("begin")))
                tev.setSafe(tokPos, t.getInt(t.fieldIndex("end")))
                if (text == null) ttv.setNull(tokPos)
                else ttv.setSafe(tokPos, texts(text))
                tokPos += 1
              }
              tokensVec.endValue(e, toks.length)
            }
            tsv.setValueCount(tokPos)
            tokensVec.setValueCount(entryIdx.size)
            dictVecs += tokensVec
            provider.put(new Dictionary(tokensVec, outerEnc))
            new Field(f.name,
              new FieldType(true, ArrowType.Struct.INSTANCE, null,
                Map(ExtName -> TokenSpanExt, ExtMeta -> "").asJava),
              Seq(
                new Field("token_begins",
                  FieldType.nullable(new ArrowType.Int(32, true)), null),
                new Field("token_ends",
                  FieldType.nullable(new ArrowType.Int(32, true)), null),
                new Field("tokens",
                  new FieldType(true, new ArrowType.Int(32, true), outerEnc,
                    null), null)
              ).asJava)
          case st: StructType if textOf.contains(f.name) =>
            val enc = new DictionaryEncoding(dictId, false, new ArrowType.Int(32, true))
            val dictVec = new VarCharVector("target_text_values", alloc)
            val values = dictValues(f.name)
            dictVec.allocateNew(values.size)
            values.keysIterator.zipWithIndex.foreach { case (s, i) =>
              dictVec.setSafe(i, s.getBytes("UTF-8"))
            }
            dictVec.setValueCount(values.size)
            dictVecs += dictVec
            provider.put(new Dictionary(dictVec, enc))
            dictId += 1
            require(st.fieldNames.contains("begin") && st.fieldNames.contains("end"),
              s"span column ${f.name} must be a struct with begin/end")
            new Field(f.name,
              new FieldType(true, ArrowType.Struct.INSTANCE, null,
                Map(ExtName -> SpanExt, ExtMeta -> "").asJava),
              Seq(
                new Field("span_begins", FieldType.nullable(new ArrowType.Int(32, true)), null),
                new Field("span_ends", FieldType.nullable(new ArrowType.Int(32, true)), null),
                new Field("target_text", new FieldType(true, new ArrowType.Int(32, true), enc, null), null)
              ).asJava)
          case ArrayType(et, _) if et == FloatType || et == DoubleType =>
            val ti = schema.fieldIndex(f.name)
            val dim = buf.iterator.filterNot(_.isNullAt(ti))
              .map(_.getSeq[Any](ti).length).nextOption().getOrElse(0)
            val child = et match {
              case FloatType => new Field("item",
                FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)), null)
              case _ => new Field("item",
                FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)
            }
            new Field(f.name,
              new FieldType(true, ArrowType.List.INSTANCE, null,
                Map(ExtName -> TensorExt, ExtMeta -> s"[$dim]").asJava),
              Seq(child).asJava)
          case t => new Field(f.name, FieldType.nullable(scalarArrowType(t)), null)
        }
      }

      val arrowSchema = new Schema(outFields.toSeq.asJava)
      val vsr = VectorSchemaRoot.create(arrowSchema, alloc)
      val writer = new ArrowFileWriter(vsr, provider,
        java.nio.channels.Channels.newChannel(out))
      writer.start()
      var off = 0
      while (off < buf.length) {
        val n = math.min(BatchRows, buf.length - off)
        vsr.allocateNew()
        outFields.zip(vsr.getFieldVectors.asScala).foreach { case (fld, vec) =>
          fillVector(vec, fld, schema, textOf, dictValues, tsRowEntry, buf, off, n)
        }
        vsr.setRowCount(n)
        writer.writeBatch()
        off += n
      }
      writer.end(); writer.close(); out.close()
      vsr.close(); dictVecs.foreach(_.close())
    } finally alloc.close()
  }

  private def scalarArrowType(t: DataType): ArrowType = t match {
    case LongType => new ArrowType.Int(64, true)
    case IntegerType => new ArrowType.Int(32, true)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BooleanType => ArrowType.Bool.INSTANCE
    case other => throw new IllegalArgumentException(s"unsupported feather type $other")
  }

  private def fillVector(vec: FieldVector, fld: Field, schema: StructType,
      textOf: Map[String, String],
      dictValues: mutable.Map[String, mutable.LinkedHashMap[String, Int]],
      tsRowEntry: mutable.Map[String, Array[Int]],
      buf: Array[Row], off: Int, n: Int): Unit = {
    val name = fld.getName
    val ci = schema.fieldIndex(name)
    vec match {
      case sv: StructVector if fld.getMetadata.get(ExtName) == TokenSpanExt =>
        val begins = sv.getChild("token_begins").asInstanceOf[IntVector]
        val ends = sv.getChild("token_ends").asInstanceOf[IntVector]
        val toks = sv.getChild("tokens").asInstanceOf[IntVector]
        // buf-parallel entry index built with the dictionaries; a non-null
        // span row is guaranteed an entry >= 0 by the builder's require
        val rowEntry = tsRowEntry(name)
        var i = 0
        while (i < n) {
          val r = buf(off + i)
          if (r.isNullAt(ci)) sv.setNull(i)
          else {
            sv.setIndexDefined(i)
            val s = r.getStruct(ci)
            val bi = s.fieldIndex("begin_tok"); val ei = s.fieldIndex("end_tok")
            if (s.isNullAt(bi)) begins.setNull(i) else begins.setSafe(i, s.getInt(bi))
            if (s.isNullAt(ei)) ends.setNull(i) else ends.setSafe(i, s.getInt(ei))
            toks.setSafe(i, rowEntry(off + i))
          }
          i += 1
        }
        sv.setValueCount(n)
      case sv: StructVector =>
        val begins = sv.getChild("span_begins").asInstanceOf[IntVector]
        val ends = sv.getChild("span_ends").asInstanceOf[IntVector]
        val tt = sv.getChild("target_text").asInstanceOf[IntVector]
        val textIdx = schema.fieldIndex(textOf(name))
        val dict = dictValues(name)
        var i = 0
        while (i < n) {
          val r = buf(off + i)
          if (r.isNullAt(ci)) sv.setNull(i)
          else {
            sv.setIndexDefined(i)
            val s = r.getStruct(ci)
            val bi = s.fieldIndex("begin"); val ei = s.fieldIndex("end")
            if (s.isNullAt(bi)) begins.setNull(i) else begins.setSafe(i, s.getInt(bi))
            if (s.isNullAt(ei)) ends.setNull(i) else ends.setSafe(i, s.getInt(ei))
            if (r.isNullAt(textIdx)) tt.setNull(i)
            else tt.setSafe(i, dict(r.getString(textIdx)))
          }
          i += 1
        }
        sv.setValueCount(n)
      case lv: ListVector =>
        val w = lv.getWriter
        var i = 0
        while (i < n) {
          val r = buf(off + i)
          w.setPosition(i)
          if (!r.isNullAt(ci)) {
            w.startList()
            r.getSeq[Any](ci).foreach {
              case f: Float => w.float4().writeFloat4(f)
              case d: Double => w.float8().writeFloat8(d)
              case other => throw new IllegalArgumentException(s"bad tensor elem $other")
            }
            w.endList()
          }
          i += 1
        }
        lv.setValueCount(n)
      case v: BigIntVector =>
        fillScalar(v.setNull, n, buf, off, ci)((i, r) => v.setSafe(i, r.getLong(ci)))
      case v: IntVector =>
        fillScalar(v.setNull, n, buf, off, ci)((i, r) => v.setSafe(i, r.getInt(ci)))
      case v: Float8Vector =>
        fillScalar(v.setNull, n, buf, off, ci)((i, r) => v.setSafe(i, r.getDouble(ci)))
      case v: Float4Vector =>
        fillScalar(v.setNull, n, buf, off, ci)((i, r) => v.setSafe(i, r.getFloat(ci)))
      case v: VarCharVector =>
        fillScalar(v.setNull, n, buf, off, ci)((i, r) =>
          v.setSafe(i, r.getString(ci).getBytes("UTF-8")))
      case v: BitVector =>
        fillScalar(v.setNull, n, buf, off, ci)((i, r) =>
          v.setSafe(i, if (r.getBoolean(ci)) 1 else 0))
      case other => throw new IllegalArgumentException(s"unsupported vector $other")
    }
    vec.setValueCount(n)
  }

  private def fillScalar(setNull: Int => Unit, n: Int, buf: Array[Row],
      off: Int, ci: Int)(set: (Int, Row) => Unit): Unit = {
    var i = 0
    while (i < n) {
      val r = buf(off + i)
      if (r.isNullAt(ci)) setNull(i) else set(i, r)
      i += 1
    }
  }

  // ----------------------------------------------------------------- read

  /**
   * Read Feather V2 files (glob) written by [[writeFeather]] — or by the
   * reference via pandas `to_feather` with its extension arrays. Span
   * extension columns come back as `<name>` struct<begin,end> plus
   * `<name>_target_text` string (dictionary decoded); tensor extension
   * columns as `array<float|double>`. One task per file.
   */
  def readFeather(spark: SparkSession, path: String): DataFrame = {
    val hConf = spark.sessionState.newHadoopConf()
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(hConf)
    val files = fs.globStatus(hPath).map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no feather files match $path")

    // driver reads ONE schema; rows stream task-side (with the session's
    // Hadoop conf shipped along — see writeFeather)
    val (sparkSchema, _) = sparkSchemaOf(files.head, hConf)
    val sconf = new org.apache.spark.SerializableWritable(hConf)
    val rdd = spark.sparkContext.parallelize(files.toSeq, files.length)
      .flatMap { f => decodeFile(f, sconf.value) }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Random-access channel over a Hadoop file — lets the Arrow reader
    * pull record batches straight from storage, so a task never holds a
    * file's raw bytes (and files past 2 GB just work). */
  private class HadoopSeekableChannel(path: String,
      conf: org.apache.hadoop.conf.Configuration)
      extends java.nio.channels.SeekableByteChannel {
    private val p = new org.apache.hadoop.fs.Path(path)
    private val fs = p.getFileSystem(conf)
    private val len = fs.getFileStatus(p).getLen
    private val in = fs.open(p)
    private var pos = 0L
    private var opened = true
    override def read(dst: java.nio.ByteBuffer): Int = {
      val n = math.min(dst.remaining().toLong, len - pos).toInt
      if (n <= 0) return -1
      val buf = new Array[Byte](n)
      in.readFully(pos, buf, 0, n)
      dst.put(buf, 0, n)
      pos += n
      n
    }
    override def position(): Long = pos
    override def position(newPos: Long): java.nio.channels.SeekableByteChannel = {
      pos = newPos; this
    }
    override def size(): Long = len
    override def write(src: java.nio.ByteBuffer): Int =
      throw new UnsupportedOperationException("read-only channel")
    override def truncate(size: Long): java.nio.channels.SeekableByteChannel =
      throw new UnsupportedOperationException("read-only channel")
    override def isOpen: Boolean = opened
    override def close(): Unit = { opened = false; in.close() }
  }

  /** (spark schema, arrow schema) for one file. */
  private def sparkSchemaOf(path: String,
      conf: org.apache.hadoop.conf.Configuration): (StructType, Schema) = {
    val alloc = new RootAllocator()
    try {
      val rd = new ArrowFileReader(new HadoopSeekableChannel(path, conf), alloc)
      try {
        val as = rd.getVectorSchemaRoot.getSchema
        val fields = as.getFields.asScala.flatMap { f =>
          val ext = Option(f.getMetadata.get(ExtName))
          (ext, f.getType) match {
            case (Some(SpanExt), _) => Seq(
              StructField(f.getName, graft.types.spanType),
              StructField(s"${f.getName}_target_text", StringType))
            case (Some(TokenSpanExt), _) => Seq(
              StructField(f.getName, graft.types.tokenSpanType),
              StructField(s"${f.getName}_target_text", StringType))
            case (Some(TensorExt), _) | (None, _: ArrowType.List) =>
              val et = f.getChildren.get(0).getType match {
                case fp: ArrowType.FloatingPoint
                  if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
                case _ => DoubleType
              }
              Seq(StructField(f.getName, ArrayType(et)))
            case (_, t: ArrowType.Int) =>
              Seq(StructField(f.getName, if (t.getBitWidth == 64) LongType else IntegerType))
            case (_, fp: ArrowType.FloatingPoint) =>
              Seq(StructField(f.getName,
                if (fp.getPrecision == FloatingPointPrecision.SINGLE) FloatType else DoubleType))
            case (_, _: ArrowType.Utf8) => Seq(StructField(f.getName, StringType))
            case (_, _: ArrowType.Bool) => Seq(StructField(f.getName, BooleanType))
            case (_, other) => throw new IllegalArgumentException(s"unsupported arrow type $other")
          }
        }
        (StructType(fields.toSeq), as)
      } finally rd.close()
    } finally alloc.close()
  }

  /** Stream one file's rows batch by batch: only the CURRENT record
    * batch's decoded rows are live at any moment (Arrow recycles the
    * vectors on loadNextBatch, so each batch is decoded before advancing,
    * but the file itself is never fully materialized). */
  private def decodeFile(path: String,
      conf: org.apache.hadoop.conf.Configuration): Iterator[Row] = {
    val alloc = new RootAllocator()
    val rd = new ArrowFileReader(new HadoopSeekableChannel(path, conf), alloc)
    val vsr = rd.getVectorSchemaRoot
    // a killed/short-circuited task must not leak the reader
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ =>
        try { rd.close(); alloc.close() } catch { case _: Throwable => }
      })
    new Iterator[Row] {
      private var batch: Array[Row] = Array.empty
      private var i = 0
      private var done = false
      private def advance(): Unit =
        while (!done && i >= batch.length) {
          if (rd.loadNextBatch()) {
            val cols: Seq[Int => Seq[Any]] = vsr.getSchema.getFields.asScala.toSeq
              .zip(vsr.getFieldVectors.asScala).map { case (f, vec) =>
                decoderFor(f, vec, rd)
              }
            batch = Array.tabulate(vsr.getRowCount)(j =>
              Row.fromSeq(cols.flatMap(_.apply(j))))
            i = 0
          } else {
            done = true
            try { rd.close(); alloc.close() } catch { case _: Throwable => }
          }
        }
      override def hasNext: Boolean = { advance(); !done }
      override def next(): Row = {
        advance()
        if (done) throw new NoSuchElementException
        val r = batch(i); i += 1; r
      }
    }
  }

  /** Per-row decoder; span extension fields expand to two output values. */
  private def decoderFor(f: Field, vec: FieldVector,
      dicts: DictionaryProvider): Int => Seq[Any] = {
    Option(f.getMetadata.get(ExtName)) match {
      case Some(TokenSpanExt) =>
        // Rebuild the engine's token-span struct (begin_tok/end_tok +
        // derived char offsets) from the storage struct plus the shared
        // tokenization in the dictionaries: tokens dictionary entry ->
        // list of span storage structs -> (begins, ends, target text).
        val sv = vec.asInstanceOf[StructVector]
        val begins = sv.getChild("token_begins").asInstanceOf[IntVector]
        val ends = sv.getChild("token_ends").asInstanceOf[IntVector]
        val toks = sv.getChild("tokens").asInstanceOf[IntVector]
        val outerId = f.getChildren.asScala
          .find(_.getName == "tokens").get.getDictionary.getId
        val tokensLists = dicts.lookup(outerId).getVector.asInstanceOf[ListVector]
        val tsv = tokensLists.getDataVector.asInstanceOf[StructVector]
        val tbv = tsv.getChild("span_begins").asInstanceOf[IntVector]
        val tev = tsv.getChild("span_ends").asInstanceOf[IntVector]
        val ttv = tsv.getChild("target_text").asInstanceOf[IntVector]
        val innerId = tokensLists.getField.getChildren.asScala.head
          .getChildren.asScala.find(_.getName == "target_text").get
          .getDictionary.getId
        val textDict = dicts.lookup(innerId).getVector.asInstanceOf[VarCharVector]
        // decode every tokenization entry up front (bounded: the file's
        // dictionary = the tokens of the docs in ONE write partition;
        // re-decoded per record batch, cheap next to the 8192-row batch)
        val entries = (0 until tokensLists.getValueCount).map { e =>
          val s = tokensLists.getElementStartIndex(e)
          val t = tokensLists.getElementEndIndex(e)
          val tb = Array.tabulate(t - s)(k => tbv.get(s + k))
          val te = Array.tabulate(t - s)(k => tev.get(s + k))
          val text = if (t > s && !ttv.isNull(s))
            new String(textDict.get(ttv.get(s)), "UTF-8") else null
          (tb, te, text)
        }
        def charSpan(tb: Array[Int], te: Array[Int], b: Int, e: Int): (Int, Int) =
          if (e > b && b >= 0 && e <= tb.length) (tb(b), te(e - 1))
          else if (b >= 0 && b < tb.length) (tb(b), tb(b))
          else if (tb.nonEmpty) (te(te.length - 1), te(te.length - 1))
          else (0, 0)
        i => {
          if (sv.isNull(i)) Seq(null, null)
          else {
            val (tb, te, text) = entries(toks.get(i))
            val b = begins.get(i); val e = ends.get(i)
            val (cb, ce) = charSpan(tb, te, b, e)
            Seq(Row(b, e, cb, ce), text)
          }
        }
      case Some(SpanExt) =>
        val sv = vec.asInstanceOf[StructVector]
        val begins = sv.getChild("span_begins").asInstanceOf[IntVector]
        val ends = sv.getChild("span_ends").asInstanceOf[IntVector]
        val tt = sv.getChild("target_text").asInstanceOf[IntVector]
        val encId = f.getChildren.asScala
          .find(_.getName == "target_text").get.getDictionary.getId
        val dict = dicts.lookup(encId).getVector.asInstanceOf[VarCharVector]
        i => {
          if (sv.isNull(i)) Seq(null, null)
          else Seq(
            Row(if (begins.isNull(i)) null else begins.get(i),
              if (ends.isNull(i)) null else ends.get(i)),
            if (tt.isNull(i)) null else new String(dict.get(tt.get(i)), "UTF-8"))
        }
      case _ => vec match {
        case lv: ListVector => i => Seq(
          if (lv.isNull(i)) null
          else lv.getObject(i).asScala.toSeq.map {
            case f: java.lang.Float => f.floatValue()
            case d: java.lang.Double => d.doubleValue()
            case x => x
          })
        case v: BigIntVector => i => Seq(if (v.isNull(i)) null else v.get(i))
        case v: IntVector => i => Seq(if (v.isNull(i)) null else v.get(i))
        case v: Float8Vector => i => Seq(if (v.isNull(i)) null else v.get(i))
        case v: Float4Vector => i => Seq(if (v.isNull(i)) null else v.get(i))
        case v: VarCharVector =>
          i => Seq(if (v.isNull(i)) null else new String(v.get(i), "UTF-8"))
        case v: BitVector => i => Seq(if (v.isNull(i)) null else v.get(i) == 1)
        case other => throw new IllegalArgumentException(s"unsupported vector $other")
      }
    }
  }
}
