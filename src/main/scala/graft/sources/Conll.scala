package graft.sources

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Iob

/**
 * CoNLL-2003 / CoNLL-U corpus readers (reference: io/conll.py).
 *
 * The reference parses files with "straight non-vectorized Python code"
 * (io/conll.py:320-323) into one pandas DataFrame per document. Here the
 * unit of parallelism is the *file*: `wholeTextFiles` distributes files
 * across executors, each file parses to token rows in a single narrow
 * flatMap, and all downstream correction (IOB1→IOB2) runs as window
 * functions. A 100 TB corpus of many files scales linearly; document
 * identity is `(fold, doc_num)` with a derived stable `doc_id` hash,
 * matching the reference's `combine_folds` flattening (io/conll.py:1437-1458).
 *
 * Output token-relation schema:
 *   fold string (file path), doc_num int, doc_id long, token_id int,
 *   span struct<begin,end>, text string,
 *   sentence struct<begin_tok,end_tok,begin,end>, line_num int,
 *   plus one column per metadata field (`name`), or two (`name_iob`,
 *   `name_type`) for IOB fields.
 */
object Conll {

  /** Reconstruction rules (reference: io/conll.py:45-59): no space before
    * punctuation/right-paren/'xx contractions; no space after left parens. */
  private val NoSpaceBefore =
    java.util.regex.Pattern.compile("[!#%)*+,-./:;=>?@\\]^_`|}~]|'[a-zA-Z]{1,2}")
  private val NoSpaceAfter = java.util.regex.Pattern.compile("[(<\\[{$]+")
  private val DocSeparator = "-DOCSTART-"

  private class Sentence(columnNames: Seq[String], iobColumns: Seq[Boolean]) {
    val tokens = mutable.ArrayBuffer.empty[String]
    val lineNums = mutable.ArrayBuffer.empty[Int]
    /** CoNLL-09 predicate-argument fields (reference: io/conll.py:292-306):
      * the reference appends per-sentence `predicate` + `pred{i}arg`
      * columns; the engine's fixed corpus-wide schema renders them as one
      * string column + one array column per token. */
    val predicates = mutable.ArrayBuffer.empty[String]
    val predArgs = mutable.ArrayBuffer.empty[Seq[String]]
    /** Values per output meta column (name or name_iob/name_type). */
    val meta: mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]] = {
      val m = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
      columnNames.zipWithIndex.foreach { case (n, i) =>
        if (i < iobColumns.length && iobColumns(i)) {
          m(s"${n}_iob") = mutable.ArrayBuffer.empty
          m(s"${n}_type") = mutable.ArrayBuffer.empty
        } else m(n) = mutable.ArrayBuffer.empty
      }
      m
    }

    def addTags(rawTags: Seq[String], lineNum: Int, isConllU: Boolean): Unit = {
      rawTags.zipWithIndex.foreach { case (raw, i) =>
        val name = columnNames(i)
        if (i < iobColumns.length && iobColumns(i)) {
          val (tag, ent): (String, String) =
            if (raw != null && (raw.startsWith("I-") || raw.startsWith("B-"))) {
              // "B-"/"I-" with no entity type parses to a null type (not
              // ""), making the writers' iobTag rendering an exact inverse
              // for hand-built relations with null-typed B/I tags.
              val parts = raw.split("-", 2)
              (parts(0), if (parts(1).isEmpty) null else parts(1))
            } else if (raw == "O") ("O", null)
            else if (!isConllU && raw == "-X-") ("O", null)
            else throw new IllegalArgumentException(
              s"Tag '$raw' of IOB field $i at line $lineNum is not I-/B-/O")
          meta(s"${name}_iob") += tag
          meta(s"${name}_type") += ent
        } else meta(name) += raw
      }
    }
  }

  /** Parse CoNLL-2003 content → docs of sentences
    * (`_parse_conll_file`, reference: io/conll.py:315-377). */
  private def parse2003(content: String, columnNames: Seq[String],
      iobColumns: Seq[Boolean]): Seq[Seq[Sentence]] = {
    val docs = mutable.ArrayBuffer.empty[Seq[Sentence]]
    var sentences = mutable.ArrayBuffer.empty[Sentence]
    var cur = new Sentence(columnNames, iobColumns)
    val lines = content.split("\n", -1)
    for (i <- lines.indices) {
      val line = lines(i).trim
      if (line.isEmpty) {
        if (cur.tokens.nonEmpty) { sentences += cur; cur = new Sentence(columnNames, iobColumns) }
      } else {
        val elems = line.split(" ").toSeq
        require(elems.length == 1 + columnNames.length,
          s"Unexpected number of elements ${elems.length} at line $i")
        if (elems.head == DocSeparator && i > 0) {
          // End of document; the -DOCSTART- token belongs to the NEXT doc.
          docs += sentences.toSeq
          sentences = mutable.ArrayBuffer.empty
        }
        cur.tokens += elems.head
        cur.lineNums += i
        cur.addTags(elems.tail, i, isConllU = false)
      }
    }
    if (cur.tokens.nonEmpty) sentences += cur
    if (sentences.nonEmpty) docs += sentences.toSeq
    docs.toSeq
  }

  /** One parsed token row, pre-DataFrame. */
  private def docToRows(fold: String, docNum: Int, doc: Seq[Sentence],
      metaCols: Seq[String], spaceBeforePunct: Boolean): Seq[Row] = {
    val rows = mutable.ArrayBuffer.empty[Row]
    var charPos = 0
    var tokenPos = 0
    for (sentence <- doc) {
      val toks = sentence.tokens
      val n = toks.length
      // Prefix of each token: "" or " " (reference: io/conll.py:723-745)
      val noSpaceBefore = Array.tabulate(n)(i =>
        !spaceBeforePunct && NoSpaceBefore.matcher(toks(i)).matches())
      val noSpaceAfter = Array.tabulate(n)(i =>
        !spaceBeforePunct && NoSpaceAfter.matcher(toks(i)).matches())
      noSpaceBefore(0) = true
      noSpaceAfter(n - 1) = true
      val prefixes = Array.tabulate(n)(i =>
        if (noSpaceBefore(i) || (i > 0 && noSpaceAfter(i - 1))) "" else " ")

      // char offsets within the sentence, then shifted by charPos
      var pos = 0
      val sentBeginTok = tokenPos
      val sentEndTok = tokenPos + n
      val begins = new Array[Int](n)
      val ends = new Array[Int](n)
      for (i <- 0 until n) {
        pos += prefixes(i).length
        begins(i) = charPos + pos
        pos += toks(i).length
        ends(i) = charPos + pos
      }
      val sentBeginChar = begins(0)
      val sentEndChar = ends(n - 1)
      for (i <- 0 until n) {
        val metaVals = metaCols.map(c => sentence.meta(c)(i))
        rows += Row.fromSeq(Seq(fold, docNum, tokenPos + i,
          Row(begins(i), ends(i)), toks(i),
          Row(sentBeginTok, sentEndTok, sentBeginChar, sentEndChar),
          sentence.lineNums(i)) ++ metaVals)
      }
      charPos += pos + 1 // newline between sentences
      tokenPos += n
    }
    rows.toSeq
  }

  private def tokensSchema(metaCols: Seq[String]): StructType = StructType(Seq(
    StructField("fold", StringType), StructField("doc_num", IntegerType),
    StructField("token_id", IntegerType),
    StructField("span", graft.types.spanType),
    StructField("text", StringType),
    StructField("sentence", graft.types.tokenSpanType),
    StructField("line_num", IntegerType)) ++
    metaCols.map(c => StructField(c, StringType)))

  private def metaColsFor(columnNames: Seq[String], iobColumns: Seq[Boolean]): Seq[String] =
    columnNames.zipWithIndex.flatMap { case (n, i) =>
      if (i < iobColumns.length && iobColumns(i)) Seq(s"${n}_iob", s"${n}_type") else Seq(n)
    }

  /**
   * Read CoNLL-2003 training/test files into the standard token relation
   * with IOB2-corrected tags (`conll_2003_to_dataframes`, reference:
   * io/conll.py:1024-1075). `path` may be a file, directory, or glob; each
   * file is one fold.
   */
  def conll2003(spark: SparkSession, path: String,
      columnNames: Seq[String] = Seq("pos", "phrase", "ent"),
      iobColumns: Seq[Boolean] = Seq(false, true, true),
      spaceBeforePunct: Boolean = false): DataFrame = {
    val metaCols = metaColsFor(columnNames, iobColumns)
    val schema = tokensSchema(metaCols)
    val rdd = spark.sparkContext.wholeTextFiles(path).flatMap { case (file, content) =>
      parse2003(content, columnNames, iobColumns).zipWithIndex.flatMap {
        case (doc, docNum) => docToRows(file, docNum, doc, metaCols, spaceBeforePunct)
      }
    }
    val raw = spark.createDataFrame(rdd, schema)
      .withColumn("doc_id", xxhash64(col("fold"), col("doc_num")))
    // IOB1 → IOB2 correction as a window plan, one pass per IOB field
    columnNames.zipWithIndex.filter { case (_, i) =>
      i < iobColumns.length && iobColumns(i) }
      .map(_._1)
      .foldLeft(raw) { case (df, name) => Iob.iobToIob2(df, name) }
  }

  /**
   * Read a CoNLL-2003 *output* file (tags only, no tokens) and align it to
   * corpus tokens by position (`conll_2003_output_to_dataframes`,
   * reference: io/conll.py:1179-1236, parser 508-587). Alignment key is the
   * global token order of the corpus relation.
   */
  def conll2003Output(spark: SparkSession, corpusTokens: DataFrame, path: String,
      name: String = "ent", docTokenCounts: Option[DataFrame] = None): DataFrame = {
    def parseTag(raw: String, idx: Long): Row = {
      require(!raw.contains(" "), s"Line contains unexpected space: '$raw'")
      val (tag, ent): (String, String) =
        if (raw.startsWith("I-") || raw.startsWith("B-")) {
          val p = raw.split("-", 2); (p(0), p(1))
        } else if (raw == "O") ("O", null)
        else throw new IllegalArgumentException(s"Unexpected tag $raw")
      Row(idx, tag, ent)
    }
    // Global line numbering. Fast path: every tags file written by this
    // engine carries a v2 sidecar ("nDocs nLines"); per-file offsets are
    // then assembled on the driver (one tiny read per file — the same
    // order of IO every scan's planning pays to list the files) and each
    // task indexes its own file locally: ONE read pass over the tags.
    // Fallback (foreign corpora, v1 sidecars): zipWithIndex, whose
    // internal count job reads the files a second time.
    val hconf = spark.sessionState.newHadoopConf()
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(hconf)
    val files = Option(fs.globStatus(hPath)).getOrElse(
      Array.empty[org.apache.hadoop.fs.FileStatus])
    def sidecarLines(f: org.apache.hadoop.fs.FileStatus): Option[Long] = {
      val sp = new org.apache.hadoop.fs.Path(f.getPath.getParent,
        "." + f.getPath.getName + ".docs")
      if (!fs.exists(sp)) None
      else {
        val in = fs.open(sp)
        val fields =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim.split("\\s+")
          finally in.close()
        if (fields.length >= 2) Some(fields(1).toLong) else None
      }
    }
    val fileOffsets: Option[Map[String, Long]] =
      if (files.isEmpty) None
      else {
        val perFile = files.sortBy(_.getPath.toUri.getPath)
          .map(f => sidecarLines(f).map(n => (f.getPath.toUri.getPath, n)))
        if (perFile.exists(_.isEmpty)) None
        else Some {
          var acc = 0L
          perFile.flatten.map { case (p, n) => val o = acc; acc += n; (p, o) }.toMap
        }
      }
    val lines = fileOffsets match {
      case Some(offs) =>
        val bc = spark.sparkContext.broadcast(offs)
        spark.sparkContext.wholeTextFiles(path).flatMap { case (file, content) =>
          val key = new org.apache.hadoop.fs.Path(file).toUri.getPath
          val off = bc.value.getOrElse(key, throw new IllegalStateException(
            s"tags file $key appeared after the driver's offset listing " +
              "(concurrent write or path normalization drift); rerun the read"))
          content.split("\n", -1).iterator.map(_.trim).filter(_.nonEmpty)
            .zipWithIndex.map { case (raw, i) => parseTag(raw, off + i) }
        }
      case None =>
        spark.sparkContext.wholeTextFiles(path).flatMap { case (_, content) =>
          content.split("\n", -1).map(_.trim).filter(_.nonEmpty)
        }.zipWithIndex().map { case (raw, idx) => parseTag(raw, idx) }
    }
    val tagsDf = spark.createDataFrame(lines, StructType(Seq(
      StructField("__pos", LongType), StructField(s"${name}_iob", StringType),
      StructField(s"${name}_type", StringType))))
    // Global token position = per-document offset + token_id, via a
    // TWO-LEVEL prefix sum over per-(fold, doc_num) token counts: the
    // within-fold document prefix sum is a window PARTITIONED BY fold
    // (distributed — each file's document directory stays in one task),
    // and the per-FOLD totals (one row per input file) accumulate through
    // a triangular self-join below — no global-order window anywhere. No
    // stage ever funnels the corpus-wide document directory — let alone
    // the token stream — through one task.
    // Fold ordering must match wholeTextFiles' PATH order (how the tag
    // lines were numbered). Reader-direct fold values ARE paths, so their
    // natural order is right; refolded relations carry LOGICAL fold
    // values whose on-disk directories are the ESCAPED names — sort those
    // by their escaped form ("a:b" lives in fold=a%3Ab, which orders
    // before fold=a-b even though raw 'a-b' < 'a:b').
    val foldOrd = udf((f: String) =>
      if (f == null || f.contains("/")) f else escapePath(f))
    val docW = Window.partitionBy("fold").orderBy("doc_num")
      .rowsBetween(Window.unboundedPreceding, -1)
    // Per-doc token counts: the CALLER often has these for free (an
    // exporter aligning its own predictions knows exactly what it wrote);
    // accepting them avoids re-executing the corpus reader subtree just
    // to count — the default derives them from `corpusTokens`, which
    // evaluates that subtree a second time. Contract: (fold, doc_num,
    // __n) with __n = this doc's token-row count in the READ relation
    // (so +1 per -DOCSTART- header token when the corpus has them).
    val counts = docTokenCounts.getOrElse(
      corpusTokens.groupBy("fold", "doc_num").agg(count(lit(1)).as("__n")))
    // Cumulative fold offsets WITHOUT a global-order window: the per-fold
    // totals (one row per input FILE) left-join themselves on
    // strictly-earlier fold order and sum — a triangular broadcast join
    // over file-count rows, so no stage sorts even the fold directory in
    // a single task. The totals aggregate appears on both join sides, but
    // its shuffle is deduplicated by ReuseExchange (identical subtrees),
    // so the corpus is still scanned once.
    val totals = counts.groupBy("fold").agg(sum("__n").as("__ft"))
      .withColumn("__ford", foldOrd(col("fold")))
    val foldOffsets = totals
      .join(broadcast(totals.select(col("__ford").as("__eford"),
        col("__ft").as("__eft"))), col("__eford") < col("__ford"), "left")
      .groupBy("fold")
      .agg(coalesce(sum("__eft"), lit(0L)).as("__fold_off"))
    val offsets = counts
      .withColumn("__doc_off", coalesce(sum("__n").over(docW), lit(0L)))
      .join(broadcast(foldOffsets), Seq("fold"))
      .withColumn("__off", col("__doc_off") + col("__fold_off"))
      .select("fold", "doc_num", "__off")
    val base = corpusTokens
      .drop(s"${name}_iob", s"${name}_type")
      .join(broadcast(offsets), Seq("fold", "doc_num"))
      .withColumn("__pos", col("__off") + col("token_id"))
      .drop("__off")
    // LEFT join: a tag-count mismatch surfaces as null tags on the
    // unmatched tokens instead of silently dropping + misaligning rows
    // (the reference warns on mismatch, io/conll.py:560-575).
    val joined = base.join(tagsDf, Seq("__pos"), "left").drop("__pos")
    Iob.iobToIob2(joined, name)
  }

  /** Default CoNLL-U field names after the first two required fields
    * (reference: io/conll.py:62-76). */
  def defaultConllUFields: Seq[String] =
    Seq("lemma", "upostag", "xpostag", "features", "head", "deprel", "deps", "misc")

  /** What `#` metadata comments to carry onto token rows
    * (reference: io/conll.py:84-96): tag in file → output column. */
  def defaultEwtMetadata: Map[String, String] = Map(
    "sent_id" -> "sentence_id", "newpar id" -> "paragraph_id", "newdoc id" -> "doc")

  /** Parse CoNLL-U content (`_parse_conll_u_file`, reference:
    * io/conll.py:380-505): tab-separated with a leading in-sentence index,
    * `#` metadata lines, `# newdoc id` document separator, optional
    * subtoken-range merging. Returns (sentence, metadata) pairs per doc. */
  private def parseConllU(content: String, columnNames: Seq[String],
      iobColumns: Seq[Boolean], mergeSubtokens: Boolean,
      metadataFields: Map[String, String],
      hasPredicateArgs: Boolean = false,
      separateSentencesByDoc: Boolean = false):
      Seq[Seq[(Sentence, Map[String, String])]] = {
    val docs = mutable.ArrayBuffer.empty[Seq[(Sentence, Map[String, String])]]
    var sentences = mutable.ArrayBuffer.empty[(Sentence, Map[String, String])]
    var cur = new Sentence(columnNames, iobColumns)
    val curMeta = mutable.Map.empty[String, String]
    val lines = content.split("\n", -1)
    var i = 0
    var subtokEnd = -1
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty) {
        if (cur.tokens.nonEmpty) {
          sentences += ((cur, curMeta.toMap))
          cur = new Sentence(columnNames, iobColumns)
        }
      } else if (line.startsWith("#")) {
        val elems = line.split(" = ", 2)
        if (elems(0) == "# newdoc id" && i > 0 && sentences.nonEmpty) {
          docs += sentences.toSeq
          sentences = mutable.ArrayBuffer.empty
        }
        val key = elems(0).replaceAll("^[# ]+", "").replaceAll("[# ]+$", "")
        if (metadataFields.contains(key) && elems.length > 1)
          curMeta(metadataFields(key)) = elems(1)
      } else if (i > subtokEnd) {
        val elems = line.split("\t").toBuffer
        if (!elems.head.contains("-")) {
          addConllULine(cur, elems.toSeq, i, columnNames, hasPredicateArgs)
        } else if (mergeSubtokens) {
          // Merge the subtoken range into one token, joining fields with "|"
          val Array(startS, endS) = elems.head.split("-", 2)
          subtokEnd = endS.toInt - startS.toInt + i + 1
          val combined = elems.take(2) ++ (2 until elems.length).map { f =>
            (i + 1 to subtokEnd).flatMap { j =>
              val se = lines(j).split("\t")
              if (f < se.length && se(f) != "_") Some(se(f)) else None
            }.mkString("|")
          }
          addConllULine(cur, combined.toSeq, i, columnNames, hasPredicateArgs)
        }
        // without mergeSubtokens, range lines are skipped (word lines follow)
      }
      i += 1
    }
    if (cur.tokens.nonEmpty) sentences += ((cur, curMeta.toMap))
    if (sentences.nonEmpty) docs += sentences.toSeq
    // `separate_sentences_by_doc` (io/conll.py:1082, 1170): every sentence
    // becomes its own document, ignoring `# newdoc id` boundaries.
    if (separateSentencesByDoc) docs.toSeq.flatten.map(Seq(_))
    else docs.toSeq
  }

  private def addConllULine(cur: Sentence, elemsIn: Seq[String], lineNum: Int,
      columnNames: Seq[String], hasPredicateArgs: Boolean = false): Unit = {
    var elems = elemsIn
    if (elems.length < 2 + columnNames.length)
      elems = elems ++ Seq.fill(2 + columnNames.length - elems.length)("_")
    val token = elems(1)
    val rawTags = elems.slice(2, columnNames.length + 2)
      .map(t => if (t == "_") null else t)
    cur.tokens += token
    cur.lineNums += lineNum
    cur.addTags(rawTags, lineNum, isConllU = true)
    if (hasPredicateArgs) {
      // CoNLL-09: fields beyond the standard layout are the predicate
      // sense column plus one argument column per predicate in the
      // sentence (io/conll.py:292-306); '_' → null like other tags.
      val extras = elemsIn.drop(2 + columnNames.length)
      cur.predicates += extras.headOption.filter(_ != "_").orNull
      cur.predArgs += extras.drop(1).map(v => if (v == "_") null else v)
    }
  }

  /**
   * Read CoNLL-U files into the standard token relation
   * (`conll_u_to_dataframes`, reference: io/conll.py:1078-1177). Adds the
   * requested `#`-comment metadata as columns, re-points `head` indices
   * from sentence-relative 1-based to document-relative 0-based token ids
   * (0 → null, reference io/conll.py:773-786), and casts numeric columns.
   */
  def conllU(spark: SparkSession, path: String,
      columnNames: Seq[String] = defaultConllUFields,
      iobColumns: Seq[Boolean] = Nil,
      mergeSubtokens: Boolean = false,
      metadataFields: Map[String, String] = defaultEwtMetadata,
      numericCols: Seq[String] = Seq("head", "line_num"),
      hasPredicateArgs: Boolean = false,
      separateSentencesByDoc: Boolean = false): DataFrame = {
    val metaCols = metaColsFor(columnNames, iobColumns)
    val extraCols = metadataFields.values.toSeq.sorted
    val predFields =
      if (hasPredicateArgs) Seq(StructField("predicate", StringType),
        StructField("pred_args", ArrayType(StringType)))
      else Nil
    val schema = StructType(tokensSchema(metaCols).fields ++
      extraCols.map(c => StructField(c, StringType)) ++ predFields)
    val cn = columnNames; val iobc = iobColumns; val ms = mergeSubtokens
    val mf = metadataFields; val hpa = hasPredicateArgs; val ssd = separateSentencesByDoc
    val rdd = spark.sparkContext.wholeTextFiles(path).flatMap { case (file, content) =>
      parseConllU(content, cn, iobc, ms, mf, hpa, ssd).zipWithIndex.flatMap {
        case (doc, docNum) =>
          // token rows from the sentence data, then append per-sentence metadata
          val rows = docToRows(file, docNum, doc.map(_._1), metaCols,
            spaceBeforePunct = false)
          // sentence index per token, to look up metadata
          val sentMeta = doc.flatMap { case (s, m) => Seq.fill(s.tokens.length)(m) }
          val predVals: Seq[Seq[Any]] =
            if (!hpa) rows.map(_ => Nil)
            else doc.flatMap { case (s, _) =>
              s.predicates.indices.map(i => Seq(s.predicates(i), s.predArgs(i)))
            }
          rows.lazyZip(sentMeta).lazyZip(predVals).map { case (r, m, p) =>
            Row.fromSeq(r.toSeq ++ extraCols.map(c => m.getOrElse(c, null)) ++ p)
          }
      }
    }
    var df = spark.createDataFrame(rdd, schema)
      .withColumn("doc_id", xxhash64(col("fold"), col("doc_num")))
    if (columnNames.contains("head")) {
      // head: 1-based within sentence → doc token id; 0 (root) → null
      df = df.withColumn("head",
        when(col("head").isNull || col("head") === "0", lit(null))
          .otherwise(col("head").cast("int") - 1 + col("sentence")("begin_tok")))
    }
    numericCols.filter(c => df.columns.contains(c) && c != "head")
      .foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("long")))
  }

  // ------------------------------------------------------------------
  // Distributed writers — the inverse of the readers. The reference's
  // own guidance is to write tagged corpora back out as CoNLL files
  // (io/conll.py:320-323); it does so with driver-side Python loops. Here
  // the export is a Spark plan end to end: every token becomes one output
  // LINE row keyed by (fold, doc_num, pos, sub); lines stream through an
  // explicit per-partition writer producing one directory per fold and one
  // ordered file per `maxDocsPerFile`-sized doc_num range, so write
  // parallelism scales with corpus size even for single-fold corpora and
  // no stage ever materializes a document — let alone the corpus — in
  // memory. `refold` restores logical (fold, doc_num) keys on re-read.
  // ------------------------------------------------------------------

  /** IOB pair back to its file form: "B-KEY" / "I-KEY" / "O". */
  private def iobTag(name: String): Column =
    when(col(s"${name}_iob").isNull || col(s"${name}_iob") === "O", lit("O"))
      .otherwise(concat(col(s"${name}_iob"), lit("-"),
        coalesce(col(s"${name}_type"), lit(""))))

  /**
   * Generic ordered-text sink shared by the format writers (public: it is
   * also the scale-safe way to export tags-only files for
   * `conll2003Output`). Input columns: fold string, doc_num int,
   * pos int, sub int, line string.
   *
   * Each fold is range-split into buckets of `maxDocsPerFile` consecutive
   * doc_nums; each (fold, bucket) becomes one ordered file
   * `path/fold=<v>/part-NNNNN.txt` (zero-padded, so an alphabetical glob
   * reads buckets — and therefore documents — back in doc_num order).
   * Write parallelism is thus `ceil(docs/maxDocsPerFile)` PER FOLD, not
   * one task per fold: a corpus delivered as a single giant fold still
   * fans out. Line order inside a file is written explicitly by this
   * function from a per-partition sort — no dependency on any sink's
   * ordering behavior — and files appear atomically (temp file + rename),
   * memory one line at a time.
   *
   * Each part file gets a hidden `.part-NNNNN.txt.docs` sidecar holding
   * its document count: [[refold]] reads these (one tiny driver-side read
   * per file) instead of re-parsing the whole corpus to rebuild per-file
   * doc offsets. Readers skip dotfiles, so sidecars never pollute a scan.
   */
  def writeLines(lines: DataFrame, path: String, maxDocsPerFile: Int = 500): Unit =
    writeLinesStreams(lines.withColumn("__stream", lit("")), Map("" -> path),
      maxDocsPerFile)

  /**
   * Multi-root variant of [[writeLines]]: `lines` carries an extra
   * `__stream` column naming which output corpus each line belongs to,
   * and `roots` maps stream name → destination path. All streams ride
   * ONE shuffle and ONE write pass — a task owns a `(fold, bucket)`
   * slice and writes that bucket's part file for every stream (the sort
   * groups streams contiguously within the slice). This is what lets an
   * exporter emit a corpus file and a parallel tags/predictions file
   * from a single scan instead of two full write jobs.
   */
  def writeLinesStreams(lines: DataFrame, roots: Map[String, String],
      maxDocsPerFile: Int = 500): Unit = {
    require(maxDocsPerFile > 0, "maxDocsPerFile must be positive")
    require(roots.nonEmpty, "at least one output root required")
    val spark = lines.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    roots.values.foreach { p =>
      val rp = new org.apache.hadoop.fs.Path(p)
      rp.getFileSystem(hconf).delete(rp, true)
    }
    // Ship the SESSION's Hadoop conf into the write tasks: executors on a
    // cluster configured purely via spark.hadoop.* (credentials,
    // defaultFS) would otherwise write against a default Configuration.
    val sconf = new org.apache.spark.SerializableWritable(hconf)
    lines
      .select(col("__stream"), col("fold"),
        (col("doc_num").cast("long") / maxDocsPerFile).cast("int").as("bucket"),
        col("doc_num").cast("long").as("doc_num"), col("pos"), col("sub"), col("line"))
      .repartition(col("fold"), col("bucket"))
      .sortWithinPartitions("fold", "bucket", "__stream", "doc_num", "pos", "sub", "line")
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = sconf.value
        var cur: (String, String, Int) = null
        var pf: PartFile = null
        var lastDoc = Long.MinValue
        it.foreach { r =>
          val stream = r.getString(0); val fold = r.getString(1); val b = r.getInt(2)
          if (cur == null || cur != ((stream, fold, b))) {
            if (pf != null) pf.close()
            pf = new PartFile(new org.apache.hadoop.fs.Path(roots(stream)),
              fold, b, conf)
            cur = (stream, fold, b)
            lastDoc = Long.MinValue
          }
          val d = r.getLong(3)
          if (d != lastDoc) { pf.nDocs += 1; lastDoc = d }
          pf.write(r.getString(6))
        }
        if (pf != null) pf.close()
      }
  }

  /**
   * One atomically-renamed part file plus its hidden sidecar. Sidecar
   * content is `"<nDocs> <nNonBlankLines>"`: the doc count drives
   * [[refold]]'s offset reconstruction, the non-blank line count lets
   * [[conll2003Output]] index tag lines per file without a counting
   * pre-pass (older single-number sidecars stay readable — every parser
   * takes the leading fields it knows).
   */
  private class PartFile(root: org.apache.hadoop.fs.Path, fold: String, b: Int,
      conf: org.apache.hadoop.conf.Configuration) {
    private val utf8 = java.nio.charset.StandardCharsets.UTF_8
    private val dir = new org.apache.hadoop.fs.Path(root, "fold=" + escapePath(fold))
    private val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    private val dest = new org.apache.hadoop.fs.Path(dir, f"part-$b%05d.txt")
    private val tmpF = new org.apache.hadoop.fs.Path(dir,
      f".part-$b%05d.txt.${java.util.UUID.randomUUID()}.tmp")
    private val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(tmpF, true), utf8), 1 << 16)
    var nDocs = 0L
    private var nLines = 0L
    def write(line: String): Unit = {
      // Count exactly what the fast-path reader counts (it trims each
      // line before its nonEmpty test): a whitespace-only line counted
      // here but skipped there would silently shift every later global
      // tag position.
      if (line.trim.nonEmpty) nLines += 1
      out.write(line); out.write('\n')
    }
    def close(): Unit = {
      out.close(); fs.delete(dest, false)
      // A false return (HDFS rename-to-existing semantics, a racing
      // speculative attempt) would lose the part file SILENTLY while
      // its sidecar still gets written — fail the task instead.
      if (!fs.rename(tmpF, dest))
        throw new java.io.IOException(s"rename $tmpF -> $dest failed")
      val side = new org.apache.hadoop.fs.Path(dir, "." + dest.getName + ".docs")
      val so = fs.create(side, true)
      so.write(s"$nDocs $nLines".getBytes(utf8))
      so.close()
    }
  }

  /** Path-segment escaping for fold directory names — same scheme as
    * Spark's dynamic-partition sink (so corpora written by older rounds'
    * `partitionBy` layout stay readable). */
  private[graft] def escapePath(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(s)
  private[graft] def unescapePath(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)

  /** Glob matching the files `writeLines` produces under `path`. */
  def writtenFilesGlob(path: String): String = s"$path/fold=*/part-*"

  /**
   * Re-key a token relation read back from a [[writeLines]] layout: the
   * readers assign `fold` = file path and restart `doc_num` at 0 per file,
   * so a fold that was range-split into several `part-NNNNN` files comes
   * back as several pseudo-folds. This restores the logical keys: `fold`
   * := the decoded `fold=<v>` directory segment, `doc_num` := the file's
   * local doc_num plus the doc count of all earlier files of the same
   * fold (files ordered by name — which [[writeLines]] guarantees is
   * doc_num order), `doc_id` := xxhash64(fold, doc_num).
   *
   * Scale shape: the prefix sum runs over ONE ROW PER FILE (a window over
   * the file-level aggregate, same pattern as `conll2003Output`'s
   * alignment), then broadcast-joins back to the token relation — no
   * global shuffle of tokens. NOTE this form re-executes the reader
   * subtree once to build the per-file counts (the broadcast subquery is
   * a second parse of the corpus); when the corpus was produced by
   * [[writeLines]], prefer the `(tokens, root)` overload, which gets the
   * counts from the writer's sidecars and scans the corpus ONCE.
   */
  def refold(tokens: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val foldEnc = regexp_extract(col("file"), "fold=([^/]+)/[^/]*$", 1)
    val perFile = tokens.groupBy(col("fold").as("file"))
      .agg((max("doc_num") + 1).as("__cnt"))
      .withColumn("__fold_enc", foldEnc)
    val w = Window.partitionBy("__fold_enc").orderBy("file")
    val unescapeUdf = udf((s: String) => unescapePath(s))
    val offsets = perFile
      .withColumn("__offset", sum("__cnt").over(w) - col("__cnt"))
      // decode on the one-row-per-file relation, not per token
      .select(col("file"), unescapeUdf(col("__fold_enc")).as("__fold"),
        col("__offset"))
    rekey(tokens, broadcast(offsets), tokens("fold") === offsets("file"),
      Seq("file"))
  }

  /**
   * [[refold]] using the doc-count sidecars [[writeLines]] leaves next to
   * each part file: the per-file offsets are assembled on the driver from
   * one tiny read per file (IO proportional to the file COUNT — the same
   * order every scan's planning pays to list the files) and broadcast, so
   * the corpus itself is parsed exactly once. Falls back to the
   * aggregate-based overload when the sidecars don't cover every part
   * file — none at all (a corpus from some other writer), or a partial
   * set (a writer task died between file rename and sidecar create, or
   * foreign files sit in the layout). The rekey join is inner, so an
   * uncovered file would otherwise be dropped SILENTLY; coverage is
   * checked up front instead.
   */
  def refold(tokens: DataFrame, root: String): DataFrame = {
    val spark = tokens.sparkSession
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    val side = fs.globStatus(
      new org.apache.hadoop.fs.Path(rootP, "fold=*/.part-*.txt.docs"))
    if (side == null || side.isEmpty) return refold(tokens)
    val parts = fs.globStatus(new org.apache.hadoop.fs.Path(rootP, "fold=*/part-*"))
    val covered = side.map(s => (s.getPath.getParent.getName,
      s.getPath.getName.stripPrefix(".").stripSuffix(".docs"))).toSet
    if (parts != null && !parts.forall(p =>
        covered((p.getPath.getParent.getName, p.getPath.getName))))
      return refold(tokens)
    // The reverse gap — a sidecar whose part file is GONE — means data
    // loss (writeLines writes part before sidecar, so this is a deleted
    // or rename-lost file, not a crashed writer). Falling back would
    // still silently miss those docs; refuse instead.
    val partSet = Option(parts).getOrElse(Array.empty)
      .map(p => (p.getPath.getParent.getName, p.getPath.getName)).toSet
    val orphans = covered -- partSet
    require(orphans.isEmpty,
      s"sidecars with no part file under $root (lost writes?): " +
        orphans.take(5).map { case (d, f) => s"$d/$f" }.mkString(", "))
    val counts = side.toSeq.map { st =>
      val p = st.getPath
      val foldEnc = p.getParent.getName.stripPrefix("fold=")
      val fileName = p.getName.stripPrefix(".").stripSuffix(".docs")
      val in = fs.open(p)
      // v2 sidecars carry "<nDocs> <nLines>"; take the leading doc count
      // (v1 single-number sidecars parse identically)
      val n =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.split("\\s+")(0).toLong
        finally in.close()
      (foldEnc, fileName, n)
    }
    val offsets = counts.groupBy(_._1).toSeq.flatMap { case (fe, xs) =>
      var acc = 0L
      xs.sortBy(_._2).map { case (_, fn, n) =>
        val off = acc; acc += n
        (s"fold=$fe/$fn", unescapePath(fe), off)
      }
    }
    import spark.implicits._
    val offDf = broadcast(offsets.toDF("__key", "__fold", "__offset"))
    // the reader's fold values are full file paths; match on the
    // scheme-independent `fold=<enc>/<name>` suffix
    rekey(tokens, offDf,
      regexp_extract(tokens("fold"), "fold=[^/]+/[^/]*$", 0) === offDf("__key"),
      Seq("__key"))
  }

  /** Shared tail of the refold overloads: join the per-file offset
    * relation, restore logical (fold, doc_num, doc_id). */
  private def rekey(tokens: DataFrame, offsets: DataFrame, cond: Column,
      dropCols: Seq[String]): DataFrame =
    tokens.join(offsets, cond)
      .withColumn("fold", col("__fold"))
      .withColumn("doc_num", (col("doc_num") + col("__offset")).cast("int"))
      .withColumn("doc_id", xxhash64(col("fold"), col("doc_num")))
      .drop(dropCols ++ Seq("__fold", "__offset"): _*)

  /**
   * Serialize a token relation to CoNLL-2003 text — the distributed
   * inverse of [[conll2003]] (format per reference io/conll.py:315-377).
   * Expects the readers' standard columns: fold, doc_num, token_id, text,
   * sentence (struct with begin_tok/end_tok), plus one column per
   * non-IOB field and `name_iob`/`name_type` per IOB field. When
   * `docstart` is set, each document is prefixed with a `-DOCSTART-`
   * header sentence (tags: "O" for IOB fields, "-X-" otherwise — the
   * reader maps "-X-" in IOB position back to O).
   */
  def write2003(tokens: DataFrame, path: String,
      columnNames: Seq[String] = Seq("pos", "phrase", "ent"),
      iobColumns: Seq[Boolean] = Seq(false, true, true),
      docstart: Boolean = true, maxDocsPerFile: Int = 500): Unit =
    writeTokens2003(tokens, path, None, columnNames, iobColumns, docstart,
      maxDocsPerFile)

  /**
   * [[write2003]] plus a parallel tags-only output corpus (the
   * [[conll2003Output]] format: one tag line per corpus token, "O" on the
   * -DOCSTART- rows, no blanks) holding `tagLine`'s per-token value —
   * the model-predictions export scenario. Both corpora come out of ONE
   * scan/shuffle/write job: the task walking a bucket's tokens keeps the
   * corpus part file and the tags part file open side by side.
   */
  def write2003WithTags(tokens: DataFrame, path: String, tagsPath: String,
      tagLine: Column,
      columnNames: Seq[String] = Seq("pos", "phrase", "ent"),
      iobColumns: Seq[Boolean] = Seq(false, true, true),
      docstart: Boolean = true, maxDocsPerFile: Int = 500): Unit =
    writeTokens2003(tokens, path, Some((tagsPath, tagLine)), columnNames,
      iobColumns, docstart, maxDocsPerFile)

  /**
   * CoNLL-2003 serialization as a direct ordered walk: tokens shuffle
   * ONCE on `(fold, bucket)` — one row per TOKEN, not per output line —
   * and each task streams its buckets in `(doc_num, token_id)` order,
   * deciding structure lines locally with a one-row lookahead: the
   * -DOCSTART- header + blank when `doc_num` changes, a blank after a
   * sentence's last PRESENT token when the next token's sentence id
   * differs (or the document/slice ends). Nothing assumes token_id 0 /
   * end_tok-1 exist, so filtered exports (stopword removal etc.) still
   * round-trip without silently merging documents. This replaces the
   * earlier window + explode assembly, which paid a second full shuffle
   * of ~4 assembled line rows per token; bucket-grain parallelism, part
   * files, and `.docs` sidecars are identical to [[writeLinesStreams]].
   */
  private def writeTokens2003(tokens: DataFrame, path: String,
      tags: Option[(String, Column)], columnNames: Seq[String],
      iobColumns: Seq[Boolean], docstart: Boolean,
      maxDocsPerFile: Int): Unit = {
    require(maxDocsPerFile > 0, "maxDocsPerFile must be positive")
    val spark = tokens.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    (path +: tags.map(_._1).toSeq).foreach { p =>
      val rp = new org.apache.hadoop.fs.Path(p)
      rp.getFileSystem(hconf).delete(rp, true)
    }
    val sconf = new org.apache.spark.SerializableWritable(hconf)
    val tagCols: Seq[Column] = columnNames.zipWithIndex.map { case (n, i) =>
      if (i < iobColumns.length && iobColumns(i)) iobTag(n)
      else coalesce(col(n).cast("string"), lit("-X-"))
    }
    val tokenLine = concat_ws(" ", (col("text") +: tagCols): _*)
    val headerTags = columnNames.indices.map(i =>
      if (i < iobColumns.length && iobColumns(i)) "O" else "-X-")
    val headerLine = ("-DOCSTART-" +: headerTags).mkString(" ")
    val tagsRoot = tags.map(_._1).orNull
    val writeTags = tags.isDefined
    val rows = tokens.select(
      col("fold"),
      (col("doc_num").cast("long") / maxDocsPerFile).cast("int").as("bucket"),
      col("doc_num").cast("long").as("doc_num"),
      col("token_id").cast("long").as("token_id"),
      col("sentence")("end_tok").cast("long").as("sent_id"),
      tokenLine.as("cline"),
      tags.map(_._2).getOrElse(lit(null)).cast("string").as("tline"))
    rows
      .repartition(col("fold"), col("bucket"))
      .sortWithinPartitions("fold", "bucket", "doc_num", "token_id")
      .foreachPartition { (rawIt: Iterator[Row]) =>
        val conf = sconf.value
        val it = rawIt.buffered
        val rootC = new org.apache.hadoop.fs.Path(path)
        val rootT = if (writeTags) new org.apache.hadoop.fs.Path(tagsRoot) else null

        while (it.hasNext) {
          // One (fold, bucket) slice = one corpus part file (+ tags twin).
          val fold = it.head.getString(0); val b = it.head.getInt(1)
          val cf = new PartFile(rootC, fold, b, conf)
          val tf = if (writeTags) new PartFile(rootT, fold, b, conf) else null
          var lastDoc = Long.MinValue
          var sameSlice = true
          while (sameSlice && it.hasNext) {
            val r = it.next()
            val doc = r.getLong(2); val sent = r.getLong(4)
            if (doc != lastDoc) {
              cf.nDocs += 1
              if (docstart) {
                cf.write(headerLine); cf.write("")
                if (writeTags) { tf.nDocs += 1; tf.write("O") }
              } else if (writeTags) tf.nDocs += 1
              lastDoc = doc
            }
            cf.write(r.getString(5))
            if (writeTags) tf.write(if (r.isNullAt(6)) "O" else r.getString(6))
            // Sentence terminator: next token absent / different slice /
            // different doc / different sentence id.
            val next = if (it.hasNext) Some(it.head) else None
            val endOfSent = next match {
              case Some(n) =>
                n.getString(0) != fold || n.getInt(1) != b ||
                  n.getLong(2) != doc || n.getLong(4) != sent
              case None => true
            }
            if (endOfSent) cf.write("")
            sameSlice = next.exists(n => n.getString(0) == fold && n.getInt(1) == b)
          }
          cf.close()
          if (writeTags) tf.close()
        }
      }
  }

  /**
   * Serialize a token relation to CoNLL-U text — the distributed inverse
   * of [[conllU]] (format per reference io/conll.py:380-505). Field
   * values: nulls render as `_`; `head` is re-pointed from
   * document-relative 0-based token ids back to sentence-relative 1-based
   * (null root → `0`), the exact inverse of the reader's mapping.
   * Metadata columns (reader names, from `metadataFields` values) are
   * emitted as `#` comments: the column mapped from `newdoc id` once per
   * document (it defines document boundaries), all others once per
   * sentence when non-null (a value that spanned sentences in the source
   * file is re-stated per sentence — byte-different, but reads back to
   * the identical relation).
   */
  def writeU(tokens: DataFrame, path: String,
      columnNames: Seq[String] = defaultConllUFields,
      iobColumns: Seq[Boolean] = Nil,
      metadataFields: Map[String, String] = defaultEwtMetadata,
      maxDocsPerFile: Int = 500): Unit = {
    val present = tokens.columns.toSet
    val key = Seq(col("fold"), col("doc_num"))
    // Like every other field, head and IOB columns named in `columnNames`
    // but absent from the relation render as the format's missing value
    // ('0' root for head, '_' otherwise) instead of failing analysis.
    val fieldCols: Seq[Column] = columnNames.zipWithIndex.map { case (n, i) =>
      if (i < iobColumns.length && iobColumns(i)) {
        if (present(s"${n}_iob"))
          when(col(s"${n}_iob").isNull, lit("_")).otherwise(iobTag(n))
        else lit("_")
      } else if (n == "head") {
        if (present("head"))
          coalesce((col("head") - col("sentence")("begin_tok") + 1).cast("string"), lit("0"))
        else lit("0")
      } else if (present(n)) coalesce(col(n).cast("string"), lit("_"))
      else lit("_")
    }
    val idx = (col("token_id") - col("sentence")("begin_tok") + 1).cast("string")
    // Direct ordered walk, same shape as [[writeTokens2003]]: ONE shuffle
    // of one row per token, each task streaming its `(fold, bucket)`
    // slices in `(doc_num, token_id)` order and deciding structure lines
    // locally — `# newdoc id` when the document changes, per-sentence
    // `# tag` comments when the sentence id changes (sorted, determinism),
    // the blank after a sentence's last PRESENT token via a one-row
    // lookahead. Nothing assumes token_id 0 / end_tok-1 exist, so
    // filtered exports still round-trip. Precondition (holds for every
    // reader-shaped relation): metadata values are constant within their
    // scope (document / sentence).
    val tokenLine =
      concat_ws("\t", (idx +: coalesce(col("text"), lit("_")) +: fieldCols): _*)
    val newdocLine: Column = metadataFields.find(_._1 == "newdoc id")
      .map(_._2).filter(present) match {
        case Some(c) => when(col(c).isNotNull, concat(lit("# newdoc id = "), col(c)))
        case None => lit(null).cast("string")
      }
    val sentMetaLines: Column = {
      val pieces = metadataFields.toSeq
        .filter { case (tag, c) => tag != "newdoc id" && present(c) }
        .map { case (tag, c) =>
          when(col(c).isNotNull, concat(lit(s"# $tag = "), col(c))) }
      if (pieces.isEmpty) lit(null).cast("array<string>")
      else array_sort(filter(array(pieces: _*), p => p.isNotNull))
    }
    writeTokenWalk(tokens, path, maxDocsPerFile, tokenLine, newdocLine,
      sentMetaLines)
  }

  /** Shared CoNLL-U walk sink: shuffles `(fold, bucket)`-keyed token rows
    * once and streams each slice, emitting `newdocLine` at document
    * starts, `sentMetaLines` at sentence starts, `tokenLine` per token,
    * and a blank after each sentence's last token (one-row lookahead). */
  private def writeTokenWalk(tokens: DataFrame, path: String,
      maxDocsPerFile: Int, tokenLine: Column, newdocLine: Column,
      sentMetaLines: Column): Unit = {
    require(maxDocsPerFile > 0, "maxDocsPerFile must be positive")
    val spark = tokens.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val rootP = new org.apache.hadoop.fs.Path(path)
    rootP.getFileSystem(hconf).delete(rootP, true)
    val sconf = new org.apache.spark.SerializableWritable(hconf)
    tokens.select(
        col("fold"),
        (col("doc_num").cast("long") / maxDocsPerFile).cast("int").as("bucket"),
        col("doc_num").cast("long").as("doc_num"),
        col("token_id").cast("long").as("token_id"),
        col("sentence")("begin_tok").cast("long").as("sent_id"),
        tokenLine.as("line"), newdocLine.as("newdoc"), sentMetaLines.as("smeta"))
      .repartition(col("fold"), col("bucket"))
      .sortWithinPartitions("fold", "bucket", "doc_num", "token_id")
      .foreachPartition { (rawIt: Iterator[Row]) =>
        val conf = sconf.value
        val it = rawIt.buffered
        val root = new org.apache.hadoop.fs.Path(path)
        while (it.hasNext) {
          val fold = it.head.getString(0); val b = it.head.getInt(1)
          val pf = new PartFile(root, fold, b, conf)
          var lastDoc = Long.MinValue
          var lastSent = Long.MinValue
          var sameSlice = true
          while (sameSlice && it.hasNext) {
            val r = it.next()
            val doc = r.getLong(2); val sent = r.getLong(4)
            if (doc != lastDoc) {
              pf.nDocs += 1
              if (!r.isNullAt(6)) pf.write(r.getString(6))
              lastDoc = doc
              lastSent = Long.MinValue
            }
            if (sent != lastSent) {
              if (!r.isNullAt(7))
                r.getSeq[String](7).foreach(pf.write)
              lastSent = sent
            }
            pf.write(r.getString(5))
            val next = if (it.hasNext) Some(it.head) else None
            val endOfSent = next match {
              case Some(n) =>
                n.getString(0) != fold || n.getInt(1) != b ||
                  n.getLong(2) != doc || n.getLong(4) != sent
              case None => true
            }
            if (endOfSent) pf.write("")
            sameSlice = next.exists(n => n.getString(0) == fold && n.getInt(1) == b)
          }
          pf.close()
        }
      }
  }

  /**
   * Rebuild the per-document text from a token relation — the inverse of
   * parsing, exact by construction: gaps between consecutive tokens are
   * single chars, newline at sentence boundaries, space otherwise
   * (reference reconstructs one sentence per line, io/conll.py:744-790).
   * Output: fold, doc_num, doc_id, text.
   */
  def documents(tokens: DataFrame): DataFrame = {
    val assemble = udf((toks: Seq[Row]) => {
      val sb = new StringBuilder
      var prevEnd = 0
      var prevSent = -1
      toks.foreach { t =>
        val begin = t.getInt(0); val end = t.getInt(1)
        val text = t.getString(2); val sentBegin = t.getInt(3)
        if (begin > prevEnd)
          sb.append(if (sentBegin != prevSent && prevSent != -1) "\n" else " " * (begin - prevEnd))
        sb.append(text)
        prevEnd = end; prevSent = sentBegin
      }
      sb.toString
    })
    tokens
      .groupBy("fold", "doc_num", "doc_id")
      .agg(sort_array(collect_list(struct(
        col("span")("begin").as("begin"), col("span")("end").as("end"),
        col("text").as("text"),
        col("sentence")("begin_tok").as("sent_begin")))).as("toks"))
      .select(col("fold"), col("doc_num"), col("doc_id"),
        assemble(col("toks")).as("text"))
  }
}
