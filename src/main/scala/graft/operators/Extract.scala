package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.spans

/**
 * Span-extraction operators — the reference's "table functions"
 * (reference: spanner/extract.py). Each produces a span relation
 * `doc_id, span, ...` from documents or tokens.
 */
object Extract {

  /**
   * All non-overlapping regex matches over document text
   * (`extract_regex`, reference: spanner/extract.py:240-261).
   * One native-Generator pass per document row (span AND matched text in
   * one emit — no UDF, no encoder round trip, no re-substring), narrow —
   * no shuffle. Also registered as the SQL generator `regex_matches`.
   * Output: doc_id, span, match (covered text).
   */
  def extractRegex(docs: DataFrame, pattern: String,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      org.apache.spark.sql.graft.RegexMatchGenerator(col(textCol), pattern))

  /**
   * All (possibly overlapping) regex matches that start and end on token
   * boundaries, with window length `minLen..maxLen` tokens
   * (`extract_regex_tok`, reference: spanner/extract.py:196-237).
   *
   * Plan: window enumeration is the reference's O(n·maxLen) candidate
   * generation, expressed as a gap-replication equi-join (one shuffle on
   * doc_id) instead of a loop: begin-token rows replicate once per window
   * length, equi-join picks up the end token, a join against `docs`
   * provides the text for the full-match filter. All expressions are
   * codegen'd; Catalyst broadcasts `docs` when small.
   *
   * Output: doc_id, span struct<begin_tok,end_tok,begin,end>, match text.
   */
  def extractRegexTok(docs: DataFrame, tokens: DataFrame, pattern: String,
      minLen: Int = 1, maxLen: Int = 1): DataFrame = {
    require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")
    val begins = tokens.select(col("doc_id"), col("token_id").as("begin_tok"),
      col("span")("begin").as("b"),
      explode(sequence(lit(minLen), lit(maxLen))).as("len"))
    val ends = tokens.select(col("doc_id").as("e_doc_id"),
      col("token_id").as("end_tok_id"), col("span")("end").as("e"))
    val windows = begins.join(ends,
      begins("doc_id") === ends("e_doc_id") &&
        ends("end_tok_id") === begins("begin_tok") + begins("len") - 1)
    val withText = windows.join(docs.select(col("doc_id").as("d_doc_id"),
        col("text").as("__text")), col("doc_id") === col("d_doc_id"))
    withText
      .withColumn("match",
        expr("substring(__text, b + 1, e - b)"))
      // fullmatch: anchor the whole covered string
      .filter(col("match").rlike("^(?:" + pattern + ")$"))
      .select(col("doc_id"),
        spans.tokenSpan(col("begin_tok"), col("begin_tok") + col("len"),
          col("b"), col("e")).as("span"),
        col("match"))
  }

  /**
   * SystemT-style dictionary matching over tokens
   * (`extract_dict`, reference: spanner/extract.py:112-193).
   *
   * The dictionary is tokenized/normalized (`toks: array<string>`, `n`
   * tokens) and broadcast. The reference iterates equi-joins (match token 0,
   * then for each length L extend survivors by joining token `begin+L`) —
   * which re-shuffles and re-scans the token relation once per length. Here
   * the lookahead is ONE window pass: `lead(normalized_text, i)` /
   * `lead(span.end, i)` materialize each candidate's next `maxLen-1` tokens
   * in place, then a single broadcast join + per-length residual comparison
   * completes every match. One shuffle on doc_id, one scan, no re-joins —
   * the equivalent of the reference's candidate semantics (multi-length
   * entries sharing a first token all match, like its per-length loop).
   *
   * `tokens` must include `normalized_text` (see Tokenize.normalizedTokens)
   * and must come from the same tokenizer as the dictionary.
   *
   * `maxLen`: upper bound on dictionary-entry token length. When omitted it
   * is computed with one (dictionary-sized, bounded) job at plan-build time;
   * callers building many plans over the same dictionary should pass it to
   * keep plan construction action-free.
   *
   * Output: doc_id, span struct<begin_tok,end_tok,begin,end>.
   */
  def extractDict(docs: DataFrame, tokens: DataFrame, dict: DataFrame,
      maxLen: Int = -1): DataFrame = {
    require(maxLen != 0, "maxLen must be positive (or omitted to infer)")
    val maxLen0 =
      if (maxLen > 0) maxLen
      else dict.agg(max(size(col("toks")))).head().getInt(0)
    val w = Window.partitionBy("doc_id").orderBy("token_id")
    val lookahead =
      (1 until maxLen0).map(i => lead(col("normalized_text"), i).over(w).as(s"__t$i")) ++
      (1 until maxLen0).map(i => lead(col("span")("end"), i).over(w).as(s"__e$i")) ++
      (1 until maxLen0).map(i => lead(col("token_id"), i).over(w).as(s"__id$i"))
    val base = tokens.select(
      Seq(col("doc_id"), col("token_id"), col("normalized_text"), col("span")) ++
        lookahead: _*)
    // Residual: entry length n matches iff tokens 1..n-1 equal the entry's;
    // the matched span's end is the (n-1)-th lookahead end (null lookaheads
    // — entry runs past the document — fail the equality and yield null).
    // The reference extends matches by token-id arithmetic (n_tok ==
    // begin_tok + l, spanner/extract.py:169-182), so matches never cross
    // token-id gaps (e.g. a pre-filtered token relation). lead() alone
    // would match the next PHYSICAL row; requiring the last lookahead id
    // to equal token_id + (l-1) restores the gap-free semantics — ids are
    // strictly increasing in window order, so one endpoint check forces
    // all l ids to be consecutive.
    val endForLen = (2 to maxLen0).foldLeft(
      when(col("n") === 1, col("span")("end"))) { case (acc, l) =>
      acc.when(col("n") === l &&
        col(s"__id${l - 1}") === col("token_id") + (l - 1) &&
        (1 until l).map(i => col(s"__t$i") === col("toks")(i)).reduce(_ && _),
        col(s"__e${l - 1}"))
    }
    // No global orderBy here: the reference sorts its output
    // (spanner/extract.py:192-193) but a total sort is the caller's choice —
    // at scale it is an all-to-one exchange most pipelines don't need.
    base.join(broadcast(dict), col("normalized_text") === col("toks")(0))
      .withColumn("__end", endForLen)
      .filter(col("__end").isNotNull)
      .select(col("doc_id"),
        spans.tokenSpan(col("token_id"), col("token_id") + col("n"),
          col("span")("begin"), col("__end")).as("span"))
  }

  /**
   * Split each document around split-point spans; emits the spans covering
   * the text between consecutive split points (`extract_split`, reference:
   * spanner/extract.py:264-311). Zero/negative-length chunks are dropped,
   * and — matching the reference's sequential walk — the next chunk begins
   * at the *previous row's* end even when split spans overlap.
   *
   * `splits`: doc_id, span. Output: doc_id, span.
   */
  def extractSplit(docs: DataFrame, splits: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("span")("begin"), col("span")("end"))
    val gaps = splits
      .withColumn("prev_end", coalesce(lag(col("span")("end"), 1).over(w), lit(0)))
      .filter(col("span")("begin") > col("prev_end"))
      .select(col("doc_id"), spans.span(col("prev_end"), col("span")("begin")).as("span"))

    // Trailing chunk: from the last split's end (in walk order) to doc end;
    // docs with no split points yield one whole-document span.
    val lastEnd = splits.groupBy("doc_id")
      .agg(max_by(col("span")("end"),
        struct(col("span")("begin"), col("span")("end"))).as("last_end"))
    val docLen = docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("int").as("len"))
    val tails = docLen.join(lastEnd, Seq("doc_id"), "left")
      .withColumn("start", coalesce(col("last_end"), lit(0)))
      .filter(col("len") > col("start"))
      .select(col("doc_id"), spans.span(col("start"), col("len")).as("span"))

    gaps.unionByName(tails)
  }

  /**
   * Load a SystemT dictionary file: one entry per line, `#` comments,
   * entries lowercased and tokenized with the engine tokenizer
   * (`load_dict`/`create_dict`, reference: spanner/extract.py:44-109).
   * Output: toks array<string>, n int.
   */
  def loadDict(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .select(trim(col("value")).as("entry"))
      .filter(length(col("entry")) > 0 && !col("entry").startsWith("#"))
    createDict(lines)
  }

  /** Build a dictionary relation from an `entry: string` column. */
  def createDict(entries: DataFrame): DataFrame = {
    val tokUdf = udf((s: String) =>
      Tokenize.tokenOffsets(s.toLowerCase).map { case (b, e) => s.toLowerCase.substring(b, e) })
    entries.select(tokUdf(col("entry")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("n", size(col("toks")))
  }
}
