package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dependency-free HTML → text ingestion — the crawl-side front door the
 * declared pipelines assume already happened: every corpus query starts
 * from clean parquet text, but a real pretraining crawl starts from raw
 * HTML (C4: Raffel et al. 2020 §2.2 extracts text from Common Crawl
 * pages before any line rule runs). No parser dependency is available
 * in-sandbox (and none is needed at this fidelity): extraction is a
 * fixed chain of codegen'd `regexp_replace`/`replace` expressions —
 * a pure shuffle-free projection that can prefix any corpus pipeline
 * at 100 TB without a plan break, exactly like [[TextAnalysis.c4Clean]]
 * and [[TextAnalysis.gopherRules]] which it feeds.
 *
 * Extraction semantics (deliberately regular, so a DuckDB oracle can
 * re-derive it expression by expression):
 *   1. comments, `<script>`, `<style>`, and `<title>` ELEMENTS are
 *      removed wholesale (content included — script/style bodies are
 *      code, title is metadata surfaced separately by [[title]]);
 *   2. block-level tags (p, div, br, h1-h6, li, ul, ol, table, tr, td,
 *      th, section, article, header, footer, blockquote) become line
 *      breaks — the block segmentation C4's line rules operate on;
 *   3. every remaining tag is stripped;
 *   4. named entities (`&lt; &gt; &quot; &apos; &nbsp;`), the numeric
 *      quote forms (`&#34; &#39;`), and LAST `&amp;` are decoded —
 *      amp-last is the standard one-level decode order;
 *   5. lines are space-run-normalized and trimmed; empty lines drop.
 *
 * All patterns are RE2-safe (no backreferences, no lookaround) so the
 * same strings drive Spark's Java regex and DuckDB's RE2 identically;
 * [[graft.Oracles]] embeds these constants verbatim.
 */
object Html {

  val CommentRe = "(?s)<!--.*?-->"
  val ScriptRe = "(?is)<script(\\s[^>]*)?>.*?</script\\s*>"
  val StyleRe = "(?is)<style(\\s[^>]*)?>.*?</style\\s*>"
  val TitleElemRe = "(?is)<title(\\s[^>]*)?>.*?</title\\s*>"
  val BlockTagRe = "(?i)</?(p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|" +
    "section|article|header|footer|blockquote)(\\s[^>]*)?/?>"
  val AnyTagRe = "<[^>]*>"
  val TitleRe = "(?is)<title[^>]*>(.*?)</title>"
  val SpaceRunRe = "[ \\t]+"

  /** Ordered (entity, replacement) decode pairs; `&amp;` deliberately
    * last so double-encoded entities decode exactly one level. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#34;" -> "\"",
    "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  // non-regex leftmost replace (same route as Bpe: SQL `replace`)
  private def repl(c: Column, s: String, r: String): Column =
    call_function("replace", c, lit(s), lit(r))

  def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (a, (s, r)) => repl(a, s, r) }

  /** The page title: first `<title>` element's decoded, trimmed text. */
  def title(html: Column): Column =
    trim(decodeEntities(regexp_extract(html, TitleRe, 1)))

  /** Tag-stripped, entity-decoded text with block boundaries as `\n`
    * (un-normalized — [[blocks]] applies the whitespace rules). */
  private def rawText(html: Column): Column = {
    val noComment = regexp_replace(html, CommentRe, "")
    val noScript = regexp_replace(noComment, ScriptRe, "")
    val noStyle = regexp_replace(noScript, StyleRe, "")
    val noTitle = regexp_replace(noStyle, TitleElemRe, "")
    val blocksNl = regexp_replace(noTitle, BlockTagRe, "\n")
    decodeEntities(regexp_replace(blocksNl, AnyTagRe, ""))
  }

  /** Non-empty, whitespace-normalized text blocks, in document order. */
  def blocks(html: Column): Column =
    filter(transform(split(rawText(html), "\n"),
      l => trim(regexp_replace(l, SpaceRunRe, " "))), b => b =!= "")

  /** Extracted text: blocks joined by newline — the column the C4 line
    * rules ([[TextAnalysis.c4Clean]]) expect. */
  def text(html: Column): Column = array_join(blocks(html), "\n")

  /** Page relation → (id, title, n_blocks, clean_text, n_chars). */
  def htmlToText(pages: DataFrame, idCol: String = "page_id",
      htmlCol: String = "html"): DataFrame = {
    val h = col(htmlCol)
    pages.select(col(idCol), title(h).as("title"),
        size(blocks(h)).cast("long").as("n_blocks"), text(h).as("clean_text"))
      .withColumn("n_chars", length(col("clean_text")).cast("long"))
  }

  /**
   * Deterministic synthetic crawl page over (id, lang, text) — the
   * closed-form oracle trick the media codecs use: both engines build
   * byte-identical HTML in-plan from the documents table, so the
   * extractor is oracle-gated without any HTML fixture files. The page
   * deliberately exercises every extraction rule: comments, a styled
   * head, entities in title/headings, a script whose body contains a
   * bare `<` and a `{`, boilerplate lines the C4 rules must drop, and
   * sentence-shaped paragraphs they must keep.
   */
  def synthPage(id: Column, lang: Column, text: Column): Column = {
    val w = TextAnalysis.words(text)
    val ids = id.cast("string")
    val s1 = concat(array_join(slice(w, 1, 8), " "), lit("."))
    val s2 = concat(array_join(slice(w, 9, 8), " "), lit("!"))
    val s3 = concat(array_join(slice(w, 17, 6), " "), lit("?"))
    concat(
      lit("<html><head><title>Doc &amp; "), ids,
      lit("</title><style type=\"text/css\">p {margin: 0}</style></head><body>"),
      lit("<!-- crawl "), ids, lit(" -->"),
      lit("<h1>Entry &lt;"), lang, lit("&gt;</h1>"),
      lit("<p>"), s1, lit("</p><p>"), s2, lit(" "), s3, lit("</p>"),
      lit("<div>Enable javascript to view this page.</div>"),
      lit("<div>We use a cookie banner; read the privacy policy.</div>"),
      lit("<p>Short line.</p>"),
      lit("<script>if (n < 10) { track(\""), ids, lit("\"); }</script>"),
      lit("<p>"), s1, lit(" "), s2, lit("</p>"),
      lit("</body></html>"))
  }
}
