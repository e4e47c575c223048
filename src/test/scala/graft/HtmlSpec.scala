package graft

import org.apache.spark.sql.functions._
import graft.operators.Html

/** Extraction-rule tests for the dependency-free HTML → text operator.
  * The oracle gate (q150/q151) proves end-to-end parity with DuckDB on
  * the synthetic crawl; these pin the individual rules on adversarial
  * fragments the closed-form page can't isolate. */
class HtmlSpec extends GraftSuite {
  import spark.implicits._

  private def extract(html: String): (String, Seq[String]) = {
    val r = Seq(html).toDF("html")
      .select(Html.title(col("html")).as("t"), Html.blocks(col("html")).as("b"))
      .collect()(0)
    (r.getString(0), r.getSeq[String](1))
  }

  test("script bodies vanish wholesale, bare < and { included") {
    val (_, b) = extract(
      "<body><p>keep me.</p><script>if (a < b) { x(\"</p>ish\"); }</script><p>and me.</p></body>")
    assert(b == Seq("keep me.", "and me."))
  }

  test("style and comments are removed, block tags segment, inline tags join") {
    val (_, b) = extract(
      "<style>p { color: red }</style><!-- note --><div>one <b>bold</b> word</div><p>two</p>")
    assert(b == Seq("one bold word", "two"))
  }

  test("entities decode one level, amp last") {
    val (_, b) = extract("<p>&lt;tag&gt; &amp;amp; &quot;q&quot; &#39;a&#39;&nbsp;end</p>")
    // &amp;amp; decodes to &amp; (one level), not to &
    assert(b == Seq("<tag> &amp; \"q\" 'a' end"))
  }

  test("title is extracted, decoded, and excluded from body text") {
    val (t, b) = extract(
      "<html><head><title> A &amp; B </title></head><body><p>body.</p></body></html>")
    assert(t == "A & B")
    assert(b == Seq("body."))
  }

  test("whitespace runs collapse and empty lines drop") {
    val (_, b) = extract("<p>a\t\t b   c</p><p>   </p><p></p><br><p>d</p>")
    assert(b == Seq("a b c", "d"))
  }

  test("self-closing and attributed block tags still break lines") {
    val (_, b) = extract("<p class=\"x\" data-n=\"1\">one</p><br/>two<div style=\"a>b\">three</div>")
    // note: attribute value contains '>' — the tag closes there (regular
    // grammar, documented fidelity bound), remainder 'b">three' survives
    assert(b.head == "one" && b.contains("two"))
  }

  test("no tags at all passes through normalized") {
    val (t, b) = extract("just  plain text")
    assert(t == "" && b == Seq("just plain text"))
  }
}
