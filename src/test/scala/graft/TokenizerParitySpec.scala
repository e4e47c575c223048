package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tokenize

/** The round-21 hand-rolled tokenizer scan must agree with the regex it
  * replaced (`[^\s P]+ | [P]`, P = Python string.punctuation) on every
  * input class the corpus can contain — including the edge classes the
  * regex semantics make subtle: Java `\s` is ASCII-only, so Unicode
  * whitespace is a WORD character; punctuation is single-char tokens;
  * maximal word runs absorb any non-ASCII codepoint. */
class TokenizerParitySpec extends AnyFunSuite {

  private val cases = Seq(
    "",
    " ",
    "\t\n\r\f",
    "plain words here",
    "punct!only?::;;",
    "a!b.c,d",
    "...",
    "word, (parenthetical) [bracket] {brace} `tick` ~tilde~",
    "tabs\tand\nnewlines\rmixed  double  spaces",
    "trailing space ",
    " leading",
    "unicode nbsp stays-in-word",
    "café naïve 世界 tokens",
    "emoji 😀 surrogate pairs",
    "digits 123 mix3d a1b2c3",
    "@#$%^&*()_+-=",
    "end.",
    "a",
    ".",
    " ",
    "x y",
    "hyphen-ated under_score apostrophe's",
    (0 until 127).map(_.toChar).mkString, // every ASCII char incl. controls
    "repeat " * 50 + "!" * 30)

  test("manual scan == regex on every edge class") {
    for (s <- cases) {
      assert(Tokenize.tokenOffsets(s) == Tokenize.tokenOffsetsRegex(s),
        s"mismatch on: ${s.take(60)}")
    }
  }

  test("manual scan == regex on deterministic pseudo-random soup") {
    val rnd = new scala.util.Random(42)
    val alphabet =
      "ab c.d!\t\n é世 ,;:()[]{}<>\"'`~@#$%1234567890_-+="
    for (_ <- 1 to 200) {
      val s = Array.fill(rnd.nextInt(400))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Tokenize.tokenOffsets(s) == Tokenize.tokenOffsetsRegex(s),
        s"mismatch on: ${s.take(80)}")
    }
  }

  test("generator output matches tokenOffsets (TokenizeSpec anchor)") {
    // TokenizeGenerator shares the classifier tables with tokenOffsets;
    // the existing TokenizeSpec/oracle gates pin the relation itself.
    val s = "The (spark) engine's 3rd run — café!"
    val offs = Tokenize.tokenOffsets(s)
    assert(offs.nonEmpty && offs == Tokenize.tokenOffsetsRegex(s))
  }
}
