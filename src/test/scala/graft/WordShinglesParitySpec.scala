package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}

/** The round-21 native words/shingle/ngram/minhash expressions must be
  * value-identical to the regexp+UDF forms they replaced, including the
  * unicode lowercase edge cases (`lower()` and UTF8String.toLowerCase
  * must agree — Kelvin sign K lowers into ASCII 'k') and the short-text
  * fallbacks. */
class WordShinglesParitySpec extends GraftSuite {

  private lazy val df = {
    import spark.implicits._
    Seq(
      "",
      " ",
      "plain words here",
      "MIXED Case WORDS",
      "digits 123 mix3d a1b2",
      "punct!only?::;; and-hyphens under_scores",
      "unicode café naïve 世界 χ",
      "KELVIN sign lowers into ascii k",
      "ß sharp s",
      "short",
      "two words",
      "a b c d e f g h i j k l m n o p",
      "repeat repeat repeat repeat repeat repeat",
      ("lorem ipsum dolor sit amet " * 20).trim,
      (0 until 127).map(_.toChar).mkString,
      null.asInstanceOf[String]
    ).toDF("text")
  }

  private def collectCol(c: org.apache.spark.sql.Column): Seq[Any] =
    df.select(c.as("v")).collect().map(_.get(0)).toSeq

  test("WordsExtract == regexp_extract_all(lower, [a-z0-9]+)") {
    assert(collectCol(TextAnalysis.words(col("text"))) ==
      collectCol(TextAnalysis.wordsRegex(col("text"))))
  }

  test("ShingleHashesExpr == shingle UDF kernel (k=3 and k=1)") {
    for (k <- Seq(1, 3, 8)) {
      assert(collectCol(TextAnalysis.shingleHashes(col("text"), k)) ==
        collectCol(TextAnalysis.shingleHashesUdfForm(col("text"), k)), s"k=$k")
    }
  }

  test("NgramHashesExpr == ngram UDF kernel") {
    for (n <- Seq(2, 8)) {
      assert(collectCol(TextAnalysis.ngramHashes(col("text"), n)) ==
        collectCol(TextAnalysis.ngramHashesUdfForm(col("text"), n)), s"n=$n")
    }
  }

  test("MinhashSigExpr == signature UDF kernel") {
    for ((k, sk) <- Seq((16, 3), (8, 3), (4, 2))) {
      assert(collectCol(Dedup.minhashSignature(col("text"), k, sk)) ==
        collectCol(Dedup.minhashSignatureUdfForm(col("text"), k, sk)),
        s"k=$k shingleK=$sk")
    }
  }

  // round-22: the native single-evaluation band-keys expression must be
  // value-identical to the aggregate-array form it replaced, including a
  // NULL signature (→ array of `bands` NULLs, never a NULL array) and a
  // signature whose length is not a multiple of the band width
  test("BandKeysExpr == aggregate-array form (round-22)") {
    for ((k, bands) <- Seq((16, 4), (8, 4), (8, 2), (4, 4))) {
      val sig = Dedup.minhashSignature(col("text"), k, 3)
      assert(collectCol(Dedup.lshBandKeys(sig, k, bands)) ==
        collectCol(Dedup.lshBandKeysAggForm(sig, k, bands)),
        s"k=$k bands=$bands")
    }
    // NULL signature propagation (minhashSignature(null text) is NULL)
    val nullSig = Dedup.minhashSignature(col("text"), 8, 3)
    val nat = collectCol(Dedup.lshBandKeys(nullSig, 8, 4))
    val agg = collectCol(Dedup.lshBandKeysAggForm(nullSig, 8, 4))
    assert(nat == agg)
    assert(nat.last == Seq(null, null, null, null)) // the df's null row
  }
}
