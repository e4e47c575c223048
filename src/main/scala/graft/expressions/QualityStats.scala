// Bridge package: see PortableHash.scala — Column↔Expression construction
// requires sql-package access in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused single-pass corpus-quality statistics (round-21 optimization):
 * `(n_chars, n_punct, n_words, word_len_sum, n_stop_en)` in one struct.
 *
 * The quality family (qualityScore / punctRatio / meanWordLen and their
 * consumers q08/q11/q69/q77/q89/q115/q151 + cleanDocs) previously ran
 * FOUR separate passes per document — a words regex, a
 * `regexp_replace(text, "[^P]", "")` whose only purpose was to measure
 * the leftover length, an `aggregate` over the word array, and an
 * `array_contains` filter per word against the stopword list. This
 * expression computes all the counts in one scan; the Column-level
 * arithmetic downstream (least/greatest/when/round) is unchanged, so
 * every derived value is bit-identical (QualityStatsParitySpec pins each
 * field against the expression form it replaces).
 *
 * Count semantics, each matching the replaced form exactly:
 *  - n_chars   = length(text)  (code points of the ORIGINAL text);
 *  - n_punct   = ASCII-punctuation chars of the original text (the char
 *    class of Tokenize.PunctClass; multi-byte code points can never
 *    match, so a byte scan is exact);
 *  - n_words / word_len_sum / n_stop_en over [[WordShingles.wordsOf]]
 *    (identical word extraction to `words()` — same lowercase, same
 *    [a-z0-9] runs; words are ASCII so byte length == char length).
 */
case class QualityStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def dataType: DataType = QualityStatsExpr.schema
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    QualityStatsExpr.statsOf(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}

object QualityStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("word_len_sum", LongType, nullable = false),
    StructField("n_stop_en", LongType, nullable = false)))

  /** StopwordsEn as byte arrays for allocation-free comparison. */
  private lazy val stopsEn: Array[Array[Byte]] =
    graft.operators.TextAnalysis.StopwordsEn
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  private def isStopEn(w: UTF8String): Boolean = {
    val n = w.numBytes()
    var i = 0
    while (i < stopsEn.length) {
      val s = stopsEn(i)
      if (s.length == n) {
        var j = 0
        while (j < n && w.getByte(j) == s(j)) j += 1
        if (j == n) return true
      }
      i += 1
    }
    false
  }

  def statsOf(s: UTF8String): InternalRow = {
    val nChars = s.numChars().toLong
    // punct chars: byte scan of the ORIGINAL text (class is pure ASCII)
    var nPunct = 0L
    val nb = s.numBytes()
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if (b >= 33 && TokenizeGenerator.isPunct(b.toChar)) nPunct += 1
      i += 1
    }
    val ws: ArrayData = WordShingles.wordsOf(s).asInstanceOf[ArrayData]
    val nWords = ws.numElements().toLong
    var lenSum = 0L
    var nStop = 0L
    var k = 0
    while (k < nWords) {
      val w = ws.getUTF8String(k)
      lenSum += w.numBytes() // ASCII words: bytes == chars
      if (isStopEn(w)) nStop += 1
      k += 1
    }
    InternalRow(nChars, nPunct, nWords, lenSum, nStop)
  }

  def apply(c: Column): Column =
    ExpressionUtils.column(QualityStatsExpr(ExpressionUtils.expression(c)))
}
