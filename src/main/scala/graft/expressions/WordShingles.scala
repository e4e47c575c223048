// Bridge package: see PortableHash.scala — Column↔Expression construction
// requires sql-package access in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native word extraction — value-identical to
 * `regexp_extract_all(lower(text), "[a-z0-9]+", 0)`, the relation the
 * whole text-analysis family (shingles, minhash, quality, stopwords,
 * vocabulary, BM25/TF-IDF) is built on.
 *
 * Round-21 optimization: the regex form paid a full lowercase copy plus
 * a regex-NFA walk per char, and its UDF consumers then decoded every
 * word to a java String. Here the lowercase uses the exact same
 * UTF8String.toLowerCase the `lower()` expression calls (so unicode
 * case mapping is identical by construction), and the [a-z0-9] runs are
 * found with one byte scan — multi-byte UTF-8 sequences can never match
 * because every byte of them has the high bit set. Output elements are
 * zero-copy views over the lowered buffer.
 *
 * Parity is pinned by WordShinglesParitySpec against the regex form on
 * adversarial inputs (unicode, Kelvin sign, digits, empty).
 */
case class WordsExtract(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    WordShingles.wordsOf(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): WordsExtract =
    copy(child = newChild)
}

/**
 * Native distinct shingle hashes over a word array — value-identical to
 * the `shingleUdf` it replaces (TextAnalysis.shingleHashSet: k-gram
 * 31-base rolling hash mod 2^31-1, insertion-ordered distinct, with the
 * short-text fallback of hashing the space-joined word list). Words come
 * from [[WordsExtract]] so they are pure ASCII [a-z0-9]: hashing UTF-8
 * bytes equals hashing chars.
 */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/**
 * Native positional n-gram hashes (duplicates kept, texts shorter than n
 * grams yield empty) — value-identical to the `ngramUdf` kernel
 * (TextAnalysis.ngramHashSeq).
 */
case class NgramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    WordShingles.ngramHashes(input.asInstanceOf[ArrayData], n)

  override protected def withNewChildInternal(newChild: Expression): NgramHashesExpr =
    copy(child = newChild)
}

/**
 * Native MinHash signature over a shingle-hash array — value-identical
 * to the `sigUdf` it replaces (per hash family i: min over shingles of
 * (h*a_i + b_i) mod 2^31-1, with Dedup.hashParams' deterministic
 * (a_i, b_i)).
 */
case class MinhashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))

  override def nullSafeEval(input: Any): Any =
    WordShingles.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object WordShingles {

  private val HashP = 2147483647L

  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** [a-z0-9]+ runs of the lowercased input, as zero-copy UTF8String
    * views. Lowercase via UTF8String.toLowerCase == `lower()` exactly. */
  def wordsOf(s: UTF8String): ArrayData = {
    val low = s.toLowerCase
    val bytes = low.getBytes // materialized once; views slice into it
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.max(8, n / 6))
    var i = 0
    while (i < n) {
      if (isWordByte(bytes(i))) {
        val b = i
        i += 1
        while (i < n && isWordByte(bytes(i))) i += 1
        out += UTF8String.fromBytes(bytes, b, i - b)
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** 31-base rolling hash of an ASCII UTF8String (byte==char fold). */
  private def hashWordInto(h0: Long, w: UTF8String): Long = {
    var h = h0
    val n = w.numBytes()
    var i = 0
    while (i < n) { h = (h * 31 + (w.getByte(i) & 0xff)) % HashP; i += 1 }
    h
  }

  def shingleHashes(ws: ArrayData, k: Int): ArrayData = {
    val n = ws.numElements()
    if (n >= k) {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i + k <= n) {
        var h = 0L
        var j = 0
        while (j < k) {
          if (j > 0) h = (h * 31 + ' ') % HashP
          h = hashWordInto(h, ws.getUTF8String(i + j))
          j += 1
        }
        seen.add(h)
        i += 1
      }
      val arr = new Array[Long](seen.size())
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { arr(o) = it.next(); o += 1 }
      new GenericArrayData(arr)
    } else {
      // short-text fallback: hash of the space-joined word list — same
      // rolling fold, so it composes as words joined by ' '
      var h = 0L
      var i = 0
      while (i < n) {
        if (i > 0) h = (h * 31 + ' ') % HashP
        h = hashWordInto(h, ws.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(Array(h))
    }
  }

  def ngramHashes(ws: ArrayData, n: Int): ArrayData = {
    val len = ws.numElements()
    if (len < n) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](len - n + 1)
      var i = 0
      while (i + n <= len) {
        var h = 0L
        var j = 0
        while (j < n) {
          if (j > 0) h = (h * 31 + ' ') % HashP
          h = hashWordInto(h, ws.getUTF8String(i + j))
          j += 1
        }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def minhashSig(hs: ArrayData, k: Int): ArrayData = {
    val params = paramCache.computeIfAbsent(k, kk => {
      val ps = graft.operators.Dedup.hashParams(kk)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })
    val (as, bs) = params
    val n = hs.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = as(i); val b = bs(i)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (hs.getLong(j) * a + b) % HashP
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def words(c: Column): Column =
    ExpressionUtils.column(WordsExtract(ExpressionUtils.expression(c)))
  def shingles(c: Column, k: Int): Column =
    ExpressionUtils.column(ShingleHashesExpr(ExpressionUtils.expression(c), k))
  def ngrams(c: Column, n: Int): Column =
    ExpressionUtils.column(NgramHashesExpr(ExpressionUtils.expression(c), n))
  def minhash(c: Column, k: Int): Column =
    ExpressionUtils.column(MinhashSigExpr(ExpressionUtils.expression(c), k))
}
