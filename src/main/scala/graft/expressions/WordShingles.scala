// Bridge package: see PortableHash.scala — Column↔Expression construction
// requires sql-package access in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
 *
 * Round-22: `doGenCode` (a static call into the same kernel) replaces
 * CodegenFallback — a fallback expression excludes its whole host
 * projection from whole-stage codegen (CollapseCodegenStages treats any
 * CodegenFallback in a plan node's expressions as non-codegen), so the
 * ~30 consuming queries paid interpreted-Project row boxing around every
 * scan→project chain. Same kernel, same values (parity specs unchanged);
 * ExpressionSpec asserts the codegen participation.
 */
case class WordsExtract(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    WordShingles.wordsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordShingles.wordsOf($c)")

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
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordShingles.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/**
 * Native positional n-gram hashes (duplicates kept, texts shorter than n
 * grams yield empty) — value-identical to the `ngramUdf` kernel
 * (TextAnalysis.ngramHashSeq).
 */
case class NgramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    WordShingles.ngramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordShingles.ngramHashes($c, $n)")

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
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))

  override def nullSafeEval(input: Any): Any =
    WordShingles.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordShingles.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

/**
 * Native LSH band keys over a MinHash signature — value-identical to the
 * `lshBandKeys` Column form it replaces (per band b: left fold
 * `acc = (acc*31 + h) mod 2^31-1` over the band's k/bands signature rows,
 * seeded with b).
 *
 * Round-22 motivation: the Column form is `array(agg_0 .. agg_{bands-1})`
 * where EVERY band's aggregate re-references the signature child — once
 * the minhash chain participates in whole-stage codegen, contexts without
 * subexpression elimination (Generate input, Filter predicates — only
 * ProjectExec dedups in WSCG) evaluated the full words→shingles→minhash
 * chain `bands` times per row (measured: q13 0.35→0.51 s on the naive
 * codegen switch). One expression, one child evaluation, by construction.
 *
 * Null semantics mirror the replaced form exactly: NULL signature →
 * array of `bands` NULLs (slice/aggregate of NULL per element — the
 * array() constructor itself is never NULL); a NULL signature element
 * nulls every band whose slice contains it.
 */
case class BandKeysExpr(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))

  override def eval(input: InternalRow): Any =
    WordShingles.bandKeys(child.eval(input).asInstanceOf[ArrayData], k, bands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          org.apache.spark.sql.graft.WordShingles.bandKeys(
            ${c.isNull} ? null : ${c.value}, $k, $bands);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeysExpr =
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

  /** [[BandKeysExpr]] kernel. NULL `sig` → array of `bands` nulls; a NULL
    * element nulls its band — both exactly the aggregate-form semantics. */
  def bandKeys(sig: ArrayData, k: Int, bands: Int): ArrayData = {
    if (sig == null) return new GenericArrayData(new Array[Any](bands))
    val rows = k / bands
    val n = sig.numElements()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var nul = false
      var j = 0
      while (j < rows) {
        val idx = b * rows + j
        if (idx < n) {
          if (sig.isNullAt(idx)) nul = true
          else if (!nul) acc = (acc * 31 + sig.getLong(idx)) % HashP
        }
        j += 1
      }
      out(b) = if (nul) null else java.lang.Long.valueOf(acc)
      b += 1
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
  def bands(c: Column, k: Int, bands: Int): Column =
    ExpressionUtils.column(BandKeysExpr(ExpressionUtils.expression(c), k, bands))
}
