package graft.operators

import java.text.Normalizer
import scala.collection.mutable

/**
 * Real BERT tokenizer — a faithful JVM implementation of the published
 * BasicTokenizer + WordPiece algorithm that HuggingFace's
 * `BertTokenizerFast` runs (the reference requires exactly that tokenizer
 * class, io/bert.py:74-86), with HF-style character offsets into the
 * ORIGINAL text. This is the "real model adapter" half of the pluggable
 * host in [[Bert]]: construct one from any standard `vocab.txt` and pass
 * it to `Bert.makeBertTokens` — no stub involved. (The embedding half of
 * the host still needs a native runtime; the tokenizer has none of that
 * dependency, it is pure algorithm + vocabulary.)
 *
 * Algorithm parity (BasicTokenizer, do_lower_case=True):
 *  - text cleaning: NUL / U+FFFD / control chars (Cc, Cf) removed;
 *    whitespace (incl. \t\n\r) is a word boundary
 *  - CJK ideographs split to single-char words
 *  - punctuation (ASCII blocks + Unicode P*) splits to single-char words
 *  - lowercase + NFD accent stripping (Mn marks removed), with each
 *    normalized char mapped back to its original char span so output
 *    offsets index the original string (what `return_offsets_mapping=True`
 *    gives and `make_bert_tokens` stores as spans)
 *
 * WordPiece (greedy longest-match-first): repeatedly take the longest
 * vocab entry that prefixes the remainder ("##" continuation prefix for
 * non-initial pieces); a word with no decomposition — or longer than
 * `maxCharsPerWord` (HF: 100) — becomes one [UNK] covering the word.
 *
 * Special tokens: [CLS] at span (0,0); [SEP] at (e,e) where e is the last
 * real token's end — the reference's forward-fill of special-token
 * offsets (io/bert.py:96-107).
 */
object WordPiece {

  /** Load a standard `vocab.txt` (one piece per line, id = line number) —
    * the file format every BERT checkpoint ships. Driver-side read of a
    * bounded (~30k-line) file, broadcast with the tokenizer closure. */
  def loadVocab(path: String): Map[String, Long] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().zipWithIndex.map { case (p, i) => (p.trim, i.toLong) }.toMap
    finally src.close()
  }

  def tokenizer(vocab: Map[String, Long], lowerCase: Boolean = true): Bert.BertTokenizer =
    new Tokenizer(vocab, lowerCase)

  class Tokenizer(vocab: Map[String, Long], lowerCase: Boolean = true,
      maxCharsPerWord: Int = 100) extends (String => Seq[Bert.BertTok]) with Serializable {
    private def id(tok: String): Long = vocab.getOrElse(tok,
      throw new IllegalArgumentException(s"vocab is missing required token $tok"))
    private val unkId = id("[UNK]")
    private val clsId = id("[CLS]")
    private val sepId = id("[SEP]")

    override def apply(text: String): Seq[Bert.BertTok] = {
      if (text == null) return Seq.empty
      val out = mutable.ArrayBuffer.empty[Bert.BertTok]
      out += Bert.BertTok(0, 0, clsId, 0, 1, special = true)
      var lastEnd = 0
      basicWords(text).foreach { w =>
        wordPieces(w).foreach { case (b, e, pid) =>
          out += Bert.BertTok(b, e, pid, 0, 1, special = false)
          lastEnd = e
        }
      }
      out += Bert.BertTok(lastEnd, lastEnd, sepId, 0, 1, special = true)
      out.toSeq
    }

    /** One basic-tokenizer word: normalized chars + each normalized
      * char's (begin, end) span in the original string. */
    private[operators] case class Word(norm: String, begins: Array[Int], ends: Array[Int])

    private def isCjk(cp: Int): Boolean =
      (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
      (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
      (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
      (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

    private def isPunct(cp: Int): Boolean =
      (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
        val t = Character.getType(cp)
        t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
        t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
        t == Character.INITIAL_QUOTE_PUNCTUATION ||
        t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
      }

    private def isControl(cp: Int): Boolean =
      cp != '\t' && cp != '\n' && cp != '\r' && {
        val t = Character.getType(cp)
        t == Character.CONTROL || t == Character.FORMAT
      }

    // HF _is_whitespace exactly: " \t\n\r" or category Zs. NOT
    // Character.isWhitespace, which misses the non-breaking spaces
    // (U+00A0/U+2007/U+202F are Zs) and wrongly includes Zl/Zp — either
    // difference changes tokens and offsets on scraped-HTML text.
    private def isWhitespace(cp: Int): Boolean =
      cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
        Character.getType(cp) == Character.SPACE_SEPARATOR

    private[operators] def basicWords(text: String): Seq[Word] = {
      val words = mutable.ArrayBuffer.empty[Word]
      val norm = new StringBuilder
      val begins = mutable.ArrayBuffer.empty[Int]
      val ends = mutable.ArrayBuffer.empty[Int]
      def flush(): Unit = if (norm.nonEmpty) {
        words += Word(norm.toString, begins.toArray, ends.toArray)
        norm.clear(); begins.clear(); ends.clear()
      }
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        val n = Character.charCount(cp)
        if (cp == 0 || cp == 0xFFFD || isControl(cp)) {
          // removed by clean_text
        } else if (isWhitespace(cp)) {
          flush()
        } else if (isCjk(cp) || isPunct(cp)) {
          flush()
          words += Word(new String(Character.toChars(cp)), Array(i), Array(i + n))
        } else {
          var s = new String(Character.toChars(cp))
          if (lowerCase) {
            s = s.toLowerCase(java.util.Locale.ROOT)
            s = Normalizer.normalize(s, Normalizer.Form.NFD)
              .filter(c => Character.getType(c) != Character.NON_SPACING_MARK)
          }
          s.foreach { c => norm += c; begins += i; ends += i + n }
        }
        i += n
      }
      flush()
      words.toSeq
    }

    /** Greedy longest-match-first decomposition of one word →
      * (begin, end, input_id) per piece, offsets in the original text. */
    private def wordPieces(w: Word): Seq[(Int, Int, Long)] = {
      val len = w.norm.length
      if (len == 0) return Seq.empty
      val wb = w.begins(0)
      val we = w.ends(len - 1)
      if (len > maxCharsPerWord) return Seq((wb, we, unkId))
      val pieces = mutable.ArrayBuffer.empty[(Int, Int, Long)]
      var start = 0
      while (start < len) {
        var end = len
        var found = -1L
        while (end > start && found < 0) {
          val sub = (if (start > 0) "##" else "") + w.norm.substring(start, end)
          vocab.get(sub) match {
            case Some(pid) => found = pid
            case None => end -= 1
          }
        }
        if (found < 0) return Seq((wb, we, unkId)) // is_bad: whole word → [UNK]
        pieces += ((w.begins(start), w.ends(end - 1), found))
        start = end
      }
      pieces.toSeq
    }
  }

  /**
   * Deterministic fixture vocabulary for the declared query (q78) and its
   * DuckDB oracle — NOT a real checkpoint's vocab (those are 30k lines; a
   * user loads one with [[loadVocab]]). Special-token ids match
   * bert-base-uncased ([UNK]=100, [CLS]=101, [SEP]=102). Contains every
   * single letter and its "##" continuation (so the synthetic corpus never
   * hits [UNK]) plus multi-char pieces that exercise greedy
   * longest-match-first mid-word.
   */
  val MiniVocab: Seq[(String, Long)] = {
    val specials = Seq("[PAD]" -> 0L, "[UNK]" -> 100L, "[CLS]" -> 101L, "[SEP]" -> 102L)
    val letters = ('a' to 'z').zipWithIndex.flatMap { case (c, i) =>
      Seq(c.toString -> (1000L + i), s"##$c" -> (1100L + i))
    }
    val pieces = Seq(
      "the" -> 3000L, "key" -> 3001L, "row" -> 3002L, "hash" -> 3003L,
      "fast" -> 3004L, "scan" -> 3005L, "agg" -> 3006L, "part" -> 3007L,
      "tab" -> 2000L, "##le" -> 2001L, "va" -> 2002L, "##lue" -> 2003L,
      "jo" -> 2004L, "##in" -> 2005L, "sp" -> 2006L, "##ark" -> 2007L,
      "win" -> 2008L, "##dow" -> 2009L, "##ream" -> 2010L, "or" -> 2011L,
      "##der" -> 2012L, "co" -> 2013L, "##lumn" -> 2014L, "##er" -> 2015L,
      "##ll" -> 2016L, "fil" -> 2017L, "##ter" -> 2018L, "gr" -> 2019L,
      "##oup" -> 2020L, "##ata" -> 2021L, "##ig" -> 2022L, "##mall" -> 2023L)
    specials ++ letters ++ pieces
  }

  /** [[MiniVocab]] as the tokenizer the q78 declared query runs. */
  def miniVocabTokenizer: Bert.BertTokenizer = tokenizer(MiniVocab.toMap)
}
