package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bert, WordPiece}

/**
 * Real BERT tokenizer (BasicTokenizer + WordPiece) parity tests.
 *
 * The golden literal comes from the reference's own test suite
 * (io/test_bert.py:52-120 `test_make_bert_tokens` / `test_add_embeddings`),
 * which prints `make_bert_tokens("What's another word for Thesaurus?",
 * BertTokenizerFast(bert-base-uncased))`: token spans
 * [0,0) [0,4) [4,5) [5,6) [7,14) with input_ids 101 2054 1005 1055 2178.
 * The fixture vocab places exactly those pieces at exactly those ids, so
 * matching the literal requires the real algorithm (lowercase, punct
 * split, greedy wordpiece, special-token offsets) — not just the ids.
 */
class WordPieceSpec extends GraftSuite {
  import spark.implicits._

  private val refVocab = Map(
    "[PAD]" -> 0L, "[UNK]" -> 100L, "[CLS]" -> 101L, "[SEP]" -> 102L,
    "what" -> 2054L, "'" -> 1005L, "s" -> 1055L, "another" -> 2178L,
    "word" -> 2773L, "for" -> 2005L, "the" -> 1996L, "##saurus" -> 22026L,
    "?" -> 1029L)

  test("reference golden: What's another word for Thesaurus?") {
    val tok = WordPiece.tokenizer(refVocab)
    val text = "What's another word for Thesaurus?"
    val toks = tok(text)
    // rows 0-4 exactly as printed by the reference test
    assert(toks.take(5).map(t => (t.begin, t.end, t.inputId, t.special)) == Seq(
      (0, 0, 101L, true), (0, 4, 2054L, false), (4, 5, 1005L, false),
      (5, 6, 1055L, false), (7, 14, 2178L, false)))
    // tail: word for the ##saurus ? [SEP]
    assert(toks.drop(5).map(t => (t.begin, t.end, t.inputId)) == Seq(
      (15, 19, 2773L), (20, 23, 2005L), (24, 27, 1996L), (27, 33, 22026L),
      (33, 34, 1029L), (34, 34, 102L)))
    assert(toks.last.special)
    // reference assertions: CLS first, SEP last, nothing special between
    assert(toks.head.inputId == 101L && toks.last.inputId == 102L)
    assert(!toks.drop(1).dropRight(1).exists(_.special))
  }

  test("canonical wordpiece decomposition with original-text offsets") {
    val tok = WordPiece.tokenizer(Map("[UNK]" -> 100L, "[CLS]" -> 101L,
      "[SEP]" -> 102L, "un" -> 1L, "##aff" -> 2L, "##able" -> 3L))
    val toks = tok("unaffable").filterNot(_.special)
    assert(toks.map(t => (t.begin, t.end, t.inputId)) ==
      Seq((0, 2, 1L), (2, 5, 2L), (5, 9, 3L)))
  }

  test("undecomposable word becomes one [UNK] covering the whole word") {
    val tok = WordPiece.tokenizer(Map("[UNK]" -> 100L, "[CLS]" -> 101L,
      "[SEP]" -> 102L, "un" -> 1L, "##aff" -> 2L))
    val toks = tok("unaffable").filterNot(_.special)
    assert(toks.map(t => (t.begin, t.end, t.inputId)) == Seq((0, 9, 100L)))
  }

  test("word longer than maxCharsPerWord becomes [UNK]") {
    val vocab = Map("[UNK]" -> 100L, "[CLS]" -> 101L, "[SEP]" -> 102L,
      "a" -> 1L, "##a" -> 2L)
    val toks = new WordPiece.Tokenizer(vocab, maxCharsPerWord = 100)("a" * 101)
      .filterNot(_.special)
    assert(toks.map(t => (t.begin, t.end, t.inputId)) == Seq((0, 101, 100L)))
  }

  test("lowercasing + NFD accent stripping keep original offsets") {
    val tok = WordPiece.tokenizer(Map("[UNK]" -> 100L, "[CLS]" -> 101L,
      "[SEP]" -> 102L, "hello" -> 1L, "cafe" -> 2L))
    val toks = tok("Héllo CAFÉ").filterNot(_.special)
    assert(toks.map(t => (t.begin, t.end, t.inputId)) ==
      Seq((0, 5, 1L), (6, 10, 2L)))
  }

  test("CJK ideographs and punctuation split to single-char words") {
    val tok = WordPiece.tokenizer(Map("[UNK]" -> 100L, "[CLS]" -> 101L,
      "[SEP]" -> 102L, "ab" -> 1L, "cd" -> 2L, "勢" -> 3L, "," -> 4L,
      "don" -> 5L, "'" -> 6L, "t" -> 7L))
    val toks = tok("ab勢cd, don't").filterNot(_.special)
    assert(toks.map(t => (t.begin, t.end, t.inputId)) == Seq(
      (0, 2, 1L), (2, 3, 3L), (3, 5, 2L), (5, 6, 4L),
      (7, 10, 5L), (10, 11, 6L), (11, 12, 7L)))
  }

  test("control chars removed, whitespace variants all split") {
    val tok = WordPiece.tokenizer(Map("[UNK]" -> 100L, "[CLS]" -> 101L,
      "[SEP]" -> 102L, "ab" -> 1L, "cd" -> 2L))
    // NUL (removed by clean_text) sits between "ab" and the tab
    val toks = tok("ab\u0000\tcd\n").filterNot(_.special)
    assert(toks.map(t => (t.begin, t.end, t.inputId)) ==
      Seq((0, 2, 1L), (4, 6, 2L)))
    // HF _is_whitespace: Zs chars split words too — NBSP (U+00A0) and
    // narrow no-break space (U+202F) are Zs, which Character.isWhitespace
    // misses; scraped HTML is full of them
    val nbsp = tok("ab\u00A0cd\u202Fab").filterNot(_.special)
    assert(nbsp.map(t => (t.begin, t.end, t.inputId)) ==
      Seq((0, 2, 1L), (3, 5, 2L), (6, 8, 1L)))
  }

  test("loadVocab reads standard vocab.txt (id = line number)") {
    val f = java.nio.file.Files.createTempFile("graft_vocab", ".txt")
    f.toFile.deleteOnExit()
    java.nio.file.Files.writeString(f, "[PAD]\n[UNK]\n[CLS]\n[SEP]\nhello\n##world\n")
    val v = WordPiece.loadVocab(f.toString)
    assert(v("[PAD]") == 0L && v("hello") == 4L && v("##world") == 5L)
    val toks = WordPiece.tokenizer(v)("helloworld").filterNot(_.special)
    assert(toks.map(t => (t.begin, t.end, t.inputId)) ==
      Seq((0, 5, 4L), (5, 10, 5L)))
  }

  test("makeBertTokens runs the real tokenizer distributed (mini vocab)") {
    val docs = Seq((0L, "the table value"), (1L, "spark window stream"))
      .toDF("doc_id", "text")
    val out = Bert.makeBertTokens(docs, WordPiece.miniVocabTokenizer)
      .orderBy("doc_id", "token_id")
      .select(col("doc_id"), col("input_id"),
        col("span")("begin"), col("span")("end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val v = WordPiece.MiniVocab.toMap
    assert(out.filter(_._1 == 0L).map(t => (t._2, t._3, t._4)).toSeq == Seq(
      (101L, 0, 0), (v("the"), 0, 3), (v("tab"), 4, 7), (v("##le"), 7, 9),
      (v("va"), 10, 12), (v("##lue"), 12, 15), (102L, 15, 15)))
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).toSeq == Seq(
      (101L, 0, 0), (v("sp"), 0, 2), (v("##ark"), 2, 5),
      (v("win"), 6, 9), (v("##dow"), 9, 12),
      (v("s"), 13, 14), (v("##t"), 14, 15), (v("##ream"), 15, 19),
      (102L, 19, 19)))
  }
}
