package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/**
 * BPE tokenizer training (operators/Bpe.scala): merge schedule vs a
 * hand-derived reference, greedy leftmost application semantics, early
 * exhaustion, and learned-vocab fertility consistency.
 */
class BpeSpec extends GraftSuite {

  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en") }
      .toDF("doc_id", "text", "lang")

  test("learn derives the hand-computed merge schedule with tie-breaks") {
    // corpus: "low" x3, "lower" x1  (word freqs via repetition)
    // symbols: l o w _ (+ e r in "lower")
    // iter1 pairs: (l,o)=4 (o,w)=4 (w,_)=3 (w,e)=1 (e,r)=1 (r,_)=1
    //   → count tie 4 between (l,o) and (o,w); lexicographic lhs: (l,o)
    // iter2: (lo,w)=4 wins → low
    // iter3: (low,_)=3 wins → low_
    val docs = docsOf("low low low lower")
    val ms = Bpe.learn(docs, numMerges = 3)
    assert(ms.map(m => (m.rank, m.lhs, m.rhs, m.freq)) ==
      Seq((1, "l", "o", 4L), (2, "lo", "w", 4L), (3, "low", "_", 3L)))
  }

  test("learn releases every checkpoint's storage (no per-iteration leak)") {
    // Dataset.unpersist is a no-op for localCheckpointed Datasets (the
    // blocks live on the internal RDD, outside the CacheManager), so the
    // release must target the checkpointed RDDs themselves. Assert the
    // persistent-RDD set is back to its pre-call state after learn() —
    // a leak would leave one MEMORY_AND_DISK vocab copy per iteration.
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    Bpe.learn(docsOf("low low low lower lowest low lower"), numMerges = 6)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"learn() leaked persisted RDDs: ${leaked.mkString(",")}")
  }

  test("merge application is greedy leftmost, never overlapping") {
    // word "aaaa" encodes (a)(a)(a)(a)(_); merging (a,a) must produce
    // (aa)(aa)(_) — leftmost pairs first, the middle overlap skipped.
    val docs = docsOf("aaaa aaaa")
    val ms = Bpe.learn(docs, numMerges = 1)
    assert(ms.head.lhs == "a" && ms.head.rhs == "a")
    // freq: "aaaa" has 3 adjacent (a,a) positions x2 words = 6, but the
    // learner counts POSITIONS (6), greedy application then merges 2
    assert(ms.head.freq == 6L)
    val enc = spark.range(1).select(
      Bpe.applyMerges(lit("aaaa"), ms).as("e")).head.getString(0)
    assert(enc == "(aa)(aa)(_)")
  }

  test("learn stops early when every word is a single symbol") {
    val docs = docsOf("ab ab")
    // only merges possible: (a,b) then (ab,_) — request 10, expect 2
    val ms = Bpe.learn(docs, numMerges = 10)
    assert(ms.size == 2)
    assert(ms.map(_.merged) == Seq("ab", "ab_"))
  }

  test("learnTable columns and determinism across repartitionings") {
    val base = docsOf("spark spark sparse parse parse parse")
    val a = Bpe.learn(base, numMerges = 5)
    val b = Bpe.learn(base.repartition(7), numMerges = 5)
    assert(a == b)
    val t = Bpe.learnTable(base, numMerges = 5)
    assert(t.columns.toSeq ==
      Seq("merge_rank", "lhs", "rhs", "merged", "pair_freq"))
    assert(t.count() == 5)
  }

  test("fertility: learned merges shrink token counts vs characters") {
    val docs = docsOf("stream stream stream table table", "stream table")
    val f = Bpe.fertility(docs, numMerges = 8).collect()
    assert(f.length == 1)
    val r = f.head
    val words = r.getAs[Long]("words")
    val tokens = r.getAs[Long]("tokens")
    assert(words == 7)
    // merged token count strictly below the un-merged symbol count
    // (chars + end-of-word marker per word), at least one per word
    val charPlusMarker = docs.select(sum(aggregate(
      graft.operators.TextAnalysis.words(col("text")),
      lit(0L), (acc, w) => acc + length(w) + 1))).head.getLong(0)
    assert(tokens < charPlusMarker)
    assert(tokens >= words) // at least one token per word
    val fert = r.getAs[Double]("fertility")
    assert(fert == math.floor(tokens.toDouble / words * 1e4 + 0.5) / 1e4)
  }

  test("kernel encode ≡ chain encode on every corpus word and random words") {
    // learn a real schedule, then assert the broadcast-rank kernel
    // (encodeWord) produces exactly the replace chain's symbol sequence —
    // the min-rank equivalence the large-vocab path rests on.
    val docs = docsOf(
      "spark sparse parse partition parquet stream streaming streams",
      "table tables stable tablet parse parse spark spark spark",
      "aaaa aabb abab bbaa partition parquet stream table")
    val ms = Bpe.learn(docs, numMerges = 24)
    val ranks = ms.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val rnd = new scala.util.Random(42)
    val corpusWords = docs.select(explode(
      graft.operators.TextAnalysis.words(col("text")))).as[String].collect()
    val randomWords = Seq.fill(200)(
      (0 until (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString)
    // words come from TextAnalysis.words ([a-z0-9]+) so are never empty
    (corpusWords ++ randomWords).distinct.foreach { w =>
      val chain = spark.range(1)
        .select(Bpe.applyMerges(lit(w), ms).as("e")).head.getString(0)
      val kernel = Bpe.encodeWord(w, ranks).mkString("(", ")(", ")")
      assert(kernel == chain, s"word '$w': kernel $kernel != chain $chain")
    }
  }

  test("kernel encode ≡ chain encode at a 256-merge schedule") {
    // vocabulary-scale twin of the 24-merge equivalence: a deterministic
    // syllable corpus rich enough to sustain 256 learned merges; the
    // chain form is evaluated ONCE over the whole word relation (a
    // 256-deep replace expression — the structural regime the
    // broadcast-rank kernel exists to escape), then compared word by
    // word against encodeWord.
    val syll = Vector("ba", "be", "bi", "bo", "bu", "da", "de", "di",
      "do", "du", "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo",
      "lu", "ma", "me", "mi", "mo", "mu")
    val words = (0 until 900).map { i =>
      // LCG-mixed syllable picks: regular stride patterns collapse into
      // whole-word merges and exhaust the pair supply before 256
      var st = i * 2654435761L
      def next(): Int = { st = (st * 1103515245L + 12345L) & 0x7fffffffL; (st % syll.size).toInt }
      (0 until (2 + i % 5)).map(_ => syll(next())).mkString
    }
    val weighted = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(1 + i % 3)(w) }
    val docs = docsOf(weighted.grouped(40).map(_.mkString(" ")).toSeq: _*)
    val ms = Bpe.learn(docs, numMerges = 256)
    assert(ms.size == 256, s"corpus exhausted early, only ${ms.size} merges")
    val ranks = ms.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val distinctW = words.distinct
    val chain = distinctW.toDF("w")
      .select(col("w"), Bpe.applyMerges(col("w"), ms).as("e"))
      .as[(String, String)].collect().toMap
    distinctW.foreach { w =>
      val kernel = Bpe.encodeWord(w, ranks).mkString("(", ")(", ")")
      assert(kernel == chain(w), s"word '$w': kernel $kernel != chain ${chain(w)}")
    }
  }

  test("learnBatched: >=8x fewer driver iterations at 256 merges; schedule " +
      "divergence from sequential is measured and bounded") {
    // the kernel test's syllable corpus — rich enough for 256 merges
    val syll = Vector("ba", "be", "bi", "bo", "bu", "da", "de", "di",
      "do", "du", "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo",
      "lu", "ma", "me", "mi", "mo", "mu")
    val words = (0 until 900).map { i =>
      var st = i * 2654435761L
      def next(): Int = { st = (st * 1103515245L + 12345L) & 0x7fffffffL; (st % syll.size).toInt }
      (0 until (2 + i % 5)).map(_ => syll(next())).mkString
    }
    val weighted = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(1 + i % 3)(w) }
    val docs = docsOf(weighted.grouped(40).map(_.mkString(" ")).toSeq: _*)
    val seqMs = Bpe.learn(docs, numMerges = 256)
    val (batMs, iters) = Bpe.learnBatchedStats(docs, numMerges = 256, batch = 8)
    // the batching's whole point: >=8x fewer driver-sequenced rounds
    assert(batMs.size == 256, s"corpus exhausted early, only ${batMs.size}")
    assert(iters <= 32, s"expected <=32 iterations (256/8), took $iters")
    // controlled divergence, MEASURED: the batched schedule may reorder
    // tie-count merges or interleave created/skipped pairs differently,
    // but the learned merge SET must stay essentially the sequential one
    val seqSet = seqMs.map(m => (m.lhs, m.rhs)).toSet
    val batSet = batMs.map(m => (m.lhs, m.rhs)).toSet
    val shared = (seqSet & batSet).size
    info(s"iterations: $iters; shared merges: $shared/256; " +
      s"first divergent rank: ${seqMs.zip(batMs).indexWhere { case (a, b) =>
        (a.lhs, a.rhs) != (b.lhs, b.rhs) } match { case -1 => "none"; case i => (i + 1).toString }}")
    // Measured on this corpus: 159/256 shared. The divergence is
    // structural, not a bug: BPE merge CHAINS (l+o, then lo+w) conflict
    // within a batch, so the batched learner defers each chain link to
    // the next round and spends the freed budget deeper in the frequency
    // order — the two schedules then differ in which tail merges fit the
    // 256 budget. The floor pins that the head of the order is shared;
    // the compression check below is the quality gate that matters for
    // a tokenizer.
    assert(shared >= 140, s"batched schedule shares only $shared/256 merges")
    // validity: the batched schedule is a working merge chain — encoding
    // any corpus word with it reconstructs the word exactly
    val chain = words.distinct.toDF("w")
      .select(col("w"), Bpe.applyMerges(col("w"), batMs).as("e"))
      .as[(String, String)].collect()
    chain.foreach { case (w, e) =>
      assert(e.stripPrefix("(").stripSuffix(")").split("\\)\\(").mkString == w + "_",
        s"batched schedule mangled '$w' -> '$e'")
    }
    // quality: compression within 2% of the sequential schedule's
    def tokens(ms: Seq[Bpe.Merge]) = words.distinct.toDF("w")
      .select(Bpe.applyMerges(col("w"), ms).as("e"))
      .select((length(col("e")) - length(translate(col("e"), "(", ""))).as("n"))
      .agg(sum("n")).head.getLong(0)
    val (tSeq, tBat) = (tokens(seqMs), tokens(batMs))
    info(s"tokens: sequential $tSeq, batched $tBat")
    // measured here: batched compresses BETTER (2847 vs 2999 — deferring
    // chain links spends the budget on more distinct high-count pairs);
    // the gate only bounds regression
    assert(tBat <= tSeq * 1.02,
      s"batched compression regressed: $tBat vs $tSeq")
  }

  test("fertilityKernel matches fertility on a multi-language corpus") {
    val docs = Seq(
      (0L, "spark stream sparse parse parse table", "en"),
      (1L, "stream stream table parse spark", "en"),
      (2L, "tabla corriente chispa chispa", "es"),
      (3L, "chispa tabla tabla corriente corriente", "es"))
      .toDF("doc_id", "text", "lang")
    val a = Bpe.fertility(docs, numMerges = 12).orderBy("lang").collect()
    val b = Bpe.fertilityKernel(docs, numMerges = 12).orderBy("lang").collect()
    assert(a.toSeq == b.toSeq)
  }
}
