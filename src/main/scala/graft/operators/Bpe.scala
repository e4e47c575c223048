package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Byte-pair-encoding tokenizer TRAINING — learn a merge sequence from
 * the corpus, not just apply a fixed vocabulary (the engine's WordPiece
 * operator applies; this one learns). Classic procedure (Sennrich,
 * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
 * Subword Units"): start from characters (plus an end-of-word marker),
 * repeatedly count adjacent symbol pairs over the corpus weighted by
 * word frequency, merge the most frequent pair everywhere, repeat for a
 * bounded number of merges.
 *
 * Spark shape, designed for the 100 TB case:
 *  - ONE linear pass over the corpus builds the distinct-word frequency
 *    table ([[wordCounts]]); every subsequent iteration touches only
 *    that vocabulary relation — per-iteration cost is bound by vocab
 *    size, not corpus size.
 *  - each iteration is one map-side-combined pair-count aggregation plus
 *    a bounded top-1 driver action (exactly the Lloyd's-iteration
 *    pattern used by the k-means operator: sequential by nature, one
 *    tiny row collected per step).
 *  - the merge is applied as a codegen string `replace` on a
 *    bracket-delimited symbol encoding (below); lineage is truncated
 *    with an eager localCheckpoint each iteration, and the previous
 *    iteration's checkpoint is unpersisted once the next materializes,
 *    so long merge schedules grow neither plan depth nor executor
 *    storage.
 *
 * Symbol encoding: a word's symbol sequence is rendered as
 * `"(h)(e)(l)(l)(o)(_)"` — every symbol wrapped in parentheses, with a
 * trailing `"_"` end-of-word symbol. Because the pre-tokenizer alphabet
 * is `[a-z0-9]` (plus the marker), symbols can never contain a
 * parenthesis, so replacing `"(l)(r)"` with `"(lr)"` applies the merge
 * exactly like the reference greedy left-to-right scan: matches are
 * found leftmost-first and never overlap, since each symbol's brackets
 * are consumed by at most one match.
 *
 * Determinism: pair counts are exact integer sums, and the best pair is
 * chosen by the total order (count DESC, lhs ASC, rhs ASC) — the same
 * merge sequence on any partitioning, and re-derivable in plain SQL.
 */
object Bpe {

  /** One learned merge: rank (1-based), the two symbols, their corpus
    * pair frequency at the time of the merge. */
  final case class Merge(rank: Int, lhs: String, rhs: String, freq: Long) {
    def merged: String = lhs + rhs
  }

  /** Bracket-encode a word column: "(c)(c)...(_)" — initial symbols are
    * the word's characters plus the end-of-word marker. */
  private[graft] def enc0(word: Column): Column =
    concat(lit("("), array_join(split(word, ""), ")("), lit(")(_)"))

  /** Symbol list of an encoded word — built from the argument column
    * (no hardcoded column name), so callers may alias freely. */
  private def syms(enc: Column): Column =
    split(enc.substr(lit(2), length(enc) - lit(2)), "\\)\\(")

  /** Number of symbols in an encoded word: count of '(' delimiters —
    * a pure length arithmetic, no split. */
  private[graft] def symCount(enc: Column): Column =
    (length(enc) - length(translate(enc, "(", ""))).cast("long")

  /**
   * Distinct-word frequency table `(word, freq)` — the single
   * corpus-size-linear aggregation; the learner never rescans the
   * corpus after this.
   */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent-pair counts over the encoded vocabulary, weighted by word
    * frequency: explode zip_with(prefixes, suffixes) → one shuffle of
    * narrow (lhs, rhs, freq) rows, map-side combined. */
  private def pairCounts(words: DataFrame): DataFrame = {
    val s = syms(col("enc"))
    words
      .select(explode(zip_with(
        slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
        (l, r) => struct(l.as("lhs"), r.as("rhs")))).as("p"), col("freq"))
      .groupBy(col("p")("lhs").as("lhs"), col("p")("rhs").as("rhs"))
      .agg(sum("freq").as("pair_freq"))
  }

  /**
   * Learn up to `numMerges` merges from the corpus. Stops early when no
   * adjacent pair remains (every word fully merged). The returned
   * schedule is deterministic — see the object doc for the tie-break.
   */
  def learn(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[Merge] = {
    require(numMerges > 0, "numMerges must be positive")
    val sc = docs.sparkSession.sparkContext
    // Dataset.unpersist does NOT release localCheckpoint storage: the
    // blocks belong to the internal checkpointed RDD, which never enters
    // the CacheManager. Read that RDD's id straight off the returned
    // Dataset's LogicalRDD plan node and unpersist it directly once the
    // next iteration's checkpoint has materialized — otherwise executor
    // storage grows one vocab copy per merge iteration and a 32k-merge
    // schedule exhausts it. (Reading the plan node — rather than diffing
    // sc.getPersistentRDDs around the call — is thread-safe: concurrent
    // checkpoints from other queries can never be captured here.)
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val out = df.localCheckpoint(true)
      val ids = out.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
      }.toSet
      (out, ids)
    }
    def releaseBlocks(ids: Set[Int]): Unit =
      ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    // Unpersisting a truncated-lineage checkpoint logs one WARN per RDD
    // ("cannot be recomputed after unpersisting") — correct here by
    // construction (the next checkpoint is already materialized, the old
    // blocks can never be needed), and at a 32k-merge schedule it would
    // be 32k log lines. Silence exactly that logger for the call.
    val ckLoggerName = "org.apache.spark.rdd.MapPartitionsRDD"
    val prevLevel = org.apache.logging.log4j.LogManager
      .getLogger(ckLoggerName).getLevel
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      ckLoggerName, org.apache.logging.log4j.Level.ERROR)
    try {
    var (words, wordsBlocks) = checkpointTracked(
      wordCounts(docs, textCol)
        .select(enc0(col("word")).as("enc"), col("freq")))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("pair_freq").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, f) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, f)
        val applied = words.withColumn("enc",
          expr_replace(col("enc"), s"($l)($r)", s"(${l + r})"))
        // eager checkpoint: materializes the merge AND truncates lineage,
        // so a 32k-merge schedule never accumulates a 32k-projection plan.
        // The PREVIOUS iteration's blocks are dead once the new checkpoint
        // materializes (lineage is truncated, so they can never be needed
        // for recompute) — release them eagerly.
        val (next, nextBlocks) = checkpointTracked(applied)
        releaseBlocks(wordsBlocks)
        words = next
        wordsBlocks = nextBlocks
        rank += 1
      }
    }
    releaseBlocks(wordsBlocks)
    merges.result()
    } finally {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        ckLoggerName, prevLevel)
    }
  }

  /**
   * [[learn]] with BATCHED merge selection — the driver-round-trip
   * remedy for long schedules: each iteration collects the top of the
   * pair-count order (one bounded driver action, `candPool = 8·batch`
   * rows) and greedily accepts up to `batch` merges that are pairwise
   * NON-INTERACTING. Merging (a,b) changes only the counts of pairs
   * adjacent to a consumed occurrence — those whose rhs is `a`, whose
   * lhs is `b`, or that mention the new symbol `ab` — so accepted pair
   * q=(c,d) must satisfy, against every earlier-accepted p:
   * `c != p.rhs, d != p.lhs, c != p.merged, d != p.merged,
   * q.merged != p.lhs, q.merged != p.rhs`. (Sharing only lhs-with-lhs
   * or rhs-with-rhs does NOT interact: merging (e)(_) leaves every
   * (s)(_) occurrence and count untouched — which is what lets the
   * many end-of-word-marker pairs that dominate early iterations batch
   * together.) Non-interaction makes the batch's `replace`
   * applications commute AND leaves every accepted pair's corpus count
   * unchanged while the batch applies, so the schedule equals the
   * sequential one — EXCEPT for two controlled divergences: sequential
   * BPE may interleave (i) a pair newly CREATED by an earlier member
   * (its count is bounded by its creator's, so only on a count tie),
   * or (ii) a SKIPPED conflicting pair, ahead of a later member.
   * BpeSpec measures the divergence at 256 merges on the spec corpus
   * and pins the invariants that hold always: accepted merges are
   * pairwise non-interacting, counts are the true corpus counts at
   * batch start, and the batched schedule is a valid merge chain.
   *
   * A 32k-merge vocabulary costs ~32k/`batch` driver round-trips
   * instead of 32k — at `batch = 8` that is the ≥8× scheduler-cost cut
   * for the one operator whose wall-clock is round-trip-bound.
   */
  def learnBatched(docs: DataFrame, numMerges: Int, batch: Int = 8,
      textCol: String = "text"): Seq[Merge] =
    learnBatchedStats(docs, numMerges, batch, textCol)._1

  /** [[learnBatched]] plus the number of driver-sequenced iterations it
    * took (the quantity the batching exists to cut — BpeSpec asserts the
    * ≥8x reduction on it). */
  private[graft] def learnBatchedStats(docs: DataFrame, numMerges: Int,
      batch: Int = 8, textCol: String = "text"): (Seq[Merge], Int) = {
    require(numMerges > 0, "numMerges must be positive")
    require(batch > 0, "batch must be positive")
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val out = df.localCheckpoint(true)
      val ids = out.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
      }.toSet
      (out, ids)
    }
    val sc = docs.sparkSession.sparkContext
    def releaseBlocks(ids: Set[Int]): Unit =
      ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val ckLoggerName = "org.apache.spark.rdd.MapPartitionsRDD"
    val prevLevel = org.apache.logging.log4j.LogManager
      .getLogger(ckLoggerName).getLevel
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      ckLoggerName, org.apache.logging.log4j.Level.ERROR)
    try {
      var (words, wordsBlocks) = checkpointTracked(
        wordCounts(docs, textCol)
          .select(enc0(col("word")).as("enc"), col("freq")))
      val merges = Seq.newBuilder[Merge]
      var rank = 1
      var iters = 0
      var exhausted = false
      while (rank <= numMerges && !exhausted) {
        val want = math.min(batch, numMerges - rank + 1)
        val top = pairCounts(words)
          .orderBy(col("pair_freq").desc, col("lhs"), col("rhs"))
          .limit(8 * want).collect()
        if (top.isEmpty) exhausted = true
        else {
          // greedy non-interacting acceptance in the total order (see
          // the scaladoc's conflict rule)
          val accLhs = scala.collection.mutable.Set.empty[String]
          val accRhs = scala.collection.mutable.Set.empty[String]
          val accMerged = scala.collection.mutable.Set.empty[String]
          val accepted = Seq.newBuilder[Merge]
          var n = 0
          top.iterator.takeWhile(_ => n < want).foreach { r =>
            val (l, rr, f) = (r.getString(0), r.getString(1), r.getLong(2))
            val m = l + rr
            // !accMerged(m): two same-batch merges may NOT produce the
            // identical merged symbol (e.g. (a,bc) and (ab,c) → abc) —
            // that would assign two ranks to one vocabulary entry
            if (!accRhs(l) && !accLhs(rr) && !accMerged(l) && !accMerged(rr) &&
                !accLhs(m) && !accRhs(m) && !accMerged(m)) {
              accepted += Merge(rank + n, l, rr, f)
              accLhs += l; accRhs += rr; accMerged += m
              n += 1
            }
          }
          val batchMerges = accepted.result()
          merges ++= batchMerges
          rank += batchMerges.length
          val applied = words.withColumn("enc",
            batchMerges.foldLeft(col("enc")) { (c, m) =>
              expr_replace(c, s"(${m.lhs})(${m.rhs})", s"(${m.merged})")
            })
          val (next, nextBlocks) = checkpointTracked(applied)
          releaseBlocks(wordsBlocks)
          words = next
          wordsBlocks = nextBlocks
        }
        iters += 1
      }
      releaseBlocks(wordsBlocks)
      (merges.result(), iters)
    } finally {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        ckLoggerName, prevLevel)
    }
  }

  // `functions.replace` exists only from Spark 3.5 as `replace`; route
  // through the SQL function for the exact non-regex leftmost semantics.
  private def expr_replace(src: Column, search: String, repl: String): Column =
    call_function("replace", src, lit(search), lit(repl))

  private val mergeSchema = StructType(Seq(
    StructField("merge_rank", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("pair_freq", LongType, nullable = false)))

  // learn() is a multi-job action sequence; the train + fertility query
  // pair (and repeated bench passes) reuse one schedule per
  // (corpus handle, knobs) rather than re-running it. textCol is part of
  // the key: the same corpus trained on two different text columns must
  // not share a schedule.
  private val learnCache = TrieMap.empty[(String, Int, String), Seq[Merge]]

  private def learnCached(docs: DataFrame, numMerges: Int, cacheKey: String,
      textCol: String): Seq[Merge] =
    if (cacheKey == null) learn(docs, numMerges, textCol)
    else learnCache.getOrElseUpdate((cacheKey, numMerges, textCol),
      learn(docs, numMerges, textCol))

  /**
   * The learned merge table as a DataFrame:
   * (merge_rank, lhs, rhs, merged, pair_freq) — numMerges rows (fewer
   * only if the vocabulary merges to single symbols first). `cacheKey`
   * (e.g. the sf dir) memoizes the schedule within the process.
   */
  def learnTable(docs: DataFrame, numMerges: Int, cacheKey: String = null,
      textCol: String = "text"): DataFrame = {
    val ms = learnCached(docs, numMerges, cacheKey, textCol)
    docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(ms.map(m =>
        Row(m.rank, m.lhs, m.rhs, m.merged, m.freq)): _*),
      mergeSchema)
  }

  /** Encode a word column with a learned schedule: the merges applied in
    * rank order as a chain of codegen `replace`s — no UDF, no join. */
  def applyMerges(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(enc0(word)) { (c, m) =>
      expr_replace(c, s"(${m.lhs})(${m.rhs})", s"(${m.merged})")
    }

  /**
   * Large-vocab ENCODER kernel — [[applyMerges]] folds the schedule into
   * a chain of `replace` expressions, which is exactly right at
   * datasheet merge counts (16: one codegen'd projection, no UDF) and
   * structurally impossible at a production 32k-merge vocabulary
   * (expression depth and generated-method size scale with the vocab).
   * This is the WordPiece pattern instead ([[WordPiece]]): the learned
   * schedule rides once per executor as a broadcast pair→rank table,
   * and each word is encoded by the standard iterative procedure —
   * find the lowest-rank adjacent pair, fuse ALL its leftmost-first
   * non-overlapping occurrences, repeat until no learned pair applies.
   *
   * Equivalence with the chain: a merge's operands can only be symbols
   * built by LOWER-rank merges (that is how the schedule was learned),
   * and fusing two symbols never creates a new adjacency between
   * pre-existing symbols — so min-rank-first iteration yields exactly
   * the rank-order replace chain's symbol sequence. BpeSpec pins the
   * property on every corpus word; q152 shares q146's oracle.
   */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = {
      val a = new Array[String](word.length + 1)
      var i = 0
      while (i < word.length) { a(i) = String.valueOf(word.charAt(i)); i += 1 }
      a(word.length) = "_"
      a
    }
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val l = syms(bestIdx)
        val r = syms(bestIdx + 1)
        val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            buf += l + r; j += 2
          } else { buf += syms(j); j += 1 }
        }
        syms = buf.toArray
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /**
   * [[fertility]]'s twin on the kernel encoder — same output relation,
   * same per-language aggregation, but the encode step is a broadcast-
   * table `mapPartitions` instead of a numMerges-deep expression chain:
   * the schedule costs one broadcast however large the vocabulary, and
   * per-word encode cost depends on word length and applicable merges,
   * not on the schedule size. Word extraction stays in-plan
   * ([[TextAnalysis.words]]) so tokenization is bit-identical to
   * [[fertility]]'s.
   */
  def fertilityKernel(docs: DataFrame, numMerges: Int, cacheKey: String = null,
      textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = learnCached(docs, numMerges, cacheKey, textCol)
    val ranks = ms.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val perDoc = docs
      .select(col(langCol).cast("string").as("lang"),
        TextAnalysis.words(col(textCol)).as("ws"))
      .as[(String, Seq[String])]
      .mapPartitions { it =>
        val r = bc.value
        it.map { case (lang, ws) =>
          var nt = 0L
          ws.foreach { w => nt += encodeWord(w, r).length.toLong }
          (lang, ws.size.toLong, nt)
        }
      }.toDF("lang", "nw", "nt")
    perDoc.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nw").as("words"),
        sum("nt").as("tokens"))
      .withColumn("fertility", when(col("words") > 0,
        floor(col("tokens") / col("words") * 1e4 + 0.5) / 1e4))
  }

  /**
   * Tokenizer fertility of the LEARNED vocabulary over the corpus —
   * the [[TextAnalysis.tokenizerFertility]] datasheet row recomputed
   * with the trained subword tokenizer instead of the fixed proxy:
   * per language, total words, total BPE tokens, fertility =
   * tokens/words rounded half-up to 4dp.
   *
   * Scale shape: learning is vocab-bound (above); scoring is one
   * shuffle-free codegen projection over the corpus (the merge chain is
   * a bounded expression, folded per word inside `aggregate`) plus one
   * map-side-combined per-language aggregation.
   */
  def fertility(docs: DataFrame, numMerges: Int, cacheKey: String = null,
      textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val ms = learnCached(docs, numMerges, cacheKey, textCol)
    val perDocTokens = aggregate(
      transform(TextAnalysis.words(col(textCol)),
        w => symCount(applyMerges(w, ms))),
      lit(0L), (acc, x) => acc + x)
    docs.select(col(langCol).as("lang"),
        size(TextAnalysis.words(col(textCol))).cast("long").as("nw"),
        perDocTokens.as("nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nw").as("words"),
        sum("nt").as("tokens"))
      .withColumn("fertility", when(col("words") > 0,
        floor(col("tokens") / col("words") * 1e4 + 0.5) / 1e4))
  }
}
