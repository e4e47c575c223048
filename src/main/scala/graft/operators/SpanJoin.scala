package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spans

/**
 * Span-predicate (theta/interval) joins, reduced to equi-joins exactly as
 * the reference does (reference: spanner/join.py) — the "blocking" pattern
 * from the entity-resolution literature. Reducing to equi-joins is what
 * makes these scale on Spark: Catalyst plans an ordinary shuffled (or
 * broadcast) hash join on `(doc_id, key)` instead of a nested-loop join.
 */
object SpanJoin {

  /**
   * Pairs (first, second) of token spans with
   * `first.end_tok + gap == second.begin_tok`, `gap ∈ [minGap, maxGap]`
   * (`adjacent_join`, reference: spanner/join.py:28-85).
   *
   * The inner side replicates once per gap value (explode over a constant
   * sequence — codegen'd, narrow), turning the band predicate into a pure
   * equi-join on `(doc_id, end_tok)`.
   *
   * Inputs: DataFrames with `doc_id` and a token-span struct column.
   * Output: doc_id, first, second.
   */
  def adjacentJoin(first: DataFrame, second: DataFrame,
      minGap: Int = 0, maxGap: Int = 0,
      firstCol: String = "span", secondCol: String = "span"): DataFrame = {
    val outer = first.select(col("doc_id"), col(firstCol).as("first"))
    val inner = second.select(col("doc_id").as("doc_id2"), col(secondCol).as("second"),
      explode(sequence(lit(minGap), lit(maxGap))).as("gap"))
      .withColumn("join_key", col("second")("begin_tok") - col("gap"))
    outer.join(inner,
        outer("doc_id") === inner("doc_id2") &&
          outer("first")("end_tok") === inner("join_key"))
      .select(col("doc_id"), col("first"), col("second"))
  }

  /**
   * All pairs of overlapping spans (`overlap_join`, reference:
   * spanner/join.py:88-171). Blocking factor = ⌊mean span length⌋ over both
   * inputs (join.py:129-134, computed with one cheap agg action); each span
   * emits one row per covered block (explode of a sequence — no UDF);
   * equi-join on `(doc_id, block)`; exact `overlaps` residual filter;
   * duplicate pairs from multi-block spans removed by row-key dedup.
   */
  def overlapJoin(first: DataFrame, second: DataFrame,
      firstCol: String = "span", secondCol: String = "span",
      blockChars: Int = 0, distinctInputs: Boolean = false): DataFrame =
    blockedJoin(first, second, firstCol, secondCol,
      (a, b) => spans.overlaps(a, b), blockChars, distinctInputs)

  /**
   * All pairs where the first span contains the second (`contain_join`,
   * reference: spanner/join.py:174-203): overlap blocking + contains filter.
   */
  def containJoin(first: DataFrame, second: DataFrame,
      firstCol: String = "span", secondCol: String = "span",
      blockChars: Int = 0, distinctInputs: Boolean = false): DataFrame =
    blockedJoin(first, second, firstCol, secondCol,
      (a, b) => spans.overlaps(a, b) && spans.containsSpan(a, b), blockChars,
      distinctInputs)

  /** Default blocking factor (chars per block) when the caller doesn't pass
    * one: wide enough that typical token/phrase spans hit 1-2 blocks. The
    * result is identical for any factor (dedup + exact residual filter);
    * only the candidate-pair count changes. */
  val DefaultBlockChars = 32

  private def blockedJoin(first: DataFrame, second: DataFrame,
      firstCol: String, secondCol: String,
      residual: (Column, Column) => Column, blockChars: Int,
      distinctInputs: Boolean = false): DataFrame = {
    // Pre-aggregate each side to DISTINCT span values + multiplicities.
    // Multi-block duplicate pairs are then removed by a value-based
    // dropDuplicates, and input row multiplicity (the reference emits one
    // output pair per input ROW pair, spanner/join.py:155-158) is restored
    // at the end by exploding m1*m2 copies. Never key the dedup on
    // monotonically_increasing_id: m_i_i is nondeterministic across stage
    // retries and would silently corrupt the result under executor loss.
    // Callers whose inputs have no duplicate (doc_id, span) rows — the
    // common case for extracted span relations — pass distinctInputs=true
    // to skip the two pre-aggregation shuffles and the restore explode.
    val f =
      if (distinctInputs)
        first.select(col("doc_id"), col(firstCol).as("first"), lit(1L).as("__m1"))
      else first.select(col("doc_id"), col(firstCol).as("first"))
        .groupBy("doc_id", "first").agg(count(lit(1)).as("__m1"))
    val s =
      if (distinctInputs)
        second.select(col("doc_id").as("doc_id2"), col(secondCol).as("second"),
          lit(1L).as("__m2"))
      else second.select(col("doc_id").as("doc_id2"), col(secondCol).as("second"))
        .groupBy("doc_id2", "second").agg(count(lit(1)).as("__m2"))

    // Blocking factor: the reference derives ⌊mean span length⌋ with an
    // eager stats pass over both inputs (spanner/join.py:129-134). At scale
    // that is 2x input I/O per join call, so the default here is a fixed
    // factor; callers holding better stats (or a cached sample) pass their
    // own `blockChars`. Correctness never depends on the factor.
    val b = if (blockChars > 0) blockChars.toLong else DefaultBlockChars.toLong

    def blocks(df: DataFrame, c: String, blockName: String) = df.withColumn(blockName,
      explode(sequence(floor(col(c)("begin") / b).cast("long"),
        floor(col(c)("end") / b).cast("long"))))

    val fb = blocks(f, "first", "block1")
    val sb = blocks(s, "second", "block2")
    // residual filter BEFORE the dedup: the filter is a cheap codegen'd
    // expression on the joined row, and false candidates vastly outnumber
    // true pairs — filtering first shrinks the dropDuplicates shuffle to
    // the (much smaller) result set
    val pairs = fb
      .join(sb, col("doc_id") === col("doc_id2") && col("block1") === col("block2"))
      .filter(residual(col("first"), col("second")))
      .dropDuplicates("doc_id", "first", "second")
    val restored =
      if (distinctInputs) pairs
      else pairs.withColumn("__copy",
        explode(sequence(lit(1L), col("__m1") * col("__m2"))))
    restored.select(col("doc_id"), col("first"), col("second"))
  }

  /**
   * Shift every span of a span column from region-relative to
   * document-relative offsets (`unpack_semijoin`, reference:
   * spanner/join.py:206-244), given a column holding the region begin.
   */
  def unpackSemijoin(df: DataFrame, spanCol: String, offsetCol: String): DataFrame =
    df.withColumn(spanCol, spans.shift(col(spanCol), col(offsetCol)))
}
