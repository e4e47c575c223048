package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for joins on pathological key distributions.
 *
 * At sf-bench scales AQE's runtime skew-join split handles sort-merge
 * skew on its own; explicit salting remains the tool when (a) AQE is off
 * or the join is a shuffled hash join its splitter doesn't cover, or
 * (b) a handful of keys are so hot (boilerplate/empty-text documents at
 * 100 TB) that even a split partition won't fit an executor.
 *
 * Shape: the LARGE side gets a deterministic per-row salt derived from
 * hashing its non-key columns (no RNG — retries and replays land on the
 * same salt); the SMALL side replicates once per salt value. The join key
 * becomes (key, salt), splitting each hot key's rows across `saltN`
 * reducers. Result set is row-identical to the unsalted join.
 */
object Skew {

  /**
   * Inner equi-join of `large ⋈ small` on `key`, salted `saltN` ways.
   * Column sets must be disjoint apart from `key` (standard join shape).
   */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltN: Int = 16): DataFrame = {
    require(saltN > 0, "saltN must be positive")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename the existing column first")
    val nonKey = large.columns.toIndexedSeq.filter(_ != key).map(col)
    require(nonKey.nonEmpty,
      s"saltedJoin needs at least one non-key column on the large side to derive a " +
        s"deterministic salt; '$key' is its only column (salting pure keys cannot " +
        s"spread a hot key's identical rows)")
    // deterministic salt: hash of the row's other columns — identical
    // inputs co-locate, but hot KEYS still spread (their rows differ)
    val salted = large.withColumn("__salt", pmod(hash(nonKey: _*), lit(saltN)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
