package graft

import org.apache.spark.sql.functions._

/** The bench pre-compiler must be safe to aim at any plan (including
  * non-codegen subtrees) and must actually drain its pool. */
class CodegenWarmerSpec extends GraftSuite {
  import spark.implicits._

  test("warm compiles a plan's codegen stages and tolerates odd plans") {
    val df = (0L until 100L).map(i => (i, s"text $i")).toDF("id", "t")
      .filter(col("id") % 2 === 0)
      .groupBy((col("id") % 10).as("k")).agg(count(lit(1)).as("n"))
    org.apache.spark.sql.graft.CodegenWarmer.warm(df) // must not throw
    // warmed plan still executes correctly
    assert(df.collect().map(_.getLong(1)).sum == 50L)
    // a plan with a UDF/object agg (no whole-stage codegen at the top)
    val tk = operators.TextAnalysis.topKByScore(2)
    val odd = (0L until 20L).map(i => (i % 3, i.toDouble, i)).toDF("g", "s", "id")
      .groupBy("g").agg(tk(col("s"), col("id")))
    org.apache.spark.sql.graft.CodegenWarmer.warm(odd) // must not throw
  }

  test("warmAllInBackground drains and never blocks the caller") {
    val mks: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "a" -> (() => spark.range(10).selectExpr("sum(id) as s")),
      "boom" -> (() => throw new RuntimeException("constructor failure")),
      "b" -> (() => spark.range(10).filter(col("id") > 3).toDF()))
    val t0 = System.nanoTime()
    val pool = org.apache.spark.sql.graft.CodegenWarmer
      .warmAllInBackground(mks, threads = 2)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "launch must be non-blocking")
    assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS),
      "pool must drain (failures swallowed per-task)")
  }
}
