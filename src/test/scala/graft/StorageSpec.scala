package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange
import graft.operators.Tokenize
import graft.sources.Storage

/** Bucketed storage: same-key joins between co-bucketed tables plan with
  * NO shuffle exchange — the claim behind the 100 TB co-location story,
  * asserted at the physical-plan level. */
class StorageSpec extends GraftSuite {
  import spark.implicits._

  test("co-bucketed doc_id join has no Exchange in the physical plan") {
    val docs = Seq((0L, "key agg row scan"), (1L, "slow fast join")).toDF("doc_id", "text")
    val toks = Tokenize.normalizedTokens(docs)
    val base = java.nio.file.Files.createTempDirectory("graft_bucketed")
    base.toFile.deleteOnExit()
    Storage.writeBucketed(toks.select("doc_id", "token_id", "text"),
      "toks_bucketed", s"$base/toks", buckets = 4)
    Storage.writeBucketed(docs, "docs_bucketed", s"$base/docs", buckets = 4)
    try {
      val t = Storage.readTable(spark, "toks_bucketed")
      val d = Storage.readTable(spark, "docs_bucketed")
      val joined = t.join(d, "doc_id")
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case e: Exchange => e }.isEmpty,
        s"expected exchange-free co-bucketed join, got:\n$plan")
      assert(joined.count() == 7) // 4 + 3 tokens, each with its doc row
    } finally {
      spark.sql("DROP TABLE IF EXISTS toks_bucketed")
      spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    }
  }
}
