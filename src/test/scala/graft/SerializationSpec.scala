package graft

import org.apache.spark.sql.functions._

/**
 * Parquet round-trip of the engine's extension-typed columns — the
 * interchange layer (SURVEY §1.5). The reference serializes spans/tensors
 * via custom Arrow extension types (array/arrow_conversion.py); the
 * engine's span/token-span STRUCT columns and array<float> tensors are
 * plain Parquet types, so round-trip (and cross-engine readability — the
 * DuckDB oracle reads every Verify output) comes for free.
 */
class SerializationSpec extends GraftSuite {

  test("span / token-span / tensor columns round-trip parquet exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ser").toString
    val df = Seq(
      (0L, 0, 5, 0, 1, Seq(1.0f, 2.5f, -3.0f)),
      (1L, 3, 9, 1, 3, Seq(0.0f, -1.5f, 7.25f)))
      .toDF("doc_id", "b", "e", "bt", "et", "vec")
      .select(col("doc_id"),
        graft.spans.span(col("b"), col("e")).as("span"),
        graft.spans.tokenSpan(col("bt"), col("et"), col("b"), col("e")).as("tok_span"),
        col("vec"))
    df.write.mode("overwrite").parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    // parquet reads everything back nullable; names and types must match
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", ""))).toSeq
    assert(shape(back.schema) == shape(df.schema))
    val a = df.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = back.orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b)
    // null span (the reference's "not a span") survives as a null struct
    val withNull = df.withColumn("span",
      when(col("doc_id") === 1, col("span")))
    withNull.write.mode("overwrite").parquet(s"$dir/n")
    val nulls = spark.read.parquet(s"$dir/n")
      .filter(col("span").isNull).count()
    assert(nulls == 1)
  }

  test("tokens relation round-trips and re-joins with documents") {
    import spark.implicits._
    val docs = Seq((0L, "key agg row"), (1L, "slow fast")).toDF("doc_id", "text")
    val toks = operators.Tokenize.tokens(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_ser2").toString
    toks.write.mode("overwrite").parquet(s"$dir/toks")
    val back = spark.read.parquet(s"$dir/toks")
    val covered = back.join(docs.withColumnRenamed("text", "__t"), "doc_id")
      .select(graft.spans.coveredText(col("__t"), col("span")).as("c"), col("text"))
      .collect()
    assert(covered.forall(r => r.getString(0) == r.getString(1)))
  }
}
