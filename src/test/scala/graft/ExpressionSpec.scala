package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PortableHash

/** Native PortableHash expression: codegen path, parity with the JVM char
  * kernel on ASCII, null propagation. */
class ExpressionSpec extends GraftSuite {

  test("PortableHash matches the char kernel and handles nulls") {
    import spark.implicits._
    val df = Seq("abc", "", "key agg row scan", null).toDF("s")
    val got = df.select(PortableHash(col("s")).as("h")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val expect = Seq("abc", "", "key agg row scan", null)
      .map(s => if (s == null) null else operators.TextAnalysis.hashString(s))
    assert(got.toSeq == expect)
    // reference value: ((97*31+98)*31+99) mod (2^31-1)
    assert(got(0) == 96354L)
  }

  test("portable_hash is registered as a SQL function via GraftExtensions") {
    val r = spark.sql("SELECT portable_hash('abc') AS h").head().getLong(0)
    assert(r == 96354L)
    assert(spark.sql("SELECT portable_hash(NULL) AS h").head().isNullAt(0))
  }

  test("PortableHash participates in whole-stage codegen") {
    // non-foldable source so the projection actually goes through codegen
    val df = spark.range(3)
      .select(PortableHash(concat(lit("x"), col("id"))).as("h"), col("id"))
    val codegenNode = df.queryExecution.executedPlan.find(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegenNode.isDefined)
    val got = df.collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(got(0L) == operators.TextAnalysis.hashString("x0"))
    assert(got(2L) == operators.TextAnalysis.hashString("x2"))
  }
}
