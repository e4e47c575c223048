package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: registers the engine's native
 * Catalyst expressions as SQL functions, so SQL-surface users get them
 * without the Scala DSL:
 *
 * {{{
 *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
 *   spark.sql("SELECT portable_hash(text) FROM documents")
 * }}}
 *
 * (Also usable via spark.sql.extensions=graft.GraftExtensions.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("portable_hash"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.PortableHash].getName,
        "portable_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "portable_hash takes exactly one argument")
        org.apache.spark.sql.graft.PortableHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.CosineSim].getName,
        "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly two arguments")
        org.apache.spark.sql.graft.CosineSim(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("tokenize"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.TokenizeGenerator].getName,
        "tokenize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "tokenize takes exactly one argument")
        org.apache.spark.sql.graft.TokenizeGenerator(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("regex_matches"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.RegexMatchGenerator].getName,
        "regex_matches"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "regex_matches takes (text, pattern)")
        org.apache.spark.sql.graft.RegexMatchGenerator(children.head, children(1))
      }))
    // auto-rewrite naive span-overlap theta-joins into blocked equi-joins
    ext.injectOptimizerRule(_ => graft.plans.SpanJoinRewrite)
  }
}
