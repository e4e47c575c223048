// Bridge package: see PortableHash.scala — Column↔Expression construction
// requires sql-package access in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, RuntimeReplaceable, UnaryExpression, With}
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column-level common-subexpression binding via Catalyst's `With`
 * expression (round-22): `Cse.bind(col) { ref => body }` guarantees `col`
 * is evaluated ONCE per row wherever the composite lands — the optimizer's
 * `RewriteWithExpression` rule hoists the common expression into a
 * Project below the consumer, so a Filter predicate built from many
 * fields of one expensive struct no longer re-evaluates the struct per
 * field reference.
 *
 * Why it matters here: whole-stage codegen does subexpression elimination
 * inside ProjectExec but NOT inside FilterExec — a predicate like
 * `qualityScore(text) >= 0.3`, whose tree holds ~9 copies of the fused
 * QualityStatsExpr, evaluates the full text scan ~9 times per row once
 * the expression participates in codegen. (The round-21 CodegenFallback
 * form happened to dodge this because the fallback Project/Filter ran
 * through generated UnsafeProjection/Predicate paths that DO eliminate
 * common subexpressions — measured in round 22: q69 0.37→0.77 s on the
 * naive codegen switch, restored by this binding.)
 */
object Cse {

  /** Bind `c` once; `f` receives a Column reference to it.
    *
    * `With` cannot be CONSTRUCTED over an unresolved child (its nullable
    * is consulted mid-analysis), so the binding is deferred through a
    * [[BindOnce]] RuntimeReplaceable: the analyzer resolves the child
    * first, then the standard ReplaceExpressions/RewriteWithExpression
    * rules expand the With into a hoisted Project — single evaluation
    * wherever the composite lands, Filter predicates included. */
  def bind(c: Column)(f: Column => Column): Column =
    ExpressionUtils.column(BindOnce(ExpressionUtils.expression(c),
      e => ExpressionUtils.expression(f(ExpressionUtils.column(e)))))

  /** Expression-level escape hatch for tests/diagnostics. */
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}

/** RuntimeReplaceable carrier for [[Cse.bind]]: `replacement` (accessed
  * only once the child is resolved) is the real `With` tree. The body
  * builder rides along as a constructor param — two BindOnce instances
  * never compare equal through it, which only costs a missed
  * expression-level CSE of the WRAPPER itself (the wrapped common
  * expression is exactly what the With dedups). */
case class BindOnce(child: Expression, body: Expression => Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression =
    With(child) { case Seq(ref) => body(ref) }

  override protected def withNewChildInternal(newChild: Expression): BindOnce =
    copy(child = newChild)
}
