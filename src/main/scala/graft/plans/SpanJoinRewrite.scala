package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/**
 * Optimizer rule: rewrite a naive span-OVERLAP theta-join into the blocked
 * equi-join that [[graft.operators.SpanJoin.overlapJoin]] builds by hand —
 * so a user who writes the natural declarative form,
 *
 * {{{ first.join(second, f("doc_id") === s("doc_id")
 *       && spans.overlaps(f("span"), s("span"))) }}}
 *
 * gets the scale-safe plan automatically. Without this rule Catalyst plans
 * the doc_id equality as the only join key and evaluates the overlap
 * predicate as a post-join residual — O(n·m) candidate work per document
 * (and a broadcast nested-loop join when there is no equality conjunct at
 * all). With it, both sides explode into ⌈len/B⌉ block ids and the join
 * gains a block equi-key, making candidates proportional to true overlap
 * density.
 *
 * Matched shape: the canonical expansion of [[graft.spans.overlaps]] —
 * `(b1 = b2 && e1 = e2) || !(b2 >= e1 || e2 <= b1)` — anywhere in the
 * conjunction of an inner join condition, with the `1` expressions
 * referring to one side and the `2` expressions to the other. All other
 * conjuncts (doc_id equality, extra filters) pass through untouched.
 *
 * The rewrite keeps EXACT multiset semantics with no dedup pass: a pair
 * sharing k blocks would match k times, so the join condition additionally
 * requires the block to be the pair's FIRST shared block,
 * `blk = greatest(b1 div B, b2 div B)` — which every overlapping pair has
 * (overlap implies b1 < e2 and b2 < e1, hence max(b1,b2) div B lies in
 * both block ranges; the equal-zero-length-span branch shares its begin
 * block), and has exactly once.
 *
 * Safety: fires only for resolved inner joins; re-application to its own
 * output is blocked by the generated `__graft_blk` attributes. Disable
 * with `spark.graft.spanJoinRewrite.enabled=false`; block width in chars
 * via `spark.graft.spanJoinRewrite.blockChars` (default 32 — correctness
 * never depends on it, only the candidate count does).
 */
object SpanJoinRewrite extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.spanJoinRewrite.enabled"
  val BlockCharsConf = "spark.graft.spanJoinRewrite.blockChars"
  private val BlkPrefix = "__graft_blk"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The tree `spans.overlaps` expands to, with the four leaf positions
    * captured: (b1, e1) from one input, (b2, e2) from the other. Matched
    * both as written — `... || !(b2 >= e1 || e2 <= b1)` — and in the form
    * BooleanSimplification (same fixed-point batch) normalizes it to:
    * `... || (b2 < e1 && e2 > b1)`. */
  private object OverlapShape {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression)] =
      e match {
        case Or(And(EqualTo(b1a, b2a), EqualTo(e1a, e2a)),
                Not(Or(GreaterThanOrEqual(b2b, e1b), LessThanOrEqual(e2b, b1b))))
            if b1a.semanticEquals(b1b) && b2a.semanticEquals(b2b) &&
               e1a.semanticEquals(e1b) && e2a.semanticEquals(e2b) =>
          Some((b1a, e1a, b2a, e2a))
        case Or(And(EqualTo(b1a, b2a), EqualTo(e1a, e2a)),
                And(LessThan(b2b, e1b), GreaterThan(e2b, b1b)))
            if b1a.semanticEquals(b1b) && b2a.semanticEquals(b2b) &&
               e1a.semanticEquals(e1b) && e2a.semanticEquals(e2b) =>
          Some((b1a, e1a, b2a, e2a))
        case _ => None
      }
  }

  private def refersOnlyTo(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(EnabledConf, "true").toBoolean) return plan
    val blockChars = SQLConf.get.getConfString(BlockCharsConf, "32").toLong

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved &&
            // don't re-match our own output (the overlap predicate stays
            // in the rewritten condition as the exact residual)
            !cond.references.exists(_.name.startsWith(BlkPrefix)) =>
        val found = conjuncts(cond).collectFirst {
          // accept the predicate with its sides in either input order
          case p @ OverlapShape(b1, e1, b2, e2)
              if refersOnlyTo(b1, left) && refersOnlyTo(e1, left) &&
                 refersOnlyTo(b2, right) && refersOnlyTo(e2, right) =>
            (p, b1, e1, b2, e2)
          case p @ OverlapShape(b1, e1, b2, e2)
              if refersOnlyTo(b1, right) && refersOnlyTo(e1, right) &&
                 refersOnlyTo(b2, left) && refersOnlyTo(e2, left) =>
            (p, b2, e2, b1, e1)
        }
        found match {
          case None => j
          case Some((_, lb, le, rb, re)) =>
            val b = Literal(blockChars, LongType)
            def div(x: Expression) = IntegralDivide(Cast(x, LongType), b)
            def explodeBlocks(child: LogicalPlan, begin: Expression, end: Expression,
                name: String): (LogicalPlan, Attribute) = {
              val attr = AttributeReference(name, LongType, nullable = false)()
              // timeZoneId must be set by hand: the analyzer's ResolveTimeZone
              // already ran, and a TimeZoneAwareExpression without it is
              // unresolved (plan validation rejects the rewrite)
              // Least/Greatest: Sequence with step 1 throws on start > stop,
              // so a malformed span (begin > end) — or a non-span predicate
              // that happens to match the overlap shape — would turn a
              // query that ran fine without the rule into a runtime error.
              // Widening to [min,max] is safe: the full original predicate
              // stays as the residual, and the first-shared-block condition
              // below still lands in both widened ranges exactly once for
              // every pair the naive join emits.
              val gen = Explode(new Sequence(
                div(Least(Seq(begin, end))), div(Greatest(Seq(begin, end))),
                Some(Literal(1L, LongType)),
                Some(SQLConf.get.sessionLocalTimeZone)))
              (Generate(gen, unrequiredChildIndex = Nil, outer = false,
                qualifier = None, generatorOutput = Seq(attr), child), attr)
            }
            val (lGen, lBlk) = explodeBlocks(left, lb, le, s"${BlkPrefix}_l")
            val (rGen, rBlk) = explodeBlocks(right, rb, re, s"${BlkPrefix}_r")
            val firstShared = EqualTo(lBlk, Greatest(Seq(div(lb), div(rb))))
            val newCond = And(And(cond, EqualTo(lBlk, rBlk)), firstShared)
            Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
        }
    }
  }
}
