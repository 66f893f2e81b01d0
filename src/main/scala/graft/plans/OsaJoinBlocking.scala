package graft.plans

import graft.functions.OsaDistance
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/**
 * Optimizer rule (SURVEY §4 "optionally a strategy to rewrite osa(a,b)<=k
 * joins"): a join whose ONLY usable predicate is a fuzzy-distance bound —
 *
 *   left.join(right, osa_distance(l, r) <= k)
 *
 * — has no equi keys, so Catalyst plans a BroadcastNestedLoopJoin /
 * CartesianProduct: every row pair evaluates the O(|l|*|r|) distance
 * kernel. This rule inserts the length-band blocking a user would have to
 * hand-build (FuzzyJoin.blockedFuzzyJoin): OSA distance >= |len(l) -
 * len(r)|, so pairs at distance <= k have lengths within k of each other,
 * and with band width k+1 their length bands differ by at most 1. The
 * left side keys on its band; the right side generates its band and both
 * neighbors; band equality becomes an equi-join key and the original
 * predicate re-verifies inside the block. Exact — the bound can only
 * discard pairs the predicate would reject — and each surviving pair
 * matches exactly one of the three distinct probe values, so no
 * duplicates are introduced.
 *
 * Fires only when no equi predicate already exists (the rewrite adds one,
 * which also keeps the rule from re-firing on its own output), and only
 * for join types that preserve no right-side rows (the probe generate
 * triples the right input, so RightOuter/FullOuter must keep the naive
 * plan).
 */
class OsaJoinBlocking extends Rule[LogicalPlan] with PredicateHelper {

  private val supported: Set[JoinType] =
    Set(Inner, Cross, LeftSemi, LeftAnti, LeftOuter)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, joinType, Some(cond), hint)
        if supported.contains(joinType) && left.resolved && right.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) ||
            (b.references.subsetOf(left.outputSet) &&
              a.references.subsetOf(right.outputSet))
        case _ => false
      }
      val bound = conjuncts.collectFirst {
        // osa(a,b) <= k / osa(a,b) < k, a from left and b from right (or
        // swapped — osa is symmetric, the band math only needs sides)
        case LessThanOrEqual(OsaDistance(a, b), Literal(k: Int, _))
            if sidesSplit(a, b, left, right) => (sideOf(a, b, left), k)
        case LessThan(OsaDistance(a, b), Literal(k: Int, _))
            if sidesSplit(a, b, left, right) => (sideOf(a, b, left), k - 1)
        case GreaterThanOrEqual(Literal(k: Int, _), OsaDistance(a, b))
            if sidesSplit(a, b, left, right) => (sideOf(a, b, left), k)
      }
      if (hasEqui || bound.isEmpty) j
      else {
        val ((lExpr, rExpr), k) = bound.get
        val w = Literal(math.max(1, k + 1).toLong, LongType)
        def band(e: Expression): Expression =
          IntegralDivide(Cast(Length(e), LongType), w)
        val bandL = Alias(band(lExpr), "__osa_band_l")()
        val leftP = Project(left.output :+ bandL, left)
        val rBand = band(rExpr)
        val probeAttr = AttributeReference("__osa_probe", LongType)()
        val probes = CreateArray(Seq(
          Subtract(rBand, Literal(1L)), rBand, Add(rBand, Literal(1L))))
        // outer generate: a null/empty probe array (null rExpr) yields a
        // null probe row instead of dropping the right row pre-join —
        // irrelevant for Inner (null never equi-matches) but keeps
        // LeftOuter's right-side multiset faithful
        val rightG = Generate(Explode(probes), unrequiredChildIndex = Nil,
          outer = true, qualifier = None,
          generatorOutput = Seq(probeAttr), child = right)
        val blocked = Join(leftP, rightG, joinType,
          Some(And(EqualTo(bandL.toAttribute, probeAttr), cond)), hint)
        // restore the original output (drops the helper columns; for
        // semi/anti this is the left output the join already emits)
        Project(j.output, blocked)
      }
  }

  private def sidesSplit(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) &&
      b.references.subsetOf(right.outputSet)) ||
      (a.references.subsetOf(right.outputSet) &&
        b.references.subsetOf(left.outputSet))

  private def sideOf(a: Expression, b: Expression,
      left: LogicalPlan): (Expression, Expression) =
    if (a.references.subsetOf(left.outputSet)) (a, b) else (b, a)
}
