package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Catalyst optimizer rule that rewrites an equi-key-LESS band join into
  * the binned equi-join shape of `operators/RangeJoin.binned` — the same
  * rewrite, but as an engine capability instead of an API the user must
  * know to call.
  *
  * A user writing the natural thing,
  *
  *   points.join(intervals, pt > lo && pt <= hi)
  *
  * gives Catalyst no equality to hash on, so the physical plan is
  * BroadcastNestedLoopJoin / CartesianProduct — O(|points| x |intervals|),
  * the 100 TB scale killer q73 documents. With
  * `spark.graft.rangeJoin.binWidth` set (> 0, in value-domain units), this
  * rule transforms the logical join:
  *
  *   - point side gains `bin = floor(pt / w)` (one bin per row);
  *   - interval side explodes to every bin its span touches
  *     (fan-out span/w + 1);
  *   - the join becomes `pBin = ivBin AND <original condition>` — an
  *     ordinary hash equi-join with the original predicate as residual,
  *     exactly the manual operator's pair set (a matching point lives in
  *     one bin; the interval's replica there is unique — no dedup).
  *
  * Scope is deliberately conservative (miss = the old plan, never a wrong
  * one): INNER joins only; the condition must contain a lower and an upper
  * bound on the SAME integral expression, each comparing one side to the
  * other; any equality conjunct between the sides means Catalyst can
  * already hash — untouched. Intervals must satisfy lo <= hi (rows with
  * lo > hi produce an empty bin list, matching the always-false residual).
  * The rule is self-stabilizing: its output join carries an equality
  * conjunct, so the fixed-point optimizer batch can't re-fire it.
  *
  * Bin arithmetic mirrors the manual operator: floor of a double division,
  * exact for |values| < 2^53 (the operator's documented domain).
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`); off by default — the width is a data-dependent
  * knob (binWidth ~ typical span keeps fan-out ~2), so it is surfaced as
  * session conf rather than guessed from absent stats.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width =
      try conf.getConfString(ConfKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, width).getOrElse(j)
    }
  }

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** floor(e / w) as a LONG — the manual operator's bin arithmetic. */
  private def binOf(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    // any equality between the sides -> Catalyst hashes already; skip
    // (also what stops this rule from re-firing on its own output)
    val crossEquality = conjuncts.exists {
      case EqualTo(a, b) => straddles(a, b, j)
      case EqualNullSafe(a, b) => straddles(a, b, j)
      case _ => false
    }
    if (crossEquality) return None

    // normalize each comparison to (pt, bound, isLower): pt > lo / lo < pt
    // are the same lower bound; inclusivity only matters to the residual,
    // which keeps the original conjuncts verbatim
    val bounds = conjuncts.flatMap {
      case GreaterThan(a, b) if straddles(a, b, j) =>
        Some((a, b, true)) // a > b: a is pt iff b is the lo bound
      case GreaterThanOrEqual(a, b) if straddles(a, b, j) => Some((a, b, true))
      case LessThan(a, b) if straddles(a, b, j) => Some((b, a, true))
      case LessThanOrEqual(a, b) if straddles(a, b, j) => Some((b, a, true))
      case _ => None
    }
    // candidate point expressions: appear as the greater side in one
    // conjunct (pt > lo) and the lesser side in another (pt < hi i.e.
    // hi > pt normalizes to (hi, pt, true))
    val candidates = for {
      (pt, lo, _) <- bounds
      (hi, pt2, _) <- bounds
      if pt.semanticEquals(pt2)
      if isIntegral(pt) && isIntegral(lo) && isIntegral(hi)
    } yield (pt, lo, hi)
    val (pt, lo, hi) = candidates.headOption.getOrElse(return None)

    // orientation: pt's refs live entirely in one child, lo/hi in the other
    val ptOnLeft = pt.references.subsetOf(j.left.outputSet)
    val (pSide, iSide) = if (ptOnLeft) (j.left, j.right) else (j.right, j.left)
    if (!pt.references.subsetOf(pSide.outputSet)) return None
    if (!(lo.references ++ hi.references).subsetOf(iSide.outputSet)) return None

    val ptBin = Alias(binOf(pt, width), "__graft_pt_bin")()
    val newP = Project(pSide.output :+ ptBin, pSide)

    val binLo = binOf(lo, width)
    val binHi = binOf(hi, width)
    // Greatest clamps a degenerate interval (lo > hi, which the residual
    // can never satisfy) to ONE emitted bin instead of an illegal
    // descending Sequence — harmless fan-out, never a wrong pair
    // Sequence is TimeZoneAware (resolved only with a tz, even for longs)
    val seq = Sequence(binLo, Greatest(Seq(binLo, binHi)), None,
      Some(conf.sessionLocalTimeZone))
    val ivBin = AttributeReference("__graft_iv_bin", LongType)()
    val newI = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(ivBin),
      child = iSide)

    val newCond = And(EqualTo(ptBin.toAttribute, ivBin), j.condition.get)
    val (newLeft, newRight) = if (ptOnLeft) (newP, newI) else (newI, newP)
    Some(Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint)))
  }

  /** True iff one expression's refs sit in one join child and the other's
    * in the other child (either orientation, both non-empty). */
  private def straddles(a: Expression, b: Expression, j: Join): Boolean = {
    val (ar, br) = (a.references, b.references)
    ar.nonEmpty && br.nonEmpty &&
      ((ar.subsetOf(j.left.outputSet) && br.subsetOf(j.right.outputSet)) ||
        (ar.subsetOf(j.right.outputSet) && br.subsetOf(j.left.outputSet)))
  }
}
