package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite equi-key-less interval-containment joins
  * into the binned form of [[graft.ops.RangeJoin]] automatically.
  *
  * A join whose only cross-side predicates are `p >= s AND p < e`
  * (any orientation, strict or inclusive upper bound) has no equi-key,
  * so Spark plans a nested-loop product — O(N·M) comparisons and a
  * broadcast requirement on one whole side. This rule gives both
  * sides a synthetic equi-key (the fixed-width bin of the point / of
  * every bin an interval overlaps) so the planner picks a hash or
  * sort-merge join; the original predicate stays in the join
  * condition, filtering inside buckets. Same rewrite Databricks
  * exposes as the RANGE_JOIN bin-size hint.
  *
  * Activation: set `spark.graft.rangeJoin.binWidth` to a positive
  * long (in the point column's units; pick ≈ the typical interval
  * length). Unset/0 disables the rule — bin width is a physical
  * tuning knob the engine cannot infer without interval statistics,
  * so it is opt-in, like the Databricks hint. Per-join widths (two
  * interval joins at different time scales in one query) go through
  * the [[RangeJoinHint]] `RANGE_JOIN(w)` hint, which wins
  * over this conf for the join it wraps. Applies only to INNER
  * joins whose bound columns are integral (epoch-quantized time goes
  * through `unix_micros` first, like everything oracle-matched in
  * this repo); rows with NULL in point or bounds match nothing under
  * both the original and rewritten plans (NULL comparisons are false,
  * NULL sequence bounds explode to zero rows).
  *
  * Register per-session via `spark.experimental.extraOptimizations`
  * or for all sessions via [[GraftExtensions]] (`injectOptimizerRule`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthConf = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(BinWidthConf, "0")
    // a malformed conf must name itself, not surface as a bare
    // NumberFormatException from inside the optimizer
    val w = try raw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$BinWidthConf must be a positive long (bin width in point units), got '$raw'")
    }
    if (w <= 0) plan
    else plan.transformUp {
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        rewrite(j, w).getOrElse(j)
    }
  }

  /** One cross-side bound: `point <op> bound`, normalized so `point`
    * references only `pointSide` and `bound` only the other side. */
  private case class Bound(point: Expression, bound: Expression)

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  private def usable(e: Expression): Boolean =
    e.deterministic && (e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })

  private[plans] def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    // a cross-side equality means the planner already has a hash key —
    // nothing to gain, and re-matching our own output must not loop
    def crossSide(a: Expression, b: Expression): Boolean =
      (for (sa <- sideOf(a, j.left, j.right); sb <- sideOf(b, j.left, j.right))
        yield sa != sb).getOrElse(false)
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b)       => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
    if (hasEquiKey) return None

    // normalize every comparison into point-side-relative bounds
    def boundsFor(pointOnLeft: Boolean): (Seq[Bound], Seq[(Bound, Boolean)]) = {
      def classify(a: Expression, b: Expression): Option[(Expression, Expression)] =
        for {
          sa <- sideOf(a, j.left, j.right); sb <- sideOf(b, j.left, j.right)
          if sa != sb && sa == pointOnLeft && usable(a) && usable(b)
        } yield (a, b)
      val lowers = conjuncts.flatMap {
        case GreaterThanOrEqual(a, b) => classify(a, b).map(Bound.tupled)    // p >= s
        case LessThanOrEqual(a, b)    => classify(b, a).map(Bound.tupled)    // s <= p
        case _ => None
      }
      val uppers = conjuncts.flatMap {
        case LessThan(a, b)           => classify(a, b).map(x => Bound.tupled(x) -> true)  // p <  e
        case GreaterThan(a, b)        => classify(b, a).map(x => Bound.tupled(x) -> true)  // e >  p
        case LessThanOrEqual(a, b)    => classify(a, b).map(x => Bound.tupled(x) -> false) // p <= e
        case GreaterThanOrEqual(a, b) => classify(b, a).map(x => Bound.tupled(x) -> false) // e >= p
        case _ => None
      }
      (lowers, uppers)
    }

    def tryOrientation(pointOnLeft: Boolean): Option[LogicalPlan] = {
      val (lowers, uppers) = boundsFor(pointOnLeft)
      val matched = (for {
        lo <- lowers; (up, strict) <- uppers
        if lo.point.semanticEquals(up.point)
      } yield (lo, up, strict)).headOption
      matched.map { case (lo, up, strict) =>
        build(j, w, pointOnLeft, lo.point, lo.bound, up.bound, strict)
      }
    }

    tryOrientation(pointOnLeft = true).orElse(tryOrientation(pointOnLeft = false))
  }

  /** `floor(x / w)` in exact long arithmetic (sign-correct for
    * negative epochs, no double rounding). */
  private def binOf(x: Expression, w: Long): Expression = {
    val xl = Cast(x, LongType)
    IntegralDivide(Subtract(xl, Pmod(xl, Literal(w))), Literal(w))
  }

  private def build(j: Join, w: Long, pointOnLeft: Boolean,
                    point: Expression, lower: Expression, upper: Expression,
                    upperStrict: Boolean): LogicalPlan = {
    val (pointPlan, intervalPlan) =
      if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

    val binP = Alias(binOf(point, w), "__graft_bin_p")()
    val newPointPlan = Project(pointPlan.output :+ binP, pointPlan)

    val upperEdge =
      if (upperStrict) Subtract(Cast(upper, LongType), Literal(1L))
      else Cast(upper, LongType)
    val seq = new Sequence(binOf(lower, w), binOf(upperEdge, w), None,
      Some(conf.sessionLocalTimeZone))
    val binI = AttributeReference("__graft_bin_i", LongType, nullable = false)()
    // empty/inverted intervals match nothing; dropping them here keeps
    // the (descending!) sequence from fabricating bins for them
    val nonEmpty = Filter(
      if (upperStrict) GreaterThan(upper, lower)
      else GreaterThanOrEqual(upper, lower), intervalPlan)
    val newIntervalPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binI), nonEmpty)

    val (newLeft, newRight) =
      if (pointOnLeft) (newPointPlan, newIntervalPlan)
      else (newIntervalPlan, newPointPlan)
    val newCond = And(EqualTo(binP.toAttribute, binI), j.condition.get)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
