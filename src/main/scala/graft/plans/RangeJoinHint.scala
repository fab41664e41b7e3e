package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule

/** Per-join bin width for the interval-join rewrite — the
  * Databricks-style `RANGE_JOIN` hint surface.
  *
  * `spark.graft.rangeJoin.binWidth` is one GLOBAL knob: two interval
  * joins at different time scales in one query would share a width and
  * mis-bin one of them (correct but slow — the exact predicate still
  * filters). The hint scopes the width to a single join:
  *
  *   - SQL: `SELECT ... FROM a JOIN b ON ...` with a `RANGE_JOIN(3600)` hint comment
  *   - DataFrame: `a.join(b, cond).hint("range_join", 3600L)`
  *
  * This must be an ANALYZER rule (`injectResolutionRule`): hint names
  * Spark doesn't recognize are warned about and stripped by
  * `ResolveHints.RemoveAllHints` before the optimizer ever runs, so an
  * optimizer-time rule would never see the hint. The rule consumes the
  * hint node and rewrites the nearest qualifying join BELOW it via
  * [[RangeJoinRewrite.rewrite]] with the hinted width; the global-conf
  * optimizer rule then skips that join (it now has an equi-key), so
  * hinted and conf-driven joins compose in one plan, each at its own
  * width.
  */
object RangeJoinHint extends Rule[LogicalPlan] {

  val HintName = "RANGE_JOIN"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case h @ UnresolvedHint(name, args, child) if name.equalsIgnoreCase(HintName) =>
      if (!child.resolved) h // wait for the fixed point to resolve the child
      else {
        val w = width(args)
        var applied = false
        val rewritten = child.transformDown {
          case j: Join if !applied =>
            RangeJoinRewrite.rewrite(j, w) match {
              case Some(p) => applied = true; p
              case None    => j
            }
        }
        if (!applied) logWarning(
          s"$HintName($w) hint matched no interval-containment join " +
            "below it (equi-keyed, non-inner, or non-integral bounds) — ignored")
        rewritten
      }
  }

  /** Hint argument → bin width. `df.hint` ships raw Scala values; SQL
    * hints ship `Literal`s — accept both, reject everything else by
    * name (a silent default here would mis-bin quietly). */
  private def width(args: Seq[Any]): Long = args match {
    case Seq(one) =>
      val v = one match {
        case Literal(x, _) => x
        case x             => x
      }
      v match {
        case i: Int   => i.toLong
        case l: Long  => l
        case s: Short => s.toLong
        case b: Byte  => b.toLong
        case other => throw new IllegalArgumentException(
          s"$HintName(binWidth) needs one integral bin width, got: $other")
      }
    case other => throw new IllegalArgumentException(
      s"$HintName takes exactly one bin-width argument, got ${other.length}")
  }
}
