package graft.plans

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LocalLimit, LogicalPlan, Sort}

import graft.sources.TxnManifest

/** Transparent materialized-view rewrite + graft-relation
  * substitution over PARSED (unresolved) query plans — the engine's
  * answer to Databricks' MV-based query acceleration, applied at the
  * two SQL entry points ([[GraftSql.execute]] and the injected
  * [[GraftSqlParser]]), before Spark's analyzer runs.
  *
  * Reference semantics: the reference's pipelines hand-point their
  * report queries at the summary tables they rebuild (the rollups
  * around `accounts.py`) — here the user keeps writing the aggregate
  * over the BASE table and the engine serves it from the view's
  * store when (and only when) that is result-identical.
  *
  * `accelerate` fires when the whole statement is
  * `[ORDER BY/LIMIT]? SELECT keys+aggs FROM t [WHERE ...] GROUP BY
  * keys` and some registered view over `t` is FRESH (its last
  * refresh consumed the source's current manifest version — a stale
  * view never serves, so results can never depend on refresh
  * recency). Matching is syntactic after parser normalization
  * (identifier case folded; both sides render through the same
  * Catalyst parser):
  *  - the view's WHERE conjuncts must all appear in the query's
  *    WHERE; leftover query conjuncts must reference only group
  *    keys and are re-applied ABOVE the serve (key predicates
  *    commute with grouping; Catalyst then pushes them back into
  *    the view-store scan, so bucket/stats pruning still applies);
  *  - query GROUP BY == view keys → a pure projection of the store;
  *  - query GROUP BY ⊂ view keys → ROLLUP: re-aggregate the stored
  *    exact accumulators at the coarser grain
  *    ([[GraftMvs.serve]]) — count/sum add, avg re-divides its
  *    (sum, n) pair, min/max re-extremize. count(DISTINCT) never
  *    rolls up (distinct doesn't compose across groups).
  *
  * At 100 TB this is the difference between a dashboard aggregate
  * re-scanning the fact table and a read of a few thousand summary
  * rows: the query text stays the same, the plan drops from
  * scan+shuffle+agg to a metadata-scale projection.
  *
  * `substitute` is the fallback for everything `accelerate` declines:
  * any remaining FROM reference to a registered materialized view
  * serves its current contents, and a single-part FROM reference to
  * a registered graft table that Spark itself cannot resolve (no
  * temp view, no catalog entry) resolves to the table's committed
  * read — so plain `SELECT ... FROM <registered table>` works in
  * `GraftSql` without a separate view registration step.
  */
object MvRewrite {

  /** The rewritten plan, or None when the statement is untouched
    * (caller falls through to vanilla execution). */
  def apply(spark: SparkSession, plan: LogicalPlan): Option[LogicalPlan] =
    accelerate(spark, plan).orElse(substitute(spark, plan))

  // ------------------------------------------------------- accelerate

  private def norm(s: String): String = s.toLowerCase(Locale.ROOT)

  /** Outer ORDER BY / LIMIT wrappers around the aggregate, kept and
    * re-attached around the serve (their unresolved column refs
    * re-resolve against the served output by name). `refs` is every
    * column name the wrappers mention — each must be an output alias
    * or the rewrite declines. */
  private final case class Outer(rewrap: LogicalPlan => LogicalPlan,
                                 refs: Seq[String], core: LogicalPlan)

  private def unwrapOuter(plan: LogicalPlan): Outer = plan match {
    case s @ Sort(order, true, child, _) =>
      val inner = unwrapOuter(child)
      val refs = order.flatMap(_.collect {
        case a: UnresolvedAttribute => a.nameParts.last })
      Outer(p => s.copy(child = inner.rewrap(p)), refs ++ inner.refs,
        inner.core)
    case g @ GlobalLimit(_, l: LocalLimit) =>
      val inner = unwrapOuter(l.child)
      Outer(p => g.copy(child = l.copy(child = inner.rewrap(p))),
        inner.refs, inner.core)
    case other => Outer(identity, Nil, other)
  }

  /** Case-folded canonical SQL of an unresolved predicate — the
    * match key for WHERE conjuncts. Identifier and function-name
    * case folds; literal case does NOT (both sides render through
    * the same parser, so equal text ⇒ equal semantics). */
  private def canonSql(e: Expression): String = e.transform {
    case a: UnresolvedAttribute =>
      UnresolvedAttribute(a.nameParts.map(norm))
    case f: UnresolvedFunction =>
      f.copy(nameParts = f.nameParts.map(norm))
  }.sql

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  private def accelerate(spark: SparkSession,
                         plan: LogicalPlan): Option[LogicalPlan] = {
    val outer = unwrapOuter(plan)
    val agg = outer.core match {
      case a: Aggregate => a
      // a global aggregate (`SELECT count(*) FROM t`, no GROUP BY)
      // parses as Project — the analyzer's GlobalAggregates turn;
      // model it as an empty-key Aggregate (non-aggregate items then
      // fail the key check below and the whole rewrite declines)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        Aggregate(Nil, p.projectList, p.child)
      case _ => return None
    }
    val (srcName, qWhere) = agg.child match {
      case UnresolvedRelation(parts, _, _) => (parts.mkString("."), None)
      case Filter(c, UnresolvedRelation(parts, _, _)) =>
        (parts.mkString("."), Some(c))
      case _ => return None
    }
    // a single-part name Spark itself resolves is a temp view — it
    // shadows the registered graft table, so the view must not serve
    if (!srcName.contains('.') &&
        (try spark.catalog.tableExists(srcName)
         catch { case scala.util.control.NonFatal(_) => false }))
      return None
    // plain-column GROUP BY only (matching the CREATE surface)
    val qKeys: Seq[String] = agg.groupingExpressions.map {
      case a: UnresolvedAttribute => norm(a.nameParts.last)
      case _                      => return None
    }
    // SELECT items, in order, under the query's aliases
    val items: Seq[GraftMvs.ServeItem] = agg.aggregateExpressions.map {
      case a: UnresolvedAttribute =>
        val k = norm(a.nameParts.last)
        if (!qKeys.contains(k)) return None // not grouped: invalid SQL, decline
        GraftMvs.ServeKey(k, a.nameParts.last)
      case Alias(a: UnresolvedAttribute, n) =>
        val k = norm(a.nameParts.last)
        if (!qKeys.contains(k)) return None
        GraftMvs.ServeKey(k, n)
      case Alias(f: UnresolvedFunction, n) =>
        scala.util.Try(GraftMvs.parseAgg(f, n)).getOrElse(return None) match {
          case spec => GraftMvs.ServeAgg(spec, n)
        }
      case _ => return None
    }
    val aliases = items.map(i => norm(i.alias))
    if (aliases.distinct.size != aliases.size) return None
    if (!outer.refs.forall(r => aliases.contains(norm(r)))) return None

    val qConj = qWhere.toSeq.flatMap(conjuncts)
    val qConjSql = qConj.map(canonSql)

    GraftMvs.allViews.iterator.flatMap { mvName =>
      serveFrom(spark, mvName, srcName, qKeys, items, qConj, qConjSql)
    }.nextOption().map { served =>
      outer.rewrap(served)
    }
  }

  /** Try one candidate view; Some(served logical plan) when it
    * matches and is fresh. */
  private def serveFrom(spark: SparkSession, mvName: String,
                        srcName: String, qKeys: Seq[String],
                        items: Seq[GraftMvs.ServeItem],
                        qConj: Seq[Expression],
                        qConjSql: Seq[String]): Option[LogicalPlan] = {
    val d = GraftMvs.freshFor(spark, mvName) match {
      case Some(d0) if norm(d0.src) == norm(srcName) &&
          d0.src2.isEmpty => d0 // join views serve only join queries
      case _ => return None
    }
    val mvKeys = d.groupKeys.map(norm)
    if (!qKeys.forall(mvKeys.contains)) return None
    val rollup = !(mvKeys.forall(qKeys.contains)) // strict-subset grain
    // the view's WHERE conjuncts must all be present in the query's
    val mvConjSql = d.where.toSeq
      .flatMap(w => conjuncts(CatalystSqlParser.parseExpression(w)))
      .map(canonSql)
    if (!mvConjSql.forall(qConjSql.contains)) return None
    // leftover query conjuncts: group-key-only predicates, re-applied
    // above the serve
    val residual = qConj.zip(qConjSql).collect {
      case (e, sql) if !mvConjSql.contains(sql) => e
    }
    val residualOk = residual.forall { e =>
      !e.exists(_.isInstanceOf[SubqueryExpression]) &&
        e.collect { case a: UnresolvedAttribute => norm(a.nameParts.last) }
          .forall(qKeys.contains)
    }
    if (!residualOk) return None
    // every selected aggregate must be stored by the view (and
    // roll-up-able when the query grain is coarser)
    val matched = items.forall {
      case GraftMvs.ServeAgg(spec, _) =>
        d.aggs.exists(m => m.func == spec.func &&
          m.arg.map(norm) == spec.arg.map(norm)) &&
          (!rollup || GraftMvs.rollupable(spec))
      case _ => true
    }
    if (!matched) return None
    // rebind each item's agg to the view's stored output name
    val bound = items.map {
      case GraftMvs.ServeAgg(spec, al) =>
        val m = d.aggs.find(m => m.func == spec.func &&
          m.arg.map(norm) == spec.arg.map(norm)).get
        GraftMvs.ServeAgg(m, al)
      case k => k
    }
    val served = GraftMvs.serve(spark, mvName, rollup, qKeys, bound)
      .queryExecution.logical
    Some(residual.foldLeft(served)((p, e) => Filter(e, p)))
  }

  // ------------------------------------------------------- substitute

  /** Replace FROM references the vanilla session could not serve:
    * registered materialized views (any reference) and single-part
    * registered graft tables Spark itself cannot resolve. None when
    * nothing changed. */
  private def substitute(spark: SparkSession,
                         plan: LogicalPlan): Option[LogicalPlan] = {
    var changed = false
    val out = plan.transformUp {
      case u @ UnresolvedRelation(parts, _, _) =>
        relationPlan(spark, parts) match {
          case Some(rep) => changed = true; rep
          case None      => u
        }
    }
    if (changed) Some(out) else None
  }

  private def relationPlan(spark: SparkSession,
                           parts: Seq[String]): Option[LogicalPlan] = {
    val joined = parts.mkString(".")
    if (GraftMvs.lookup(joined).isDefined)
      return Some(GraftMvs.read(spark, joined).queryExecution.logical)
    if (parts.length != 1) return None // multi-part names resolve via catalogs
    GraftSqlTables.lookup(parts).flatMap { entry =>
      val sparkResolves =
        try spark.catalog.tableExists(parts.head)
        catch { case scala.util.control.NonFatal(_) => false }
      if (sparkResolves) None // temp views / catalog tables win, as before
      else Some(tableFrame(spark, entry).queryExecution.logical)
    }
  }

  /** Committed-snapshot read of a registered table, serving LOGICAL
    * column names for mapped tables (the DSv2 reader applies the
    * schema log) and the declared-schema overlay for plain ones
    * ([[GraftDml.committedRead]] — also the clone-union path). */
  private def tableFrame(spark: SparkSession,
                         entry: GraftSqlTables.Entry)
    : org.apache.spark.sql.DataFrame =
    if (entry.isClone || entry.schemaLogPath.isEmpty)
      GraftDml.committedRead(spark, entry, new TxnManifest(entry.manifestPath))
    else {
      var r = spark.read.format("graft-manifest")
        .option("manifest", entry.manifestPath)
      entry.schemaLogPath.foreach(p => r = r.option("schemaLog", p))
      r.load(entry.root)
    }
}
