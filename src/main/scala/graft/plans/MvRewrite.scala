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
  * `[ORDER BY/LIMIT]? SELECT keys+aggs FROM t [JOIN t2 ON ...]
  * [WHERE ...] GROUP BY keys [HAVING <over output aliases>]` and
  * some registered view over the same
  * FROM is FRESH (its last refresh consumed every source's current
  * manifest version — a stale view never serves, so results can
  * never depend on refresh recency). The join form serves star
  * queries that KEEP their join text: the table pair and the ON
  * equality pairs must equal the view's (inner joins commute, so the
  * written order is free); qualifiers resolve through the same
  * [[GraftMvs.SideResolver]] CREATE used, so `f.qty` in the query
  * matches the stored `qty`. Matching is syntactic after parser
  * normalization (identifier case folded; both sides render through
  * the same Catalyst parser):
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
    * or the rewrite declines. `ok=false` declines outright: a sort
    * expression containing a FUNCTION call (`ORDER BY count(*)`)
    * resolves against the aggregate in vanilla execution but would
    * re-aggregate — or fail analysis — above the serve. */
  private final case class Outer(rewrap: LogicalPlan => LogicalPlan,
                                 refs: Seq[String], core: LogicalPlan,
                                 ok: Boolean = true)

  private def unwrapOuter(plan: LogicalPlan): Outer = plan match {
    case s @ Sort(order, true, child, _) =>
      val inner = unwrapOuter(child)
      val refs = order.flatMap(_.collect {
        case a: UnresolvedAttribute => a.nameParts.last })
      val plain = order.forall(o => !o.child.exists(e =>
        e.isInstanceOf[UnresolvedFunction] ||
          e.isInstanceOf[SubqueryExpression]))
      Outer(p => s.copy(child = inner.rewrap(p)), refs ++ inner.refs,
        inner.core, plain && inner.ok)
    case g @ GlobalLimit(_, l: LocalLimit) =>
      val inner = unwrapOuter(l.child)
      Outer(p => g.copy(child = l.copy(child = inner.rewrap(p))),
        inner.refs, inner.core, inner.ok)
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

  /** One FROM relation of the query, with the qualifiers that may
    * address it. */
  private final case class QRel(name: String, quals: Seq[String])

  private def qrel(p: LogicalPlan): Option[QRel] = {
    import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
    p match {
      case UnresolvedRelation(parts, _, _) =>
        Some(QRel(parts.mkString("."), Seq(norm(parts.last))))
      case SubqueryAlias(id, UnresolvedRelation(parts, _, _)) =>
        Some(QRel(parts.mkString("."), Seq(norm(id.name))))
      case _ => None
    }
  }

  private def accelerate(spark: SparkSession,
                         plan: LogicalPlan): Option[LogicalPlan] = {
    val outer = unwrapOuter(plan)
    if (!outer.ok) return None
    // HAVING filters AFTER aggregation — exactly a Filter above the
    // serve, provided it references only output aliases (an agg call
    // inside HAVING would need its own view matching: decline)
    val (qHaving, core) = outer.core match {
      case org.apache.spark.sql.catalyst.analysis
          .UnresolvedHaving(c, a: Aggregate) => (Some(c), a)
      case other => (None, other)
    }
    val agg = core match {
      case a: Aggregate => a
      // a global aggregate (`SELECT count(*) FROM t`, no GROUP BY)
      // parses as Project — the analyzer's GlobalAggregates turn;
      // model it as an empty-key Aggregate (non-aggregate items then
      // fail the key check below and the whole rewrite declines)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        Aggregate(Nil, p.projectList, p.child)
      case _ => return None
    }
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val (qWhere, fromPlan) = agg.child match {
      case Filter(c, ch) => (Some(c), ch)
      case ch            => (None, ch)
    }
    // FROM shape: one registered table, or fact INNER JOIN dim — the
    // same surface CREATE accepts. strip() resolves a column
    // reference to its stored (unqualified) name, or None = decline.
    val (srcName, src2Name, strip, stripExpr):
      (String, Option[String], Seq[String] => Option[String],
        Expression => Option[Expression]) = fromPlan match {
      case p if qrel(p).isDefined =>
        val r = qrel(p).get
        val st: Seq[String] => Option[String] = {
          case Seq(c)                                  => Some(c)
          case Seq(q, c) if r.quals.contains(norm(q)) => Some(c)
          case _                                       => None
        }
        val se: Expression => Option[Expression] = e => {
          var ok = true
          val out = e.transform {
            case a: UnresolvedAttribute =>
              st(a.nameParts) match {
                case Some(c) => UnresolvedAttribute(Seq(c))
                case None    => ok = false; a
              }
          }
          if (ok) Some(out) else None
        }
        (r.name, None, st, se)
      case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner,
          Some(cond), _) if qrel(l).isDefined && qrel(r).isDefined =>
        joinResolution(spark, qrel(l).get, qrel(r).get, cond) match {
          case Some(jr) => jr
          case None     => return None
        }
      case _ => return None
    }
    // a single-part name Spark itself resolves is a temp view — it
    // shadows the registered graft table, so the view must not serve
    def shadowed(n: String): Boolean = !n.contains('.') &&
      (try spark.catalog.tableExists(n)
       catch { case scala.util.control.NonFatal(_) => false })
    if (shadowed(srcName) || src2Name.exists(shadowed)) return None
    // GROUP BY: a plain/aliased column (Left of its stripped name) or
    // a computed-key expression (Right of its canonical SQL) — bound
    // to a concrete view's keys per candidate in serveFrom
    val qGroup: Seq[Either[String, String]] = agg.groupingExpressions.map {
      case a: UnresolvedAttribute =>
        strip(a.nameParts) match {
          case Some(c) => Left(norm(c))
          case None    => return None
        }
      case e => stripExpr(e) match {
        case Some(se) => Right(canonSql(se))
        case None     => return None
      }
    }
    // SELECT items, in order, under the query's aliases; key
    // membership is validated per-view in serveFrom (an alias-named
    // GROUP BY binds through the item)
    val items: Seq[GraftMvs.ServeItem] = agg.aggregateExpressions.map {
      case a: UnresolvedAttribute =>
        val k = strip(a.nameParts).map(norm).getOrElse(return None)
        GraftMvs.ServeKey(k, a.nameParts.last)
      case Alias(a: UnresolvedAttribute, n) =>
        val k = strip(a.nameParts).map(norm).getOrElse(return None)
        GraftMvs.ServeKey(k, n)
      case Alias(f: UnresolvedFunction, n)
          if scala.util.Try(GraftMvs.parseAgg(f, n)).isSuccess =>
        val spec = GraftMvs.parseAgg(f, n)
        val stripped = spec.arg match {
          case Some(arg) =>
            strip(arg.split('.').toSeq) match {
              case Some(c) => spec.copy(arg = Some(c))
              case None    => return None
            }
          case None => spec
        }
        GraftMvs.ServeAgg(stripped, n)
      case Alias(e, n) => // computed-key select item
        stripExpr(e) match {
          case Some(se) => GraftMvs.ServeKeyExpr(canonSql(se), n)
          case None     => return None
        }
      case _ => return None
    }
    val aliases = items.map(i => norm(i.alias))
    if (aliases.distinct.size != aliases.size) return None
    if (!outer.refs.forall(r => aliases.contains(norm(r)))) return None
    val havingOk = qHaving.forall { h =>
      !h.exists(e => e.isInstanceOf[SubqueryExpression] ||
        e.isInstanceOf[UnresolvedFunction]) &&
        h.collect { case a: UnresolvedAttribute => a.nameParts }
          .forall(p => p.length == 1 && aliases.contains(norm(p.head)))
    }
    if (!havingOk) return None

    // WHERE conjuncts, qualifier-stripped so they compare (and
    // re-apply) against the view's stored names
    val qConj = qWhere.toSeq.flatMap(conjuncts)
      .map(e => stripExpr(e).getOrElse(return None))
    val qConjSql = qConj.map(canonSql)
    val joinKey = (norm(srcName), src2Name.map(norm))

    GraftMvs.allViews.iterator.flatMap { mvName =>
      serveFrom(spark, mvName, joinKey, qGroup, items, qConj, qConjSql)
    }.nextOption().map { served =>
      outer.rewrap(qHaving.foldLeft(served)((p, c) => Filter(c, p)))
    }
  }


  /** Resolve the join-query FROM: orientation against some candidate
    * view is NOT decided here — the fact side is whichever relation a
    * view's `src` names; this just builds the strip functions from
    * the two schemas and validates the ON shape. Returns None when
    * the sides don't resolve (unknown table, ambiguous column, non-
    * equi ON) — the rewrite then declines. */
  private def joinResolution(spark: SparkSession, l: QRel, r: QRel,
                             cond: Expression)
    : Option[(String, Option[String],
        Seq[String] => Option[String], Expression => Option[Expression])] = {
    // both relations must be registered graft tables (snapshot
    // schemas come from their committed reads)
    def entryOf(n: String) = GraftSqlTables.lookup(n.split('.').toSeq)
    val (el, er) = (entryOf(l.name), entryOf(r.name))
    if (el.isEmpty || er.isEmpty) return None
    if (norm(l.name) == norm(r.name)) return None // self-join: no view exists
    // any join view over this table PAIR? (cheap gate before schema IO)
    val pair = Set(norm(l.name), norm(r.name))
    val candidates = GraftMvs.allViews.flatMap(v =>
      GraftMvs.lookup(v).flatMap(base =>
        scala.util.Try(GraftMvs.readDef(base)).toOption))
      .filter(d => d.src2.isDefined &&
        Set(norm(d.src), norm(d.src2.get)) == pair)
    if (candidates.isEmpty) return None
    val colsL = scala.util.Try(tableFrame(spark, el.get).columns.toSeq)
      .getOrElse(return None)
    val colsR = scala.util.Try(tableFrame(spark, er.get).columns.toSeq)
      .getOrElse(return None)
    // orient fact = the side the candidate views' `src` names (all
    // candidates share the pair; orientation differs per view, but
    // the RESOLUTION is symmetric — strip() only needs side
    // membership, and serveFrom() re-checks the pair orientation)
    val d0 = candidates.head
    val (fRel, fCols, dRel, dCols) =
      if (norm(d0.src) == norm(l.name)) (l, colsL, r, colsR)
      else (r, colsR, l, colsL)
    val res = scala.util.Try(new GraftMvs.SideResolver(
      GraftMvs.ParsedRel(fRel.name, fRel.quals.headOption),
      fCols, Some(GraftMvs.ParsedRel(dRel.name, dRel.quals.headOption)),
      Some(dCols))).getOrElse(return None)
    val pairs = scala.util.Try(res.resolveJoinPairs(Some(cond)))
      .getOrElse(return None)
    // every candidate view must agree on the ON pairs to serve; the
    // pair set rides via a closure check in serveFrom — encode it in
    // the srcName/src2Name slot by filtering candidates there. The ON
    // set is stored here for the equality check.
    pendingJoinPairs.set(pairs.map { case (a, b) => (norm(a), norm(b)) }.toSet)
    val st: Seq[String] => Option[String] =
      parts => scala.util.Try(res.strip(parts)).toOption
    val se: Expression => Option[Expression] = e => {
      var ok = true
      val out = e.transform {
        case a: UnresolvedAttribute =>
          st(a.nameParts) match {
            case Some(c) => UnresolvedAttribute(Seq(c))
            case None    => ok = false; a
          }
      }
      if (ok) Some(out) else None
    }
    Some((fRel.name, Some(dRel.name), st, se))
  }

  /** The ON pairs of the join query currently being matched —
    * thread-local because accelerate() is re-entrant across sessions
    * but the parse→match window is single-threaded per statement. */
  private val pendingJoinPairs =
    new ThreadLocal[Set[(String, String)]] {
      override def initialValue(): Set[(String, String)] = Set.empty
    }

  /** Try one candidate view; Some(served logical plan) when it
    * matches and is fresh. */
  private def serveFrom(spark: SparkSession, mvName: String,
                        joinKey: (String, Option[String]),
                        qGroup: Seq[Either[String, String]],
                        items0: Seq[GraftMvs.ServeItem],
                        qConj: Seq[Expression],
                        qConjSql: Seq[String]): Option[LogicalPlan] = {
    val d = GraftMvs.freshFor(spark, mvName) match {
      case Some(d0) if (norm(d0.src), d0.src2.map(norm)) == joinKey => d0
      case _ => return None
    }
    // join form: the query's ON pairs must equal the view's
    if (d.src2.isDefined) {
      val mvPairs = d.joinPairs
        .map { case (a, b) => (norm(a), norm(b)) }.toSet
      if (mvPairs != pendingJoinPairs.get()) return None
    }
    val mvKeys = d.groupKeys.map(norm)
    // the view's computed keys, addressable by canonical expression
    val canonOfStored: Map[String, String] = d.keyExprs.map { case (a, s) =>
      canonSql(CatalystSqlParser.parseExpression(s)) -> norm(a)
    }.toMap
    // bind computed-key select items to stored key aliases
    val items: Seq[GraftMvs.ServeItem] = items0.map {
      case GraftMvs.ServeKeyExpr(canon, al) =>
        canonOfStored.get(canon) match {
          case Some(k) => GraftMvs.ServeKey(k, al)
          case None    => return None
        }
      case other => other
    }
    // resolve the query's grouping list against this view: a name is
    // a view key directly or the alias of a bound key item; an
    // expression must be one of the view's computed keys
    val qKeys: Seq[String] = qGroup.map {
      case Left(name) =>
        if (mvKeys.contains(name)) name
        else items.collectFirst {
          case GraftMvs.ServeKey(k, al) if norm(al) == name => k
        }.getOrElse(return None)
      case Right(canon) => canonOfStored.getOrElse(canon, return None)
    }.distinct
    // every selected key must be grouped (else the SQL is invalid —
    // decline and let vanilla execution produce the real error)
    if (items.exists {
      case GraftMvs.ServeKey(k, _) => !qKeys.contains(k)
      case _                       => false
    }) return None
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
        e.collect { case a: UnresolvedAttribute => a.nameParts }
          .forall(p => p.length == 1 && qKeys.contains(norm(p.head)))
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
