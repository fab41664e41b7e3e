package graft.plans

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Expression, SubqueryExpression, UnresolvedWindowExpression, WindowExpression}
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
    * (caller falls through to vanilla execution). The accelerate arm
    * is defensive: any throw while matching/serving falls back to
    * vanilla execution — a rewrite must never make a query that runs
    * fine without it start failing. */
  def apply(spark: SparkSession, plan: LogicalPlan): Option[LogicalPlan] =
    (scala.util.Try(accelerate(spark, plan)) match {
      case scala.util.Success(r) => r
      case scala.util.Failure(e) =>
        // falling back to vanilla is the contract, but silently eating
        // the throw turns a corrupt mvdef or a rewrite bug into "query
        // quietly stopped accelerating" — log it so the regression has
        // a signal outside the plan-assert tests
        log.warn(s"MV accelerate declined by exception; running " +
          s"vanilla: ${e.getClass.getSimpleName}: ${e.getMessage}")
        None
    }).orElse(substitute(spark, plan))

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger(MvRewrite.getClass)

  /** Shapes neither compound serving nor agg-call binding can
    * reproduce above a served store: a window function computes over
    * a FRAME of served rows, not a per-group value, so its result is
    * not the stored aggregate — decline and run vanilla. */
  private def hasWindow(e: Expression): Boolean = e.exists(x =>
    x.isInstanceOf[WindowExpression] ||
      x.isInstanceOf[UnresolvedWindowExpression])

  // ------------------------------------------------------- accelerate

  private def norm(s: String): String = s.toLowerCase(Locale.ROOT)

  /** Outer ORDER BY / LIMIT wrappers around the aggregate, collected
    * outermost-first and re-attached around the serve after their
    * sort expressions are BOUND to served output aliases
    * ([[bindWrappers]] — binding needs the SELECT items, which aren't
    * known until the core aggregate is matched). */
  private final case class Outer(wrappers: Seq[LogicalPlan],
                                 core: LogicalPlan)

  private def unwrapOuter(plan: LogicalPlan): Outer = plan match {
    case s @ Sort(_, true, child, _) =>
      val inner = unwrapOuter(child)
      Outer(s +: inner.wrappers, inner.core)
    case g @ GlobalLimit(_, l: LocalLimit) =>
      val inner = unwrapOuter(l.child)
      Outer(g +: inner.wrappers, inner.core)
    case other => Outer(Nil, other)
  }

  /** Re-attach the collected wrappers (outermost-first) around the
    * served plan. */
  private def rewrap(wrappers: Seq[LogicalPlan],
                     inner: LogicalPlan): LogicalPlan =
    wrappers.foldRight(inner) {
      case (s: Sort, p)                           => s.copy(child = p)
      case (g @ GlobalLimit(_, l: LocalLimit), p) =>
        g.copy(child = l.copy(child = p))
      case (_, p) => p // unreachable: unwrapOuter collects only the above
    }

  /** Recognize a SELECT item COMPOSING aggregate calls with
    * arithmetic / CASE / casts over group keys (`sum(m)/count(*) AS
    * ratio`, `100 * sum(a) / sum(b) AS pct`). Each aggregate call
    * becomes a placeholder attribute `__c<i>` with its parsed spec
    * recorded in order; the serve re-evaluates the expression over
    * the bound aggregates' SERVED values, which equal direct
    * execution's inputs — identical types, identical coercion,
    * identical result. None when the expression has no aggregate
    * call (the computed-key path handles it) or uses shapes the
    * serve can't reproduce: leftover non-aggregate functions
    * (including nondeterministic ones), subqueries, unresolvable
    * refs. */
  private def compoundOf(e: Expression, alias: String,
                         strip: Seq[String] => Option[String])
    : Option[GraftMvs.ServeItem] = {
    if (e.exists(_.isInstanceOf[SubqueryExpression])) return None
    if (hasWindow(e)) return None
    val specs = scala.collection.mutable.ArrayBuffer.empty[GraftMvs.AggSpec]
    var ok = true
    val out = e.transform {
      case f: UnresolvedFunction =>
        scala.util.Try(GraftMvs.parseAgg(f, s"__c${specs.length}"))
          .toOption.flatMap { spec0 =>
            spec0.arg match {
              case Some(arg) => strip(arg.split('.').toSeq)
                .map(c => spec0.copy(arg = Some(c)))
              case None => Some(spec0)
            }
          } match {
          case Some(sp) =>
            specs += sp
            UnresolvedAttribute(Seq(sp.out))
          case None => ok = false; f
        }
    }
    if (!ok || specs.isEmpty) return None
    if (out.exists(_.isInstanceOf[UnresolvedFunction])) return None
    // remaining refs strip to stored key names (membership in the
    // query's grouping is validated per-view in serveFrom); nothing
    // may collide with the placeholder namespace
    var refsOk = true
    val stripped = out.transform {
      case a: UnresolvedAttribute if !(a.nameParts.length == 1 &&
          a.nameParts.head.startsWith("__c")) =>
        strip(a.nameParts) match {
          case Some(c) if !norm(c).startsWith("__c") =>
            UnresolvedAttribute(Seq(c))
          case _ => refsOk = false; a
        }
    }
    if (!refsOk) return None
    Some(GraftMvs.ServeCompound(stripped, specs.toSeq, alias))
  }

  /** Bind an above-the-aggregate expression (ORDER BY key, HAVING
    * predicate) to the served output: every aggregate CALL
    * (`count(*)`, `sum(qty)`) must match a SELECT item computing the
    * same aggregate and rebinds to that item's alias — per SQL
    * semantics the call's value IS that item's per-group value, so
    * evaluating the bound expression above the serve is
    * result-identical. After substitution, every remaining attribute
    * must be a bare output alias (a QUALIFIED ref like `t.k` cannot
    * resolve against the served plan even when `k` is an alias), no
    * function may remain (a scalar call over non-alias inputs has
    * nothing served to read), and subqueries decline outright. */
  private def bindAggRefs(e: Expression, aliases: Seq[String],
                          items: Seq[GraftMvs.ServeItem],
                          strip: Seq[String] => Option[String])
    : Option[Expression] = {
    if (e.exists(_.isInstanceOf[SubqueryExpression])) return None
    if (hasWindow(e)) return None
    def bindCall(f: UnresolvedFunction): Option[UnresolvedAttribute] =
      scala.util.Try(GraftMvs.parseAgg(f, "__bind")).toOption.flatMap {
        spec0 =>
          val spec = spec0.arg match {
            case Some(arg) => strip(arg.split('.').toSeq) match {
              case Some(c) => Some(spec0.copy(arg = Some(c)))
              case None    => None
            }
            case None => Some(spec0)
          }
          spec.flatMap(s => items.collectFirst {
            case GraftMvs.ServeAgg(m, al) if m.func == s.func &&
                m.arg.map(norm) == s.arg.map(norm) =>
              UnresolvedAttribute(Seq(al))
          })
      }
    var ok = true
    val out = e.transform {
      case f: UnresolvedFunction => bindCall(f) match {
        case Some(attr) => attr
        case None       => ok = false; f
      }
    }
    val attrsOk = out.collect { case a: UnresolvedAttribute => a.nameParts }
      .forall(p => p.length == 1 && aliases.contains(norm(p.head)))
    if (ok && attrsOk && !out.exists(_.isInstanceOf[UnresolvedFunction]))
      Some(out)
    else None
  }

  /** Bind every ORDER BY expression via [[bindAggRefs]] — a sort key
    * may be an output alias, a SELECT-listed aggregate call, or any
    * composition of the two. */
  private def bindWrappers(wrappers: Seq[LogicalPlan],
                           aliases: Seq[String],
                           items: Seq[GraftMvs.ServeItem],
                           strip: Seq[String] => Option[String])
    : Option[Seq[LogicalPlan]] = {
    val bound = wrappers.map {
      case s: Sort =>
        val orders = s.order.map(o =>
          bindAggRefs(o.child, aliases, items, strip) match {
            case Some(b) => o.copy(child = b)
            case None    => return None
          })
        s.copy(order = orders)
      case w => w
    }
    Some(bound)
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
    // FROM shape: one registered table, or a fact INNER / LEFT
    // JOINed to one or more dims — the same star surface CREATE
    // accepts; the query's join TYPE per dim must equal the view's
    // (an INNER query over a LEFT view drops NULL-extension groups
    // and vice versa — never interchangeable). strip() resolves a
    // column reference to its stored (unqualified) name, or None =
    // decline.
    def unjoin(p: LogicalPlan)
      : Option[(Seq[QRel], Seq[(Expression, String)])] =
      p match {
        case Join(l, r, jt, Some(c), _)
            if (jt == org.apache.spark.sql.catalyst.plans.Inner ||
              jt == org.apache.spark.sql.catalyst.plans.LeftOuter) &&
              qrel(r).isDefined =>
          val t = if (jt == org.apache.spark.sql.catalyst.plans.LeftOuter)
            "left" else "inner"
          unjoin(l).map { case (rels, cs) =>
            (rels :+ qrel(r).get, cs :+ ((c, t))) }
        case p0 if qrel(p0).isDefined => Some((Seq(qrel(p0).get), Nil))
        case _ => None
      }
    val (srcName, dimNames, strip, stripExpr):
      (String, Seq[String], Seq[String] => Option[String],
        Expression => Option[Expression]) = unjoin(fromPlan) match {
      case Some((Seq(r), _)) =>
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
        (r.name, Nil, st, se)
      case Some((rels, conds)) =>
        starResolution(spark, rels, conds) match {
          case Some(jr) => jr
          case None     => return None
        }
      case None => return None
    }
    // a single-part name Spark itself resolves is a temp view — it
    // shadows the registered graft table, so the view must not serve.
    // EXCEPT a registered MV's own name: CREATE auto-registers a temp
    // view under it as the vanilla-SQL serving surface, and GraftSql
    // always resolves an MV name to the MV store (substitute checks
    // the MV registry before anything else) — so for an MV-sourced
    // parent the temp view IS the expected resolution, not a shadow
    def shadowed(n: String): Boolean = !n.contains('.') &&
      GraftMvs.lookup(n).isEmpty &&
      (try spark.catalog.tableExists(n)
       catch { case scala.util.control.NonFatal(_) => false })
    if (shadowed(srcName) || dimNames.exists(shadowed)) return None
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
      case Alias(e, n) => // compound-aggregate or computed-key item
        compoundOf(e, n, strip).getOrElse {
          stripExpr(e) match {
            case Some(se) => GraftMvs.ServeKeyExpr(canonSql(se), n)
            case None     => return None
          }
        }
      case _ => return None
    }
    val aliases = items.map(i => norm(i.alias))
    if (aliases.distinct.size != aliases.size) return None
    val wrappers = bindWrappers(outer.wrappers, aliases, items, strip)
      .getOrElse(return None)
    // HAVING binds exactly like ORDER BY: output aliases and
    // SELECT-listed aggregate calls, nothing else
    val havingBound = qHaving.map(h =>
      bindAggRefs(h, aliases, items, strip).getOrElse(return None))

    // WHERE conjuncts, qualifier-stripped so they compare (and
    // re-apply) against the view's stored names
    val qConj = qWhere.toSeq.flatMap(conjuncts)
      .map(e => stripExpr(e).getOrElse(return None))
    val qConjSql = qConj.map(canonSql)
    val joinKey = (norm(srcName), dimNames.map(norm).toSet)

    GraftMvs.allViews.iterator.flatMap { mvName =>
      serveFrom(spark, mvName, joinKey, qGroup, items, qConj, qConjSql)
    }.nextOption().map { served =>
      rewrap(wrappers, havingBound.foldLeft(served)((p, c) => Filter(c, p)))
    }
  }


  /** Resolve the star/snowflake-query FROM: orientation against some
    * candidate view is NOT decided here — the fact side is whichever
    * relation a view's `src` names; this just builds the strip
    * functions from the relation schemas and validates the ON shape
    * (every conjunct joins a dim to an earlier relation under the
    * candidate's dim ordering, wherever in the join chain it was
    * written — inner-join conjunctions commute). Returns None when
    * the sides don't resolve (unknown table, ambiguous column,
    * non-equi or forward-referencing ON) — the rewrite declines. */
  private def starResolution(spark: SparkSession, rels: Seq[QRel],
                             conds: Seq[(Expression, String)])
    : Option[(String, Seq[String],
        Seq[String] => Option[String], Expression => Option[Expression])] = {
    // every relation must be a registered graft table (snapshot
    // schemas come from their committed reads)
    def entryOf(n: String) = GraftSqlTables.lookup(n.split('.').toSeq)
    if (rels.exists(r => entryOf(r.name).isEmpty)) return None
    val names = rels.map(r => norm(r.name))
    if (names.distinct.size != names.size) return None // self-join: no view
    // any star view over this table SET? (cheap gate before schema IO)
    val nameSet = names.toSet
    val candidates = GraftMvs.allViews.flatMap(v =>
      GraftMvs.lookup(v).flatMap(base =>
        scala.util.Try(GraftMvs.readDef(base)).toOption))
      .filter(d => d.dims.size == rels.size - 1 &&
        (d.dims.map(x => norm(x.name)).toSet + norm(d.src)) == nameSet)
    if (candidates.isEmpty) return None
    // orient fact = the relation the candidate views' `src` names
    // (candidates share the set; orientation differs per view, but
    // strip() only needs side membership, and serveFrom() re-checks
    // each candidate's pair sets — a mismatch just declines)
    val d0 = candidates.head
    val factRel = rels.find(r => norm(r.name) == norm(d0.src)).get
    val dimRels = d0.dims.map(x =>
      rels.find(r => norm(r.name) == norm(x.name)).get)
    val anyLeft = conds.exists(_._2 == "left")
    // join type per dim, keyed by the dim's QUERY position
    val typeByName: Map[String, String] = rels.drop(1)
      .map(r => norm(r.name)).zip(conds.map(_._2)).toMap
    if (anyLeft) {
      // LEFT joins commute with neither the FROM base nor (in
      // general) the written order: match only the CREATE's canonical
      // form — base relation = the view's fact, dims in declared
      // order. (Inner-only queries keep the r11 any-order freedom.)
      if (norm(rels.head.name) != norm(d0.src)) return None
      if (rels.drop(1).map(r => norm(r.name)) !=
          d0.dims.map(x => norm(x.name))) return None
    }
    def colsOf(r: QRel): Option[Seq[String]] =
      scala.util.Try(tableFrame(spark, entryOf(r.name).get)
        .columns.toSeq).toOption
    val factCols = colsOf(factRel).getOrElse(return None)
    val dimCols = dimRels.map(r => colsOf(r).getOrElse(return None))
    val res = scala.util.Try(new GraftMvs.StarResolver(
      GraftMvs.ParsedRel(factRel.name, factRel.quals.headOption), factCols,
      dimRels.zip(dimCols).map { case (r, cs) =>
        (GraftMvs.ParsedRel(r.name, r.quals.headOption), cs) }))
      .getOrElse(return None)
    val classifiedPer = scala.util.Try(
      conds.map { case (c, _) => conjuncts(c).map(res.classify) })
      .getOrElse(return None)
    // placement is semantic under LEFT (a conjunct in dim p's ON
    // decides which rows NULL-extend): with dims in declared order,
    // query position p must classify to dim p — else decline
    if (anyLeft && !classifiedPer.zipWithIndex.forall { case (cs, p) =>
        cs.forall(_._1 == p + 1) }) return None
    val classified = classifiedPer.flatten
    // a dim written as the query's BASE relation (`FROM dim JOIN
    // fact` — inner-only, since anyLeft pinned base=fact above) has
    // no ON of its own: every join in the query is inner, so it is
    val byDim = dimRels.indices.map { i =>
      norm(dimRels(i).name) -> ((classified.collect {
        case (d, f, c) if d == i + 1 => (norm(f), norm(c)) }.toSet,
        typeByName.getOrElse(norm(dimRels(i).name), "inner")))
    }.toMap
    if (byDim.values.exists(_._1.isEmpty)) return None // cross-join shaped
    pendingJoinPairs.set(byDim)
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
    Some((factRel.name, dimRels.map(_.name), st, se))
  }

  /** The per-dim ON pair sets AND join types of the star query
    * currently being matched — thread-local because accelerate() is
    * re-entrant across sessions but the parse→match window is
    * single-threaded per statement. */
  private val pendingJoinPairs =
    new ThreadLocal[Map[String, (Set[(String, String)], String)]] {
      override def initialValue()
        : Map[String, (Set[(String, String)], String)] = Map.empty
    }

  /** Try one candidate view; Some(served logical plan) when it
    * matches and is fresh. */
  private def serveFrom(spark: SparkSession, mvName: String,
                        joinKey: (String, Set[String]),
                        qGroup: Seq[Either[String, String]],
                        items0: Seq[GraftMvs.ServeItem],
                        qConj: Seq[Expression],
                        qConjSql: Seq[String]): Option[LogicalPlan] = {
    val d = GraftMvs.servableFor(spark, mvName) match {
      case Some(d0) if (norm(d0.src),
          d0.dims.map(x => norm(x.name)).toSet) == joinKey => d0
      case _ => return None
    }
    // star form: the query's per-dim ON pair sets AND join types must
    // equal the view's (INNER vs LEFT changes which groups exist)
    if (d.dims.nonEmpty) {
      val mvPairs = d.dims.map(x => norm(x.name) ->
        ((x.pairs.map { case (a, b) => (norm(a), norm(b)) }.toSet,
          x.joinType))).toMap
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
    // decline and let vanilla execution produce the real error);
    // compound items' key references likewise
    if (items.exists {
      case GraftMvs.ServeKey(k, _) => !qKeys.contains(k)
      case GraftMvs.ServeCompound(e, _, _) =>
        !e.collect {
          case a: UnresolvedAttribute
            if !a.nameParts.head.startsWith("__c") => norm(a.nameParts.last)
        }.forall(qKeys.contains)
      case _ => false
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
    // every selected aggregate — plain item or compound component —
    // must be stored by the view (and roll-up-able when the query
    // grain is coarser). An approx_count_distinct never serves: the
    // store's DataSketches estimate is a DIFFERENT approximation
    // than Spark's native HLL++, so serving would change the query's
    // result. approx_percentile serves ONLY on estimator identity:
    // the query names the accuracy literal equal to the stored GK
    // summary's 1/ε (both are Spark QuantileSummaries at that point);
    // Spark's 2-arg default (10000) and any other accuracy decline.
    // Rollup serves too: coarser grains re-merge the stored per-group
    // summaries (GK merge keeps the shared ε bound).
    def matchSpec(spec: GraftMvs.AggSpec): Option[GraftMvs.AggSpec] =
      if (spec.func == "hll") None
      else if (spec.func.startsWith("qtile:")) {
        val want = math.round(1.0 / graft.expressions.QuantileSketch.Epsilon)
        spec.func.split(':') match {
          case Array("qtile", p, acc) if acc.toLong == want =>
            d.aggs.find(m => m.func == s"qtile:$p" &&
              m.arg.map(norm) == spec.arg.map(norm))
          case _ => None
        }
      }
      else d.aggs.find(m => m.func == spec.func &&
          m.arg.map(norm) == spec.arg.map(norm))
        .filter(_ => !rollup || GraftMvs.rollupable(spec))
    val matched = items.forall {
      case GraftMvs.ServeAgg(spec, _) => matchSpec(spec).isDefined
      case GraftMvs.ServeCompound(_, specs, _) =>
        specs.forall(s => matchSpec(s).isDefined)
      case _ => true
    }
    if (!matched) return None
    // rebind each item's agg(s) to the view's stored specs
    val bound = items.map {
      case GraftMvs.ServeAgg(spec, al) =>
        GraftMvs.ServeAgg(matchSpec(spec).get, al)
      case GraftMvs.ServeCompound(e, specs, al) =>
        GraftMvs.ServeCompound(e, specs.map(s => matchSpec(s).get), al)
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
