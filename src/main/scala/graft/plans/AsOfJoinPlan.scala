package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, GenericInternalRow, InterpretedOrdering, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.DataType

/** As-of join as a first-class Catalyst operator — the tier-(c)
  * extension path (custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`), complementing the composed union+window form in
  * [[graft.ops.AsOfJoin]] (which remains the oracle-checked default).
  *
  * Why a physical operator at all: the window form materializes each
  * partition's rows in the window buffer and carries the matched
  * struct through `last(_, ignoreNulls)` over every row. This exec
  * instead merges the two sides per partition as a single O(n+m)
  * streaming pass holding ONE buffered right row and ONE carried
  * match — same single co-partitioning shuffle, no per-partition
  * window buffer, memory O(1) per partition. Semantics match DuckDB
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`: each left row
  * takes the right row with the greatest rightTs <= leftTs (ties by
  * last in (key, ts) sort order); NULL-padded when none precede.
  * Right-side timestamps must be non-null (filter first).
  *
  * NULL-key deviation from SQL equality: join keys compare with
  * InterpretedOrdering (and cluster with ClusteredDistribution), so
  * NULL keys group TOGETHER — a null-keyed left row can match a
  * null-keyed right row, where SQL `l.k = r.k` would never match.
  * This matches the composed union+window form in
  * [[graft.ops.AsOfJoin]] (window partitioning also groups NULLs) but
  * diverges from the DuckDB oracle if keys are ever null; pre-filter
  * null keys on either side for strict SQL semantics. The oracle
  * corpus has non-null keys, so j12 is unaffected.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTs: Attribute, rightTs: Attribute,
                        rightValues: Seq[Attribute])
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * [[GraftExtensions]] (`spark.sql.extensions`) or at runtime through
  * `spark.experimental.extraStrategies` ([[AsOfJoinPhysical.register]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.rightValues, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTs: Attribute, rightTs: Attribute,
                        rightValues: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  /** Both sides cluster on the join keys — EnsureRequirements makes the
    * children co-partitioned (ONE shuffle each at most, reused when the
    * child is already keyed — e.g. bucketed sources). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (keys, ts) ascending on both sides — the merge precondition. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(a => SortOrder(a, Ascending)),
    (rightKeys :+ rightTs).map(a => SortOrder(a, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  private def ordFor(types: Seq[DataType]): InterpretedOrdering =
    new InterpretedOrdering(types.zipWithIndex.map { case (dt, i) =>
      SortOrder(BoundReference(i, dt, nullable = true), Ascending)
    })

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTs = leftTs; val rTs = rightTs; val rVals = rightValues
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val leftKeyProj  = UnsafeProjection.create(lKeys, lOut)
      val rightKeyProj = UnsafeProjection.create(rKeys, rOut)
      val leftTsProj   = UnsafeProjection.create(Seq(lTs), lOut)
      val rightTsProj  = UnsafeProjection.create(Seq(rTs), rOut)
      val valueProj    = UnsafeProjection.create(rVals, rOut)
      val keyOrd = ordFor(lKeys.map(_.dataType))
      val tsOrd  = ordFor(Seq(lTs.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRow = new GenericInternalRow(rVals.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // single-row state: the lookahead right row (copied — sorter
        // iterators reuse row objects), the carried match and its key
        private var bufferedRight: InternalRow = null
        private var matchKey: UnsafeRow = null
        private var lastMatch: UnsafeRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkRow = leftKeyProj(l)
          if (matchKey != null && keyOrd.compare(matchKey, lkRow) != 0) {
            matchKey = null; lastMatch = null
          }
          val ltsRow = leftTsProj(l)
          var done = false
          while (!done && (bufferedRight != null || rIter.hasNext)) {
            if (bufferedRight == null) bufferedRight = rIter.next().copy()
            val c = keyOrd.compare(rightKeyProj(bufferedRight), lkRow)
            if (c < 0) bufferedRight = null // behind every remaining left key
            else if (c > 0) done = true     // ahead: stop until left catches up
            else {
              if (tsOrd.compare(rightTsProj(bufferedRight), ltsRow) <= 0) {
                lastMatch = valueProj(bufferedRight).copy()
                matchKey = lkRow.copy()
                bufferedRight = null
              } else done = true            // too new for this left row
            }
          }
          resultProj(joined(l, if (lastMatch != null) lastMatch else nullRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** `spark.sql.extensions`-style injection point
  * (`.config("spark.sql.extensions", classOf[GraftExtensions].getName)`):
  * the as-of planner strategy plus the native SQL functions — an
  * engine exposes its operators through its query language, so
  * `SELECT simhash64(text)` and `SELECT top_k(struct(...), 3, true)`
  * work in any session built with these extensions (per-session
  * runtime equivalents: `SimHash64.register` / `TopKStructs.register`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.expressions.{NfcNormalize, SimHash64, TopKStructs}

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL-text MERGE INTO / DELETE FROM on registered manifest tables
    // (everything else passes through to the delegate byte-identical)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // opt-in via spark.graft.rangeJoin.binWidth (see RangeJoinRewrite)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    // per-join width: the RANGE_JOIN(w) hint — analyzer-time, because
    // unrecognized hints are stripped before the optimizer runs
    ext.injectResolutionRule(_ => RangeJoinHint)
    // (Delta's table_changes TVF substitutes inside the injected
    // parser — see TableChangesSubstitution: analysis rejects an
    // unknown TVF before any injected resolution rule could run)
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"simhash64(text) takes exactly one argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }))
    ext.injectFunction((FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKStructs].getName, "top_k"),
      TopKStructs.sqlBuilder _))
    ext.injectFunction((FunctionIdentifier("nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"nfc(text) takes exactly one argument, got ${exprs.length}")
        NfcNormalize(exprs.head)
      }))
    ext.injectFunction((FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(
        classOf[graft.expressions.BpeTokenCount].getName, "bpe_token_count"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"bpe_token_count(text) takes exactly one argument, " +
            s"got ${exprs.length}")
        graft.expressions.BpeTokenCount(exprs.head)
      }))
    // mergeable quantile sketches (the percentile-MV accumulator) as
    // ad-hoc SQL: build per-group summaries, union them across rounds
    // or tables, ask any quantile — the hll_sketch_agg / hll_union /
    // hll_sketch_estimate triple, for percentiles
    ext.injectFunction((FunctionIdentifier("qtile_sketch_agg"),
      new ExpressionInfo(
        classOf[graft.expressions.QuantileSketchAgg].getName,
        "qtile_sketch_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"qtile_sketch_agg(col) takes exactly one argument, " +
            s"got ${exprs.length}")
        graft.expressions.QuantileSketchAgg(exprs.head)
      }))
    ext.injectFunction((FunctionIdentifier("qtile_merge"),
      new ExpressionInfo(
        classOf[graft.expressions.QuantileSketchMerge].getName,
        "qtile_merge"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"qtile_merge(a, b) takes exactly two arguments, " +
            s"got ${exprs.length}")
        graft.expressions.QuantileSketchMerge(exprs.head, exprs(1))
      }))
    ext.injectFunction((FunctionIdentifier("qtile_merge_agg"),
      new ExpressionInfo(
        classOf[graft.expressions.QuantileSketchMergeAgg].getName,
        "qtile_merge_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"qtile_merge_agg(sketch) takes exactly one argument, " +
            s"got ${exprs.length}")
        graft.expressions.QuantileSketchMergeAgg(exprs.head)
      }))
    ext.injectFunction((FunctionIdentifier("qtile_estimate"),
      new ExpressionInfo(
        classOf[graft.expressions.QuantileSketchEstimate].getName,
        "qtile_estimate"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        require(exprs.length == 2,
          s"qtile_estimate(sketch, p) takes exactly two arguments, " +
            s"got ${exprs.length}")
        val p = exprs(1) match {
          case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
          case Literal(d: Double, _) => d
          case Literal(i: Int, _)    => i.toDouble
          case other => throw new IllegalArgumentException(
            s"qtile_estimate: p must be a numeric literal, got $other")
        }
        graft.expressions.QuantileSketchEstimate(exprs.head, p)
      }))
  }
}

object AsOfJoinPhysical {

  /** Runtime registration for an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** Same surface as [[graft.ops.AsOfJoin.asOf]], planned through
    * [[AsOfJoinExec]]: left.* plus right's non-key non-ts columns.
    *
    * The right side's key/ts columns are renamed to `__asof_r_*`
    * before the node is built: both sides routinely derive from the
    * same source (self-as-of), so their attributes share exprIds —
    * built-in joins get `DeduplicateRelations` re-aliasing from the
    * analyzer, but a custom node's key references are ambiguous to
    * that rule (it cannot know `rightKeys` means the RIGHT child's
    * instance), and the ambiguity surfaces as the optimizer pruning
    * the right child down to its uniquely-owned columns. A real
    * rename mints fresh exprIds with distinct names, which no
    * alias-cleanup rule undoes; the renamed columns never appear in
    * the output, so the surface is unchanged. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val rightVals = right.columns.toSeq.diff(keys :+ rightTs)
    val collisions = rightVals.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"asOf: right value columns collide with left columns: " +
        s"${collisions.mkString(", ")} — rename before joining")
    val rRenamed = keys.foldLeft(right)((df, k) =>
      df.withColumnRenamed(k, s"__asof_r_$k"))
      .withColumnRenamed(rightTs, "__asof_r_ts")
    val lPlan = left.queryExecution.analyzed
    val rPlan = rRenamed.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"asOf: column $n not found in [${p.output.map(_.name).mkString(", ")}]"))
    PlanBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"__asof_r_$k")),
      attr(lPlan, leftTs), attr(rPlan, "__asof_r_ts"),
      rightVals.map(attr(rPlan, _))))
  }
}
