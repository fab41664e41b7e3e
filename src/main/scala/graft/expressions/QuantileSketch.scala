package graft.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable quantile sketches for percentile materialized views
  * (round 12) — the quantile twin of the HLL approx-distinct
  * accumulator: a per-group Greenwald–Khanna summary (Spark's own
  * [[QuantileSummaries]], the engine behind `approxQuantile`)
  * serialized as a BINARY store column. Insert-only refresh deltas
  * FOLD by sketch merge (GK merge is commutative up to the shared
  * rank-error bound ε — the merged summary still answers any quantile
  * within ε·n ranks); deletes recompute the touched groups (summaries
  * don't subtract). The estimate — not an exact percentile — is the
  * declared output. The transparent rewrite serves a query's
  * `approx_percentile(x, p, acc)` ONLY when `acc` names this
  * summary's exact operating point (acc = 1/ε): the function's own
  * contract declares rank error ≤ n/acc, GK-vs-GK at the same ε
  * means the served answer conforms to exactly the tolerance the
  * query asked for. Spark's 2-arg default (acc 10000) and any other
  * accuracy decline, as does HLL always (DataSketches vs HLL++ is a
  * different estimator FAMILY, with no user-named shared tolerance
  * to certify against).
  *
  * At 100 TB: the sketch is O(1/ε · log(εn)) per group regardless of
  * row count, the aggregate is partial-aggregatable
  * (ObjectHashAggregateExec map-side combine), and a latency
  * dashboard's p50/p95/p99 summary refreshes from the delta alone.
  */
object QuantileSketch {

  /** Shared rank-error target: ±1% of n, `approxQuantile`'s common
    * operating point. */
  val Epsilon = 0.01

  def emptySummary(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      Epsilon)

  /** Length-stable binary format:
    * [eps double][count long][n int][(value double, g long,
    * delta long) × n] — always written COMPRESSED (headSampled
    * flushed), so merge/query precondition holds on read. */
  def serialize(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(qs.relativeError)
    out.writeLong(qs.count)
    val s = qs.sampled
    out.writeInt(s.length)
    var i = 0
    while (i < s.length) {
      out.writeDouble(s(i).value); out.writeLong(s(i).g)
      out.writeLong(s(i).delta)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val eps = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val stats = new Array[QuantileSummaries.Stats](n)
    var i = 0
    while (i < n) {
      stats(i) = QuantileSummaries.Stats(in.readDouble(), in.readLong(),
        in.readLong())
      i += 1
    }
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      eps, stats, count, true)
  }

  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    serialize(deserialize(a).merge(deserialize(b)))

  def estimate(bytes: Array[Byte], p: Double): Option[Double] =
    deserialize(bytes).query(p)

  /** Column-API aggregate: `qtileSketch(col)` → serialized summary. */
  def sketchAgg(c: Column): Column =
    ColumnBridge.toColumn(QuantileSketchAgg(ColumnBridge.toExpression(c))
      .toAggregateExpression())

  /** Column-API scalar union of two serialized summaries (NULL
    * absorbs: null ∪ x = x). */
  def mergeCol(a: Column, b: Column): Column =
    ColumnBridge.toColumn(QuantileSketchMerge(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))

  /** Column-API AGGREGATE union of serialized summaries — the rollup
    * serve's cross-group merge (`qtile_merge_agg`). */
  def mergeAggCol(c: Column): Column =
    ColumnBridge.toColumn(QuantileSketchMergeAgg(
      ColumnBridge.toExpression(c)).toAggregateExpression())

  /** Column-API estimate: value at quantile `p`, NULL for the empty
    * summary. */
  def estimateCol(sketch: Column, p: Double): Column =
    ColumnBridge.toColumn(QuantileSketchEstimate(
      ColumnBridge.toExpression(sketch), p))
}

/** `qtile_sketch_agg(double)` → binary GK summary. Nulls skip (the
  * SQL aggregate convention); the empty group yields the empty
  * summary, whose estimate is NULL. */
case class QuantileSketchAgg(child: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def createAggregationBuffer(): QuantileSummaries =
    QuantileSketch.emptySummary()

  override def update(buffer: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.insert(v.asInstanceOf[Double])
  }

  override def merge(buffer: QuantileSummaries,
                     other: QuantileSummaries): QuantileSummaries =
    buffer.compress().merge(other.compress())

  override def eval(buffer: QuantileSummaries): Any =
    QuantileSketch.serialize(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileSketch.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "qtile_sketch_agg"

  override def withNewMutableAggBufferOffset(n: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression)
    : QuantileSketchAgg = copy(child = c)
}

/** Scalar union of two serialized summaries — the MV fold arm's
  * stored ∪ delta combine (NULL absorbs). Interpreted eval
  * ([[CodegenFallback]]) by design: it runs once per TOUCHED GROUP
  * per refresh, never on a per-row hot path. */
case class QuantileSketchMerge(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null) b
    else if (b == null) a
    else QuantileSketch.mergeBytes(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchMerge =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "qtile_merge"
}

/** `qtile_merge_agg(binary)` → union of serialized summaries as an
  * AGGREGATE — the rollup-serve arm's cross-group merge: a query
  * grouping COARSER than the view re-aggregates stored per-group
  * summaries, and GK merge preserves the shared ε rank bound (the
  * merged summary answers any quantile within ε of the combined
  * count). NULL inputs skip; the empty group yields the empty
  * summary (estimate NULL), matching vanilla approx_percentile over
  * zero rows. Cost: one deserialize+merge per STORED GROUP — rollup
  * reads summary rows, never source rows. */
case class QuantileSketchMergeAgg(child: Expression,
                                  mutableAggBufferOffset: Int = 0,
                                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def createAggregationBuffer(): QuantileSummaries =
    QuantileSketch.emptySummary()

  override def update(buffer: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.compress().merge(
      QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]).compress())
  }

  override def merge(buffer: QuantileSummaries,
                     other: QuantileSummaries): QuantileSummaries =
    buffer.compress().merge(other.compress())

  override def eval(buffer: QuantileSummaries): Any =
    QuantileSketch.serialize(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileSketch.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "qtile_merge_agg"

  override def withNewMutableAggBufferOffset(n: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression)
    : QuantileSketchMergeAgg = copy(child = c)
}

/** Scalar estimate: the summary's value at quantile `p` (rank error
  * ≤ ε·n), NULL for the empty summary. Interpreted eval — runs once
  * per SERVED GROUP at read time, not per source row. */
case class QuantileSketchEstimate(child: Expression, p: Double)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(p >= 0.0 && p <= 1.0, s"quantile p=$p out of [0, 1]")
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else QuantileSketch.estimate(v.asInstanceOf[Array[Byte]], p)
      .map(java.lang.Double.valueOf).orNull
  }

  override protected def withNewChildInternal(c: Expression)
    : QuantileSketchEstimate = copy(child = c)
  override def prettyName: String = "qtile_estimate"
}
