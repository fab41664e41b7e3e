package graft.expressions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k buffer: a max-heap (by "worst first") holding at most
  * k rows. Rows are stored as copied [[UnsafeRow]]s so serialization
  * is a length-prefixed byte concat. */
final class TopKBuffer(ord: Ordering[InternalRow], k: Int) {
  // PriorityQueue dequeues its MAX; with ord ranking better rows as
  // "less", the head is the current worst — the eviction candidate.
  val heap: mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty[UnsafeRow](ord.on[UnsafeRow](identity))

  def offer(row: InternalRow, materialize: InternalRow => UnsafeRow): Unit = {
    if (heap.size < k) { heap.enqueue(materialize(row)); () }
    else if (ord.compare(row, heap.head) < 0) {
      heap.dequeue(); heap.enqueue(materialize(row)); ()
    }
  }

  /** Best-first. */
  def sorted(ord2: Ordering[InternalRow]): Array[UnsafeRow] =
    heap.toArray.sorted(ord2.on[UnsafeRow](identity))
}

/** Aggregate `top_k(struct, k)` → `array<struct>` of the k first rows
  * per group under the struct-field ordering (field i descending where
  * `desc(i)`, ascending otherwise; include a unique tiebreaker field
  * for determinism).
  *
  * WHY this exists (SURVEY.md §2.5 D1/D4 at scale): the window
  * formulation `row_number() OVER (PARTITION BY g ORDER BY ...) <= k`
  * shuffles EVERY input row, then sorts every group fully, to keep k.
  * A bounded-heap aggregate is partial-aggregatable: each map task
  * keeps at most k rows per group, so shuffle volume is
  * |groups| × k × |tasks|, independent of input row count — the right
  * cost model for "top 3 documents per domain" over 100 TB. Planned
  * through ObjectHashAggregateExec (map-side combine verified in
  * TopKSpec).
  */
case class TopKStructs(child: Expression, k: Int, desc: Seq[Boolean],
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {
  require(k > 0, "top_k needs k > 0")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  private def sortOrders: Seq[SortOrder] =
    structType.fields.zipWithIndex.map { case (f, i) =>
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (desc.lift(i).getOrElse(false)) Descending else Ascending)
    }.toSeq

  @transient private lazy val ord: Ordering[InternalRow] =
    new InterpretedOrdering(sortOrders)
  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(ord, k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null)
      buffer.offer(v.asInstanceOf[InternalRow], r => toUnsafe(r).copy())
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach(r => buffer.offer(r, _ => r)) // already materialized
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted(ord).map(_.copy()))

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.heap.size)
    buffer.heap.foreach { r =>
      val b = r.getBytes
      out.writeInt(b.length); out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.length)
      row.pointTo(b, len)
      buf.heap.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructs =
    copy(child = newChild)
}

object TopKStructs {
  /** Column-API entry point: `top_k(struct(measure, tiebreak, payload...),
    * k, desc-flags-per-leading-field)` → best-first `array<struct>`. */
  def topK(structCol: Column, k: Int, desc: Seq[Boolean]): Column =
    ColumnBridge.toColumn(
      TopKStructs(ColumnBridge.toExpression(structCol), k, desc)
        .toAggregateExpression())

  /** SQL builder: `top_k(struct, k [, desc...])` with `k` and the
    * per-field descending flags as literals. Returns the bare
    * aggregate function — the analyzer wraps it in an
    * `AggregateExpression` (same contract as built-in aggregates). */
  def sqlBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    require(exprs.length >= 2,
      "top_k(struct, k[, desc...]) takes at least a struct and a literal k")
    val k = exprs(1) match {
      case Literal(i: Int, _) => i
      case other => throw new IllegalArgumentException(
        s"top_k: k must be an integer literal, got $other")
    }
    val desc = exprs.drop(2).map {
      case Literal(b: Boolean, _) => b
      case other => throw new IllegalArgumentException(
        s"top_k: desc flags must be boolean literals, got $other")
    }
    TopKStructs(exprs.head, k, desc)
  }

  /** SQL registration on a live session:
    * `SELECT g, top_k(struct(m, id), 3, true) FROM t GROUP BY g`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k", sqlBuilder, "scala_udf")
    ()
  }
}
