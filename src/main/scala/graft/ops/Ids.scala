package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense surrogate-id assignment (SURVEY.md §2.1 S11 — the Sync
  * mapping's `new_item_id`) without a global window.
  *
  * `row_number() OVER (ORDER BY k)` plans a single-partition window —
  * the whole table funnels through one task, the canonical scale
  * killer. Scale-safe equivalent: range-repartition on the order key
  * (each task owns one contiguous, sorted key range), then
  * `zipWithIndex` — Spark counts each partition in one lightweight
  * job and adds the running offset, so ids come out dense 1..N in
  * global key order, bit-identical to the window's, with no
  * single-partition stage anywhere in the plan.
  *
  * The index ride stays on INTERNAL rows: `queryExecution.toRdd` →
  * zipWithIndex → `JoinedRow(row, id)` → re-enter SQL via
  * [[PlanBridge.ofInternalRows]]. The earlier external-Row form
  * (`.rdd` → `Row.fromSeq` → `createDataFrame`) paid a full
  * deserialize + re-encode of every column just to append one long —
  * ~2× on the whole stage.
  *
  * `order` must be a total order (include a unique key) or ids are
  * nondeterministic within ties, exactly as with `row_number`.
  */
object Ids {

  def denseIds(df: DataFrame, order: Seq[Column], idCol: String,
               startAt: Long = 1L): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val withIds = sorted.queryExecution.toRdd.zipWithIndex()
      .mapPartitions { it =>
        // JoinedRow is a view over (reused row, id) — safe because
        // downstream SQL operators copy when they buffer, same as any
        // internal iterator; one allocation per PARTITION, not row.
        val joined = new JoinedRow
        val idRow  = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(1)
        it.map { case (r, i) =>
          idRow.update(0, i + startAt)
          joined(r, idRow): InternalRow
        }
      }
    PlanBridge.ofInternalRows(df.sparkSession, withIds, schema)
  }
}
