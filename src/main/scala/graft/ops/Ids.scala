package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * `order` must be a total order (include a unique key) or ids are
  * nondeterministic within ties, exactly as with `row_number`.
  */
object Ids {

  def denseIds(df: DataFrame, order: Seq[Column], idCol: String,
               startAt: Long = 1L): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + startAt))
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
