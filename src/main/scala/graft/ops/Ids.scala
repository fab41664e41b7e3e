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

  /** IDENTITY-column allocation for one committed batch:
    * `start + step · (batchId · 2³³ + i)` with `i` the batch-dense
    * row index ([[denseIds]]'s zipWithIndex ride, input partitioning
    * kept — no sort, no shuffle). Collision-free WITHOUT coordination
    * because the manifest's CAS already serializes batch ids: two
    * concurrent inserts cannot commit the same `batchId`, and within
    * a batch the dense index is unique. Monotonic across batches for
    * `step > 0` (every batch-N id sorts before every batch-N+1 id)
    * — Delta's identity contract (unique, direction-monotonic, gaps
    * allowed) without its high-water-mark round trips. Capacity:
    * 2³³ ≈ 8.6e9 rows per batch, loudly enforced per row. */
  def fillIdentity(df: DataFrame, idCol: String, start: Long, step: Long,
                   batchId: Long): DataFrame = {
    require(step != 0, "identity step must be non-zero")
    require(batchId >= 0 && batchId < (1L << 30),
      s"identity batch id $batchId outside [0, 2^30)")
    val order = df.columns.toSeq
    // zipWithIndex runs TWO jobs over the input (partition counts,
    // then the id-assigning write) — a nondeterministic source
    // (rand(), an unordered LIMIT) could size partitions differently
    // between them and collide one partition's id range with the
    // next's. Pin nondeterministic inputs once (batch-sized by the
    // insert contract); deterministic plans skip the materialization.
    val deterministic = df.queryExecution.analyzed.collectFirst {
      case p if p.expressions.exists(e =>
        e.exists(!_.deterministic)) => p
    }.isEmpty
    val src = if (deterministic) df else df.localCheckpoint(eager = true)
    val without = src.drop(idCol)
    val schema = StructType(without.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val withIds = without.queryExecution.toRdd.zipWithIndex()
      .mapPartitions { it =>
        val joined = new JoinedRow
        val idRow = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(1)
        it.map { case (r, i) =>
          require(i < (1L << 33),
            s"identity batch exceeds 2^33 rows — split the insert")
          // checked arithmetic: start/step combinations can overflow
          // Long well inside the batchId bound (e.g. step 3 past
          // batchId ~3.6e8) — wrap-around would silently break the
          // uniqueness/monotonicity contract, so fail loudly instead
          val id =
            try Math.addExact(start,
              Math.multiplyExact(step, (batchId << 33) + i))
            catch { case _: ArithmeticException =>
              throw new ArithmeticException(
                s"identity value start=$start + step=$step * " +
                  s"(batch=$batchId * 2^33 + $i) overflows BIGINT — " +
                  "the table has exhausted its allocation range")
            }
          idRow.update(0, id)
          joined(r, idRow): InternalRow
        }
      }
    PlanBridge.ofInternalRows(df.sparkSession, withIds, schema)
      .select(order.map(c => org.apache.spark.sql.functions.col(c)): _*)
  }

  /** Explicitly-provided IDENTITY values must not be NULL: the column
    * is implicitly NOT NULL (Delta's rule) — a null id would quietly
    * undermine the uniqueness/monotonicity contract the allocator
    * certifies. The guard is IN the write plan (a `raise_error`
    * branch on the column), so it evaluates on exactly the rows
    * being written — a separate probe job would re-execute the
    * source, doubling insert cost, and for a nondeterministic source
    * its verdict would not even bind the written rows. */
  def guardNoNullIdentity(table: String, df: DataFrame,
                          idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    df.schema.fields.find(_.name.equalsIgnoreCase(idCol)) match {
      case None => df
      case Some(f) => df.withColumn(f.name,
        when(col(f.name).isNotNull, col(f.name))
          .otherwise(raise_error(lit(
            s"INSERT into $table: IDENTITY column '${f.name}' received " +
              "an explicit NULL — identity columns are implicitly " +
              "NOT NULL; omit the column to let the engine allocate"))))
    }
  }
}
