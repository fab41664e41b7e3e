package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator Spark lacks natively.
  *
  * Built by composition (preferred over a custom SparkPlan, per the
  * build guidance): union the two sides, then a single keyed window
  * carries the latest right-side values forward onto left rows. Cost =
  * ONE shuffle on the join keys + a sort within partitions — no range
  * explosion, no per-row binary search, no broadcast requirement;
  * skewed keys fall under the same AQE handling as any window. This is
  * the standard scalable formulation (points-in-polygon-free
  * "last observation carried forward").
  *
  * Semantics match DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.ts >= r.ts`: each left row gets the right row with the greatest
  * `rightTs <= leftTs` (inclusive); NULLs when none precede. The right
  * side must be unique per (keys, ts) — dedupe first
  * ([[Dedup.topPerGroup]]) or the carried value is unspecified.
  */
object AsOfJoin {

  /** @return left.* plus right's non-key, non-ts columns, as-of matched. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val rightVals = right.columns.toSeq.diff(keys :+ rightTs)
    val collisions = rightVals.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"asOf: right value columns collide with left columns: " +
        s"${collisions.mkString(", ")} — rename before joining")
    // the right row's values travel as ONE struct: the window carries
    // the matched row atomically, so a NULL field of the matched row
    // stays NULL (per-column ignoreNulls would resurrect older values
    // and could mix fields from different right rows)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__is_left", lit(0))
      .withColumn("__rv", struct(rightVals.map(col): _*))
      .drop(rightVals :+ rightTs: _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal __ts → inclusive (>=)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__rv",
      last(col("__rv"), ignoreNulls = true).over(w))
    rightVals.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__rv").getField(c))
    }.filter(col("__is_left") === 1)
      .drop("__ts", "__is_left", "__rv")
  }
}
