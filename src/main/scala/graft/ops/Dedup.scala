package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.5 D1-D2).
  *
  * The reference's `sort_values(...).drop_duplicates(subset, keep='first')`
  * (`items.py:149-155`, `categories.py:86-91`) is order-dependent: the
  * survivor is defined by the preceding sort. Spark's `dropDuplicates`
  * has a nondeterministic tie-break under shuffles, so the *correct*
  * distributed formulation is a window `row_number() == 1` — one shuffle
  * on the partition keys, deterministic at any scale, AQE-skew-safe.
  */
object Dedup {

  /** D1 — top-1-per-group: keep, per `keys`, the first row under
    * `order`. Always include a unique tiebreaker column in `order`. */
  def topPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Top-N-per-group generalization (not in the reference, but the
    * natural extension used by training-data samplers). */
  def topNPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** D2 — plain dedup on a key subset where the reference does not sort
    * first (`locations.py:117,128,139`). Deterministic formulation:
    * group-by keys + min of a deterministic discriminator is preferred;
    * when all non-key columns must survive, fall back to [[topPerGroup]].
    */
  def dedupKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(keys.map(col): _*).distinct()
}
