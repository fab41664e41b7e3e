package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping + nested aggregation (SURVEY.md §2.6 R1-R2, §2.4 A3, §2.7 C16).
  */
object Reshape {

  /** R1 — unpivot/melt wide→EAV (`location_settings.py:89-93`,
    * `roles.py:96-101`). Spark's native `Dataset.unpivot` compiles to an
    * `Expand` node: no shuffle, each input row fans out map-side. */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
           keyCol: String = "key", valCol: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, keyCol, valCol)

  /** A3/C16 — group child rows to a JSON array string per parent
    * (`locations.py:123,134,141,146,151` + `json.dumps` at 162-166).
    *
    * `collect_list` order is nondeterministic under shuffles, so the
    * array is sorted before serialization (`sort_array` on the struct's
    * natural ordering — put a stable discriminator first in `fields`).
    * One shuffle on `keys`; partial aggregation applies map-side.
    */
  def jsonAgg(df: DataFrame, keys: Seq[String], fields: Seq[Column],
              out: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(to_json(sort_array(collect_list(struct(fields: _*)))).as(out))

  /** A3 variant that keeps the typed ArrayType(StructType) column for
    * further relational work before the final stringify. */
  def structAgg(df: DataFrame, keys: Seq[String], fields: Seq[Column],
                out: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(fields: _*))).as(out))
}
