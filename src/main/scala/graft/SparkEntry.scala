package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family from
  * SURVEY.md §2 (plus the LLM-data-pipeline extensions) to a
  * `(spark, sfDir) => DataFrame`; `oracleSql` carries the equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables.
  * Query implementations live under `graft.queries.*`; reusable
  * operator code under `graft.ops.*`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ CleanseQueries.queries ++ PipelineQueries.queries ++
      DocQueries.queries ++ SimQueries.queries ++ ExtraQueries.queries ++
      CurationQueries.queries ++ TpchQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ CleanseQueries.oracle ++ PipelineQueries.oracle ++
      DocQueries.oracle ++ SimQueries.oracle ++ ExtraQueries.oracle ++
      CurationQueries.oracle ++ TpchQueries.oracle
}
