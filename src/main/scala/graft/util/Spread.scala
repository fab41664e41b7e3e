package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism floor for CPU-heavy per-row legs.
  *
  * The testdata tables are single-row-group parquet files, so every
  * scan starts as ONE task — and a shingle/hash/codec pipeline chained
  * onto it runs serial until its first exchange. At production scale
  * the same scan has thousands of splits and needs nothing. This
  * helper repartitions ONLY when the input's planned partition count
  * is below the session's parallelism (guide §2.5 "input skew:
  * repartition immediately after the read", made conditional so the
  * wide-input case moves no bytes): a no-op at cluster scale, a
  * one-tiny-shuffle full-width unlock locally and for few-file
  * batches. Deterministic hash partitioning when keys are given
  * (guide §2.5 — never rand-derived).
  */
object Spread {
  def wide(df: DataFrame, by: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val n = df.rdd.getNumPartitions // plan-only, no job
    if (n >= p) df
    else if (by.isEmpty) df.repartition(p)
    else df.repartition(p, by: _*)
  }
}
