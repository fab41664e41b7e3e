package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join splitting (on by default) handles most skew at
  * runtime; explicit salting remains the tool when one key dominates
  * so heavily that even split partitions bottleneck, or when the skew
  * is in an aggregation rather than a join. Pattern: fact rows get a
  * random-free deterministic salt (hash-derived, reproducible), the
  * dimension is exploded ×`salts`, and the join key becomes
  * (key, salt) — hot keys spread over `salts` reducers.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): derived from a stable
    * discriminator column (NOT rand() — reruns and retries must land
    * rows identically for idempotent sinks). */
  def salt(discriminator: Column, salts: Int): Column =
    pmod(hash(discriminator), lit(salts))

  /** Salted equi-join: `fact ⋈ dim` on `key`, with the dim replicated
    * ×`salts`. Output columns = fact.* ++ dim's non-key columns.
    *
    * Join types that preserve UNMATCHED DIM rows (right/full outer)
    * are rejected: the dim side is replicated per salt, so an
    * unmatched dim row would surface `salts` times — silently wrong.
    * Fact-preserving types (inner/left/semi/anti) are exact: each
    * fact row carries ONE salt and meets exactly its own dim copy. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 discriminator: String, salts: Int,
                 joinType: String = "left"): DataFrame = {
    val normalized = joinType.toLowerCase.replace("_", "")
    require(!Set("right", "rightouter", "full", "fullouter", "outer")
      .contains(normalized),
      s"saltedJoin cannot preserve unmatched dim rows under $joinType: " +
        "the replicated dim side would emit them once per salt — " +
        "swap the sides or use a plain join for dim-preserving semantics")
    val saltedFact = fact.withColumn("__salt", salt(col(discriminator), salts))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on
    * (key, salt), then final-aggregate on key. For aggregates that
    * compose (sum/count/min/max), result is identical to a direct
    * groupBy — the hot key's partials spread over `salts` tasks. */
  def saltedSum(df: DataFrame, key: String, discriminator: String,
                valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", salt(col(discriminator), salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
