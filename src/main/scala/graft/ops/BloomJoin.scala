package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-join pruning — the cross-job form of Spark's own
  * runtime row-level filtering.
  *
  * Catalyst's `InjectRuntimeFilter` already plants a bloom filter from
  * a join's build side into the probe side's scan — but only WITHIN
  * one query plan. The incremental-dedup flow
  * ([[graft.text.DedupIndex]]) joins every incoming batch against a
  * PERSISTED index produced by earlier jobs, a boundary the optimizer
  * cannot see across. This helper builds the same
  * `BloomFilterAggregate` the optimizer would, surfaces the filter
  * bytes as a value (store them next to the index; megabytes for
  * billions of keys), and applies `BloomFilterMightContain` as an
  * ordinary scan-side predicate: the probe side drops non-matching
  * rows at the parquet scan, BEFORE paying the shuffle, and the exact
  * join afterwards removes the bloom's false positives — results stay
  * exact, only the pruning is probabilistic.
  *
  * At 100 TB: the index side may be billions of keys (bloom stays
  * driver-collectable — ~1.2 GB per 10^9 keys at 1% fpp, and one
  * hash-check per probe row), while the probe side avoids shuffling
  * the ~99% of rows that match nothing. Same expressions as Spark's
  * injected filters (`XxHash64` keying both sides), so the pruning
  * predicate stays codegen'd.
  */
object BloomJoin {

  /** Aggregate `key` over `keys` into serialized bloom-filter bytes
    * (one job; the bytes are the reusable, persistable artifact). */
  def bloomOf(keys: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.toExpression(xxhash64(key)), expectedItems)
    keys.agg(ColumnBridge.toColumn(agg.toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
  }

  /** `might_contain(bloom, xxhash64(key))` as a scan-pushable
    * predicate: false ⇒ definitely absent (safe to drop), true ⇒
    * verify with an exact join. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.toExpression(xxhash64(key))))

  /** Exact left-semi join of `fact` against `keys`, bloom-pruned
    * before the shuffle. `expectedItems` sizes the filter (pass the
    * key cardinality or a safe upper bound; oversizing only costs
    * bytes, undersizing only costs false-positive pass-through —
    * never correctness). */
  def semiJoinPruned(fact: DataFrame, factKey: Column,
                     keys: DataFrame, keysKey: Column,
                     expectedItems: Long): DataFrame = {
    val bloom = bloomOf(keys, keysKey, expectedItems)
    fact.where(mightContain(bloom, factKey))
      .join(keys.select(keysKey.as("__bloom_key")).distinct(),
        factKey === col("__bloom_key"), "left_semi")
  }
}
