package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Cdc

/** Streaming consume of a [[TxnManifest]]-committed table: the
  * downstream half of the reference's CDC story. The upstream loop
  * (`graft.ops.Cdc.runLoop`, `accounts.py:147-161`) produces batches
  * and commits them atomically; this consumer tails the manifest the
  * way a Kafka consumer tails a partition — batch ids are the offsets,
  * the manifest is the log, and a per-consumer offset store marks how
  * far each independent reader has drained.
  *
  * Delivery contract (same shape as the producer side):
  *   - the manifest commit is the ONLY visibility point, so a consumer
  *     never observes a half-written batch or a crash orphan;
  *   - a batch is handed to `process` before its offset is committed —
  *     at-least-once delivery;
  *   - the batch id rides along, so an idempotent, batch-keyed sink
  *     (`Sinks.appendBatch`) turns at-least-once into exactly-once
  *     end-to-end, exactly like the producer's watermark protocol;
  *   - ids must be assigned MONOTONICALLY by the producer
  *     (`Cdc.runLoop`'s watermark-derived ids are): a commit at or
  *     below a consumer's offset is indistinguishable from the
  *     crash-retry it is designed to absorb, so it is skipped — a
  *     producer that backfills an old id under a drained consumer is
  *     a protocol violation this layer cannot detect (same contract
  *     as a Kafka consumer and a compacted offset).
  *
  * Two consumption forms share this contract. THIS class is the
  * embedded driver loop — zero moving parts, a caller-controlled sink
  * callback, the shape the reference's `while True` loop has. Its
  * planner-native twin is [[GraftManifestProvider]]
  * (`spark.readStream.format("graft-manifest")`): same offsets
  * (manifest batch ids), same orphan-invisibility, but progress lives
  * in Spark's checkpoint WAL, admission control bounds catch-up
  * batches, and pruning/pushdown reach the parquet reader — prefer it
  * whenever the consumer is a Spark query rather than arbitrary
  * driver-side code. (Spark's BUILT-IN file-stream source fits
  * neither: it defines visibility by directory listing, so an
  * uncommitted orphan dir would be consumed.)
  */
object ManifestConsumer {

  /** Offset key under which `consumer`'s progress is stored — one
    * logical consumer group per key, many independent readers per
    * manifest. */
  private def offsetKey(consumer: String, root: String) = s"$consumer@$root"

  /** One poll: hand every committed batch with id > the consumer's
    * offset to `process`, in id order, committing the offset after
    * each batch. Returns the processed batch ids.
    *
    * `process` receives `(batchDf, batchId)` and must be idempotent in
    * `batchId` (a crash between `process` and the offset commit
    * re-delivers that id on the next poll).
    */
  def pollOnce(spark: SparkSession, manifest: TxnManifest, root: String,
               offsets: Cdc.WatermarkStore, consumer: String)
              (process: (DataFrame, Int) => Unit): Seq[Int] = {
    val key = offsetKey(consumer, root)
    val from = offsets.read(key)
    val pending = manifest.committed().toSeq
      .filter { case (id, _) => id > from }
      .sortBy(_._1)
      .map { case (id, dirs) => id -> dirs.filter(_.startsWith(root + "/")) }
      .filter(_._2.nonEmpty)
    pending.map { case (id, dirs) =>
      // a deletion-vector batch has no raw content to serve — its
      // MEANING is "rows disappeared", which this form cannot express
      require(!dirs.exists(Sinks.isDvDir),
        s"batch $id under $root is a deletion-vector delete — the raw " +
          "consumer cannot express row removal; tail with pollChanges " +
          "(row-level deltas) instead")
      val batch = spark.read.option("mergeSchema", true).parquet(dirs: _*)
      process(batch, id)
      // offset commit AFTER the sink: the crash window re-delivers,
      // the batch-keyed sink deduplicates — exactly-once end to end
      offsets.upsert(key, id.toLong)
      id
    }
  }

  /** Bootstrap a NEW change-feed consumer (the Delta CDF rule): hand
    * `process` one consistent snapshot of the committed table, then
    * commit the offset to tail from — offset-after-sink, the same
    * at-least-once contract as every poll form (a crash inside
    * `process` re-runs the bootstrap; committing the offset FIRST
    * would strand a consumer that never materialized its snapshot).
    * The manifest is read ONCE, so a commit racing the bootstrap
    * lands strictly above the returned offset and arrives on the
    * first poll. Returns the committed offset. */
  def bootstrap(spark: SparkSession, manifest: TxnManifest, root: String,
                offsets: Cdc.WatermarkStore, consumer: String)
               (process: (DataFrame, Int) => Unit): Int = {
    val state = manifest.committed()
      .filter(_._2.exists(_.startsWith(root + "/")))
    if (state.isEmpty)
      throw new IllegalStateException(
        s"no committed batches under $root — nothing to bootstrap from")
    val (dirs, dv) = Sinks.splitDv(state.toSeq.sortBy(_._1)
      .flatMap(_._2).filter(_.startsWith(root + "/")))
    val snapshot = Sinks.applyDv(spark,
      spark.read.option("mergeSchema", true).parquet(dirs: _*), dv)
    val maxId = state.keysIterator.max
    process(snapshot, maxId)
    offsets.upsert(offsetKey(consumer, root), maxId.toLong)
    maxId
  }

  /** Change-feed form: the same offset protocol, but each poll hands
    * `process` the ROW-LEVEL deltas ([[Sinks.readChanges]]) committed
    * since the consumer's offset instead of raw batch contents — a
    * MERGE batch arrives as update pre/post images and deletes from
    * its `_cdf` sidecar, an append batch as inserts. This upgrades the
    * documented upsert-feed limitation of the raw consumer: a keyed
    * downstream can now apply deletes and distinguish updates from
    * inserts without diffing. Offset commits after `process`, so the
    * crash window re-delivers and the sink keys by the returned
    * high-water id (at-least-once → exactly-once, as everywhere).
    *
    * BOOTSTRAP rule (Delta CDF's): a NEW consumer starts from a
    * `readCommitted` snapshot plus the manifest's current max id as
    * its first offset, THEN tails changes. Replaying the feed from
    * id 0 is lossy once a merge has un-named early batches — their
    * kept rows live in the merge target, which the feed serves as
    * deltas only. */
  def pollChanges(spark: SparkSession, manifest: TxnManifest, root: String,
                  offsets: Cdc.WatermarkStore, consumer: String)
                 (process: (DataFrame, Int) => Unit): Option[Int] = {
    val key = offsetKey(consumer, root)
    val from = offsets.read(key)
    val pendingIds = manifest.committed().toSeq
      .filter { case (id, dirs) =>
        id > from && dirs.exists(_.startsWith(root + "/")) }
      .map(_._1)
    if (pendingIds.isEmpty) None
    else {
      val highWater = pendingIds.max
      val changes = Sinks.readChanges(spark, root, manifest,
        fromBatch = from.toInt, toBatch = highWater)
      process(changes, highWater)
      offsets.upsert(key, highWater.toLong)
      Some(highWater)
    }
  }

  /** Catch-up form: consume ALL pending batches as one scan (one job,
    * not one per batch) when per-batch ordering doesn't matter —
    * the efficient shape for a consumer that fell far behind. The
    * offset moves to the highest consumed id only after `process`
    * returns, so the whole catch-up re-delivers on a crash and the
    * sink must key by the returned high-water id. */
  def pollCoalesced(spark: SparkSession, manifest: TxnManifest, root: String,
                    offsets: Cdc.WatermarkStore, consumer: String)
                   (process: (DataFrame, Int) => Unit): Option[Int] = {
    val key = offsetKey(consumer, root)
    val from = offsets.read(key)
    val pending = manifest.committed().toSeq
      .filter { case (id, _) => id > from }
      .flatMap { case (id, dirs) =>
        dirs.filter(_.startsWith(root + "/")).map(id -> _) }
    if (pending.isEmpty) None
    else {
      require(!pending.exists(p => Sinks.isDvDir(p._2)),
        s"pending batches under $root include a deletion-vector " +
          "delete — the raw consumer cannot express row removal; tail " +
          "with pollChanges (row-level deltas) instead")
      val highWater = pending.map(_._1).max
      val batch = spark.read.option("mergeSchema", true)
        .parquet(pending.map(_._2): _*)
      process(batch, highWater)
      offsets.upsert(key, highWater.toLong)
      Some(highWater)
    }
  }
}
