package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{Sinks, StatsSinks, TxnManifest}
import graft.util.AtomicText

/** Streaming CDC APPLY — the standard Delta recipe ("apply change
  * data with foreachBatch") as a first-class function: a change-feed
  * stream (`_change_type` / `_commit_batch` rows from a `changeFeed`
  * read or `table_changes`) replicates into a downstream manifest
  * table, collapsing each micro-batch to NET row changes and applying
  * them as ONE atomic merge.
  *
  * Collapse rules (per key, inside one micro-batch):
  *   - `update_preimage` rows drop (the postimage carries the row);
  *   - the row from the HIGHEST `_commit_batch` wins — a key inserted
  *     in commit 3 and deleted in commit 5 nets to a delete;
  *   - a winning `delete` routes to the merge's delete arm, anything
  *     else to the upsert arm.
  *
  * Exactly-once: the applied-epoch log (`<manifestPath>.applied/
  * <appId>`, one atomic write per epoch) makes restarts skip already
  * applied epochs — Delta's `txnAppId`/`txnVersion` idempotent-write
  * pattern. The crash window (merge committed, log write lost) re-
  * applies ONE epoch's net changes, which is state-idempotent by
  * construction: re-upserting the same rows and re-deleting the same
  * keys against the post-apply state changes nothing. The first
  * epoch into an EMPTY downstream table bootstraps as a plain
  * stats-indexed append (a merge needs committed data to merge into).
  *
  * Scale shape (100 TB): each micro-batch costs one window over the
  * batch (batch-sized, never table-sized) plus the merge's own
  * pruned rewrite — the downstream table is touched only where keys
  * land, exactly like a hand-written MERGE.
  */
object CdcApply {

  private[graft] def appliedPath(manifestPath: String,
                                 appId: String): String = {
    AtomicText.requireCleanKey(appId, "CDC apply appId")
    s"$manifestPath.applied/$appId"
  }

  /** Last epoch applied for `appId`; None before the first. */
  def lastApplied(manifestPath: String, appId: String): Option[Long] =
    AtomicText.readLines(appliedPath(manifestPath, appId))
      .headOption.map(_.toLong)

  /** Collapse one change-feed micro-batch to net per-key changes:
    * `(upserts, deleteKeys)` — either may be empty. */
  def collapse(batch: DataFrame, keys: Seq[String])
    : (DataFrame, DataFrame) = {
    require(batch.columns.contains("_change_type") &&
      batch.columns.contains("_commit_batch"),
      "CDC apply input must be a change feed (needs _change_type and " +
        "_commit_batch columns — read with changeFeed=true or " +
        "table_changes)")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_commit_batch").desc)
    val last = batch
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    (last.filter(col("_change_type") =!= "delete")
      .drop("_change_type", "_commit_batch"),
      last.filter(col("_change_type") === "delete")
        .select(keys.map(col): _*))
  }

  /** Apply one micro-batch (already change-feed shaped) to the
    * downstream table at `root`/`manifestPath`: collapse, then one
    * atomic bootstrap-append or merge. Skips (returns false) when
    * `epochId` was already applied for `appId`. */
  def applyBatch(spark: SparkSession, batch: DataFrame, root: String,
                 manifestPath: String, keys: Seq[String], appId: String,
                 epochId: Long, cdf: Boolean = false): Boolean = {
    if (lastApplied(manifestPath, appId).exists(_ >= epochId)) return false
    if (batch.isEmpty) {
      AtomicText.writeAtomically(appliedPath(manifestPath, appId),
        epochId.toString)
      return true
    }
    val man = new TxnManifest(manifestPath)
    val (ups, delKeys) = collapse(batch, keys)
    val ids = man.committed().keySet
    val nextId = if (ids.isEmpty) 0 else ids.max + 1
    if (man.committedDirs(root).isEmpty) {
      // bootstrap: the first net state IS the table; net deletes of
      // rows that never existed downstream drop with the collapse
      StatsSinks.appendBatchStats(ups, root, nextId)
      man.commit(nextId, Seq(s"$root/batch=$nextId"))
    } else {
      Sinks.merge(spark, Some(ups), Some(delKeys), root, man, keys,
        mergeId = nextId, cdf = cdf)
    }
    AtomicText.writeAtomically(appliedPath(manifestPath, appId),
      epochId.toString)
    true
  }

  /** Start the replication stream: `changes` (a streaming change
    * feed) applies to the downstream table per micro-batch. */
  def start(changes: DataFrame, root: String, manifestPath: String,
            keys: Seq[String], checkpoint: String, appId: String,
            cdf: Boolean = false): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        applyBatch(batch.sparkSession, batch, root, manifestPath, keys,
          appId, epochId, cdf)
        ()
      }
      .start()
}
