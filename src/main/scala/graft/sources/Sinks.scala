package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/** Sink adapters (SURVEY.md §2.1 S8-S12).
  *
  * The reference's load phase is: idempotent `ALTER TABLE ADD` (S10),
  * transactional append (S8), side "Sync" table write (S11), per-column
  * SQL type mapping (S12) — all inside one DB transaction. Without a
  * transactional table format offline, exactly-once is recovered the
  * way [[graft.ops.Cdc]] does: deterministic batch → batch-keyed
  * directory (idempotent overwrite) → watermark committed last. On a
  * cluster with Delta/Iceberg the same call sites become `MERGE` /
  * txn-append with no shape change.
  */
object Sinks {

  /** S12 — apply the reference's dtype maps (`accounts.py:93-108`,
    * `locations.py:186-188`) as casts immediately before the sink. */
  def applySinkTypes(df: DataFrame, types: Map[String, DataType]): DataFrame =
    types.foldLeft(df) { case (d, (name, t)) =>
      if (d.columns.contains(name)) d.withColumn(name, col(name).cast(t)) else d
    }

  /** S8 — append a batch under a batch-keyed subdirectory: re-running
    * the same batch id overwrites identically (idempotent), giving
    * at-least-once extract / exactly-once apply like the reference's
    * data+watermark transaction. */
  def appendBatch(df: DataFrame, root: String, batchId: Int): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/batch=$batchId")
    ()
  }

  /** S10 — schema evolution on read: new columns appear (NULL-filled
    * for old batches) the way the reference's conditional
    * `ALTER TABLE ADD OldXID` widens the target table. */
  def readEvolved(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(root)

  /** Bucketed managed table: pre-shuffles once at write so every later
    * equi-join/aggregation on `keys` is exchange-free (the cluster
    * analogue of the reference's indexed target tables — pay the
    * shuffle once, reuse per query). Requires `saveAsTable`
    * (bucket metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
    ()
  }

  /** Hive-style partitioned layout: directory per key value → partition
    * pruning turns key-filtered scans into O(selected partitions). */
  def writePartitioned(df: DataFrame, path: String, keys: Seq[String]): Unit = {
    df.write.mode(SaveMode.Overwrite).partitionBy(keys: _*).parquet(path)
    ()
  }

  /** S11 — dual-output load (fact + Sync mapping side table,
    * `categories.py:125-128`). The mapping rows derive from the SAME
    * in-memory batch, so persist once and write both — a crash between
    * the writes is repaired by idempotent re-run of the batch id. */
  def dualWrite(fact: DataFrame, mapping: DataFrame, factRoot: String,
                mappingRoot: String, batchId: Int): Unit = {
    appendBatch(fact, factRoot, batchId)
    appendBatch(mapping, mappingRoot, batchId)
  }

  /** S11, transactional — [[dualWrite]] plus the reference's
    * one-transaction visibility: both directories land as invisible
    * data, then ONE atomic [[TxnManifest]] commit names them both.
    * Readers going through [[readCommitted]] observe both outputs of a
    * batch or neither, exactly like the reference's `engine.begin()`
    * dual INSERT. */
  def dualWriteAtomic(fact: DataFrame, mapping: DataFrame, factRoot: String,
                      mappingRoot: String, manifest: TxnManifest,
                      batchId: Int): Unit = {
    appendBatch(fact, factRoot, batchId)
    appendBatch(mapping, mappingRoot, batchId)
    manifest.commit(batchId,
      Seq(s"$factRoot/batch=$batchId", s"$mappingRoot/batch=$batchId"))
  }

  /** Manifest-resolved read: only directories the manifest has
    * committed are scanned, so orphan dirs from a crashed batch are
    * invisible. Fails loudly when nothing is committed under `root` —
    * there is no schema to guess an empty frame from (Delta has its
    * log's schema; a fresh manifest has nothing).
    *
    * S10 on the transactional path: `mergeSchema` unions the batch
    * schemas, so a batch that COMMITS new columns serves older
    * batches' rows as NULL in those columns — additive evolution with
    * the same reader, the offline equivalent of Delta's
    * mergeSchema-on-write (column REMOVAL/retype stays an error by
    * parquet's merge rules, which is the safe default). */
  def readCommitted(spark: org.apache.spark.sql.SparkSession, root: String,
                    manifest: TxnManifest): DataFrame = {
    val dirs = manifest.committedDirs(root)
    if (dirs.isEmpty)
      throw new IllegalStateException(
        s"no committed batches under $root — nothing visible yet")
    spark.read.option("mergeSchema", true).parquet(dirs: _*)
  }
}
