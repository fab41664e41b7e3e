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

  /** Compaction — the small-files answer ingestion creates: many
    * small batch dirs (each its own parquet footer, each a scan task)
    * re-written as ONE right-sized dir, made visible by a single
    * atomic manifest commit that simultaneously un-names every input
    * dir. Readers through [[readCommitted]] see the old batches or
    * the compacted result, never both, never neither — OPTIMIZE with
    * `_delta_log` semantics on plain parquet. The superseded dirs
    * stay on disk (crash safety: the old manifest may still name
    * them) until [[vacuum]] removes what no manifest names.
    *
    * @param compactId batch id for the compacted output; must not
    *   collide with a live batch id. */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String,
              manifest: TxnManifest, compactId: Int, numFiles: Int): Unit =
    withJobDescription(spark, s"graft: compact $root -> batch=$compactId") {
    val dirs = manifest.committedDirs(root)
    require(dirs.nonEmpty, s"nothing committed under $root to compact")
    val all = spark.read.option("mergeSchema", true).parquet(dirs: _*)
    val target = s"$root/batch=$compactId"
    require(!dirs.contains(target), s"compactId $compactId is a live batch")
    all.coalesce(numFiles).write.mode(SaveMode.Overwrite).parquet(target)
    // maintenance must not LOSE data-skipping capability: re-stat the
    // compacted files (cheap footer pass) before they become visible
    BatchStats.writeSidecar(spark, target)
    // ONE commit point: all input batches' entries are replaced by the
    // compacted dir — readers flip atomically
    manifest.replaceAll(root, compactId, Seq(target))
  }

  /** OPTIMIZE ZORDER BY for the manifest table: compaction that
    * re-CLUSTERS instead of just re-packing. The committed history
    * rewrites z-ordered on (a, b) ([[graft.sources.Layout]] Morton
    * keys — each output file covers a small rectangle of the value
    * space), a [[BatchStats]] sidecar is written over the new files,
    * and ONE `replaceAll` commit flips readers atomically. After this,
    * manifest-level data skipping prunes on EITHER column: the
    * accumulated append-order batches (clustered by arrival time, so
    * only time-correlated predicates pruned) become value-clustered
    * files whose sidecar bounds are tight for both dimensions. Same
    * maintenance contract as [[compact]]: no in-flight writers, stay
    * behind the slowest streaming checkpoint. */
  def compactZOrdered(spark: org.apache.spark.sql.SparkSession, root: String,
                      manifest: TxnManifest, compactId: Int,
                      a: org.apache.spark.sql.Column,
                      b: org.apache.spark.sql.Column, numFiles: Int): Unit =
    withJobDescription(spark, s"graft: zorder-compact $root -> batch=$compactId") {
    val dirs = manifest.committedDirs(root)
    require(dirs.nonEmpty, s"nothing committed under $root to compact")
    val target = s"$root/batch=$compactId"
    require(!dirs.contains(target), s"compactId $compactId is a live batch")
    val all = spark.read.option("mergeSchema", true).parquet(dirs: _*)
    Layout.writeZOrdered(all, target, a, b, numFiles)
    BatchStats.writeSidecar(spark, target)
    manifest.replaceAll(root, compactId, Seq(target))
  }

  /** Spark-UI attribution for multi-job maintenance operations: every
    * job the body launches carries `desc`, restored after. */
  private def withJobDescription[A](spark: org.apache.spark.sql.SparkSession,
                                    desc: String)(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** Row-level MERGE (upsert) on the manifest layer — Delta
    * `MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    * THEN INSERT *` semantics on plain parquet, the write shape behind
    * the reference's watermark MERGE (`accounts.py:131-140`) and Sync
    * upserts (`categories.py:84,128`).
    *
    * Copy-on-write at batch-dir granularity:
    *   1. find the committed dirs that CONTAIN a matched key (one
    *      semi-join pass with `input_file_name`; the updates side is
    *      batch-sized and broadcasts) — unaffected dirs are never read
    *      again nor rewritten;
    *   2. rewrite = (affected dirs' rows anti-joined on `keys`)
    *      ∪ updates, written as ONE new batch dir (insert-only rows
    *      land there too);
    *   3. one atomic [[TxnManifest.replaceDirs]] commit swaps exactly
    *      the affected entries for the new dir. A crash before the
    *      commit leaves the old view; the orphan dir is vacuumable.
    *
    * Updates must be UNIQUE on `keys` (two source rows matching one
    * target row is ambiguous — same loud error Delta raises). Matched
    * rows are replaced WHOLE (UPDATE SET *); new columns in `updates`
    * evolve the schema additively, NULL-filled for kept rows.
    *
    * At 100 TB the affected-dir probe is the piece to upgrade: per-dir
    * key min/max (or bloom) stats prune without the scan — the same
    * data-skipping Delta keeps in its log. The commit shape is already
    * O(affected), not O(table).
    *
    * @param mergeId batch id for the rewritten output; must not
    *   collide with a live batch id. */
  def mergeUpsert(spark: org.apache.spark.sql.SparkSession, updates: DataFrame,
                  root: String, manifest: TxnManifest, keys: Seq[String],
                  mergeId: Int): Unit =
    withJobDescription(spark, s"graft: merge $root -> batch=$mergeId") {
    import org.apache.spark.sql.functions.{broadcast, count, input_file_name, lit}
    val dirs = manifest.committedDirs(root)
    require(dirs.nonEmpty, s"nothing committed under $root to merge into")
    val target = s"$root/batch=$mergeId"
    require(!dirs.contains(target), s"mergeId $mergeId is a live batch")
    val keyCols = keys.map(col)

    val dup = updates.groupBy(keyCols: _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"updates are not unique on (${keys.mkString(", ")}): e.g. " +
        dup.headOption.map(_.toString).getOrElse(""))

    val keysOnly = updates.select(keyCols: _*)
    val current = spark.read.option("mergeSchema", true).parquet(dirs: _*)
    // input_file_name yields URIs (file:///…); manifest dirs are plain
    // paths — normalize both sides before the prefix match
    def pathOf(s: String) = new org.apache.hadoop.fs.Path(s).toUri.getPath
    val affectedFiles = current.withColumn("__file", input_file_name())
      .join(broadcast(keysOnly), keys, "left_semi")
      .select("__file").distinct().collect().map(r => pathOf(r.getString(0)))
    val affectedDirs = dirs.filter(d =>
      affectedFiles.exists(_.startsWith(pathOf(d) + "/")))

    val kept =
      if (affectedDirs.isEmpty) updates.limit(0) // pure insert
      else spark.read.option("mergeSchema", true).parquet(affectedDirs: _*)
        .join(broadcast(keysOnly), keys, "left_anti")
    val merged = kept.unionByName(updates, allowMissingColumns = true)
    merged.write.mode(SaveMode.Overwrite).parquet(target)
    // rewritten dirs may have carried stats sidecars — the merge
    // output keeps the table skippable (cheap footer pass)
    BatchStats.writeSidecar(spark, target)
    manifest.replaceDirs(affectedDirs.toSet, mergeId, Seq(target))
  }

  /** Remove `batch=N` directories under `root` that NO manifest entry
    * names — crash orphans and compacted-away inputs. Deliberately
    * restricted to the batch-dir layout so a mis-pointed root cannot
    * delete arbitrary data. Returns the deleted directory names.
    *
    * `graceMillis` is the Delta-VACUUM-style retention check: a
    * directory modified within the grace window is skipped, because a
    * concurrent producer sits in exactly that state between
    * `appendBatch` (data landed) and `manifest.commit` (dir named) —
    * vacuuming inside that window would let the producer commit a
    * pointer to a deleted directory. Pass 0 only when no writer can be
    * in flight (tests, exclusive maintenance). */
  def vacuum(root: String, manifest: TxnManifest,
             graceMillis: Long = 24L * 3600 * 1000): Seq[String] = {
    import org.apache.hadoop.fs.{FileContext, Path}
    val live = manifest.committedDirs(root).toSet
    val cutoff = System.currentTimeMillis() - graceMillis
    val rootPath = new Path(root)
    val fc =
      if (rootPath.toUri.getScheme == null)
        FileContext.getFileContext(spark2HadoopConf)
      else FileContext.getFileContext(rootPath.toUri, spark2HadoopConf)
    if (!fc.util().exists(rootPath)) return Nil
    val candidates = fc.util().listStatus(rootPath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filterNot(st => live.contains(s"$root/${st.getPath.getName}"))
      .filter(_.getModificationTime <= cutoff)
    candidates.foreach(st => fc.delete(st.getPath, /* recursive = */ true))
    candidates.map(_.getPath.getName).toSeq
  }

  /** Active session's Hadoop conf when one exists; defaults otherwise
    * (same resolution as [[graft.util.AtomicText]]). */
  private def spark2HadoopConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

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

  /** Time travel on the manifest layer: the table as it stood when
    * batch `asOfBatch` was the newest commit — Delta's `VERSION AS OF`
    * on plain parquet. Works because commits only ADD batch-keyed
    * dirs and [[vacuum]] only deletes UN-named ones; the one
    * history-rewriting operation is [[compact]], whose `replaceAll`
    * collapses its inputs into one entry — travel before a compaction
    * point therefore degrades to the compacted view, exactly like
    * Delta time travel after its VACUUM horizon. */
  def readCommittedAsOf(spark: org.apache.spark.sql.SparkSession, root: String,
                        manifest: TxnManifest, asOfBatch: Int): DataFrame = {
    val dirs = manifest.committed().toSeq
      .filter(_._1 <= asOfBatch).sortBy(_._1)
      .flatMap(_._2).filter(_.startsWith(root + "/"))
    if (dirs.isEmpty)
      throw new IllegalStateException(
        s"nothing committed under $root at or before batch $asOfBatch")
    spark.read.option("mergeSchema", true).parquet(dirs: _*)
  }
}
