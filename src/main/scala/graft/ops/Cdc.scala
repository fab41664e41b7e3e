package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** CDC-watermark incremental processing (SURVEY.md §2.1 S2-S3, S8-S9, §2.9).
  *
  * The reference's shape (`accounts.py:36-41,110,131-161`):
  *   read watermark from `app.EtlCDC` → `SELECT TOP n * WHERE id > wm
  *   ORDER BY id` → transform → append + MERGE watermark in ONE
  *   transaction → loop until an empty batch.
  *
  * Spark-first re-expression: the watermark is a tiny keyed state table
  * (here parquet, driver-side read — at production scale a Delta table
  * with `MERGE INTO`); the keyset scan is `filter > wm` + `orderBy` +
  * `limit`, which Catalyst plans as `TakeOrderedAndProject` — no global
  * sort materialization, and the `id > wm` predicate is pushed into the
  * parquet scan (min/max row-group skipping ≈ the keyset index seek).
  * Exactly-once apply without multi-table transactions: each batch
  * writes to a `batch=<id>` subdirectory and the watermark file is
  * committed last; on restart an already-written batch directory is
  * overwritten idempotently (same batch id ⇒ same rows, since the scan
  * is deterministic).
  */
object Cdc {

  /** S3 — one incremental batch: keyset-paginated scan. */
  def keysetBatch(src: DataFrame, idCol: String, watermark: Long, batchSize: Int): DataFrame =
    src.filter(col(idCol) > watermark).orderBy(col(idCol)).limit(batchSize)

  /** A4 — next watermark = max id of the batch (`accounts.py:110`). */
  def nextWatermark(batch: DataFrame, idCol: String): Option[Long] =
    batch.agg(max(col(idCol))).first() match {
      case r if r.isNullAt(0) => None
      case r                  => Some(r.getLong(0))
    }

  /** S2/S9 — watermark state persisted as a tiny keyed parquet table
    * (`app.EtlCDC(TableName, MaxIndex)`, `Setup/setup.sql:122-125`). */
  /** @param initial watermark when no state exists yet. The reference
    *   uses 0 (`ISNULL(MaxIndex,0)`, ids start at 1); testdata ids
    *   start at 0, so callers there pass -1 — the scan is exclusive
    *   (`id > wm`). */
  final class WatermarkStore(spark: SparkSession, path: String, initial: Long = 0L) {
    import spark.implicits._

    // Write-through cache: the state table is tiny and this store is
    // the single writer (like the reference's one ETL process), so the
    // loop never re-reads parquet per batch — disk is the restart path.
    private var cache: Option[Map[String, Long]] = None

    private def load(): Map[String, Long] = cache.getOrElse {
      val dir = new java.io.File(path)
      val m =
        if (!dir.exists()) Map.empty[String, Long]
        else spark.read.parquet(path).as[(String, Long)].collect().toMap
      cache = Some(m)
      m
    }

    def read(table: String): Long = load().getOrElse(table, initial)

    /** MERGE-equivalent upsert (`accounts.py:131-140`): read-modify-write
      * of the (tiny) state table, committed to disk then cached.
      *
      * The delete+rename pair is not atomic: a crash in the window
      * loses the state file and the next start reprocesses from
      * `initial` — safe because batch identity is the start watermark
      * (see [[runLoop]]), so reprocessing rewrites identical batch
      * directories. A failed rename throws rather than leaving memory
      * and disk divergent. */
    def upsert(table: String, maxIndex: Long): Unit = {
      val updated = load() + (table -> maxIndex)
      val tmp = path + ".tmp"
      updated.toSeq.toDF("TableName", "MaxIndex")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val dir  = new java.io.File(path)
      val tmpF = new java.io.File(tmp)
      deleteRecursively(dir)
      if (!tmpF.renameTo(dir))
        throw new java.io.IOException(
          s"watermark commit failed: rename $tmp -> $path")
      cache = Some(updated)
      ()
    }

    private def deleteRecursively(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
      f.delete()
      ()
    }
  }

  /** The `while True: extract→transform→load` loop (`accounts.py:147-161`),
    * driver-side control flow above Catalyst. Returns the number of
    * batches processed.
    *
    * `sink` receives (batchDf, startWatermark). The watermark — NOT a
    * restart-relative counter — is the batch identity: after a crash
    * between sink and watermark commit, the retried batch has the same
    * start watermark, hence the same rows and the same sink key, so an
    * idempotent sink (batch-keyed overwrite, [[graft.sources.Sinks]])
    * lands exactly-once. A counter would restart at 0 and collide with
    * earlier batches' directories. */
  def runLoop(src: DataFrame, idCol: String, table: String,
              store: WatermarkStore, batchSize: Int,
              transform: DataFrame => DataFrame,
              sink: (DataFrame, Long) => Unit,
              maxBatches: Int = Int.MaxValue): Int = {
    var n = 0
    var done = false
    while (!done && n < maxBatches) {
      val wm    = store.read(table)
      // persist: the batch feeds two actions (watermark max + sink) —
      // without it the keyset scan runs twice per iteration.
      val batch = keysetBatch(src, idCol, wm, batchSize).persist()
      try nextWatermark(batch, idCol) match {
        case None => done = true
        case Some(next) =>
          sink(transform(batch), wm)
          store.upsert(table, next)
          n += 1
      } finally { batch.unpersist(); () }
    }
    n
  }
}
