package graft.sources

import graft.util.AtomicText

/** File-level load tracking for `COPY INTO` — Delta's idempotent
  * bulk-ingest verb: a source file is loaded AT MOST ONCE across any
  * number of re-runs (re-running the statement after new files land
  * picks up only the new ones; `FORCE` reloads regardless).
  *
  * One entry file per ingest batch under `<root>/_copy_log/b<id>.list`
  * — INSIDE the table root, so a managed DROP purges the tracking
  * with the table (a recreated table must not inherit a dead table's
  * loaded set). Safe there: reads are manifest-driven (entries are
  * named dirs, not a disk listing) and vacuum sweeps only
  * `batch=*`-shaped orphans. The entry is written with an EXCLUSIVE
  * create BEFORE the manifest
  * CAS that commits the same batch, and counts only once its batch
  * dir appears in the manifest's HISTORY:
  *
  *   - crash between entry write and commit → the dir never enters
  *     history, the entry is stale and ignored; a later sweep
  *     reclaims it ([[CopyLog.sweepStale]]);
  *   - compaction / TRUNCATE / RESTORE un-name the dir from the
  *     CURRENT view but not from history → files stay loaded, which
  *     is Delta's documented rule (COPY INTO never reloads a file it
  *     already loaded even if its rows were later deleted);
  *   - two concurrent COPYs compute the same next id → the exclusive
  *     create admits one; the loser fails LOUDLY (the same discipline
  *     as the manifest CAS) instead of silently overwriting the
  *     winner's file list with its own.
  *
  * Batch-id selection ([[CopyLog.nextBatchId]]) takes the max over
  * EVER-COMMITTED ids, not just the current view, so a TRUNCATE that
  * empties the view never makes COPY reuse an id an old entry is
  * keyed to. Residual window (documented, not closed): a crashed
  * COPY's stale entry plus a LATER non-COPY writer reusing that exact
  * id would falsely validate the stale entry; the sweep reclaims
  * stale entries after [[CopyLog.staleAfterMs]] to keep that window
  * bounded.
  */
object CopyLog {

  /** How long a never-committed entry may exist before the sweep
    * treats it as a crashed attempt rather than a copy in flight. */
  val staleAfterMs: Long = 60L * 60 * 1000

  def dir(root: String): String = root.stripSuffix("/") + "/_copy_log"

  private def entryPath(root: String, batchId: Int): String =
    s"${dir(root)}/b$batchId.list"

  /** Every dir name any manifest version ever committed. */
  def everAdded(man: TxnManifest): Set[String] =
    man.history().flatMap(_.added).toSet

  /** Next ingest id: one past the max of current ids and every
    * `<root>/batch=N` that ever appeared in history. */
  def nextBatchId(root: String, man: TxnManifest,
                  ever: Set[String]): Int = {
    val prefix = root.stripSuffix("/") + "/batch="
    val historical = ever.collect {
      case d if d.startsWith(prefix) =>
        d.stripPrefix(prefix).takeWhile(_.isDigit) match {
          case "" => -1
          case n  => n.toInt
        }
    }
    val ids = man.committed().keySet ++ historical
    if (ids.isEmpty) 0 else ids.max + 1
  }

  /** The session's Hadoop conf (credentials, fs.impl overrides) when a
    * session is active — every filesystem touch in this object resolves
    * through it, so s3a/abfs credentials in the Spark conf reach the
    * delete path too, not just the listing. */
  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    new org.apache.hadoop.conf.Configuration(
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration()))

  private def listEntries(root: String)
    : Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(dir(root))
    val fs = p.getFileSystem(hadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(s =>
      s.isFile && s.getPath.getName.matches("b\\d+\\.list"))
  }

  /** Source files already loaded into `root`: the union of entries
    * whose batch dir ever committed. */
  def loadedFiles(root: String, man: TxnManifest): Set[String] = {
    val ever = everAdded(man)
    listEntries(root).flatMap { s =>
      val id = s.getPath.getName.stripPrefix("b").stripSuffix(".list").toInt
      if (ever.contains(s"${root.stripSuffix("/")}/batch=$id"))
        AtomicText.readLines(s.getPath.toString)
      else Nil
    }.toSet
  }

  /** Reclaim entries from crashed attempts: never committed AND older
    * than [[staleAfterMs]]. Never touches a fresh entry — that may be
    * a copy in flight. */
  def sweepStale(root: String, man: TxnManifest): Unit = {
    val ever = everAdded(man)
    val cutoff = System.currentTimeMillis() - staleAfterMs
    listEntries(root).foreach { s =>
      val id = s.getPath.getName.stripPrefix("b").stripSuffix(".list").toInt
      if (!ever.contains(s"${root.stripSuffix("/")}/batch=$id") &&
          s.getModificationTime < cutoff)
        s.getPath.getFileSystem(hadoopConf()).delete(s.getPath, false)
    }
  }

  /** Record `files` as batch `batchId`'s load set — exclusive create;
    * refuses loudly when the id's entry already exists (a concurrent
    * COPY, or a crashed one younger than the sweep horizon). */
  def record(root: String, batchId: Int, files: Seq[String]): Unit = {
    val ok = AtomicText.createExclusive(entryPath(root, batchId),
      files.sorted.mkString("\n") + "\n")
    if (!ok) throw new IllegalStateException(
      s"COPY INTO tracking entry b$batchId.list already exists under " +
        s"${dir(root)} — another COPY INTO is in flight for this table, " +
        "or a recent one crashed before committing; re-run after it " +
        s"finishes (crashed entries are reclaimed after " +
        s"${staleAfterMs / 60000} minutes)")
  }
}
