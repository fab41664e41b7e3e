package graft.sources

import graft.util.AtomicText

/** S11 at production strength — the multi-table commit point.
  *
  * The reference loads a fact table and its `Sync` mapping side table
  * inside ONE database transaction
  * (`Main_Modules/Categories/categories.py:125-128`,
  * `accounts.py:113-140`): a reader never observes one without the
  * other. Without a transactional table format offline, the same
  * guarantee comes from indirection: data directories land first —
  * invisible, because readers resolve through this manifest — and the
  * single manifest file is then replaced atomically
  * ([[graft.util.AtomicText.writeAtomically]]). A crash anywhere
  * before the rename leaves the previous manifest: NEITHER output of
  * the in-flight batch is visible, and a restart re-runs the batch id,
  * overwriting the orphan directories idempotently before committing.
  * This is the `_delta_log` shape — on a cluster the same call sites
  * become a Delta multi-table txn with no structural change.
  *
  * Format: one line per committed batch,
  * `batchId<TAB>dir1<TAB>dir2...` — re-committing a batch id replaces
  * its line (idempotent re-run after a crash).
  */
final class TxnManifest(path: String) {

  /** batchId → the output directories that batch committed. */
  def committed(): Map[Int, Seq[String]] =
    AtomicText.readLines(path).map { line =>
      val fields = line.split('\t')
      fields.head.toInt -> fields.tail.toSeq
    }.toMap

  /** All committed directories under `root`, oldest batch first. */
  def committedDirs(root: String): Seq[String] =
    committed().toSeq.sortBy(_._1)
      .flatMap(_._2)
      .filter(_.startsWith(root + "/"))

  /** The ONE commit point: all of `dirs` become visible together or —
    * on a crash before the atomic rename — none do. */
  def commit(batchId: Int, dirs: Seq[String]): Unit =
    writeAll(committed() + (batchId -> dirs))

  /** Compaction commit: atomically un-name every committed dir under
    * `root` and name `dirs` as batch `batchId` instead — one rename,
    * so readers see the pre- or post-compaction view, never a mix.
    * Entries' dirs under OTHER roots (a dual-write manifest) are
    * preserved; entries left empty disappear. */
  def replaceAll(root: String, batchId: Int, dirs: Seq[String]): Unit =
    replaceWith(_.startsWith(root + "/"), batchId, dirs,
      s"pick a fresh id for the compacted output")

  /** Partial-rewrite commit (row-level MERGE): atomically un-name ONLY
    * `removed` and name `dirs` as batch `batchId` — entries for
    * untouched dirs survive, so a merge that rewrites 2 of 500 batch
    * dirs commits a 2-dir swap, not a table rewrite. One rename:
    * readers see the pre- or post-merge view, never a mix. */
  def replaceDirs(removed: Set[String], batchId: Int, dirs: Seq[String]): Unit =
    replaceWith(removed.contains, batchId, dirs,
      s"pick a fresh id for the merge output")

  private def replaceWith(drop: String => Boolean, batchId: Int,
                          dirs: Seq[String], hint: String): Unit = {
    val pruned = committed().view
      .mapValues(_.filterNot(drop))
      .filter(_._2.nonEmpty).toMap
    require(!pruned.contains(batchId),
      s"batch id $batchId still names other dirs — $hint")
    writeAll(pruned + (batchId -> dirs))
  }

  private def writeAll(entries: Map[Int, Seq[String]]): Unit = {
    entries.values.flatten.foreach(AtomicText.requireCleanKey(_, "manifest dir"))
    val body = entries.toSeq.sortBy(_._1)
      .map { case (id, ds) => (id.toString +: ds).mkString("\t") }
      .mkString("", "\n", "\n")
    AtomicText.writeAtomically(path, body)
  }
}
