package graft.util

import java.nio.charset.StandardCharsets
import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Tiny-state text files with crash-atomic replacement — the commit
  * primitive under [[graft.ops.Cdc.WatermarkStore]] (S9) and
  * [[graft.sources.TxnManifest]] (S11). At production scale both become
  * a transactional table (Delta `MERGE INTO` / `_delta_log`); offline,
  * a single-file rename is the atomic equivalent: a crash leaves the
  * old or the new file intact, never neither and never a torn mix.
  *
  * All IO goes through the Hadoop [[FileContext]] API, so the same
  * code serves `file:` in this sandbox and `hdfs:`/`viewfs:` on a
  * cluster — `FileContext.rename(OVERWRITE)` is atomic on both (POSIX
  * rename / HDFS namespace op), and unlike the `FileSystem` facade,
  * `FileContext` binds `file:` to [[org.apache.hadoop.fs.RawLocalFs]],
  * so no `.crc` sidecars are written that a raw rename would orphan.
  * OBJECT-STORE CAVEAT: on `s3a:` and friends rename is
  * copy-then-delete, NOT atomic — there the manifest must live on a
  * real filesystem (HDFS, DBFS) or be replaced by a log-based commit
  * service (the `_delta_log` shape this layer mirrors); the same
  * caveat Delta documents for S3 multi-writer.
  */
object AtomicText {

  /** Active session's Hadoop conf when one exists (carries scheme
    * configs/credentials on a cluster); plain defaults otherwise. */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def contextFor(p: Path): FileContext = {
    val uri = p.toUri
    if (uri.getScheme == null) FileContext.getFileContext(hadoopConf)
    else FileContext.getFileContext(uri, hadoopConf)
  }

  /** Modification time of `path` in epoch millis; None when absent.
    * The clock source for timestamp-addressed time travel: commit
    * claim files carry their publish time as mtime, the same basis
    * Delta uses (log-file mtimes) for `TIMESTAMP AS OF`. */
  def mtime(path: String): Option[Long] = {
    val p = new Path(path)
    val fc = contextFor(p)
    if (fc.util().exists(p)) Some(fc.getFileStatus(p).getModificationTime)
    else None
  }

  /** All non-empty lines of `path`; Nil when absent. A path that
    * exists but is NOT a regular file (e.g. a state DIRECTORY left by
    * an older layout) fails with a migration hint instead of an opaque
    * `IOException` from the open. */
  def readLines(path: String): Seq[String] = {
    val p = new Path(path)
    val fc = contextFor(p)
    if (!fc.util().exists(p)) Nil
    else if (!fc.getFileStatus(p).isFile)
      throw new IllegalStateException(
        s"state path $path exists but is not a regular file — " +
          "legacy directory-format state found; delete or migrate it")
    else {
      val in = fc.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
          .split('\n').toSeq.filter(_.nonEmpty)
      } finally in.close()
    }
  }

  /** Replace `path` with `body`: write a sibling temp file, then one
    * atomic rename. Creates parent directories as needed.
    *
    * The rename is scheme-dispatched, because "atomic" is per-FS:
    * `RawLocalFs` inherits `AbstractFileSystem`'s DEFAULT
    * `renameInternal(overwrite)`, which is delete-then-rename — a
    * concurrent reader in that window sees NO manifest at all (caught
    * live: a streaming consumer's `latestOffset` read an empty log
    * mid-commit and re-delivered the whole history). For `file:` the
    * POSIX `ATOMIC_MOVE` is the real atomic primitive; for `hdfs:`
    * and friends, `FileContext.rename(OVERWRITE)` IS the atomic
    * namespace op (Hdfs overrides renameInternal natively). */
  def writeAtomically(path: String, body: String): Unit = {
    val target = new Path(path)
    val fc = contextFor(target)
    val tmp = new Path(path + ".tmp")
    val out = fc.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val qualified = fc.makeQualified(target)
    if (qualified.toUri.getScheme == "file") {
      val toNio = (p: Path) =>
        java.nio.file.Paths.get(fc.makeQualified(p).toUri.getPath)
      java.nio.file.Files.move(toNio(tmp), toNio(target),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else fc.rename(tmp, target, Options.Rename.OVERWRITE)
    ()
  }

  /** Keys become line prefixes in tab-separated state files; a tab or
    * control character would corrupt the manifest on the next read. */
  def requireCleanKey(key: String, what: String): Unit =
    require(!key.exists(c => c == '\t' || Character.isISOControl(c)),
      s"$what must not contain tabs or control characters: ${key.take(40)}")

  /** Create `path` EXCLUSIVELY with `body`: returns true on success,
    * false when the file already exists (the compare-and-swap
    * primitive under [[graft.sources.TxnManifest]]'s versioned
    * commits). The claim is all-or-nothing on BOTH counts: exclusivity
    * AND content. The body is always written to a uniquely-named
    * sibling temp first, then published by a single primitive that
    * atomically fails when the target exists — so two racing claimers
    * can never both win, and a crash mid-write leaves the claim ABSENT
    * (plus a harmless orphan temp), never present-but-torn. Like
    * [[writeAtomically]], the publish is scheme-dispatched because the
    * atomic no-replace primitive is per-FS: `FileContext`'s CREATE
    * flag on `RawLocalFs` is check-then-create (non-atomic TOCTOU) and
    * local rename overwrites silently, but a POSIX hard link is an
    * atomic exclusive publish; on `hdfs:` `rename(Rename.NONE)` is the
    * atomic namespace op that fails when the destination exists. */
  def createExclusive(path: String, body: String): Boolean = {
    val target = new Path(path)
    val fc = contextFor(target)
    val tmp = new Path(path + ".claim-" + java.util.UUID.randomUUID())
    val out = fc.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val qualified = fc.makeQualified(target)
    try {
      if (qualified.toUri.getScheme == "file") {
        val toNio = (p: Path) =>
          java.nio.file.Paths.get(fc.makeQualified(p).toUri.getPath)
        try { java.nio.file.Files.createLink(toNio(target), toNio(tmp)); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        try { fc.rename(tmp, target, Options.Rename.NONE); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException        => false
        }
      }
    } finally {
      try fc.delete(tmp, false) catch { case _: java.io.IOException => () }
    }
  }

  /** Whole-file read normalized to newline-terminated non-empty lines
    * (the shape every writer in this codebase produces); empty string
    * when absent. */
  def readAll(path: String): String = {
    val lines = readLines(path)
    if (lines.isEmpty) "" else lines.mkString("", "\n", "\n")
  }
}
