package graft.util

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Tiny-state text files with crash-atomic replacement — the commit
  * primitive under [[graft.ops.Cdc.WatermarkStore]] (S9) and
  * [[graft.sources.TxnManifest]] (S11). At production scale both become
  * a transactional table (Delta `MERGE INTO` / `_delta_log`); offline,
  * a single-file `Files.move(ATOMIC_MOVE)` is the POSIX-atomic
  * equivalent: a crash leaves the old or the new file intact, never
  * neither and never a torn mix.
  */
object AtomicText {

  /** All non-empty lines of `path`; Nil when absent. A path that
    * exists but is NOT a regular file (e.g. a state DIRECTORY left by
    * an older layout) fails with a migration hint instead of an opaque
    * `IOException` from `readAllLines`. */
  def readLines(path: String): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Nil
    else if (!Files.isRegularFile(p))
      throw new IllegalStateException(
        s"state path $path exists but is not a regular file — " +
          "legacy directory-format state found; delete or migrate it")
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
        .filter(_.nonEmpty)
    }
  }

  /** Replace `path` with `body`: write a sibling temp file, then one
    * atomic rename. Creates parent directories as needed. */
  def writeAtomically(path: String, body: String): Unit = {
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Keys become line prefixes in tab-separated state files; a tab or
    * control character would corrupt the manifest on the next read. */
  def requireCleanKey(key: String, what: String): Unit =
    require(!key.exists(c => c == '\t' || Character.isISOControl(c)),
      s"$what must not contain tabs or control characters: ${key.take(40)}")
}
