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
  * Format: a `#version=N` header, then one line per committed batch,
  * `batchId<TAB>dir1<TAB>dir2...` — re-committing a batch id replaces
  * its line (idempotent re-run after a crash).
  *
  * CONCURRENT-WRITER fencing (the optimistic-concurrency half of the
  * `_delta_log` shape): every mutation is a compare-and-swap on the
  * version it read. The new state is first written EXCLUSIVELY to a
  * sibling claim file named by the NEXT version (`<path>.v<N+1>`),
  * then atomically renamed over the manifest. A second producer whose
  * snapshot is stale finds its claim already taken and fails LOUDLY
  * instead of silently last-write-winning away the racer's commit; a
  * crashed commit (claim written, rename lost) recovers idempotently —
  * re-running the same batch produces a byte-identical claim, which is
  * completed instead of refused. Claim files are tombstones: they
  * PERSIST (one tiny file per commit, the Delta log history) so a
  * writer stale by many versions still hits an existing claim and is
  * fenced — never delete them below the current version.
  */
/** One [[TxnManifest.history]] row: what a version's commit changed. */
final case class VersionChange(version: Long, added: Seq[String],
                               removed: Seq[String])

final class TxnManifest(val path: String) {

  /** batchId → the output directories that batch committed. */
  def committed(): Map[Int, Seq[String]] = readState()._2

  /** Current manifest version (0 = never committed / legacy file). */
  def version(): Long = readState()._1

  /** All committed directories under `root`, oldest batch first. */
  def committedDirs(root: String): Seq[String] =
    committed().toSeq.sortBy(_._1)
      .flatMap(_._2)
      .filter(_.startsWith(root + "/"))

  /** Every committed directory under EVERY root, oldest batch first —
    * the view a SHALLOW CLONE reads through, whose entries span the
    * source's root (inherited, zero-copy) and its own (new writes,
    * copy-on-write rewrites). Do not use on a dual-write manifest:
    * there the roots are DIFFERENT logical tables and the per-root
    * [[committedDirs]] filter is the table boundary. */
  def committedDirsAll(): Seq[String] =
    committed().toSeq.sortBy(_._1).flatMap(_._2)

  /** The ONE commit point: all of `dirs` become visible together or —
    * on a crash before the atomic rename — none do.
    *
    * `sinkQueryId` is the streaming-sink identity exception to the
    * epoch-ownership fence: a batch id claimed in the `<path>.sink`
    * ownership log belongs to that streaming query, and a commit by
    * anyone else (a batch producer, or a different query) would
    * replace the sink's entry for the epoch — refused loudly. The
    * owning sink passes its own query id and proceeds. */
  def commit(batchId: Int, dirs: Seq[String],
             sinkQueryId: Option[String] = None): Unit = {
    requireNotSinkOwned(batchId, sinkQueryId)
    val (v, cur) = readState()
    writeCas(v, cur + (batchId -> dirs))
  }

  /** Refuse a commit of `batchId` when the sidecar sink-ownership log
    * (`<path>.sink/<batchId>`, written by the streaming sink BEFORE
    * any bytes move) claims the id for a query other than the caller.
    * Without this, a batch producer committing an id after the sink's
    * claim — or in the sink's claim-to-commit window — would silently
    * un-name / replace the sink's epoch. */
  private def requireNotSinkOwned(batchId: Int,
                                  sinkQueryId: Option[String]): Unit =
    AtomicText.readLines(s"$path.sink/$batchId").headOption.foreach { owner =>
      if (!sinkQueryId.contains(owner))
        throw new IllegalStateException(
          s"batch id $batchId of manifest $path is claimed by streaming " +
            s"query $owner (sink ownership log) — a commit by " +
            s"${sinkQueryId.getOrElse("a batch producer")} would replace " +
            "that sink's epoch; use a different batch id or a manifest " +
            "the sink does not own")
    }

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

  /** Materialization commit (shallow-clone OPTIMIZE): atomically
    * un-name EVERY entry — across ALL roots, the clone-manifest shape
    * where inherited source dirs and own divergence dirs coexist —
    * and name `dirs` as batch `batchId` instead. After this commit
    * the manifest references nothing outside its own table's root,
    * which ends the shared-fate hazard with the source's vacuum. */
  def replaceEverything(batchId: Int, dirs: Seq[String]): Unit =
    replaceWith(_ => true, batchId, dirs,
      s"pick a fresh id for the materialized output")

  private def replaceWith(drop: String => Boolean, batchId: Int,
                          dirs: Seq[String], hint: String): Unit = {
    requireNotSinkOwned(batchId, sinkQueryId = None)
    val (v, cur) = readState()
    val pruned = cur.view
      .mapValues(_.filterNot(drop))
      .filter(_._2.nonEmpty).toMap
    require(!pruned.contains(batchId),
      s"batch id $batchId still names other dirs — $hint")
    writeCas(v, pruned + (batchId -> dirs))
  }

  /** SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE src`): this
    * fresh manifest adopts the source's current entries under
    * `srcRoot` — same batch ids, same directory paths, ZERO data
    * moved. Because committed batch dirs are immutable, the clone is
    * a consistent snapshot: later source commits never appear in it,
    * and the clone's own writes (appends under its own root, or
    * cross-root copy-on-write merges via
    * [[Sinks.merge]]`(unionRoots = true)`) never touch the source.
    *
    * The one shared-fate hazard is Delta's own: the clone REFERENCES
    * source files it does not own. A source-side MERGE or compaction
    * un-names dirs from the SOURCE manifest only; a subsequent
    * `vacuum(srcRoot, srcManifest)` then deletes them out from under
    * the clone, and clone reads fail loudly (missing committed dir).
    * Vacuum the source only when no live clone still references its
    * un-named history — the same operational rule as Delta shallow
    * clones.
    *
    * One commit, one version: the whole snapshot lands through the
    * same CAS as any other commit, so a racing writer on the DEST
    * manifest is fenced. The dest must be fresh — cloning over a
    * live table would silently discard it. */
  /** @param atVersion snapshot the source at this MANIFEST version
    *   (Delta's `CLONE ... VERSION AS OF`) instead of HEAD — the
    *   clone then serves the table exactly as that version did,
    *   subject to the same vacuum hazard (un-named historical dirs
    *   must still exist).
    * @param allRoots keep entries under EVERY root the source
    *   manifest names, not just `srcRoot` — how a clone OF a clone
    *   snapshots its parent's union view (source root + parent's
    *   divergence); never set on a dual-write manifest. */
  def cloneFrom(src: TxnManifest, srcRoot: String,
                atVersion: Option[Long] = None,
                allRoots: Boolean = false): Unit = {
    val (v, cur) = readState()
    require(v == 0 && cur.isEmpty,
      s"clone destination $path is not a fresh manifest " +
        s"(version $v, ${cur.size} entries)")
    val all = atVersion match {
      case Some(ver) => src.stateAt(ver)
      case None      => src.committed()
    }
    val entries =
      if (allRoots) all.filter(_._2.nonEmpty)
      else all.view
        .mapValues(_.filter(_.startsWith(srcRoot + "/")))
        .filter(_._2.nonEmpty).toMap
    // an EMPTY source (zero commits anywhere) clones fine: version 1
    // with zero entries — reads serve the declared schema and zero
    // rows, exactly like a freshly created table. Refusing that used
    // to strand orphan catalog metadata written before this call. But
    // a manifest that HAS commits, none under `srcRoot`, is a wrong
    // root (typo / dual-write misuse) — stay loud.
    require(entries.nonEmpty || all.isEmpty,
      s"nothing committed under $srcRoot to clone (the source manifest " +
        "has commits under other roots — wrong root?)")
    writeCas(v, entries)
  }

  /** The dirs `batchId` last named — from the CURRENT state when the
    * batch is live, else from the claim tombstones, walking versions
    * DOWNWARD until a snapshot names it (the walk is short when the
    * collapse is recent, the common lagging-consumer case). The CDF
    * planner serves a collapsed-but-undrained append batch through
    * this: a rewrite un-names dirs from the current state only, never
    * from the claims, so historical batches stay addressable exactly
    * as Delta's version-v files do — until VACUUM removes them, at
    * which point the read fails loudly. None when no claim ever
    * names the id (pre-CAS history, or a vacuumed claim set). */
  def lastKnownDirs(batchId: Int): Option[Seq[String]] = {
    val (current, cur) = readState()
    cur.get(batchId).orElse(
      Iterator.iterate(current - 1)(_ - 1).takeWhile(_ >= 1).map(entriesAt)
        .collectFirst { case Some(m) if m.contains(batchId) => m(batchId) })
  }

  /** Commit history from the persisted claim files — Delta
    * `DESCRIBE HISTORY` on the version-CAS log. Each entry diffs a
    * version against its predecessor: which directories the commit
    * ADDED and which it UN-NAMED (appends add, merges/compactions do
    * both). Claims are tombstones that never get deleted, so the
    * history is complete from version 1; a version whose claim is
    * missing (pre-CAS manifest upgraded in place) reports NO change —
    * the last known state carries forward, and the missing version's
    * actual diff is attributed to the next version whose claim
    * survives. (Treating a missing claim as an empty state would
    * report phantom everything-removed/re-added churn instead.) */
  def history(): Seq[VersionChange] = {
    val (current, _) = readState()
    var prevDirs = Set.empty[String]
    (1L to current).map { v =>
      entriesAt(v) match {
        case None => VersionChange(v, added = Nil, removed = Nil)
        case Some(entries) =>
          val curDirs = entries.values.flatten.toSet
          val change = VersionChange(v,
            added = (curDirs -- prevDirs).toSeq.sorted,
            removed = (prevDirs -- curDirs).toSeq.sorted)
          prevDirs = curDirs
          change
      }
    }
  }

  /** RESTORE to an earlier version (Delta `RESTORE TABLE ... VERSION
    * AS OF`): re-commits that version's full entry state as a NEW
    * version through the same CAS, so the restore itself is fenced,
    * atomic, and appears in [[history]] — nothing is rewritten on
    * disk, only the view flips. Directories the restored state names
    * must still exist (run restore inside the vacuum retention
    * window, Delta's own constraint). Change-feed caveat, same as
    * Delta's: restored batch ids are OLD ids, invisible to consumers
    * already past them — consumers that drained the now-un-restored
    * changes should re-bootstrap. */
  def restoreTo(version: Long): Unit = {
    val (current, _) = readState()
    require(version >= 1 && version < current,
      s"restore target $version out of range [1, ${current - 1}]")
    val entries = entriesAt(version).getOrElse(throw new IllegalStateException(
      s"no claim file for version $version — pre-CAS history is not restorable"))
    writeCas(current, entries)
  }

  /** The full entry state at `version` — the public face of the claim
    * tombstones, for version-addressed reads ([[Sinks.readCommittedAtVersion]]).
    * Fails loudly when the claim is missing: a pre-CAS manifest
    * upgraded in place has no recorded state for that version. */
  def stateAt(version: Long): Map[Int, Seq[String]] = {
    val (current, _) = readState()
    require(version >= 1 && version <= current,
      s"version $version out of range [1, $current]")
    entriesAt(version).getOrElse(throw new IllegalStateException(
      s"no claim file for version $version of $path — pre-CAS history " +
        "is not addressable"))
  }

  /** version → commit timestamp (epoch millis) for versions 1..current,
    * from the claim tombstones' file modification times — the same
    * clock Delta reads its log files' mtimes for `TIMESTAMP AS OF`.
    * Monotonic-adjusted exactly as Delta does: a version whose mtime
    * runs BEHIND its predecessor (clock skew, copied files) reports
    * its predecessor's timestamp instead, so the mapping
    * timestamp → version is well-defined. A version with no claim
    * (pre-CAS history) inherits its predecessor's timestamp — it can
    * never win a timestamp lookup over the predecessor, matching
    * [[history]]'s carry-forward semantics for the same gap. */
  def commitTimestamps(): Seq[(Long, Long)] = {
    val (current, _) = readState()
    var prev = Long.MinValue
    (1L to current).map { v =>
      val ts = AtomicText.mtime(s"$path.v$v") match {
        case Some(m) => math.max(m, prev)
        case None    => if (prev == Long.MinValue) Long.MinValue else prev
      }
      prev = ts
      v -> ts
    }.filterNot(_._2 == Long.MinValue)
  }

  /** The newest version committed at or before `timestampMillis` —
    * Delta's `TIMESTAMP AS OF` resolution. Fails loudly on a
    * timestamp before the earliest commit (there was no table then)
    * and on an empty manifest. A timestamp between two commits
    * resolves to the EARLIER one: the table as it stood at that
    * moment. */
  def versionAt(timestampMillis: Long): Long = {
    val ts = commitTimestamps()
    require(ts.nonEmpty, s"manifest $path has no timestamped commits")
    val at = ts.filter(_._2 <= timestampMillis)
    if (at.isEmpty)
      throw new IllegalArgumentException(
        s"timestamp $timestampMillis predates the earliest commit " +
          s"(${ts.head._2}) of $path — the table did not exist yet")
    at.last._1
  }

  /** The full entry state at `version`, from its claim tombstone. */
  private def entriesAt(version: Long): Option[Map[Int, Seq[String]]] = {
    val lines = AtomicText.readLines(s"$path.v$version")
    if (lines.isEmpty) None
    else Some(lines.filterNot(_.startsWith("#")).map { line =>
      val fields = line.split('\t')
      fields.head.toInt -> fields.tail.toSeq
    }.toMap)
  }

  /** One consistent snapshot: (version, entries). A missing header
    * (pre-versioning manifest) reads as version 0 and upgrades on the
    * next commit. */
  private def readState(): (Long, Map[Int, Seq[String]]) = {
    val lines = AtomicText.readLines(path)
    val version = lines.find(_.startsWith("#version="))
      .map(_.stripPrefix("#version=").toLong).getOrElse(0L)
    val entries = lines.filterNot(_.startsWith("#")).map { line =>
      val fields = line.split('\t')
      fields.head.toInt -> fields.tail.toSeq
    }.toMap
    (version, entries)
  }

  /** Deterministic body for version `v` — byte-identical re-renders
    * are what make crashed-commit recovery idempotent. */
  private[graft] def renderBody(v: Long, entries: Map[Int, Seq[String]]): String =
    (s"#version=$v" +: entries.toSeq.sortBy(_._1)
      .map { case (id, ds) => (id.toString +: ds).mkString("\t") })
      .mkString("", "\n", "\n")

  /** The CAS: claim `<path>.v<expected+1>` exclusively with the new
    * state, then replace the manifest. The claim file STAYS behind as
    * the version's tombstone — renaming it into place would un-fence
    * writers stale by exactly one version. */
  private def writeCas(expectedVersion: Long,
                       entries: Map[Int, Seq[String]]): Unit = {
    entries.values.flatten.foreach(AtomicText.requireCleanKey(_, "manifest dir"))
    val next = expectedVersion + 1
    val body = renderBody(next, entries)
    val claim = s"$path.v$next"
    if (!AtomicText.createExclusive(claim, body)) {
      // the claim exists: either a RACING producer won version `next`
      // (its snapshot beat ours — fail loudly, our state is stale), or
      // OUR OWN previous run crashed between claim and manifest write
      // (the idempotent re-run reproduces the identical body — safe to
      // complete below)
      if (AtomicText.readAll(claim) != body)
        throw new java.util.ConcurrentModificationException(
          s"manifest $path: version $next was already claimed by another " +
            "producer — this writer's snapshot (version " +
            s"$expectedVersion) is stale; re-read and retry, or stop the " +
            "second producer (single-writer contract). If no second " +
            s"producer exists, $claim is an orphan of YOUR OWN crashed " +
            "commit whose re-run was not byte-identical: after verifying " +
            "the manifest still reads consistently, delete that claim " +
            "file to unwedge (it fences nothing once its version is " +
            "re-claimed by the next commit).")
    }
    AtomicText.writeAtomically(path, body)
  }
}
