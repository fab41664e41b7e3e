package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Driver-side snapshot cache for sidecar metadata (`_stats.tsv`,
  * `_bloom.tsv`) — the Delta-snapshot-cache shape. Plan-time skipping
  * consults one sidecar per committed directory per query; without a
  * cache an interactive session re-reads, re-parses, and (for blooms)
  * re-deserializes base64 bit arrays for the SAME immutable dirs on
  * every plan — O(dirs) data reads per query, the dominant planning
  * cost once a table has thousands of batch dirs on a remote FS.
  *
  * Entries key on `(qualified path, mtime, length)`, so the cache
  * never needs invalidation hooks: committed dirs are immutable by
  * contract, and the documented EXCEPTIONS — an operator rebuilding a
  * torn sidecar in place, maintenance re-statting — change the
  * file's status and miss onto a fresh parse. Each lookup still costs
  * one `getFileStatus` round-trip (freshness is never assumed), but
  * not the read + parse. Absent files are answered from the same
  * status probe and never cached.
  *
  * Bounded LRU per cache: stats entries are tiny (thousands fit),
  * bloom entries carry real bit arrays (megabytes per dir at
  * production row counts), so blooms get a much smaller cap.
  *
  * CAVEAT (inherent to mtime keys, same as Hadoop's own metadata
  * caches): a same-length rewrite landing within the filesystem's
  * mtime granularity of the previous write can serve the prior parse.
  * All in-repo writers go through [[graft.util.AtomicText]] (a fresh
  * temp file + rename, which advances mtime), and sidecar rebuilds
  * are operator actions seconds apart, not sub-millisecond loops —
  * the stale window is theoretical here, but a FOREIGN writer
  * rewriting sidecars in place at high frequency is outside the
  * envelope. */
private[sources] final class SidecarCache[V <: AnyRef](maxEntries: Int) {

  private final case class Key(path: String, mtime: Long, len: Long)

  private val entries =
    new java.util.LinkedHashMap[Key, V](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Key, V]): Boolean =
        size() > maxEntries
    }

  /** None = file absent. Some(parse result) otherwise, served from
    * cache when `(path, mtime, len)` matches a prior parse. A racing
    * double-parse is possible and harmless (last one wins). */
  def cached(fs: FileSystem, p: Path)(parse: => V): Option[V] = {
    val qualified = fs.makeQualified(p)
    val st =
      try Some(fs.getFileStatus(qualified))
      catch { case _: java.io.FileNotFoundException => None }
    st.map { s =>
      val key = Key(qualified.toString, s.getModificationTime, s.getLen)
      val hit = entries.synchronized(entries.get(key))
      if (hit != null) hit
      else {
        val v = parse
        entries.synchronized(entries.put(key, v))
        v
      }
    }
  }
}
