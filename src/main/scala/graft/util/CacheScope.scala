package graft.util

import org.apache.spark.sql.DataFrame

/** Query-scoped cache lifecycle. Several operators cache an internal
  * frame that feeds 2-3 consumers inside ONE returned plan (LSH key
  * explode + both sides of a scoring join, shingle explode + both
  * sides of an intersection join). A lazy-plan API cannot unpersist
  * its own cache — the returned, not-yet-executed plan still
  * references it — so every such cache registers here and the QUERY
  * DRIVER releases the batch after consuming each result
  * ([[graft.Verify]] / [[graft.Bench]] do, per query). A long-lived
  * session that skips [[releaseAll]] leaks one storage block per
  * operator invocation.
  *
  * Deliberately NOT tracked: the memoized cross-query pair graph
  * (`DocQueries.verifiedPairs`), which is an eager `localCheckpoint`
  * shared across dd2/dd6/dd8 by design.
  *
  * Scope: ONE process-global registry, sized for the repo's drivers,
  * which run queries sequentially. Concurrent queries on one JVM would
  * cross-talk (A's releaseAll unpersists what B is consuming — correct
  * but silently recomputes); a multi-tenant driver should scope
  * releases per query (token/ThreadLocal) before going parallel.
  */
object CacheScope {
  private val live = scala.collection.mutable.Buffer.empty[DataFrame]
  private val hooks = scala.collection.mutable.Buffer.empty[() => Unit]

  /** Cache `df` and register it for the next [[releaseAll]]. */
  def track(df: DataFrame): DataFrame = live.synchronized {
    val cached = df.cache()
    live += cached
    cached
  }

  /** Register a cleanup to run at the next [[releaseAll]] — the hook
    * for query-scoped SCRATCH state that outlives the plan (e.g. the
    * dd18/dd21 temp index dirs + their session-catalog tables, which
    * would otherwise pile up one per bench pass). Same consumed-first
    * contract as tracked caches. */
  def onRelease(f: () => Unit): Unit = live.synchronized { hooks += f }

  /** Unpersist every tracked cache and run the registered cleanups.
    * Call only AFTER the plans built from them have been consumed —
    * releasing earlier is correct but silently recomputes. */
  def releaseAll(): Unit = live.synchronized {
    live.foreach(_.unpersist())
    live.clear()
    val hs = hooks.toList
    hooks.clear()
    hs.foreach(h => scala.util.Try(h()))
  }
}
