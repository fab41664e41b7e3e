package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental dedup CLUSTERING against a persisted cluster-id table —
  * the step past the pair-grain index family ([[DedupIndex]],
  * [[SpanIndex]], [[graft.multimodal.PhashIndex]]): those answer
  * "which pairs are duplicates", production dedup needs "which doc
  * survives", and the survivor assignment must stay STABLE and
  * O(batch) per ingest. Each ingest folds the batch's new pairs into
  * the maintained components via union-find over AFFECTED components
  * only — the pair history is never rescanned (cf. ref
  * etl_documents.py's whole-corpus groupby, re-paid per run).
  *
  * Index layout — one logical row set `(id, cid, batch)` written to
  * TWO bucketed catalog tables (the probe direction differs):
  *   - assign  `(id, cid) PARTITIONED BY (batch) CLUSTERED BY (id)` —
  *     id → canonical lookups; the LATEST row per id (max batch) is
  *     current;
  *   - members `(id, cid) PARTITIONED BY (batch) CLUSTERED BY (cid)` —
  *     canonical → membership lookups for merge relabeling.
  *
  * Core invariant (components only MERGE, canonicals only DECREASE —
  * min-id keeper): if `c` is a LIVE canonical (some id's latest cid
  * is `c`), then every id EVER assigned `c` is currently in `c`'s
  * component — an id only leaves `c` when `c`'s whole component
  * merges away, which kills `c` as a canonical. So "rows ever written
  * with cid = c" IS the current membership of a live `c`, and a merge
  * relabels only the LOSING components' members: O(size of losers),
  * never O(corpus).
  *
  * Per ingest: look up current canonicals for the batch's touched ids
  * (assign is bucketed by id — exchange-free stored side), contract
  * the batch's pairs to CANONICAL-level edges, run min-label
  * connected components on that contracted graph (O(batch) nodes; a
  * distributed loop, not driver union-find — a day-of-crawl batch's
  * contracted graph does not fit a driver), then write one row per
  * new id and per relabeled member. Members write BEFORE assign;
  * either orphan direction is inert — [[storedView]] reads only
  * batches present in BOTH tables, so a torn batch is invisible until
  * its retry overwrites both partitions (the round-15 SpanIndex
  * discipline).
  *
  * Batch-wise assignments equal the one-shot
  * [[DedupClusters.connectedComponents]] over the concatenated pair
  * feed EXACTLY (no cap/threshold caveats — set union is associative;
  * dd24 gates it on dd6's oracle, IndexSpec pins keeper stability and
  * idempotent retry).
  */
object ClusterIndex {

  private[graft] def tableNames(indexDir: String): (String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(indexDir.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(12)
    (s"graft_clidx_assign_$tag", s"graft_clidx_members_$tag")
  }

  private def pair(indexDir: String): DedupIndex.PairSpec = {
    val (assignT, membersT) = tableNames(indexDir)
    DedupIndex.PairSpec(assignT, "assign", Seq("id"),
      membersT, "members", Seq("cid"))
  }

  /** OPTIMIZE: fold the batch partitions into one generation AND
    * prune superseded rows (only the latest row per id survives — the
    * supersession order lives in `batch`, so the reduction runs
    * inside the fold, before the order collapses into one
    * generation). Pruning preserves the membership invariant: a
    * superseded row `(x, cOld)` is only ever consulted through
    * lookups of `cOld`, which is dead by the time the row is
    * superseded. */
  def compact(spark: SparkSession, indexDir: String,
              buckets: Int = 4): Boolean =
    DedupIndex.compactPair(spark, indexDir, pair(indexDir), buckets,
      reduce = df => {
        val w = Window.partitionBy("id").orderBy(col("batch").desc)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      })

  /** Ingest one batch of verified duplicate pairs `(a, b)` (doc ids,
    * undirected): folds them into the maintained components and
    * returns the CURRENT `(id, canonical_id)` for every id the batch
    * touched. A crashed run re-ingests the same `batchId`
    * idempotently (dynamic-partition overwrite + own-batch
    * exclusion). */
  /** @param returnView false skips building (and pinning) the
    *   returned per-batch view — for callers that only fold the batch
    *   in and read assignments at the end ([[currentAssignments]]);
    *   the frame returned in that mode is `pairs.limit(0)`-shaped and
    *   must not be read. The index writes are identical either way. */
  def ingestBatch(pairs: DataFrame, indexDir: String, batchId: Int,
                  buckets: Int = 4, returnView: Boolean = true): DataFrame = {
    val spark = pairs.sparkSession
    val p = graft.util.CacheScope.track(
      pairs.select(col("a").cast("long").as("a"),
          col("b").cast("long").as("b"))
        .filter(col("a") =!= col("b")).distinct())
    val touched = p.select(col("a").as("id"))
      .unionAll(p.select(col("b").as("id"))).distinct()

    val (assignT, membersT) = tableNames(indexDir)
    DedupIndex.recoverPair(spark, indexDir, pair(indexDir))
    val empty = touched.limit(0)
      .select(col("id"), col("id").as("cid"))
    DedupIndex.ensureTable(spark, empty, membersT, s"$indexDir/members",
      Seq("cid"), buckets)
    DedupIndex.ensureTable(spark, empty, assignT, s"$indexDir/assign",
      Seq("id"), buckets)
    val stored = storedView(spark, indexDir, excludeBatch = batchId)

    // current canonical per touched id: latest stored row, else self.
    // The assign scan is bucketed on id, so both the semi-probe join
    // and the latest-row window run without a stored-side exchange.
    val cur = graft.util.CacheScope.track(stored match {
      case Some((assign, _)) =>
        val w = Window.partitionBy("id").orderBy(col("batch").desc)
        val latest = assign.join(touched, Seq("id"), "left_semi")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("id"), col("cid"))
        touched.join(latest, Seq("id"), "left")
          .select(col("id"), coalesce(col("cid"), col("id")).as("cid"))
      case None =>
        touched.select(col("id"), col("id").as("cid"))
    })

    // contract pairs to canonical-level edges and solve ONLY the
    // affected components: O(batch) nodes however large the corpus
    val contracted = p
      .join(cur.select(col("id").as("a"), col("cid").as("ca")), Seq("a"))
      .join(cur.select(col("id").as("b"), col("cid").as("cb")), Seq("b"))
      .select(col("ca").as("a"), col("cb").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val canonMap = graft.util.CacheScope.track(
      DedupClusters.connectedComponents(
          contracted.select(col("a").as("id"))
            .unionAll(contracted.select(col("b").as("id"))).distinct(),
          contracted)
        .select(col("id").as("cid"), col("canonical_id").as("ncid")))

    // rows to write: every NEW id (no stored assignment) lands with
    // its component's canonical; every member of a LOSING canonical
    // (ncid < cid) relabels — winners' rows already read correctly
    val withNew = cur.join(canonMap, Seq("cid"), "left")
      .select(col("id"), coalesce(col("ncid"), col("cid")).as("ncid"),
        col("cid"))
    val newIds = stored match {
      case Some((assign, _)) =>
        cur.select("id").join(assign.select("id").distinct(),
          Seq("id"), "left_anti")
      case None => cur.select("id")
    }
    val newRows = withNew.join(newIds, Seq("id"), "left_semi")
      .select(col("id"), col("ncid").as("cid"))
    val losers = canonMap.filter(col("ncid") < col("cid"))
    val relabeled = stored match {
      case Some((_, members)) =>
        members.join(losers, Seq("cid"))
          .select(col("id"), col("ncid").as("cid")).distinct()
      case None => newRows.limit(0)
    }
    val rows = graft.util.CacheScope.track(
      // a new id can also sit in a losing NEW component — same target
      // cid from both legs; distinct collapses it
      newRows.unionAll(relabeled).distinct())

    val out =
      if (!returnView) cur.limit(0)
        .select(col("id"), col("cid").as("canonical_id"))
      else cur
        .join(rows.withColumnRenamed("cid", "newcid"), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("newcid"), col("cid")).as("canonical_id"))
        .localCheckpoint()
    DedupIndex.writeIndexed(spark, rows, membersT, s"$indexDir/members",
      Seq("cid"), buckets, batchId)
    DedupIndex.writeIndexed(spark, rows, assignT, s"$indexDir/assign",
      Seq("id"), buckets, batchId)
    out
  }

  /** Current `(id, canonical_id)` for every id in `nodes` (single
    * column `id`): latest assignment, self for ids the pair feed
    * never touched. One exchange-free pass over the id-bucketed
    * assign table + one join. */
  def currentAssignments(spark: SparkSession, indexDir: String,
                         nodes: DataFrame): DataFrame = {
    val (assignT, _) = tableNames(indexDir)
    DedupIndex.recoverPair(spark, indexDir, pair(indexDir))
    if (!spark.catalog.tableExists(assignT))
      nodes.select(col("id"), col("id").as("canonical_id"))
    else {
      val live = liveBatches(spark, indexDir)
      val w = Window.partitionBy("id").orderBy(col("batch").desc)
      val latest = spark.table(assignT)
        .filter(col("batch").isInCollection(live))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("cid"))
      nodes.select(col("id"))
        .join(latest, Seq("id"), "left")
        .select(col("id"), coalesce(col("cid"), col("id")).as("canonical_id"))
    }
  }

  private def liveBatches(spark: SparkSession, indexDir: String): Set[Int] =
    DedupIndex.fsBatches(spark, s"$indexDir/assign")
      .intersect(DedupIndex.fsBatches(spark, s"$indexDir/members"))

  /** (assign, members) with `batch` retained on assign (the latest-row
    * order) — only batches present in BOTH tables are read, so a torn
    * ingest (either orphan direction) is invisible until its retry
    * lands both partitions. */
  private[graft] def storedView(spark: SparkSession, indexDir: String,
                                excludeBatch: Int)
    : Option[(DataFrame, DataFrame)] = {
    val (assignT, membersT) = tableNames(indexDir)
    DedupIndex.recoverPair(spark, indexDir, pair(indexDir))
    if (!spark.catalog.tableExists(assignT)) None
    else {
      val live = liveBatches(spark, indexDir) - excludeBatch
      if (live.isEmpty) None
      else Some((
        spark.table(assignT).filter(col("batch").isInCollection(live))
          .select("id", "cid", "batch"),
        spark.table(membersT).filter(col("batch").isInCollection(live))
          .select("id", "cid")))
    }
  }

  /** Drop this index's session-catalog tables and delete its data —
    * for SCRATCH indexes whose lifetime is one query (dd24 registers
    * this as a CacheScope release hook). */
  def dropIndex(spark: SparkSession, indexDir: String): Unit = {
    val (a, m) = tableNames(indexDir)
    Seq(a, m).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}
