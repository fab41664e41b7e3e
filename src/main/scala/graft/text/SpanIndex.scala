package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental exact-substring span dedup against a PERSISTED anchor
  * index — [[SubstringSpans]]'s batch-against-corpus form, the same
  * operational move [[DedupIndex]] makes for MinHash and
  * [[graft.multimodal.PhashIndex]] for perceptual hashes: a 100 TB
  * corpus ingests batch by batch, and each batch must find its
  * duplicated token spans against everything so far WITHOUT
  * re-anchoring the accumulated corpus.
  *
  * Index layout — bucketed catalog tables, partitioned by `batch`:
  *   - anchors `(doc_id, pos, h) CLUSTERED BY (h)` — the probe table;
  *   - adf     `(h, df)          CLUSTERED BY (h)` — each batch's
  *     per-anchor DISTINCT-DOC count. Doc ids are batch-unique
  *     (single-writer contract), so the corpus-wide document
  *     frequency of an anchor is the SUM across partitions — read
  *     only for the handful of anchors the new batch collides with
  *     (bucketed semi-probe, exchange-free stored side).
  *
  * The round-14 DOCUMENT-FREQUENCY CAP carries over incrementally:
  * an anchor whose accumulated df exceeds `maxDf` is dropped from
  * BOTH sides of the candidate join. Semantics are monotone: the cap
  * is evaluated against df AS OF PROBE TIME, so an anchor that
  * crosses the cap in a later batch stops generating NEW candidates
  * while spans already reported stand — the only sound choice for an
  * append-only pipeline (reports are immutable downstream). Batch-
  * wise output equals the one-shot [[SubstringSpans]] pass whenever
  * no anchor crosses the cap mid-ingest — a checkable condition:
  * [[capCrossings]] lists the crossing anchors, dd22 gates its
  * equality claim on the list being empty, and IndexSpec pins both
  * the equality on the dd19 corpus and the cap-crossing
  * monotonicity separately.
  *
  * adf writes BEFORE anchors (the DedupIndex torn-batch direction:
  * anchors are the probe entry point, so a torn batch must leave an
  * adf-orphan rather than an anchors-orphan whose df undercounts
  * would silently disable the cap). The adf-orphan is made inert by
  * construction: [[storedView]] excludes adf partitions lacking an
  * anchors twin from the accumulated-df view, so a torn batch
  * neither suppresses other batches' anchors nor requires its retry
  * to run before further ingests. Compaction rides
  * [[DedupIndex.compact]]'s marker protocol via [[compact]].
  */
object SpanIndex {

  private[graft] def tableNames(indexDir: String): (String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(indexDir.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(12)
    (s"graft_spidx_anchors_$tag", s"graft_spidx_adf_$tag")
  }

  private def pair(indexDir: String): DedupIndex.PairSpec = {
    val (anchorsT, adfT) = tableNames(indexDir)
    DedupIndex.PairSpec(anchorsT, "anchors", Seq("h"),
      adfT, "adf", Seq("h"))
  }

  /** Fold the batch partitions into one generation
    * ([[DedupIndex.compact]] semantics). */
  def compact(spark: SparkSession, indexDir: String,
              buckets: Int = 4): Boolean =
    DedupIndex.compactPair(spark, indexDir, pair(indexDir), buckets)

  /** Ingest one batch of tokenized docs `(idCol, tokensCol:
    * array<string>)`: returns the token-exact duplicated spans
    * involving this batch (`id1 < id2`, `span_tokens >= minTokens`,
    * new-new and new-stored), and appends the batch's anchors + df
    * counts. A crashed run re-ingests the same `batchId`
    * idempotently (dynamic-partition overwrite + own-batch
    * exclusion). */
  def ingestBatch(docs: DataFrame, idCol: String, tokensCol: String,
                  indexDir: String, batchId: Int,
                  k: Int = 8, maxDf: Int = 16, minTokens: Int = 16,
                  buckets: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val w = col(tokensCol)
    // the anchor-hash explode (k md5s per token) is the batch's CPU
    // wall and otherwise runs at the input's split count; no-op when
    // the batch already arrives wide (guide §2.5)
    val newAnchors = graft.util.CacheScope.track(
      graft.util.Spread.wide(docs, col(idCol))
      .select(col(idCol).as("doc_id"), posexplode(
        when(size(w) >= k,
          transform(sequence(lit(0), size(w) - k),
            i => md5(concat_ws(" ", slice(w, i + 1, lit(k))))))
          .otherwise(array())))
      .toDF("doc_id", "pos", "h"))
    val newAdf = graft.util.CacheScope.track(
      newAnchors.groupBy("h").agg(countDistinct(col("doc_id")).as("df")))

    val (anchorsT, adfT) = tableNames(indexDir)
    DedupIndex.recoverPair(spark, indexDir, pair(indexDir))
    DedupIndex.ensureTable(spark, newAdf, adfT, s"$indexDir/adf",
      Seq("h"), buckets)
    DedupIndex.ensureTable(spark, newAnchors, anchorsT,
      s"$indexDir/anchors", Seq("h"), buckets)
    val stored = storedView(spark, indexDir, excludeBatch = batchId)

    // corpus-wide df for the batch's OWN anchors only: the stored adf
    // table is bucketed on h, so the semi-probe + partial sums stay
    // O(batch anchors), never O(corpus vocabulary)
    val totalDf = stored match {
      case Some((_, sdf)) =>
        newAdf.unionAll(
          sdf.join(newAdf.select("h"), Seq("h"), "left_semi"))
          .groupBy("h").agg(sum("df").as("df"))
      case None => newAdf
    }
    val hot = totalDf.filter(col("df") > maxDf).select("h")
    // kept feeds THREE consumers (its own self-join's two sides + the
    // stored-anchor probe key set); cache it or each re-derives the
    // df aggregate + anti-join chain
    val kept = graft.util.CacheScope.track(
      newAnchors.join(hot, Seq("h"), "left_anti"))
    // stored anchors matter only where they collide with the batch's
    // surviving anchors — and those h already passed the global cap
    val storedKept = stored.map { case (sa, _) =>
      sa.join(kept.select("h").distinct(), Seq("h")) }

    val mNewNew = kept.as("a")
      .join(kept.as("b"), col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.pos").as("pa"),
        (col("b.pos") - col("a.pos")).cast("long").as("delta"))
    val m = storedKept match {
      case Some(sk) =>
        val cross = kept
          .select(col("doc_id").as("nid"), col("pos").as("npos"), col("h"))
          .join(sk.select(col("doc_id").as("sid"), col("pos").as("spos"),
            col("h")), Seq("h"))
          .filter(col("nid") =!= col("sid"))
          .select(least(col("nid"), col("sid")).as("id1"),
            greatest(col("nid"), col("sid")).as("id2"),
            when(col("nid") < col("sid"), col("npos"))
              .otherwise(col("spos")).as("pa"),
            when(col("nid") < col("sid"), col("spos") - col("npos"))
              .otherwise(col("npos") - col("spos"))
              .cast("long").as("delta"))
        mNewNew.unionAll(cross)
      case None => mNewNew
    }
    val win = Window.partitionBy("id1", "id2", "delta").orderBy("pa")
    val spans = m
      .withColumn("grpk", col("pa") - row_number().over(win))
      .groupBy(col("id1"), col("id2"), col("delta"), col("grpk"))
      .agg(min(col("pa")).cast("long").as("start1"),
        count(lit(1)).as("n_anchors"))
      .withColumn("span_tokens", col("n_anchors") + (k - 1))
      .filter(col("span_tokens") >= minTokens)
      .select(col("id1"), col("id2"), col("start1"),
        (col("start1") + col("delta")).as("start2"), col("span_tokens"))

    val out = spans.localCheckpoint()
    DedupIndex.writeIndexed(spark, newAdf, adfT, s"$indexDir/adf",
      Seq("h"), buckets, batchId)
    DedupIndex.writeIndexed(spark, newAnchors, anchorsT,
      s"$indexDir/anchors", Seq("h"), buckets, batchId)
    out
  }

  /** Drop this index's session-catalog tables and delete its data —
    * for SCRATCH indexes whose lifetime is one query (dd22 registers
    * this as a CacheScope release hook). */
  def dropIndex(spark: SparkSession, indexDir: String): Unit = {
    val (a, d) = tableNames(indexDir)
    Seq(a, d).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** (anchors, adf) as committed — minus `excludeBatch` — or None
    * before the first batch; torn guard: every anchors partition
    * must have its adf twin (df undercount = silent cap loss).
    *
    * The OPPOSITE orphan — an adf partition whose anchors twin never
    * landed (crash between the adf and anchors writes) — is excluded
    * from the adf view (round 15): its docs contributed no probe-able
    * anchors, so counting it into the accumulated df would inflate
    * totals and silently drop anchors (missed spans) for every batch
    * ingested before the torn batch is retried. With the exclusion
    * the orphan is inert whether or not the retry ever happens. */
  private[graft] def storedView(spark: SparkSession, indexDir: String,
                                excludeBatch: Int)
    : Option[(DataFrame, DataFrame)] = {
    val (anchorsT, adfT) = tableNames(indexDir)
    DedupIndex.recoverPair(spark, indexDir, pair(indexDir))
    if (!spark.catalog.tableExists(anchorsT)) None
    else {
      val anchorsB = DedupIndex.fsBatches(spark, s"$indexDir/anchors")
      val adfB = DedupIndex.fsBatches(spark, s"$indexDir/adf")
      val torn = anchorsB -- adfB
      require(torn.isEmpty,
        s"span index $indexDir is torn: anchors partitions " +
          s"${torn.mkString(",")} have no adf twin — delete the orphan " +
          "anchors partitions or re-ingest those batch ids")
      val adfOrphans = (adfB -- anchorsB) - excludeBatch
      val adfView = spark.table(adfT).filter(col("batch") =!= excludeBatch)
      Some((
        spark.table(anchorsT).filter(col("batch") =!= excludeBatch)
          .drop("batch").select("doc_id", "pos", "h"),
        (if (adfOrphans.isEmpty) adfView
         else adfView.filter(!col("batch").isInCollection(adfOrphans)))
          .drop("batch").select("h", "df")))
    }
  }

  /** Anchors whose accumulated df CROSSES `maxDf` mid-ingest on this
    * index — the exact condition under which batch-wise output can
    * diverge from the one-shot [[SubstringSpans]] pass: an anchor
    * that probed under the cap in an early batch but whose final df
    * exceeds it generates spans the one-shot pass suppresses.
    * Divergence-free iff this is empty: for every anchor, either the
    * final df is within the cap, or every batch the anchor appeared
    * in already saw the accumulated df over the cap. dd22's equality
    * claim is gated on this (driver-side count over the small adf
    * table — per-batch DISTINCT anchors, not positions). */
  def capCrossings(spark: SparkSession, indexDir: String,
                   maxDf: Int): DataFrame = {
    val (_, adfT) = tableNames(indexDir)
    // same orphan exclusion as storedView: a torn batch's adf never
    // fed any probe's accumulated df, so it must not fake a crossing
    val orphans = DedupIndex.fsBatches(spark, s"$indexDir/adf") --
      DedupIndex.fsBatches(spark, s"$indexDir/anchors")
    val adf = spark.table(adfT)
    val live = if (orphans.isEmpty) adf
      else adf.filter(!col("batch").isInCollection(orphans))
    val w = Window.partitionBy("h").orderBy("batch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("h")
    live
      .withColumn("cum", sum(col("df")).over(w))
      .withColumn("total", sum(col("df")).over(wAll))
      .filter(col("total") > maxDf && col("cum") <= maxDf)
      .select(col("h"), col("batch"), col("cum"), col("total"))
  }
}
