package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Incremental near-duplicate detection against a PERSISTED MinHash
  * index — the operational shape of dedup at 100 TB: the corpus grows
  * batch by batch, and each batch must find its duplicates against
  * everything ingested so far WITHOUT recomputing the existing
  * corpus's signatures or pair graph
  * (cf. [[MinHash.nearDupPairs]], the one-shot form).
  *
  * Index layout (parquet, batch-keyed dirs via
  * [[graft.sources.Sinks.appendBatch]] — idempotent on retry):
  *   - `<dir>/bands/batch=N`: (band, key, id) — the LSH probe table
  *   - `<dir>/sets/batch=N`:  (id, s)         — shingle sets for exact verify
  *
  * Per batch: new docs shingle + sign once; candidates are
  * (new ⋈ new) ∪ (new ⋈ stored) band collisions — work tracks the
  * NEW batch's bucket occupancy, never the full corpus size; exact
  * Jaccard verifies candidates against the union of stored and new
  * shingle sets (set join prunes to candidate ids). At cluster scale
  * the band table is bucketed by (band, key) so the probe join is
  * shuffle-free on the stored side; rewriting only `batch=N` keeps
  * ingestion append-only.
  *
  * A batch's pairs are returned ordered `a < b`, so
  * incremental-by-batches ∪ = the one-shot pair set (IndexSpec pins
  * the equality).
  */
object DedupIndex {

  /** Ingest one batch: returns the VERIFIED near-dup pairs involving
    * this batch (new-new and new-stored), and appends the batch's
    * bands + shingle sets to the index. `batchId` keys the index dirs:
    * a crashed run re-ingests the same batch id and overwrites its own
    * directories idempotently. */
  def ingestBatch(docs: DataFrame, idCol: String, textCol: String,
                  indexDir: String, batchId: Int,
                  k: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
                  threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val sh = graft.util.CacheScope.track(
      MinHash.shingles(docs, idCol, textCol, k))
    val sig = MinHash.signatures(sh, idCol, numHashes)
    val newBands = graft.util.CacheScope.track(
      bandsOf(sig, idCol, numHashes, rowsPerBand))
    val newSets = graft.util.CacheScope.track(
      sh.groupBy(idCol).agg(collect_set(col("shingle")).as("s"))
        .select(col(idCol).as("id"), col("s")))

    // exclude THIS batch id from the stored view: a crash-retry of a
    // batch whose appendBatch already ran would otherwise see its own
    // rows in `stored`, double every set entry in allSets, and emit
    // each pair 2-4 times through the set joins
    val stored = readIndex(spark, indexDir, excludeBatch = batchId)
    val probeBands = stored.map(_._1.unionAll(newBands)).getOrElse(newBands)
    // candidates = this batch against everything (stored ∪ itself):
    // one band join, new side always the (small) left
    val cand = newBands.select(col("band"), col("key"), col("id").as("x"))
      .join(probeBands.select(col("band"), col("key"), col("id").as("y")),
        Seq("band", "key"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
    val allSets = stored.map(_._2.unionAll(newSets)).getOrElse(newSets)
    val verified = MinHash.exactJaccardSets(cand, allSets)
      .filter(col("jaccard") >= threshold)

    // append AFTER the probe plans are built against the old index
    // state; localCheckpoint pins the result so callers can read it
    // after the index advances
    val out = verified.localCheckpoint()
    Sinks.appendBatch(newBands, s"$indexDir/bands", batchId)
    Sinks.appendBatch(newSets, s"$indexDir/sets", batchId)
    out
  }

  private def bandsOf(sig: DataFrame, idCol: String, numHashes: Int,
                      rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    sig.select(col(idCol).as("id"),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", (0 until rowsPerBand)
            .map(r => col(s"mh${b * rowsPerBand + r}")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** (bands, sets) as currently committed — minus `excludeBatch`
    * (the id being re-ingested) — or None before the first batch. */
  private def readIndex(spark: SparkSession, indexDir: String,
                        excludeBatch: Int): Option[(DataFrame, DataFrame)] = {
    val bandsDir = new java.io.File(s"$indexDir/bands")
    if (!bandsDir.exists()) None
    else Some((
      // the batch=N layout surfaces as a partition column — used for
      // the retry exclusion, then dropped: index readers see the
      // logical relation, not the ingestion layout. Column order
      // matters — unionAll with bandsOf output is positional.
      spark.read.parquet(s"$indexDir/bands")
        .filter(col("batch") =!= excludeBatch).select("id", "band", "key"),
      spark.read.parquet(s"$indexDir/sets")
        .filter(col("batch") =!= excludeBatch).select("id", "s")))
  }
}
