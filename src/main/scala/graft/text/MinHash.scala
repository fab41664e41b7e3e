package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection
  * (shingle → minhash signature → band → bucket join → exact verify).
  *
  * Scale design (the point of LSH): candidate generation is a
  * self-join on (band index, band key) — a shuffle whose key space
  * grows with corpus size, so work stays proportional to bucket
  * collisions, never to N². The exact-Jaccard verification joins only
  * the candidate pairs back to their shingle sets. At 100 TB:
  * signatures are ~constant bytes/doc (here 8 min-hashes), the band
  * join is AQE-skew-safe, and no stage ever materializes all-pairs.
  *
  * Hashes are engine-portable (md5-derived string minima) so the
  * DuckDB oracle reproduces signatures bit-for-bit.
  */
object MinHash {

  /** Word k-shingles as one row per (id, shingle), distinct.
    * `transform` over a `sequence` keeps shingling inside codegen.
    * Docs shorter than k shingle to nothing (guarded: Spark's
    * `sequence(0, n)` DESCENDS when n < 0 and would feed `slice`
    * invalid starts). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    val sh = when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array())
    docs.select(col(idCol), explode(array_distinct(sh)).as("shingle"))
  }

  /** One portable min-hash per seed: min over shingles of
    * md5(shingle || '#' || seed) compared as strings. */
  private def minhashAgg(seed: Int): Column =
    min(md5(concat(col("shingle"), lit(s"#$seed")))).as(s"mh$seed")

  /** Signature matrix: one row per doc, `numHashes` min-hash columns. */
  def signatures(sh: DataFrame, idCol: String, numHashes: Int): DataFrame =
    sh.groupBy(idCol).agg(minhashAgg(0), (1 until numHashes).map(minhashAgg): _*)

  /** LSH candidate pairs: docs sharing any band (bands of `rowsPerBand`
    * consecutive hashes). Returns distinct (a, b) with a < b. */
  def candidatePairs(sig: DataFrame, idCol: String, numHashes: Int,
                     rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = sig.select(col(idCol).as("id"),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", (0 until rowsPerBand)
            .map(r => col(s"mh${b * rowsPerBand + r}")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = bands.select(col("band"), col("key"), col("id").as("a"))
    val r = bands.select(col("band"), col("key"), col("id").as("b"))
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** ESTIMATED Jaccard from signature agreement alone: the fraction
    * of min-hashes two docs share is an unbiased estimator of their
    * Jaccard (the MinHash property), so the pair score costs a join
    * of two `numHashes`-column rows — no shingle-set join at all. At
    * corpus scale this is the production trade: the exact verify
    * ([[exactJaccard]]) re-joins each pair's full shingle sets, IO
    * proportional to pair-count × set-size, while the estimate
    * touches only the signature matrix already built for banding.
    * Estimator std-err is ~sqrt(j(1-j)/numHashes) — callers pick
    * numHashes for the precision the downstream threshold needs. */
  def estimatedJaccard(pairs: DataFrame, sig: DataFrame, idCol: String,
                       numHashes: Int): DataFrame = {
    val sa = sig.select(col(idCol).as("a") +:
      (0 until numHashes).map(i => col(s"mh$i").as(s"__a$i")): _*)
    val sb = sig.select(col(idCol).as("b") +:
      (0 until numHashes).map(i => col(s"mh$i").as(s"__b$i")): _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"__a$i") === col(s"__b$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
  }

  /** Exact Jaccard over the shingle sets of candidate pairs only.
    *
    * Set-per-doc formulation: shingle sets aggregate once to one
    * array per doc (input is already distinct per doc, so sizes are
    * the set cardinalities), each pair joins its two arrays and
    * `array_intersect` counts the overlap — two joins of |pairs|
    * rows. The earlier explode-join form
    * (pairs ⋈ shinglesA ⋈ shinglesB on the shingle) shuffled
    * |pairs| × avg_set_size intermediate rows through a re-aggregation
    * to count the same intersection; per-pair array intersection does
    * it with no intermediate explosion and no second aggregation. */
  def exactJaccard(pairs: DataFrame, sh: DataFrame, idCol: String): DataFrame =
    exactJaccardSets(pairs,
      sh.groupBy(idCol).agg(collect_set(col("shingle")).as("s"))
        .select(col(idCol).as("id"), col("s")))

  /** Same, over pre-aggregated shingle sets `(id, s)` — the form a
    * persisted dedup index stores ([[DedupIndex]]). */
  def exactJaccardSets(pairs: DataFrame, sets: DataFrame): DataFrame = {
    // tiny (one row per doc) and consumed by BOTH pair-side joins —
    // this is the frame worth caching, not the exploded shingles
    val cached = graft.util.CacheScope.track(sets)
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("long")
    pairs
      .join(cached.select(col("id").as("a"), col("s").as("sa")), "a")
      .join(cached.select(col("id").as("b"), col("s").as("sb")), "b")
      .select(col("a"), col("b"),
        (inter.cast("double") /
          (size(col("sa")).cast("long") + size(col("sb")).cast("long") - inter)
            .cast("double")).as("jaccard"))
  }

  /** End-to-end near-dup pairs: shingle → sign → band → verify ≥ threshold. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
                   threshold: Double = 0.5): DataFrame = {
    // each fan-out point is persisted: Spark's ReuseExchange does NOT
    // cover these self-join sides (verified on the executed plans), so
    // without caching the shingle explode runs 4× and the signature
    // aggregation 2×. At cluster scale these become checkpoints.
    // Spread.wide: the shingle+md5 leg is the CPU wall of the whole
    // pipeline and otherwise runs at the scan's split count (ONE task
    // on a single-row-group input); no-op when the scan is already
    // wide (guide §2.5).
    val sh    = graft.util.CacheScope.track(
      shingles(graft.util.Spread.wide(docs, col(idCol)), idCol, textCol, k))
    val sig   = graft.util.CacheScope.track(signatures(sh, idCol, numHashes))
    val cand  = candidatePairs(sig, idCol, numHashes, rowsPerBand)
    exactJaccard(cand, sh, idCol).filter(col("jaccard") >= threshold)
  }
}
