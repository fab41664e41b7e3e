package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection against a PERSISTED MinHash
  * index — the operational shape of dedup at 100 TB: the corpus grows
  * batch by batch, and each batch must find its duplicates against
  * everything ingested so far WITHOUT recomputing the existing
  * corpus's signatures or pair graph
  * (cf. [[MinHash.nearDupPairs]], the one-shot form).
  *
  * Index layout — BUCKETED catalog tables (external, rooted at
  * `<dir>/bands` and `<dir>/sets`), partitioned by `batch`:
  *   - bands `(id, band, key) PARTITIONED BY (batch)
  *     CLUSTERED BY (band, key)` — the LSH probe table;
  *   - sets  `(id, s) PARTITIONED BY (batch) CLUSTERED BY (id)` —
  *     shingle sets for exact verification.
  *
  * Bucketing is what makes the index INCREMENTAL at scale: the stored
  * side of every per-batch join arrives pre-partitioned on its join
  * key, so the probe plan has NO Exchange on the stored side
  * (ScaleSpec pins this) — per-batch shuffle volume is O(batch), not
  * O(corpus history). Without it each ingest would re-shuffle the
  * entire accumulated band table, the exact linear-in-history cost an
  * incremental index exists to avoid. Partitioning by `batch` keeps
  * ingestion append-only: a retry dynamic-partition-overwrites ONLY
  * its own `batch=N` partition.
  *
  * Sets are written BEFORE bands: bands are the probe entry point, so
  * a crash between the two writes must leave a sets-orphan (inert —
  * nothing probes it, and the batch retry overwrites it) rather than
  * a bands-orphan, whose candidates would silently vanish in the
  * set-lookup join. [[storedView]] additionally fails loudly if a
  * bands partition has no sets twin (a torn batch from a pre-fix
  * writer, or manual surgery).
  *
  * Single-writer assumption (same as the reference's loader): batch
  * ids are assigned monotonically by one producer; the catalog
  * entries live in the session catalog (production = a persistent
  * metastore over the same external paths).
  */
object DedupIndex {

  /** Catalog table names are derived from the index directory, so
    * independent indexes in one session never collide. */
  private def tableNames(indexDir: String): (String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(indexDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    (s"graft_idx_bands_$tag", s"graft_idx_sets_$tag")
  }

  /** Ingest one batch: returns the VERIFIED near-dup pairs involving
    * this batch (new-new and new-stored), and appends the batch's
    * bands + shingle sets to the index. `batchId` keys the index
    * partitions: a crashed run re-ingests the same batch id and
    * overwrites its own partitions idempotently. */
  def ingestBatch(docs: DataFrame, idCol: String, textCol: String,
                  indexDir: String, batchId: Int,
                  k: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
                  threshold: Double = 0.5, buckets: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    // spread the batch across the cluster BEFORE the per-doc hashing:
    // a batch often arrives as few (or one) input files, and the
    // shingle+md5 pipeline is the CPU-heavy stage — one shuffle of the
    // raw batch (O(batch)) buys full-width parallelism for it
    val spread = docs.repartition(spark.sparkContext.defaultParallelism,
      col(idCol))
    val sh = graft.util.CacheScope.track(
      MinHash.shingles(spread, idCol, textCol, k))
    val sig = MinHash.signatures(sh, idCol, numHashes)
    val newBands = graft.util.CacheScope.track(
      bandsOf(sig, idCol, numHashes, rowsPerBand))
    val newSets = graft.util.CacheScope.track(
      sh.groupBy(idCol).agg(collect_set(col("shingle")).as("s"))
        .select(col(idCol).as("id"), col("s")))

    // RESTART RECOVERY runs before the PROBE, not just before the
    // write: after a catalog loss with surviving index data,
    // storedView's tableExists check would otherwise return None and
    // the batch would probe an "empty" index — silently missing every
    // cross-batch pair (caught by IndexSpec's catalog-loss test).
    // Both calls are no-ops when the tables exist or no data survived.
    val (bandsT, setsT) = tableNames(indexDir)
    ensureTable(spark, newSets, setsT, s"$indexDir/sets", Seq("id"), buckets)
    ensureTable(spark, newBands, bandsT, s"$indexDir/bands",
      Seq("band", "key"), buckets)

    // exclude THIS batch id from the stored view: a crash-retry of a
    // batch whose index write already ran would otherwise see its own
    // rows in `stored`, duplicate every set lookup, and emit each
    // pair 2-4 times through the joins
    val stored = storedView(spark, indexDir, excludeBatch = batchId)

    // candidates = (new ⋈ new) ∪ (new ⋈ stored) band collisions — two
    // joins, NOT one join against a union: a union would discard the
    // stored table's bucketing and re-shuffle the whole index. The
    // stored side of the second join is bucketed on exactly the join
    // key, so only the (batch-sized) probe side moves.
    val newProbe = newBands.select(col("band"), col("key"), col("id").as("x"))
    def collisions(other: DataFrame) =
      newProbe
        .join(other.select(col("band"), col("key"), col("id").as("y")),
          Seq("band", "key"))
        .filter(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"))
    val cand = stored.map(s => collisions(newBands).unionAll(collisions(s._1)))
      .getOrElse(collisions(newBands))
      .distinct()

    // exact-Jaccard verify: resolve each pair side's shingle set from
    // the stored index (bucketed by id — exchange-free) or, for ids
    // born this batch, from the new sets. Never a union of stored ∪
    // new (same bucketing-destruction argument as above), and no
    // FORCED broadcast of the batch side: a production batch can be
    // a day of crawl, so the hint would override AQE's size check —
    // small batches still auto-broadcast, large ones degrade to a
    // shuffle join while the stored side stays exchange-free.
    def lookupSet(p: DataFrame, side: String, out: String): DataFrame = {
      val fresh = newSets
        .select(col("id").as(side), col("s").as(s"__new_$out"))
      val withNew = p.join(fresh, Seq(side), "left")
      stored match {
        case Some((_, ss)) =>
          withNew
            .join(ss.select(col("id").as(side), col("s").as(s"__st_$out")),
              Seq(side), "left")
            .withColumn(out, coalesce(col(s"__st_$out"), col(s"__new_$out")))
            .drop(s"__new_$out", s"__st_$out")
        case None => withNew.withColumnRenamed(s"__new_$out", out)
      }
    }
    val withSets = lookupSet(lookupSet(cand, "a", "sa"), "b", "sb")
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("long")
    val verified = withSets
      .select(col("a"), col("b"),
        (inter.cast("double") /
          (size(col("sa")).cast("long") + size(col("sb")).cast("long") - inter)
            .cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

    // append AFTER the probe plans are built against the old index
    // state; localCheckpoint pins the result so callers can read it
    // after the index advances. Sets first (see class doc).
    val out = verified.localCheckpoint()
    writeIndexed(spark, newSets, setsT, s"$indexDir/sets",
      Seq("id"), buckets, batchId)
    writeIndexed(spark, newBands, bandsT, s"$indexDir/bands",
      Seq("band", "key"), buckets, batchId)
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

  /** One batch partition of one index table. The batch is
    * pre-partitioned to exactly `buckets` tasks on the bucket keys —
    * same hash as the bucket-id assignment — so each task writes ONE
    * bucket file instead of tasks×buckets splinters. First write
    * creates the bucketed external table; after that, dynamic-partition
    * OVERWRITE of `batch=N` only — the retry-idempotent append. */
  private[graft] def writeIndexed(spark: SparkSession, df: DataFrame, table: String,
                           dir: String, bucketKeys: Seq[String], buckets: Int,
                           batchId: Int): Unit = {
    ensureTable(spark, df, table, dir, bucketKeys, buckets)
    val withBatch = df.repartition(buckets, bucketKeys.map(col): _*)
      .withColumn("batch", lit(batchId))
    if (!spark.catalog.tableExists(table)) {
      withBatch.write.mode(SaveMode.Overwrite)
        .partitionBy("batch")
        .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
        .sortBy(bucketKeys.head, bucketKeys.tail: _*)
        .option("path", dir)
        .format("parquet")
        .saveAsTable(table)
    } else {
      val conf = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(conf)
      spark.conf.set(conf, "dynamic")
      try withBatch.write.mode(SaveMode.Overwrite).insertInto(table)
      finally prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None    => spark.conf.unset(conf)
      }
    }
  }

  /** Restart recovery: an index whose DATA survives a JVM restart but
    * whose catalog entry (session-scoped here; a metastore in
    * production) did not must be RE-REGISTERED, never overwritten —
    * without this, the `saveAsTable(Overwrite)` first-write path would
    * silently destroy the accumulated index. Bucket count must match
    * the original write (bucket-file names encode the id, not the
    * count). */
  private[graft] def ensureTable(spark: SparkSession, df: DataFrame, table: String,
                          dir: String, bucketKeys: Seq[String],
                          buckets: Int): Unit = {
    if (!spark.catalog.tableExists(table) && fsBatches(spark, dir).nonEmpty) {
      val cols = df.schema.fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      val bk = bucketKeys.map(k => s"`$k`").mkString(", ")
      spark.sql(
        s"""CREATE TABLE $table ($cols) USING parquet
           |PARTITIONED BY (batch INT)
           |CLUSTERED BY ($bk) SORTED BY ($bk) INTO $buckets BUCKETS
           |LOCATION '$dir'""".stripMargin)
      spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
      ()
    }
  }

  /** Batch ids present on disk under one index table root — a
    * driver-side filesystem listing (Hadoop FS, so HDFS/object-store
    * paths work), no Spark job. */
  private[graft] def fsBatches(spark: SparkSession, dir: String): Set[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toInt).toSet
  }

  /** (bands, sets) as currently committed — minus `excludeBatch` (the
    * id being re-ingested) — or None before the first batch. Reads go
    * through the CATALOG tables so the scans report their bucketed
    * distribution; the `batch` partition filter prunes, then drops to
    * keep the ingestion layout out of the logical view. */
  private[graft] def storedView(spark: SparkSession, indexDir: String,
                                excludeBatch: Int): Option[(DataFrame, DataFrame)] = {
    val (bandsT, setsT) = tableNames(indexDir)
    if (!spark.catalog.tableExists(bandsT)) None
    else {
      // torn-batch guard: every bands partition must have its sets
      // twin, or probes into it would silently drop candidates in the
      // set-lookup join (missed pairs, no error — the failure mode a
      // loud assert exists for). Driver-side dir listing — no job.
      val torn = fsBatches(spark, s"$indexDir/bands") --
        fsBatches(spark, s"$indexDir/sets")
      require(torn.isEmpty,
        s"dedup index $indexDir is torn: bands partitions ${torn.mkString(",")} " +
          "have no sets twin — delete the orphan bands partitions or " +
          "re-ingest those batch ids")
      Some((
        spark.table(bandsT).filter(col("batch") =!= excludeBatch)
          .drop("batch").select("id", "band", "key"),
        spark.table(setsT).filter(col("batch") =!= excludeBatch)
          .drop("batch").select("id", "s")))
    }
  }
}
