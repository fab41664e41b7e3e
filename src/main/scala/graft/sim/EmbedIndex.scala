package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.DedupIndex
import graft.util.AtomicText

/** Incremental EMBEDDING near-dup detection against a persisted
  * sign-LSH band index — the vector-space member of the incremental
  * family (dd9 MinHash shingles, dd18 perceptual hashes, dd22 token
  * spans, dd24 clusters), closing the one modality whose near-dup
  * pass ([[Embeddings.nearDupPairs]], dd7/dd14) was still one-shot: a
  * 100 TB embedding corpus ingests batch by batch, and each batch
  * must find its semantic duplicates against everything so far
  * WITHOUT re-bucketing the accumulated corpus.
  *
  * Index layout — bucketed catalog tables, partitioned by `batch`:
  *   - bands `(id, t, b) CLUSTERED BY (t, b)` — the hyperplane-sign
  *     LSH probe table (the dd7 keys: exact integer dot products
  *     against md5-derived planes);
  *   - vecs  `(id, v, n2) CLUSTERED BY (id)` — quantized vectors +
  *     norms for the exact integer-cosine verify.
  *
  * LSH geometry `(bits, tables)` is pinned at creation
  * (`_geometry.tsv`, the PhashIndex precedent): the planes themselves
  * are deterministic functions of (table, bit, dim), so pinning the
  * two counts pins the whole key space — stored bands keyed under a
  * different geometry would be unreachable, which reads as silent
  * recall loss, so a mismatch refuses loudly.
  *
  * Vecs write BEFORE bands (the family's torn-batch direction: bands
  * are the probe entry point, so a crash leaves a vecs-orphan —
  * inert — never a bands-orphan whose candidates would silently drop
  * in the verify join). Batch-wise output equals the one-shot
  * [[Embeddings.nearDupPairs]] pass exactly (deterministic keys +
  * exact integer cosine — no randomness to tolerate): dd25 gates on
  * dd7's oracle.
  */
object EmbedIndex {

  private def tableNames(indexDir: String): (String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(indexDir.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(12)
    (s"graft_embidx_bands_$tag", s"graft_embidx_vecs_$tag")
  }

  private def pair(indexDir: String): DedupIndex.PairSpec = {
    val (bandsT, vecsT) = tableNames(indexDir)
    DedupIndex.PairSpec(bandsT, "bands", Seq("t", "b"),
      vecsT, "vecs", Seq("id"))
  }

  private def geometryPath(indexDir: String) = s"$indexDir/_geometry.tsv"

  private def pinGeometry(indexDir: String, bits: Int, tables: Int): Unit = {
    AtomicText.readLines(geometryPath(indexDir)) match {
      case Seq() =>
        AtomicText.writeAtomically(geometryPath(indexDir),
          s"bits\t$bits\ntables\t$tables\n")
      case lines =>
        val kv = lines.map(_.split("\t"))
          .collect { case Array(k, v) => k -> v.trim.toInt }.toMap
        require(kv.get("bits").contains(bits) &&
          kv.get("tables").contains(tables),
          s"embed index $indexDir was created with " +
            s"bits=${kv.getOrElse("bits", "?")}/" +
            s"tables=${kv.getOrElse("tables", "?")}; this ingest asked " +
            s"for bits=$bits/tables=$tables — stored bands would be " +
            "unreachable under a different key space")
    }
  }

  /** Fold the batch partitions into one generation
    * ([[DedupIndex.compact]] semantics). */
  def compact(spark: SparkSession, indexDir: String,
              buckets: Int = 4): Boolean =
    DedupIndex.compactPair(spark, indexDir, pair(indexDir), buckets)

  /** Ingest one batch of embeddings `(idCol, embCol)`: returns the
    * VERIFIED near-dup pairs involving this batch (`a_id < b_id`,
    * exact integer `cos_sim >= threshold`, new-new and new-stored)
    * and appends the batch's bands + quantized vectors. A crashed run
    * re-ingests the same `batchId` idempotently. */
  def ingestBatch(vectors: DataFrame, idCol: String, embCol: String,
                  indexDir: String, batchId: Int, threshold: Double,
                  bits: Int = 8, tables: Int = 2, dim: Int = 64,
                  buckets: Int = 4): DataFrame = {
    val spark = vectors.sparkSession
    pinGeometry(indexDir, bits, tables)
    val newVecs = graft.util.CacheScope.track(vectors
      .select(col(idCol).as("id"),
        Embeddings.quantizeChecked(col(embCol), dim).as("v"))
      .withColumn("n2", Embeddings.qnorm2(col("v"))))
    val newBands = graft.util.CacheScope.track(
      newVecs.select(col("id"), explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"),
            Embeddings.signBucket(col("v"), t, bits, dim).as("b"))): _*))
          .as("tb"))
        .select(col("id"), col("tb.t").as("t"), col("tb.b").as("b")))

    val (bandsT, vecsT) = tableNames(indexDir)
    DedupIndex.recoverPair(spark, indexDir, pair(indexDir))
    DedupIndex.ensureTable(spark, newVecs, vecsT, s"$indexDir/vecs",
      Seq("id"), buckets)
    DedupIndex.ensureTable(spark, newBands, bandsT, s"$indexDir/bands",
      Seq("t", "b"), buckets)
    val stored = storedView(spark, indexDir, excludeBatch = batchId)

    // candidates = (new ⋈ new) ∪ (new ⋈ stored) bucket collisions —
    // two joins, never one join against a union (the family's
    // bucketing-preservation argument)
    val newProbe = newBands.select(col("t"), col("b"), col("id").as("x"))
    def collisions(other: DataFrame) =
      newProbe
        .join(other.select(col("t"), col("b"), col("id").as("y")),
          Seq("t", "b"))
        .filter(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a_id"),
          greatest(col("x"), col("y")).as("b_id"))
    val cand = stored
      .map(s => collisions(newBands).unionAll(collisions(s._1)))
      .getOrElse(collisions(newBands))
      .distinct()

    // exact integer-cosine verify: each side's quantized vector from
    // the id-bucketed store (exchange-free) or the new batch — the
    // NEW batch's vector wins the coalesce (an id re-ingested with
    // changed content verifies against what this batch carries)
    def lookupVec(p: DataFrame, side: String, tag: String): DataFrame = {
      val fresh = newVecs.select(col("id").as(side),
        col("v").as(s"__nv_$tag"), col("n2").as(s"__nn_$tag"))
      val withNew = p.join(fresh, Seq(side), "left")
      stored match {
        case Some((_, sv)) =>
          withNew
            .join(sv.select(col("id").as(side), col("v").as(s"__sv_$tag"),
              col("n2").as(s"__sn_$tag")), Seq(side), "left")
            .withColumn(s"v$tag",
              coalesce(col(s"__nv_$tag"), col(s"__sv_$tag")))
            .withColumn(s"n2$tag",
              coalesce(col(s"__nn_$tag"), col(s"__sn_$tag")))
            .drop(s"__nv_$tag", s"__nn_$tag", s"__sv_$tag", s"__sn_$tag")
        case None =>
          withNew.withColumnRenamed(s"__nv_$tag", s"v$tag")
            .withColumnRenamed(s"__nn_$tag", s"n2$tag")
      }
    }
    val withVecs = lookupVec(lookupVec(cand, "a_id", "a"), "b_id", "b")
    val verified = withVecs
      .select(col("a_id"), col("b_id"),
        Embeddings.cosine(Embeddings.qdot(col("va"), col("vb")),
          col("n2a"), col("n2b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)

    val out = verified.localCheckpoint()
    DedupIndex.writeIndexed(spark, newVecs, vecsT, s"$indexDir/vecs",
      Seq("id"), buckets, batchId)
    DedupIndex.writeIndexed(spark, newBands, bandsT, s"$indexDir/bands",
      Seq("t", "b"), buckets, batchId)
    out
  }

  /** Drop this index's session-catalog tables and delete its data —
    * for SCRATCH indexes whose lifetime is one query (dd25 registers
    * this as a CacheScope release hook). */
  def dropIndex(spark: SparkSession, indexDir: String): Unit = {
    val (b, v) = tableNames(indexDir)
    Seq(b, v).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** (bands, vecs) as committed — minus `excludeBatch` — or None
    * before the first batch; torn guard: every bands partition must
    * have its vecs twin (a missing vector silently drops candidates
    * in the verify join). */
  private[graft] def storedView(spark: SparkSession, indexDir: String,
                                excludeBatch: Int)
    : Option[(DataFrame, DataFrame)] = {
    val (bandsT, vecsT) = tableNames(indexDir)
    DedupIndex.recoverPair(spark, indexDir, pair(indexDir))
    if (!spark.catalog.tableExists(bandsT)) None
    else {
      val torn = DedupIndex.fsBatches(spark, s"$indexDir/bands") --
        DedupIndex.fsBatches(spark, s"$indexDir/vecs")
      require(torn.isEmpty,
        s"embed index $indexDir is torn: bands partitions " +
          s"${torn.mkString(",")} have no vecs twin — delete the orphan " +
          "bands partitions or re-ingest those batch ids")
      Some((
        spark.table(bandsT).filter(col("batch") =!= excludeBatch)
          .drop("batch").select("id", "t", "b"),
        spark.table(vecsT).filter(col("batch") =!= excludeBatch)
          .drop("batch").select("id", "v", "n2")))
    }
  }
}
