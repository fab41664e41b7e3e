package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.DedupIndex
import graft.util.AtomicText

/** Persisted IVF-PQ index — [[Embeddings.ivfPqTopK]]'s operational
  * form, the same move the dedup family makes for bands and anchors:
  * a 100 TB embedding corpus ingests incrementally, so the ANN
  * structures must not rebuild per query (every sim query so far
  * re-derives centroids + codebook + codes from scratch).
  *
  * GEOMETRY IS PINNED AT CREATION (the PhashIndex `_geometry.tsv`
  * precedent, and how FAISS-style stores actually work: train once
  * on a sample, add forever): `create` computes the IVF centroids
  * (exact integer label-centroid sums) and the PQ codebook (the
  * nTrain smallest train ids' subvectors) from a TRAINING frame and
  * persists both to `<dir>/_geometry.tsv`; every later batch encodes
  * against that fixed geometry. Re-deriving per batch would silently
  * partition history into incompatible code spaces — the same
  * failure mode the phash band-width pin exists for.
  *
  * Codes live in ONE bucketed catalog table
  * `(id, cl, j, code) PARTITIONED BY (batch) CLUSTERED BY (cl)`:
  * queries probe `nprobe` clusters, and the bucket layout keeps the
  * stored side exchange-free under the probe join (ScaleSpec pins
  * it); at production scale `cl` would also partition, turning the
  * probe list into partition pruning. Ingestion is idempotent per
  * `batchId` (dynamic-partition overwrite), matching the rest of the
  * index family.
  *
  * With geometry trained on the full corpus, batch-wise ingest +
  * [[query]] equals the one-shot [[Embeddings.ivfPqTopK]] EXACTLY
  * (same integer arithmetic, same tie-breaks) — sim12 gates on
  * sim6's oracle; SimSpec pins recall vs brute force.
  */
object AnnIndex {

  private[graft] def tableName(indexDir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(indexDir.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(12)
    s"graft_annidx_codes_$tag"
  }

  private def geometryPath(indexDir: String) = s"$indexDir/_geometry.tsv"

  private def codesSpec(indexDir: String): Seq[DedupIndex.TableSpec] =
    Seq(DedupIndex.TableSpec(tableName(indexDir), "codes", Seq("cl")))

  /** OPTIMIZE: fold the batch partitions of the codes table into one
    * generation ([[DedupIndex.compactSpecs]]'s marker protocol on the
    * single-table spec) — daily ingestion otherwise leaves one
    * partition per batch forever, every probe scanning all of them.
    * Folding a batch ends its retry window, as across the family. */
  def compact(spark: SparkSession, indexDir: String,
              buckets: Int = 4): Boolean =
    DedupIndex.compactSpecs(spark, indexDir, codesSpec(indexDir), buckets)

  final case class Geometry(m: Int, subDim: Int, nTrain: Int,
                            cents: Seq[(Int, Long, Seq[Long])],
                            codes: Seq[(Int, Long, Seq[Long])])

  /** Train + pin the index geometry. `train` is the training sample
    * (the full corpus in the gated query; a sample at 100 TB — the
    * FAISS contract). Centroids and codebook are SMALL by
    * construction (|labels|·dim and m·nTrain·subDim integers), so the
    * driver-side collect is the geometry artifact, not a data move.
    * Refuses to overwrite an existing geometry: stored codes are only
    * decodable under the codebook that wrote them. */
  def create(train: DataFrame, idCol: String, embCol: String,
             labelCol: String, indexDir: String,
             m: Int = 8, subDim: Int = 8, nTrain: Int = 16): Unit = {
    require(AtomicText.readLines(geometryPath(indexDir)).isEmpty,
      s"ann index $indexDir already has pinned geometry — stored codes " +
        "are undecodable under a new codebook; create a fresh index")
    val q = train.select(col(idCol).as("id"), col(labelCol).as("cl"),
      Embeddings.quantizeChecked(col(embCol), m * subDim, 1e4).as("v"))
    val cents = Embeddings.labelCentroids(q, "cl")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Long](2))).sortBy(_._1)
    val codes = Embeddings.pqCodebook(
        Embeddings.pqSubs(q, m, subDim), nTrain)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Long](2))).sortBy(c => (c._1, c._2))
    val body = new StringBuilder
    body.append(s"param\tm\t$m\nparam\tsubDim\t$subDim\n")
    body.append(s"param\tnTrain\t$nTrain\n")
    cents.foreach { case (cl, n, s) =>
      body.append(s"cent\t$cl\t$n\t${s.mkString(",")}\n") }
    codes.foreach { case (j, c, cw) =>
      body.append(s"code\t$j\t$c\t${cw.mkString(",")}\n") }
    AtomicText.writeAtomically(geometryPath(indexDir), body.toString)
  }

  /** The pinned geometry — loud when absent (an index without
    * geometry has no code space to encode into). */
  def geometry(indexDir: String): Geometry = {
    val lines = AtomicText.readLines(geometryPath(indexDir))
    require(lines.nonEmpty,
      s"ann index $indexDir has no pinned geometry — run create() first")
    val kv = lines.map(_.split("\t"))
    def param(k: String): Int = kv.collectFirst {
      case Array("param", `k`, v) => v.toInt }.get
    Geometry(param("m"), param("subDim"), param("nTrain"),
      kv.collect { case Array("cent", cl, n, s) =>
        (cl.toInt, n.toLong, s.split(",").toSeq.map(_.toLong)) },
      kv.collect { case Array("code", j, c, cw) =>
        (j.toInt, c.toLong, cw.split(",").toSeq.map(_.toLong)) })
  }

  private def codebookDf(spark: SparkSession, g: Geometry): DataFrame = {
    import spark.implicits._
    g.codes.toDF("j", "c", "cw")
  }

  /** Encode one batch against the pinned codebook and append to the
    * cl-bucketed codes table. Idempotent per `batchId`. */
  def ingestBatch(vectors: DataFrame, idCol: String, embCol: String,
                  labelCol: String, indexDir: String, batchId: Int,
                  buckets: Int = 4): Unit = {
    val spark = vectors.sparkSession
    val g = geometry(indexDir)
    val q = vectors.select(col(idCol).as("id"), col(labelCol).as("cl"),
      Embeddings.quantizeChecked(col(embCol), g.m * g.subDim, 1e4).as("v"))
    val codes = Embeddings.pqCodes(
        Embeddings.pqSubs(q, g.m, g.subDim), codebookDf(spark, g))
      .join(q.select(col("id"), col("cl")), Seq("id"))
      .select(col("id"), col("cl"), col("j"), col("code"))
    val t = tableName(indexDir)
    DedupIndex.recoverSpecs(spark, indexDir, codesSpec(indexDir))
    DedupIndex.ensureTable(spark, codes, t, s"$indexDir/codes",
      Seq("cl"), buckets)
    DedupIndex.writeIndexed(spark, codes, t, s"$indexDir/codes",
      Seq("cl"), buckets, batchId)
  }

  /** ADC top-k over the STORED codes: probe the `nprobe` nearest
    * pinned centroids per query (exact integer n²·d², ties by
    * label), build the query↔codeword lookup table against the
    * pinned codebook, and score only the probed clusters' codes —
    * [[Embeddings.ivfPqTopK]] with the corpus side read from the
    * index. Self-matches excluded by id, as there. */
  def query(spark: SparkSession, indexDir: String, queries: DataFrame,
            idCol: String, embCol: String, k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val g = geometry(indexDir)
    val qv = graft.util.CacheScope.track(
      queries.select(col(idCol).as("id"),
        Embeddings.quantizeChecked(col(embCol), g.m * g.subDim, 1e4).as("v")))
    val cents = g.cents.toDF("cl", "n", "s")
    val pw = Window.partitionBy("query_id").orderBy(col("d2").asc, col("cl").asc)
    val probed = qv.select(col("id").as("query_id"), col("v"))
      .join(broadcast(cents))
      .select(col("query_id"), col("cl"), Embeddings.dist2n2.as("d2"))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nprobe)
      .select(col("query_id").as("p_query_id"), col("cl"))
    val lut = Embeddings.pqLut(
      Embeddings.pqSubs(qv, g.m, g.subDim), codebookDf(spark, g),
      lit(true))
    DedupIndex.recoverSpecs(spark, indexDir, codesSpec(indexDir))
    val codes = spark.table(tableName(indexDir))
      .select(col("id"), col("cl"), col("j"), col("code"))
    Embeddings.adcRank(codes.join(broadcast(probed), Seq("cl"))
      .join(broadcast(lut),
        codes("j") === lut("j") && lut("c") === codes("code") &&
          col("p_query_id") === lut("query_id")), k)
  }

  /** Drop this index's catalog table, geometry, and data — for
    * SCRATCH indexes whose lifetime is one query (sim12 registers
    * this as a CacheScope release hook). */
  def dropIndex(spark: SparkSession, indexDir: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${tableName(indexDir)}")
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}
