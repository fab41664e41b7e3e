package graft

import org.apache.spark.sql.functions._
import graft.text.{DedupIndex, MinHash}

/** Incremental dedup-index semantics: ingesting the corpus batch by
  * batch must discover exactly the pairs the one-shot pipeline finds
  * on the full corpus — cross-batch pairs included — and a re-run of
  * a batch (crash retry) must leave the index unchanged. */
class IndexSpec extends SparkSuite {
  import spark.implicits._

  private def corpus() = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    // planted near-dups ACROSS the batch split (originals are even ids,
    // copies odd) so cross-batch discovery is actually exercised
    docs.unionAll(docs.filter($"doc_id" % 20 === 0)
      .select(($"doc_id" + 1000001L).as("doc_id"),
        concat($"text", lit(" tail")).as("text")))
  }

  private def pairKey(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("batch-wise ingest == one-shot pairs, cross-batch pairs included") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup_idx_").toString
    val all = corpus()
    val batch0 = all.filter($"doc_id" % 2 === 0)
    val batch1 = all.filter($"doc_id" % 2 === 1)

    val p0 = pairKey(DedupIndex.ingestBatch(batch0, "doc_id", "text", tmp, 0))
    val p1 = pairKey(DedupIndex.ingestBatch(batch1, "doc_id", "text", tmp, 1))
    val oneShot = pairKey(MinHash.nearDupPairs(all, "doc_id", "text"))

    assert(oneShot.nonEmpty, "corpus must contain near-dup pairs")
    // batch 1's copies pair with batch 0's originals — the cross-batch
    // case an index exists for
    val cross = p1.filter { case (a, b) => a % 2 == 0 && b % 2 == 1 }
    assert(cross.nonEmpty, "expected cross-batch pairs via the stored index")
    assert((p0 ++ p1) == oneShot)

    // crash retry: re-ingesting batch 1 overwrites its own index dirs
    // (same rows) and rediscovers the same pairs — as a MULTISET:
    // comparing sets alone would mask duplicated rows from the
    // retry's own data still being visible in the stored index
    val p1againDf = DedupIndex.ingestBatch(batch1, "doc_id", "text", tmp, 1)
    assert(p1againDf.count() == p1.size, "retry must not duplicate pair rows")
    assert(pairKey(p1againDf) == p1)
    val bandRows = spark.read.parquet(s"$tmp/bands").count()
    val setRows  = spark.read.parquet(s"$tmp/sets").count()
    assert(setRows == all.count())
    assert(bandRows == setRows * 4) // 8 hashes / 2 rows-per-band
  }

  test("catalog loss: index data survives and re-registers, never overwritten") {
    // the restart scenario ensureTable exists for: the session catalog
    // entry (a metastore in production) is gone but the index DATA on
    // disk survived — the next ingest must RE-REGISTER the external
    // tables and still find cross-batch pairs against the old data.
    // The failure mode this guards is the saveAsTable(Overwrite)
    // first-write path silently destroying the accumulated index.
    val tmp = java.nio.file.Files.createTempDirectory("dedup_idx_rs_").toString
    val batchA = Seq(
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (4L, "completely unrelated payload with different words entirely"))
      .toDF("doc_id", "text")
    val batchB = Seq( // near-dup of id 2, lands in a LATER batch
      (3L, "the quick brown fox jumps over the lazy dog tonight yes"))
      .toDF("doc_id", "text")
    DedupIndex.ingestBatch(batchA, "doc_id", "text", tmp, 0)

    // simulate the restart: drop the session-catalog entries (EXTERNAL
    // tables — data stays), as a fresh JVM would present them
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_idx_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    assert(spark.read.parquet(s"$tmp/bands").count() > 0,
      "index data must survive the catalog drop")

    val pairs = pairKey(DedupIndex.ingestBatch(batchB, "doc_id", "text", tmp, 1))
    assert(pairs == Set((2L, 3L)),
      s"cross-batch pair against pre-restart data expected, got $pairs")
    // and batch 0's rows are still in the re-registered index
    assert(spark.read.parquet(s"$tmp/sets").count() == 3)
  }

  test("PhashIndex: audio fingerprints ingest batch-wise == one-shot; geometry pinned") {
    import graft.multimodal.{MediaContent, PhashIndex}
    val tmp = java.nio.file.Files.createTempDirectory("ph_idx_a_").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id")
    val fps = MediaContent.fingerprintAudio(
      MediaContent.audioFromDocuments(spark, docs)).toDF()
      .select($"doc_id".as("id"), $"fp_hi".as("hi"), $"fp_lo".as("lo"))
      .localCheckpoint()
    val n = fps.count()
    val bits = graft.sim.HammingBands.bits(n, occ = 4)
    // one-shot: all pairs via a single full-corpus ingest into a
    // scratch index
    val oneTmp = java.nio.file.Files.createTempDirectory("ph_idx_b_").toString
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = key(PhashIndex.ingestBatch(fps, oneTmp, 0, bits))
    // batch-wise: %2 split (planted pairs (2k, 2k+1) are cross-batch)
    val p0 = key(PhashIndex.ingestBatch(
      fps.filter($"id" % 2 === 0), tmp, 0, bits))
    val p1 = key(PhashIndex.ingestBatch(
      fps.filter($"id" % 2 === 1), tmp, 1, bits))
    assert(oneShot.nonEmpty, "audio corpus must contain near-dup pairs")
    val cross = p1.filter { case (a, b) => a % 2 != b % 2 }
    assert(cross.nonEmpty, "expected cross-batch pairs via stored bands")
    assert((p0 ++ p1) == oneShot)
    // geometry is an index invariant: a mismatched width refuses
    val e = intercept[IllegalArgumentException](
      PhashIndex.ingestBatch(fps, tmp, 2, bandBits = bits + 1))
    assert(e.getMessage.contains("bandBits"))
  }

  test("ingest verify joins: shuffle-join regime == broadcast regime") {
    // round 14 removed the forced broadcast() hints on the batch side
    // of the verify lookups (a production batch is a day of crawl —
    // the hint overrode AQE's size check). Small batches still
    // auto-broadcast; this pins that the DEGRADED regime (broadcast
    // disabled entirely, as AQE does above the threshold) returns
    // bit-identical pairs through the shuffle-join path.
    import graft.multimodal.{MediaContent, PhashIndex}
    val fps = MediaContent.fingerprintAudio(
      MediaContent.audioFromDocuments(spark,
        spark.read.parquet(s"$sf/documents.parquet").select($"doc_id"))).toDF()
      .select($"doc_id".as("id"), $"fp_hi".as("hi"), $"fp_lo".as("lo"))
      .localCheckpoint()
    val bits = graft.sim.HammingBands.bits(fps.count(), occ = 4)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def runPh(dir: String) =
      (key(PhashIndex.ingestBatch(fps.filter($"id" % 2 === 0), dir, 0, bits)),
        key(PhashIndex.ingestBatch(fps.filter($"id" % 2 === 1), dir, 1, bits)))
    def runMh(dir: String) = {
      val all = corpus()
      (pairKey(DedupIndex.ingestBatch(
          all.filter($"doc_id" % 2 === 0), "doc_id", "text", dir, 0)),
        pairKey(DedupIndex.ingestBatch(
          all.filter($"doc_id" % 2 === 1), "doc_id", "text", dir, 1)))
    }
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (bPh, bMh) = (runPh(tmp("regime_b_ph_")), runMh(tmp("regime_b_mh_")))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val (sPh, sMh) =
        (runPh(tmp("regime_s_ph_")), runMh(tmp("regime_s_mh_")))
      assert(sPh == bPh, "PhashIndex pairs must not depend on join strategy")
      assert(sMh == bMh, "DedupIndex pairs must not depend on join strategy")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
