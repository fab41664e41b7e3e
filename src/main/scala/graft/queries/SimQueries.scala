package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sim.Embeddings

/** Similarity-search queries over `embeddings` + the multimodal
  * metadata query over `documents` payloads.
  *
  * All similarity math is exact-integer (see [[Embeddings]]) so the
  * DuckDB oracle reproduces scores bit-for-bit; ranks carry a
  * neighbor-id tiebreaker.
  */
object SimQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-k: every 50th vector queries the corpus.
    "sim1_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Embeddings.bruteForceTopK(
        emb.filter(col("vec_id") % 50 === 0), emb, "vec_id", "embedding", k = 5)
    }),

    // Sign-LSH bucketed ANN: seeded random hyperplanes, multi-table
    // probing (the scale path — never materializes all pairs; bits
    // and tables grow with the corpus).
    "sim2_lsh_ann" -> ((s, d) => {
      Embeddings.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        k = 3, bits = Sim2Bits, tables = Sim2Tables)
    }),

    // IVF-style coarse quantizer: exact integer label centroids,
    // nearest-centroid assignment.
    "sim3_ivf_centroid" -> ((s, d) => {
      Embeddings.centroidAssign(Tables.embeddings(s, d),
        "vec_id", "embedding", "label")
    }),

    // IVF search — the pruned-scan ANN the coarse quantizer exists
    // for: every 50th vector probes its 2 nearest centroids and
    // scores exact cosine only inside those clusters (at scale: the
    // corpus is partitioned by label and the probe list prunes
    // partitions from the scan).
    "sim4_ivf_search" -> ((s, d) => {
      Embeddings.ivfSearch(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", queryPred = col("id") % 50 === 0, k = 5, nprobe = 2)
    }),

    // IVF over a BUCKETED manifest table (round 9: the ANN and SPJ
    // threads composed): the corpus lives in a catalog table bucketed
    // on the IVF cell (label), so the probe's cell set — a broadcast
    // join at run time — prunes files WITHIN each bucket group via
    // Hybrid retrieval (round 10): lexical BM25 over documents fused
    // with embedding cosine via integer RECIPROCAL RANK FUSION —
    // the two-arm retrieval stack every RAG pipeline runs. Each arm
    // ranks its own top-50 (BM25 doubles are bit-deterministic by
    // t25's construction; cosine is exact-integer-parts); the fusion
    // score 10^6/(60+r) folds in INTEGER division, so the fused
    // ranking is integer-exact end to end. Scale shape: the lexical
    // arm is one corpus aggregation family + broadcast df; the
    // semantic arm broadcasts the single query vector over the
    // embedding scan; fusion joins two 50-row frames.
    "sim11_hybrid_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // lexical arm: t25's BM25 (same constants, same fixed-order
      // IEEE arithmetic), ranked top-50
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val terms = Seq("hash", "join", "vector")
      val tf = toks.filter(col("tok").isin(terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        .crossJoin(lens.agg(sum(col("len")).cast("double").as("s_toks")))
      val scored = tf.join(broadcast(dfreq), "tok").join(lens, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("score",
          ((col("n_docs") - col("df") + lit(0.5d)) /
            (col("df") + lit(0.5d))) *
          ((col("tf") * lit(2.2d)) /
            (col("tf") + lit(0.3d) +
              (lit(0.9d) * col("len")) / (col("s_toks") / col("n_docs")))))
      val bm25 = scored.groupBy("doc_id").agg(
        sum(when(col("tok") === "hash", col("score"))).as("s1"),
        sum(when(col("tok") === "join", col("score"))).as("s2"),
        sum(when(col("tok") === "vector", col("score"))).as("s3"))
        .select(col("doc_id"),
          (coalesce(col("s1"), lit(0d)) + coalesce(col("s2"), lit(0d)) +
            coalesce(col("s3"), lit(0d))).as("bm25"))
      // distributed top-k FIRST (TakeOrderedAndProject — no global
      // single-partition window over the corpus), then rank the
      // 50-row result
      val wl = Window.orderBy(col("bm25").desc, col("doc_id").asc)
      val lex = bm25.orderBy(col("bm25").desc, col("doc_id").asc).limit(50)
        .withColumn("r_lex", row_number().over(wl))
        .select(col("doc_id"), col("r_lex"))
      // semantic arm: exact-integer cosine against ONE query vector
      val emb = Tables.embeddings(s, d)
      val qvec = emb.filter(col("vec_id") === 0).select(
        Embeddings.quantize(col("embedding")).as("qv"))
        .withColumn("qn2", Embeddings.qnorm2(col("qv")))
      val cosScored = emb.select(col("vec_id"),
        Embeddings.quantize(col("embedding")).as("cv"))
        .withColumn("cn2", Embeddings.qnorm2(col("cv")))
        .crossJoin(broadcast(qvec))
        .select(col("vec_id"),
          Embeddings.cosine(Embeddings.qdot(col("qv"), col("cv")),
            col("qn2"), col("cn2")).as("cos"))
      val ws = Window.orderBy(col("cos").desc, col("vec_id").asc)
      val sem = cosScored.orderBy(col("cos").desc, col("vec_id").asc)
        .limit(50)
        .withColumn("r_sem", row_number().over(ws))
        .select(col("vec_id"), col("r_sem"))
      // reciprocal rank fusion, k=60, ppm-scaled integer division;
      // an id absent from one arm rides rank 1000
      lex.join(sem, lex("doc_id") === sem("vec_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
          col("r_lex").cast("long").as("r_lex"),
          col("r_sem").cast("long").as("r_sem"),
          (expr("1000000 div (60 + coalesce(r_lex, 1000))") +
            expr("1000000 div (60 + coalesce(r_sem, 1000))"))
            .cast("long").as("rrf_ppm"))
        .orderBy(col("rrf_ppm").desc, col("id").asc)
        .limit(10)
    }),

    // runtime filtering, and a same-bucketed second corpus would join
    // exchange-free. Same semantics as sim4 (the oracle is shared):
    // the hash gate certifies that the bucket-pruned storage path
    // returns bit-identical neighbors.
    "sim10_bucketed_ivf" -> ((s, d) => {
      import graft.plans.GraftSql
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_sim10_wh_").toString)
      Tables.embeddings(s, d).select("vec_id", "label", "embedding")
        .createOrReplaceTempView("sim10_src")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.ivfb")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.ivfb (vec_id BIGINT, label INT,
           |  embedding ARRAY<FLOAT>) USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'vec_id', 'bucketBy' = '8,label')
           |""".stripMargin)
      GraftSql.execute(s, s"INSERT INTO $cat.ivfb SELECT * FROM sim10_src")
      Embeddings.ivfSearch(s.table(s"$cat.ivfb"), "vec_id", "embedding",
        "label", queryPred = col("id") % 50 === 0, k = 5, nprobe = 2)
    }),

    // Product-quantization ANN (ADC): corpus compressed 4× to one
    // code per 4-dim subspace, queries score code lookup tables
    // instead of vectors — the memory leg of the ANN triad (sim2
    // prunes candidates, sim4 prunes scans, sim5 shrinks residency).
    // Deterministic Lloyd's k-means — the semantic-diversity sampler
    // (cluster-balanced selection, topic mixing) run before corpus
    // sampling. k = the label cardinality, 8 iterations; output is
    // per-cluster size + majority true label + purity, a shape that
    // is deterministic end to end (integer distances, id-tie argmin,
    // lowest-id seeds) — deliberately so: the DuckDB oracle unrolls
    // the 8 fixed iterations as staged CTEs and matches bit-for-bit.
    "sim7_kmeans_diversity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val k = emb.select("label").distinct().count().toInt
      val assigned = Embeddings.kMeans(emb, "vec_id", "embedding",
        k = k, iters = 8)
      assigned.join(emb.select(col("vec_id").as("vid"), col("label")), "vid")
        .groupBy(col("cluster"), col("label"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("cluster")
            .orderBy(col("n").desc, col("label").asc)))
        .groupBy(col("cluster"))
        .agg(sum(col("n")).as("n_members"),
          max(when(col("rk") === 1, col("label"))).as("majority_label"),
          (max(when(col("rk") === 1, col("n"))).cast("double") /
            sum(col("n"))).as("purity"))
    }),

    "sim5_pq_topk" -> ((s, d) => {
      Embeddings.pqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryPred = col("id") % 50 === 0, k = 5, m = Sim5M, subDim = Sim5Sub)
    }),

    // IVF-PQ — the stacked ANN form real vector stores deploy: the
    // probe prunes WHICH vectors a query touches (2 nearest label
    // centroids), PQ shrinks WHAT is scored (ADC over codes). Both
    // legs proven separately (sim4, sim5); this gates the composition.
    "sim6_ivfpq_topk" -> ((s, d) => {
      Embeddings.ivfPqTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", queryPred = col("id") % 50 === 0, k = 5, nprobe = 2,
        m = Sim5M, subDim = Sim5Sub)
    }),

    // PERSISTED ANN index (round 15): every sim query so far rebuilds
    // its structures per run — a 100 TB embedding corpus ingests
    // incrementally. sim12 trains the geometry once (IVF centroids +
    // PQ codebook pinned to _geometry.tsv, the FAISS train-then-add
    // contract), ingests the corpus in three batches into the
    // cl-bucketed codes table, and answers top-k by probing nprobe
    // pinned centroids over the STORED codes — exchange-free stored
    // side (ScaleSpec). Geometry trained on the same corpus ⇒
    // batch-wise == one-shot sim6 exactly; the oracle IS sim6's SQL,
    // and SimSpec pins recall vs brute force.
    "sim12_ann_index" -> ((s, d) => {
      import graft.sim.AnnIndex
      val dir = java.nio.file.Files
        .createTempDirectory("graft_sim12_idx_").toString
      graft.util.CacheScope.onRelease(() => AnnIndex.dropIndex(s, dir))
      val emb = Tables.embeddings(s, d)
      AnnIndex.create(emb, "vec_id", "embedding", "label", dir,
        m = Sim5M, subDim = Sim5Sub)
      (0 until 3).foreach(i => AnnIndex.ingestBatch(
        emb.filter(pmod(col("vec_id"), lit(3)) === i),
        "vec_id", "embedding", "label", dir, i))
      AnnIndex.query(s, dir, emb.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", k = 5, nprobe = 2)
    }),

    // Embedding-cosine near-dup (the vector member of the dd family):
    // corpus extended with exact copies (id+2e6) and perturbed copies
    // (id+3e6, x*0.9+0.05 → cosine ≈ 0.92 vs original; natural pairs
    // max ≈ 0.51 on this corpus) so duplicate groups exist at every
    // sf. LSH-bucketed candidates, exact integer cosine ≥ 0.9.
    "dd7_embed_neardup" -> ((s, d) =>
      Embeddings.nearDupPairs(dd7Corpus(s, d),
        "vec_id", "e", threshold = 0.9, bits = Dd7Bits, tables = Dd7Tables)),

    // Incremental EMBEDDING near-dup (round 15) — the dd18 move for
    // the vector modality, closing the last one-shot member of the
    // incremental family ([[graft.sim.EmbedIndex]]): sign-LSH bands +
    // quantized vectors persist in bucketed tables under pinned
    // (bits, tables) geometry; each batch probes the stored bands
    // exchange-free and verifies exact integer cosine against the
    // id-bucketed vector store. dd7's corpus ingested as three
    // batches on vec_id%3 — every exact copy (id+2e6, 2e6≡2 mod 3)
    // lands in a DIFFERENT batch from its source, so recovering them
    // exercises the stored probe; perturbed copies (id+3e6) stay
    // within-batch, covering the new-new join. Batch-wise must equal
    // the one-shot dd7 pass exactly: deterministic keys + exact
    // cosine — the oracle IS dd7's SQL.
    "dd25_incremental_embed" -> ((s, d) => {
      import graft.sim.EmbedIndex
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dd25_idx_").toString
      graft.util.CacheScope.onRelease(() => EmbedIndex.dropIndex(s, dir))
      val corpus = graft.util.CacheScope.track(dd7Corpus(s, d))
      val pairs = (0 until 3)
        .map(i => EmbedIndex.ingestBatch(
          corpus.filter(pmod(col("vec_id"), lit(3)) === i),
          "vec_id", "e", dir, i, threshold = 0.9,
          bits = Dd7Bits, tables = Dd7Tables))
        .reduce(_ unionAll _)
        .localCheckpoint() // the recall guard below re-reads it
      val planted = corpus
        .filter(col("vec_id") >= 2000000L && col("vec_id") < 3000000L)
        .count()
      val found = pairs
        .filter(col("b_id") === col("a_id") + 2000000L)
        .select("a_id").distinct().count()
      require(found == planted,
        s"dd25: recovered $found of $planted planted cross-batch " +
          "exact copies — identical vectors collide in every table")
      pairs
    }),

    // SEMANTIC dedup canonicalization (SemDeDup's shape): the
    // embedding near-dup pair graph (dd7's exact-integer cosine over
    // LSH candidates) contracts to connected components, and each
    // semantic duplicate group keeps its min-id vector as canonical —
    // the row a curation filter joins on to drop paraphrase-level
    // copies that no lexical dedup (dd1/dd2/dd13) can see. Scale
    // shape: the pair graph is the expensive intermediate (never
    // all-pairs — banded LSH); CC is O(log n) label-propagation
    // rounds over the EDGE subgraph only (singletons re-enter via one
    // left join).
    "dd14_semantic_dedup" -> ((s, d) => {
      val corpus = dd7Corpus(s, d)
      val pairs = Embeddings.nearDupPairs(corpus,
        "vec_id", "e", threshold = 0.9, bits = Dd7Bits, tables = Dd7Tables)
      graft.text.DedupClusters.connectedComponents(
          corpus.select(col("vec_id").as("id")),
          pairs.select(col("a_id").as("a"), col("b_id").as("b")))
        .select(col("id").as("vec_id"), col("canonical_id"),
          when(col("id") === col("canonical_id"), 1).otherwise(0)
            .as("is_canonical"))
    }),

    // Embedding outlier filter (round-8 continuation): exact integer
    // n²·d² distance of every vector to its OWN label centroid,
    // deterministic per-label ranking, top-5% flagged — the
    // embedding-space noise filter (mislabeled / off-topic / garbled
    // rows) a curation pipeline runs before sampling. Centroids
    // broadcast; one shuffle on label.
    "sim9_outlier_filter" -> ((s, d) => {
      Embeddings.centroidOutliers(Tables.embeddings(s, d),
        "vec_id", "embedding", "label", denom = 20)
    }),

    // ANN recall@k certified by the HARD gate: each approximate
    // method's top-k (sign-LSH, IVF) joined against its brute-force
    // ground truth — every leg integer-exact, so the DuckDB oracle
    // reproduces both the approximate and the exact lists and the
    // recall fractions hash-match. SimSpec pins thresholds; this row
    // lets the driver certify ANN QUALITY, not just result shape.
    // Scale: the truth leg is |Q|×|C| on the 1-in-50 query sample —
    // recall certification always samples; the ANN legs are the
    // production paths (bucketed / partition-pruned).
    "sim8_recall_report" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") % 50 === 0)
      def pairs(df: DataFrame) = df.select("query_id", "neighbor_id")
      def report(method: String, k: Int, ann: DataFrame,
                 truth: DataFrame): DataFrame = {
        val hits = pairs(truth)
          .join(pairs(ann), Seq("query_id", "neighbor_id"), "left_semi")
        pairs(truth)
          .agg(countDistinct(col("query_id")).as("n_queries"),
            count(lit(1)).as("truth_pairs"))
          .crossJoin(hits.agg(count(lit(1)).as("hit_pairs")))
          .select(lit(method).as("method"), lit(k).as("k"),
            col("n_queries"), col("truth_pairs"), col("hit_pairs"),
            (col("hit_pairs").cast("double") / col("truth_pairs"))
              .as("recall"))
      }
      val lsh = Embeddings.lshTopK(emb, "vec_id", "embedding",
          k = 3, bits = Sim2Bits, tables = Sim2Tables)
        .filter(col("query_id") % 50 === 0)
      val bf3 = Embeddings.bruteForceTopK(qs, emb, "vec_id", "embedding", k = 3)
      val ivf = Embeddings.ivfSearch(emb, "vec_id", "embedding", "label",
        queryPred = col("id") % 50 === 0, k = 5, nprobe = 2)
      val bf5 = Embeddings.bruteForceTopK(qs, emb, "vec_id", "embedding", k = 5)
      report("lsh", 3, lsh, bf3).unionAll(report("ivf", 5, ivf, bf5))
    }),

    // Multimodal metadata over REAL binary containers: each document
    // is wrapped in a genuine PNG/BMP/WAV header (format by doc_id%3,
    // body = text bytes) and width/height/format come back out by
    // PARSING those bytes in the mapPartitions decode path. The oracle
    // predicts the same values arithmetically, so the hash match
    // certifies the encode→decode round trip.
    "mm1_media_meta" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val meta = graft.multimodal.Multimodal
        .extractMeta(graft.multimodal.Multimodal.mediaFromDocuments(s, docs))
        .toDF()
      meta.select(col("id").as("doc_id"), col("format"), col("width"),
          col("height"), col("n_bytes"))
        .join(docs.select(col("doc_id"), md5(col("text")).as("payload_md5")),
          Seq("doc_id"))
    }),

    // Video containers: each document wrapped as a REAL RIFF/AVI header
    // (rate/frames/dims by doc_id arithmetic, body = text bytes) and
    // parsed back out in the mapPartitions decode path — then
    // frameSampleIndices turns the PARSED duration into a deterministic
    // 2 fps / max-8 sampling plan per video (the per-frame decode those
    // indices would fan into is the codec boundary). Short clips
    // (duration < 500 ms) exercise the empty-plan branch. The oracle
    // predicts every value arithmetically, so the hash match certifies
    // the AVI encode→decode round trip AND the sampling arithmetic.
    "mm2_video_meta" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val meta = graft.multimodal.Multimodal
        .extractVideoMeta(graft.multimodal.Multimodal.videoFromDocuments(s, docs))
        .toDF()
      meta.select(col("id").as("doc_id"), col("format"), col("width"),
          col("height"), col("us_per_frame"), col("total_frames"),
          col("duration_ms"), col("n_bytes"))
        .withColumn("sample_idx", graft.multimodal.Multimodal
          .frameSampleIndices(col("duration_ms"), fps = 2.0, maxFrames = 8))
        // The driver's compare harness hashes rows with pandas, which
        // cannot hash an array cell — serialize the plan to a joined
        // string (both arms emit the identical CSV form).
        .withColumn("sample_idx",
          array_join(col("sample_idx").cast("array<string>"), ","))
    }),

    // The REAL-corpus container pair (round 7): JPEG SOFn dims and
    // MP4 moov/mvhd+tkhd clock/dims, both parsed from genuine binary
    // layouts (marker walk / box traversal) synthesized from the
    // documents table — even ids JPEG, odd ids MP4. The oracle
    // predicts every field arithmetically (header sizes 39 / 240,
    // duration = mvhd duration·1000/timescale), so a hash match
    // certifies both encode→decode round trips.
    // The web-corpus sibling pair (round-7 continuation): GIF
    // Logical-Screen-Descriptor dims (LE16) and FLAC STREAMINFO
    // sample-rate/channels (the spec's 20/3-bit packed field), both
    // parsed from genuine binary layouts. Oracle predicts every field
    // arithmetically (headers 13 / 42 bytes) — a hash match certifies
    // the encode→decode round trips.
    "mm4_gif_flac_meta" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val media = Multimodal.gifFlacFromDocuments(s, docs)
      Multimodal.extractMeta(media).toDF()
        .select(col("id").as("doc_id"), col("format"), col("width"),
          col("height"), col("n_bytes"))
    }),

    // WebP (VP8X extended header, LE24 canvas dims) + MP3 (ID3v2 tag
    // skip + MPEG frame-header sample-rate/channel bits) — the two
    // most common remaining web-corpus container types (round-8
    // task). Same contract as mm1-mm4: REAL binary layouts
    // synthesized from documents, values recovered by PARSING, the
    // oracle predicts them arithmetically, so a hash match certifies
    // the encode→decode round trips.
    "mm5_webp_mp3_meta" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      Multimodal.extractMeta(Multimodal.webpMp3FromDocuments(s, docs)).toDF()
        .select(col("id").as("doc_id"), col("format"), col("width"),
          col("height"), col("n_bytes"))
    }),

    "mm3_jpeg_mp4_meta" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val media = Multimodal.jpegMp4FromDocuments(s, docs)
      val img = Multimodal.extractMeta(media.filter(_.id % 2 == 0)).toDF()
        .select(col("id").as("doc_id"), col("format"), col("width"),
          col("height"), lit(0L).as("duration_ms"), col("n_bytes"))
      val vid = Multimodal.extractVideoMeta(media.filter(_.id % 2 == 1)).toDF()
        .select(col("id").as("doc_id"), col("format"), col("width"),
          col("height"), col("duration_ms"), col("n_bytes"))
      img.unionByName(vid)
    }),

    // Pixel-level perceptual hashing (round 12): REAL pixel grids
    // (id-derived integer arithmetic) encoded as genuine BMP (24bpp
    // bottom-up padded rows) and PNG (zlib IDAT + filter bytes, real
    // CRCs), decoded BACK FROM THE BYTES (Inflater + un-filter), then
    // dHash/aHash by integer block-average downsample. The oracle
    // replays the pixel + hash arithmetic straight from doc_id without
    // seeing the binary — a hash match certifies encoder, decoder,
    // gray conversion, downsample, and bit packing together. The
    // 64-bit hashes travel as two 32-bit halves (hi/lo) so the BIGINT
    // oracle arithmetic never touches the sign bit.
    "mm6_image_phash" -> ((s, d) => {
      import graft.multimodal.ImagePixels
      val docs = Tables.documents(s, d).select(col("doc_id"))
      ImagePixels.hashImages(ImagePixels.imagesFromDocuments(s, docs))
        .toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("dh_hi"), col("dh_lo"), col("ah_hi"), col("ah_lo"))
    }),

    // Audio CONTENT (round 12): real WAV payloads carrying 16-bit PCM
    // mono waveforms (id-derived integers), decoded BACK FROM THE
    // BYTES and fingerprinted by frame-energy deltas (bit f = "energy
    // rose frame f-1 → f", the Haitsma–Kalker bit shape — gain-shift
    // robust, pure integer). The oracle replays the waveform + energy
    // + bit-packing arithmetic straight from doc_id, so a hash match
    // certifies WAV encode, PCM decode (sign-extension included), the
    // 32-sample energy fold, and the packing together.
    "mm7_audio_fingerprint" -> ((s, d) => {
      import graft.multimodal.MediaContent
      val docs = Tables.documents(s, d).select(col("doc_id"))
      MediaContent.fingerprintAudio(
        MediaContent.audioFromDocuments(s, docs)).toDF()
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          col("fp_hi"), col("fp_lo"))
    }),

    // Audio near-duplicate detection (round 12): banded LSH over the
    // 64-bit acoustic fingerprint, candidates from band-equality
    // self-joins, exact Hamming ≤ 8 verify. Band geometry derives
    // from the corpus count by the occupancy rule ([[HammingBands]],
    // round 13): 8×8-bit at the oracle scale, narrower/wider as the
    // corpus grows — never a code-time constant that balloons bucket
    // occupancy at 10^9 items. Planted pairs (2k, 2k+1) share a
    // waveform differing on every 499th sample; the in-query recall
    // guard pins that the banded search recovers ≥70% of them (the
    // rest sit past the Hamming threshold by construction, not past
    // the bands).
    "dd16_audio_neardup" -> ((s, d) => {
      import graft.multimodal.MediaContent
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val fps = MediaContent.fingerprintAudio(
        MediaContent.audioFromDocuments(s, docs)).toDF()
        .select(col("doc_id").as("id"), col("fp_hi"), col("fp_lo"))
        .localCheckpoint() // banding + verify both read it; decode once
      val nDocs = fps.count() // checkpointed: a metadata count
      val bspec = graft.sim.HammingBands.spec(
        graft.sim.HammingBands.bits(nDocs, occ = 4))
      val ufp = shiftleft(col("fp_hi"), 32).bitwiseOR(col("fp_lo"))
      def band(shf: Int, wd: Int): Column =
        shiftrightunsigned(ufp, shf).bitwiseAND(lit((1L << wd) - 1))
      val bands = fps.select(col("id"),
        explode(array(bspec.zipWithIndex.map { case ((shf, wd), i) =>
          struct(lit(i).as("bi"), band(shf, wd).as("bv")) }: _*)).as("b"))
        .select(col("id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      val cand = bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
      val h1 = fps.select(col("id").as("id1"),
        col("fp_hi").as("hi1"), col("fp_lo").as("lo1"))
      val h2 = fps.select(col("id").as("id2"),
        col("fp_hi").as("hi2"), col("fp_lo").as("lo2"))
      val pairs = cand.join(h1, Seq("id1")).join(h2, Seq("id2"))
        .withColumn("hamming",
          (expr("bit_count(lo1 ^ lo2)") + expr("bit_count(hi1 ^ hi2)"))
            .cast("long"))
        .filter(col("hamming") <= 8)
        .select(col("id1"), col("id2"), col("hamming"))
        .localCheckpoint() // the recall guard below re-reads it
      val planted = nDocs / 2
      val found = pairs
        .filter(col("id1") % 2 === 0 && col("id2") === col("id1") + 1)
        .count()
      require(planted == 0 || found >= (planted * 7) / 10,
        s"dd16: banded search recovered $found of $planted planted pairs")
      pairs
    }),

    // Video CONTENT (round 12): real AVI containers whose movi LIST
    // carries uncompressed BGR24 DIB frames; the mm2 sampling plan
    // (2 fps, max 8) is EXECUTED — the decoder seeks to exactly the
    // sampled frames by walking chunk sizes (skipped frames are never
    // materialized: O(sampled), not O(video)) and each lands in the
    // image dHash. The oracle replays sampling arithmetic + frame
    // pixels + hash from doc_id, certifying container encode, frame
    // seek, DIB decode, and the hash together.
    "mm8_video_frames" -> ((s, d) => {
      import graft.multimodal.MediaContent
      val docs = Tables.documents(s, d).select(col("doc_id"))
      MediaContent.hashSampledFrames(
        MediaContent.videosFromDocuments(s, docs)).toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), col("dh_hi"), col("dh_lo"))
    }),

    // Video near-duplicate detection (round 12, trim-tolerant since
    // round 13): SEQUENCE-level with OFFSET alignment — two videos are
    // near-dups when, at some constant frame offset, every sampled
    // frame BOTH videos have sits within Hamming 8, and the overlap
    // misses at most one sampled frame of the longer video ("the same
    // footage up to small edits and a head/tail trim"). Candidates
    // come from band-equality joins that PROPOSE the offset (a band
    // match at (f1, f2) votes for off = f1 − f2) — never all-pairs;
    // the verdict verifies the full overlap at each proposed offset
    // and keeps the best. Planted pairs (2k, 2k+1) share texture with
    // 2–3 diagonal pixels perturbed per frame; every third pair's odd
    // twin is HEAD-TRIMMED by one sample slot (the generator drops its
    // first 5 container frames), so the ≥90% recall guard now also
    // certifies the offset path. Completes the near-dup family across
    // all four modalities.
    "dd17_video_neardup" -> ((s, d) => {
      import graft.multimodal.MediaContent
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val frames = MediaContent.hashSampledFrames(
        MediaContent.videosFromDocuments(s, docs)).toDF()
        .select(col("doc_id").as("id"), col("frame_idx"),
          col("dh_hi"), col("dh_lo"))
        .localCheckpoint() // banding + align + counts read it; decode once
      // geometry from the VIDEO count (a band bucket holds ids of
      // videos × their ≤8 sampled frames)
      val nDocs = docs.count()
      val bspec = graft.sim.HammingBands.spec(
        graft.sim.HammingBands.bits(nDocs, occ = 4))
      val ufp = shiftleft(col("dh_hi"), 32).bitwiseOR(col("dh_lo"))
      def band(shf: Int, wd: Int): Column =
        shiftrightunsigned(ufp, shf).bitwiseAND(lit((1L << wd) - 1))
      val bands = frames.select(col("id"), col("frame_idx"),
        explode(array(bspec.zipWithIndex.map { case ((shf, wd), i) =>
          struct(lit(i).as("bi"), band(shf, wd).as("bv")) }: _*)).as("b"))
        .select(col("id"), col("frame_idx"), col("b.bi").as("bi"),
          col("b.bv").as("bv"))
      // a band collision at (f1, f2) proposes alignment off = f1 − f2
      val cand = bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          (col("a.frame_idx") - col("b.frame_idx")).cast("long").as("off"))
        .distinct()
      val f1 = frames.select(col("id").as("id1"),
        col("frame_idx").as("fi1"),
        col("dh_hi").as("hi1"), col("dh_lo").as("lo1"))
      val f2 = frames.select(col("id").as("id2"),
        col("frame_idx").as("fi2"),
        col("dh_hi").as("hi2"), col("dh_lo").as("lo2"))
      val perOff = cand.join(f1, Seq("id1")).as("l")
        .join(f2.as("r"), col("l.id2") === col("r.id2") &&
          col("r.fi2") === col("l.fi1") - col("l.off"))
        .select(col("l.id1").as("id1"), col("l.id2").as("id2"),
          col("l.off").as("off"), col("l.hi1").as("hi1"),
          col("l.lo1").as("lo1"), col("r.hi2").as("hi2"),
          col("r.lo2").as("lo2"))
        .withColumn("ham",
          (expr("bit_count(lo1 ^ lo2)") + expr("bit_count(hi1 ^ hi2)"))
            .cast("long"))
        .groupBy(col("id1"), col("id2"), col("off"))
        .agg(count(lit(1)).as("n_aligned"), max(col("ham")).as("max_ham"))
      val nf = frames.groupBy(col("id")).agg(count(lit(1)).as("nf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id1"), col("id2"))
        .orderBy(col("n_aligned").desc, col("off").asc)
      val pairs = perOff
        .join(nf.select(col("id").as("id1"), col("nf").as("nf1")), Seq("id1"))
        .join(nf.select(col("id").as("id2"), col("nf").as("nf2")), Seq("id2"))
        .filter(col("max_ham") <= 8 &&
          col("n_aligned") >= greatest(col("nf1"), col("nf2")) - 1)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id1"), col("id2"), col("n_aligned"), col("off"),
          col("max_ham"))
        .localCheckpoint() // the recall guard below re-reads it
      val planted = nDocs / 2
      val found = pairs
        .filter(col("id1") % 2 === 0 && col("id2") === col("id1") + 1)
        .count()
      require(planted == 0 || found >= (planted * 9) / 10,
        s"dd17: banded search recovered $found of $planted planted pairs")
      pairs
    }),

    // Image near-duplicate detection (round 12): Hamming-banded LSH
    // over the 64-bit dHash, candidates from band-equality self-joins
    // (NEVER an all-pairs product; at corpus scale the band join is
    // the only shuffle), verified by exact Hamming ≤ 8 via
    // bit_count(xor). Band geometry derives from the corpus count by
    // the occupancy rule ([[HammingBands]], round 13) instead of a
    // code-time 4×16 constant. Planted pairs (2k, 2k+1) share a pixel
    // pattern across FORMATS (BMP vs PNG) differing on 2–3 perturbed
    // pixels; the in-query recall guard pins that the banded search
    // recovers ≥90% of them.
    "dd15_image_neardup" -> ((s, d) => {
      import graft.multimodal.ImagePixels
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val hashes = ImagePixels.hashImages(
        ImagePixels.imagesFromDocuments(s, docs)).toDF()
        .select(col("doc_id").as("id"), col("dh_hi"), col("dh_lo"))
        .localCheckpoint() // banding + verify both read it; decode once
      val nDocs = hashes.count() // checkpointed: a metadata count
      val bspec = graft.sim.HammingBands.spec(
        graft.sim.HammingBands.bits(nDocs, occ = 4))
      val ufp = shiftleft(col("dh_hi"), 32).bitwiseOR(col("dh_lo"))
      def band(shf: Int, wd: Int): Column =
        shiftrightunsigned(ufp, shf).bitwiseAND(lit((1L << wd) - 1))
      val bands = hashes.select(col("id"),
        explode(array(bspec.zipWithIndex.map { case ((shf, wd), i) =>
          struct(lit(i).as("bi"), band(shf, wd).as("bv")) }: _*)).as("b"))
        .select(col("id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      val cand = bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
      val h1 = hashes.select(col("id").as("id1"),
        col("dh_hi").as("hi1"), col("dh_lo").as("lo1"))
      val h2 = hashes.select(col("id").as("id2"),
        col("dh_hi").as("hi2"), col("dh_lo").as("lo2"))
      val pairs = cand.join(h1, Seq("id1")).join(h2, Seq("id2"))
        .withColumn("hamming",
          (expr("bit_count(lo1 ^ lo2)") + expr("bit_count(hi1 ^ hi2)"))
            .cast("long"))
        .filter(col("hamming") <= 8)
        .select(col("id1"), col("id2"), col("hamming"))
        .localCheckpoint() // the recall guard below re-reads it
      // planted-pair recall ≥ 90% (scalar-aggregate guard)
      val planted = nDocs / 2
      val found = pairs
        .filter(col("id1") % 2 === 0 && col("id2") === col("id1") + 1)
        .count()
      require(planted == 0 || found >= (planted * 9) / 10,
        s"dd15: banded search recovered $found of $planted planted pairs")
      pairs
    }),

    // GIF pixel CONTENT (round 13): real GIF89a payloads whose index
    // stream is variable-width LZW (the GIF87a/89a appendix algorithm
    // implemented from the spec — clear/EOI, width growth,
    // 255-byte sub-blocks) under a 256-entry grayscale palette. The
    // pixel LUMA equals the mm6 image texture's, so the decoded GIF's
    // dHash equals its BMP/PNG twin's — a format-shifted re-upload is
    // an exact cross-codec dup, which is how a production pipeline
    // catches re-encodes. The oracle replays the pixel arithmetic
    // blind; a hash match certifies LZW encode → decode end to end.
    "mm9_gif_pixels" -> ((s, d) => {
      import graft.multimodal.CompressedCodecs
      val docs = Tables.documents(s, d).select(col("doc_id"))
      CompressedCodecs.hashGifs(
        CompressedCodecs.gifsFromDocuments(s, docs)).toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("dh_hi"), col("dh_lo"))
    }),

    // FLAC sample CONTENT (round 13): real FLAC streams — STREAMINFO
    // + one frame (sync/blocksize/rate codes, CRC-8, CRC-16) carrying
    // the mm7 waveform as a verbatim / fixed-predictor-1 / fixed-2
    // subframe by id%3 (rice-coded residuals, spec §9) — decoded back
    // sample-exact and fingerprinted with the mm7 energy fold. The
    // oracle replays waveform + fingerprint arithmetic blind and
    // predicts the subframe type; a match certifies the rice/fixed
    // encode → decode round trip across all three subframe arms.
    "mm10_flac_samples" -> ((s, d) => {
      import graft.multimodal.CompressedCodecs
      val docs = Tables.documents(s, d).select(col("doc_id"))
      CompressedCodecs.fingerprintFlacs(
        CompressedCodecs.flacsFromDocuments(s, docs)).toDF()
        .select(col("doc_id"), col("subframe"), col("sample_rate"),
          col("n_samples"), col("fp_hi"), col("fp_lo"))
    }),

    // Incremental VIDEO near-dup (round 13): the dd18 argument at
    // SEQUENCE grain, completing the incremental index across all
    // three perceptual modalities — the video corpus ingested as
    // three batches of per-frame hashes into the persisted frame-band
    // index ([[PhashIndex.ingestVideoBatch]]); each batch's dd17
    // offset-alignment verdict runs against the stored corpus, with
    // stored frames read only for candidate ids. Every planted pair
    // is cross-batch under the %3 split; batch-wise must equal the
    // one-shot dd17 pass exactly — the oracle IS dd17's SQL.
    "dd21_incremental_video" -> ((s, d) => {
      import graft.multimodal.{MediaContent, PhashIndex}
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dd21_idx_").toString
      // scratch index: tables + dir die with the query, not the JVM
      graft.util.CacheScope.onRelease(() => PhashIndex.dropIndex(s, dir))
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val frames = MediaContent.hashSampledFrames(
        MediaContent.videosFromDocuments(s, docs)).toDF()
        .select(col("doc_id").as("id"), col("frame_idx"),
          col("dh_hi").as("hi"), col("dh_lo").as("lo"))
        .localCheckpoint() // three ingests re-read it; decode once
      val bits = graft.sim.HammingBands.bits(docs.count(), occ = 4)
      (0 until 3)
        .map(b => PhashIndex.ingestVideoBatch(
          frames.filter(col("id") % 3 === b), dir, b, bits))
        .reduce(_ unionAll _)
        .select(col("id1"), col("id2"), col("n_aligned"), col("off"),
          col("max_ham"))
    }),

    // Cross-CODEC near-dup (round 13): the format-shifted re-upload
    // case — the same picture living as BMP/PNG (the mm6 corpus) AND
    // as a GIF re-encode (the mm9 corpus, id-shifted by 10M) must
    // dedup across codecs. GIF's grayscale palette preserves the
    // texture's luma exactly, so each cross-codec twin sits at
    // Hamming 0 and the banded search recovers EVERY one (the
    // in-query guard requires 100% — no LSH randomness at distance
    // 0: equal hashes share all bands). Geometry derives from the
    // COMBINED corpus size.
    "dd20_crosscodec_neardup" -> ((s, d) => {
      import graft.multimodal.{CompressedCodecs, ImagePixels, Multimodal}
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"))
      // the GIF twins live at doc_id + 10M: refuse a corpus whose ids
      // reach the shift instead of letting the unioned id space
      // collide and fail confusingly in the recall guard below
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      require(maxId < 10000000L,
        s"dd20: max doc_id $maxId reaches the 10000000 twin-id shift — " +
          "raise the shift before re-encoding")
      val imgs = ImagePixels.hashImages(
        ImagePixels.imagesFromDocuments(s, docs)).toDF()
        .select(col("doc_id").as("id"), col("dh_hi"), col("dh_lo"))
      val gifs = CompressedCodecs.hashGifs(
        docs.select("doc_id").as[Long].map(id =>
          Multimodal.MediaRow(id + 10000000L,
            CompressedCodecs.gifPixelBytes(id)))).toDF()
        .select(col("doc_id").as("id"), col("dh_hi"), col("dh_lo"))
      val hashes = imgs.unionAll(gifs)
        .localCheckpoint() // banding + verify read it; decode once
      val nAll = hashes.count()
      val bspec = graft.sim.HammingBands.spec(
        graft.sim.HammingBands.bits(nAll, occ = 4))
      val ufp = shiftleft(col("dh_hi"), 32).bitwiseOR(col("dh_lo"))
      def band(shf: Int, wd: Int): Column =
        shiftrightunsigned(ufp, shf).bitwiseAND(lit((1L << wd) - 1))
      val bands = hashes.select(col("id"),
        explode(array(bspec.zipWithIndex.map { case ((shf, wd), i) =>
          struct(lit(i).as("bi"), band(shf, wd).as("bv")) }: _*)).as("b"))
        .select(col("id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      val cand = bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
      val pairs = cand
        .join(hashes.select(col("id").as("id1"), col("dh_hi").as("hi1"),
          col("dh_lo").as("lo1")), Seq("id1"))
        .join(hashes.select(col("id").as("id2"), col("dh_hi").as("hi2"),
          col("dh_lo").as("lo2")), Seq("id2"))
        .withColumn("hamming",
          (expr("bit_count(lo1 ^ lo2)") + expr("bit_count(hi1 ^ hi2)"))
            .cast("long"))
        .filter(col("hamming") <= 8)
        .select(col("id1"), col("id2"), col("hamming"))
        .localCheckpoint() // the recall guard below re-reads it
      val planted = nAll / 2
      val found = pairs
        .filter(col("id2") === col("id1") + 10000000L &&
          col("hamming") === 0).count()
      require(found == planted,
        s"dd20: recovered $found of $planted cross-codec twins — " +
          "Hamming-0 pairs must all band-collide")
      pairs
    }),

    // Baseline JPEG CONTENT (round 13): real JFIF grayscale payloads
    // — SOI/DQT/SOF0/DHT(Annex-K tables)/SOS markers, Huffman-coded
    // DC-difference MCUs with 0xFF00 byte-stuffing — decoded back
    // through a spec-complete baseline path (canonical Huffman from
    // DHT, EXTEND, AC run-length/ZRL/EOB, dezigzag, dequant, IDCT,
    // level shift, clamp; SimSpec drives the AC arm the lossy-exact
    // corpus can't). The generator stays inside the DC-EXACT subspace
    // (flat 8×8 blocks, quant 8 cancels the IDCT's ÷8) so the DuckDB
    // oracle can replay the decoded pixels blind — the strongest
    // certification a SQL oracle can make of a lossy codec.
    "mm11_jpeg_pixels" -> ((s, d) => {
      import graft.multimodal.JpegCodec
      val docs = Tables.documents(s, d).select(col("doc_id"))
      JpegCodec.hashJpegs(
        JpegCodec.jpegsFromDocuments(s, docs)).toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("dh_hi"), col("dh_lo"))
    }),

    // COLOR baseline JPEG (round 14) — real corpora are 3-component
    // YCbCr (overwhelmingly 4:2:0); mm11's grayscale-only scope
    // excluded nearly all of them. The generator writes true color
    // JFIF: multi-table DQT (luma 8s / chroma 16s), four DHT tables
    // (Annex K luma AND chroma pairs), interleaved MCU scans — 4:2:0
    // on even ids, 4:4:4 on odd — with per-component DC prediction;
    // every 3rd id's chroma carries an AC coefficient so the gated
    // corpus itself drives the decode-and-discard bitstream sync.
    // The decoder parses sampling factors and decodes ONLY the luma
    // plane (chroma blocks entropy-decode to stay in sync, then
    // drop — dHash needs luma alone, so chroma IDCT/upsampling would
    // be pure waste at corpus scale). Luma stays in the DC-exact
    // subspace; the oracle replays block lumas + dHash blind, and
    // the sampling label comes from the PARSED SOF0.
    "mm12_jpeg_color" -> ((s, d) => {
      import graft.multimodal.JpegCodec
      val docs = Tables.documents(s, d).select(col("doc_id"))
      JpegCodec.hashColorJpegs(
        JpegCodec.colorJpegsFromDocuments(s, docs)).toDF()
        .select(col("doc_id"), col("sampling"), col("width"), col("height"),
          col("dh_hi"), col("dh_lo"))
    }),

    // PROGRESSIVE JPEG (round 15) — a large share of real web JPEGs
    // and mm12's one refused frame type. The generator writes true
    // SOF2 streams (interleaved DC scan first, then per-component
    // all-zero AC scans — spec-complete multi-scan files), 4:2:0 on
    // even ids / 4:4:4 on odd, with mm12's exact block lumas; the
    // decoder reads EXACTLY the DC scan, which carries the full 8×8
    // block average the dHash folds — the mm11 DC-exact argument
    // applied to scan order (this prefix-renderability is why
    // progressive exists). Hashes must equal the baseline twin's
    // bit-for-bit (SimSpec pins it); the oracle replays lumas +
    // dHash blind with the sampling label parsed from SOF2.
    "mm16_jpeg_progressive" -> ((s, d) => {
      import graft.multimodal.JpegCodec
      val docs = Tables.documents(s, d).select(col("doc_id"))
      JpegCodec.hashColorJpegs(
        JpegCodec.progressiveFromDocuments(s, docs)).toDF()
        .select(col("doc_id"), col("sampling"), col("width"), col("height"),
          col("dh_hi"), col("dh_lo"))
    }),

    // MP4 sample-table extraction (round 14) — the codec-agnostic
    // half of real video ingest: a REAL boxed ISO-BMFF file (ftyp +
    // full moov with mvhd/tkhd/mdhd/hdlr/vmhd + stbl{stsd stts stsc
    // stsz stco} + mdat) whose sample table locates every frame's
    // byte range — samples grouped 3-per-chunk with a short last
    // chunk (second stsc run), VARIABLE per-sample sizes keeping
    // stsz honest, absolute stco offsets. The mm8 2 fps sampling
    // plan reads rate+count from stts and SEEKS via stsc/stco/stsz
    // to only the sampled frames — O(sampled), never O(video). The
    // oracle replays frame count, plan, and pixels from doc_id; a
    // dHash match certifies box walk + sample table + seek + decode.
    "mm13_mp4_samples" -> ((s, d) => {
      import graft.multimodal.Mp4Samples
      val docs = Tables.documents(s, d).select(col("doc_id"))
      Mp4Samples.hashSampledMp4Frames(
        Mp4Samples.mp4sFromDocuments(s, docs)).toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), col("dh_hi"), col("dh_lo"))
    }),

    // PDF text extraction (round 14) — after HTML/WARC the second
    // biggest document format a pretraining pipeline opens: REAL
    // single-page PDFs (object walk, /Length-accounted streams —
    // payloads legally contain 'endstream' — xref + trailer), content
    // streams Flate-compressed on even ids / raw on odd, one Tj per
    // 8-token line with Td advances and the full literal-string
    // escape set (every 3rd-of-4 line wraps its first word in
    // parentheses, forcing \( \) decode). The oracle replays the
    // expected text from the tokens blind — a hash match certifies
    // object walk + Length accounting + inflate + escape decode.
    "mm14_pdf_text" -> ((s, d) => {
      import graft.multimodal.PdfText
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      PdfText.extractPdfs(PdfText.pdfsFromDocuments(s, docs)).toDF()
        .select(col("doc_id"), col("pdf_filter"),
          col("n_lines").cast("long").as("n_lines"), col("text_out"))
    }),

    // Animated GIF frame decode (round 14) — the sampled-frame GIF
    // re-encode every video host ships as a preview: GIF89a with one
    // full frame per 2 fps sample slot of the AS-SHIPPED video
    // (head-trims included), each behind a Graphic Control
    // Extension, LZW-compressed under the global grayscale palette.
    // Frame pixels carry the video texture's luma (palette index =
    // luma), frame_idx is the STREAM ORDINAL — the shared clock a
    // cross-container matcher aligns on. Oracle replays sampling
    // plan + per-pixel luma + dHash blind; a match certifies the
    // multi-frame walk (GCE skip, per-frame LZW) end to end.
    "mm15_gif_anim_frames" -> ((s, d) => {
      import graft.multimodal.{CompressedCodecs, Multimodal}
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"))
      CompressedCodecs.hashGifFrames(
        docs.select("doc_id").as[Long].map(id =>
          Multimodal.MediaRow(id, CompressedCodecs.gifAnimBytes(id))))
        .toDF()
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), col("dh_hi"), col("dh_lo"))
    }),

    // Cross-CONTAINER sequence near-dup (round 14) — every video
    // lives twice: as its AVI source (mm8) and as an animated-GIF
    // re-encode (mm15, ids +20M). Containers number frames
    // differently, so both sides re-index to the sampled ORDINAL
    // (the shared 2 fps clock), band per frame under the combined
    // corpus geometry, and candidates propose offsets ONLY across
    // the container boundary — a re-encode verifies against the
    // SOURCE catalog, which keeps the match targeted at scale. The
    // shared dd17 verdict ([[PhashIndex.offsetVerdict]]) confirms;
    // the grayscale palette preserves luma exactly, so every twin
    // verifies at offset 0, Hamming 0, with every sampled slot
    // aligned — which is exactly what the oracle replays.
    "dd23_crosscontainer_video" -> ((s, d) => {
      import graft.multimodal.{CompressedCodecs, MediaContent,
        Multimodal, PhashIndex}
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      require(maxId < 20000000L,
        s"dd23: max doc_id $maxId reaches the 20000000 twin-id shift")
      val vids = MediaContent.hashSampledFrames(
        MediaContent.videosFromDocuments(s, docs)).toDF()
      val w = Window.partitionBy("doc_id").orderBy("frame_idx")
      val vOrd = vids.select(col("doc_id").as("id"),
        (row_number().over(w) - 1).as("fi"),
        col("dh_hi").as("hi"), col("dh_lo").as("lo"))
      val gifs = CompressedCodecs.hashGifFrames(
        docs.select("doc_id").as[Long].map(idv =>
          Multimodal.MediaRow(idv + 20000000L,
            CompressedCodecs.gifAnimBytes(idv)))).toDF()
        .select(col("doc_id").as("id"), col("frame_idx").as("fi"),
          col("dh_hi").as("hi"), col("dh_lo").as("lo"))
      val frames = graft.util.CacheScope.track(vOrd.unionAll(gifs))
      val bspec = graft.sim.HammingBands.spec(
        graft.sim.HammingBands.bits(docs.count() * 2, occ = 4))
      val ufp = shiftleft(col("hi"), 32).bitwiseOR(col("lo"))
      val bands = frames.select(col("id"), col("fi"),
        explode(array(bspec.zipWithIndex.map { case ((shf, wd), i) =>
          struct(lit(i).as("bi"),
            shiftrightunsigned(ufp, shf).bitwiseAND(lit((1L << wd) - 1))
              .as("bv")) }: _*)).as("b"))
        .select(col("id"), col("fi"), col("b.bi").as("bi"),
          col("b.bv").as("bv"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
            col("a.id") < lit(20000000L) && col("b.id") >= lit(20000000L))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          (col("a.fi") - col("b.fi")).cast("long").as("off"))
        .distinct()
      val pairs = PhashIndex.offsetVerdict(cand, frames)
        .filter(col("id2") === col("id1") + 20000000L)
        .localCheckpoint() // the guard below re-reads it
      val found = pairs
        .filter(col("off") === 0 && col("max_ham") === 0).count()
      val total = docs.count()
      require(found == total,
        s"dd23: verified $found of $total re-encodes — Hamming-0 " +
          "twins must all band-collide and align at offset 0")
      pairs
    }),

    // Cross-modal curation composite (round 13) — the multimodal twin
    // of cur1, proving the multimodal pieces COMPOSE: decode both
    // modalities once (image dHash + audio fingerprint, scan-speed
    // mapPartitions) → per-modality banded near-dup pairs under the
    // shared corpus-derived geometry → union into one edge set → star
    // connected components → keep one doc per cluster → shard-pack
    // survivors by content bytes into ~64 KB shards within 256
    // deterministic hash buckets (the t16 per-bucket-cumsum shape:
    // no global sort, no single-partition window). The only shuffles
    // are the two band self-joins, the CC rounds, and the final
    // bucket window — ScaleSpec pins the plan never goes all-pairs.
    "cur2_multimodal_curation" -> ((s, d) => {
      import graft.multimodal.{ImagePixels, MediaContent}
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val img = ImagePixels.hashImages(
        ImagePixels.imagesFromDocuments(s, docs)).toDF()
        .select(col("doc_id").as("id"), col("dh_hi").as("hi"),
          col("dh_lo").as("lo"),
          (col("width") * col("height") * 3).cast("long").as("ibytes"))
        .localCheckpoint() // pairs + sizing read it; decode once
      val aud = MediaContent.fingerprintAudio(
        MediaContent.audioFromDocuments(s, docs)).toDF()
        .select(col("doc_id").as("id"), col("fp_hi").as("hi"),
          col("fp_lo").as("lo"),
          (col("n_samples") * 2).cast("long").as("abytes"))
        .localCheckpoint()
      val nDocs = docs.count()
      val bspec = graft.sim.HammingBands.spec(
        graft.sim.HammingBands.bits(nDocs, occ = 4))
      def neardupPairs(h: DataFrame): DataFrame = {
        val ufp = shiftleft(col("hi"), 32).bitwiseOR(col("lo"))
        def band(shf: Int, wd: Int): Column =
          shiftrightunsigned(ufp, shf).bitwiseAND(lit((1L << wd) - 1))
        val bands = h.select(col("id"),
          explode(array(bspec.zipWithIndex.map { case ((shf, wd), i) =>
            struct(lit(i).as("bi"), band(shf, wd).as("bv")) }: _*)).as("b"))
          .select(col("id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
        val cand = bands.as("a").join(bands.as("b"),
          col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
            col("a.id") < col("b.id"))
          .select(col("a.id").as("a"), col("b.id").as("b")).distinct()
        cand
          .join(h.select(col("id").as("a"), col("hi").as("hi1"),
            col("lo").as("lo1")), Seq("a"))
          .join(h.select(col("id").as("b"), col("hi").as("hi2"),
            col("lo").as("lo2")), Seq("b"))
          .filter((expr("bit_count(lo1 ^ lo2)") +
            expr("bit_count(hi1 ^ hi2)")) <= 8)
          .select(col("a"), col("b"))
      }
      val edges = neardupPairs(img.select("id", "hi", "lo"))
        .unionAll(neardupPairs(aud.select("id", "hi", "lo"))).distinct()
      val cc = graft.text.DedupClusters.connectedComponentsStar(
        docs.select(col("doc_id").as("id")), edges)
      val members = cc.groupBy(col("canonical_id"))
        .agg(count(lit(1)).as("n_members"))
      val bucket = { // cur1's md5-prefix bucket, portable to DuckDB
        val h = md5(col("id").cast("string"))
        ((instr(lit("0123456789abcdef"), substring(h, 1, 1)) - 1) * 16 +
          (instr(lit("0123456789abcdef"), substring(h, 2, 1)) - 1))
          .cast("int")
      }
      val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
      cc.filter(col("id") === col("canonical_id"))
        .join(members, Seq("canonical_id"))
        .join(img.select(col("id"), col("ibytes")), Seq("id"))
        .join(aud.select(col("id"), col("abytes")), Seq("id"))
        .withColumn("bytes", col("ibytes") + col("abytes"))
        .withColumn("bucket", bucket)
        .withColumn("cum", sum(col("bytes")).over(w))
        .select(col("id"), col("n_members"), col("bytes"), col("bucket"),
          floor((col("cum") - 1) / 65536.0).cast("long").as("shard"))
    }),

    // Incremental perceptual-hash dedup (round 13): the dd15 image
    // corpus ingested as THREE batches into a persisted Hamming-band
    // index ([[graft.multimodal.PhashIndex]] — bucketed band tables,
    // exchange-free stored-side probes, the dd9 shape for multimodal
    // hashes). Every planted pair (2k, 2k+1) is CROSS-batch under the
    // %3 split, so recovering them exercises the stored-band probe
    // path, not the within-batch join. Batch-wise must equal the
    // one-shot pair set exactly: the oracle IS dd15's SQL.
    "dd18_incremental_phash" -> ((s, d) => {
      import graft.multimodal.{ImagePixels, PhashIndex}
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dd18_idx_").toString
      // scratch index: tables + dir die with the query, not the JVM
      graft.util.CacheScope.onRelease(() => PhashIndex.dropIndex(s, dir))
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val hashes = ImagePixels.hashImages(
        ImagePixels.imagesFromDocuments(s, docs)).toDF()
        .select(col("doc_id").as("id"), col("dh_hi").as("hi"),
          col("dh_lo").as("lo"))
        .localCheckpoint() // three ingests re-read it; decode once
      // index geometry = the one-shot rule over the FULL corpus size
      // (an index pins its geometry at creation; the expected corpus
      // here is the corpus)
      val bits = graft.sim.HammingBands.bits(hashes.count(), occ = 4)
      (0 until 3)
        .map(b => PhashIndex.ingestBatch(
          hashes.filter(col("id") % 3 === b), dir, b, bits))
        .reduce(_ unionAll _)
        .select(col("id1"), col("id2"), col("hamming"))
    })
  )

  /** sim2 knobs: 2^8 buckets/table × 2 tables at sf0.01 (~500
    * vectors → ~2/bucket); at corpus scale raise bits ≈
    * log2(N / target_occupancy). */
  private val Sim2Bits   = 8
  private val Sim2Tables = 2

  /** dd7 knobs, sized for the LARGEST corpus the query actually runs
    * on (sf0.1: ~2040 vectors after the planted extension) per
    * SCALE.md's occupancy rule bits ≈ log2(N/k): 2^8 buckets/table →
    * ~8 vectors/bucket. Round 2 shipped bits=6 tuned for the sf0.01
    * oracle corpus; at sf0.1 occupancy was ~32 (worse under the
    * label-clustered corpus) and pair work grows quadratically with
    * occupancy — dd7 was the most expensive bench query. Recall: a
    * cos≈0.92 pair crosses each plane with p≈0.13 → colliding in an
    * 8-bit table with p≈0.32, missed by all 6 tables with p≈0.1;
    * exact copies always collide. SimSpec pins planted-pair recall. */
  private val Dd7Bits   = 8
  private val Dd7Tables = 6

  /** dd7/dd14's shared oracle CTE chain (through `scored`): the
    * extended corpus, integer-quantized vectors, banded sign-LSH
    * candidate keys, and exact integer-cosine scoring. */
  private lazy val dd7OracleCte: String = {
    val keyArms = (0 until Dd7Tables).map { t =>
      s"SELECT id, $t AS t, CAST(${sim2BucketSql(t, Dd7Bits)} AS BIGINT) AS b FROM v"
    }.mkString("\n        |  UNION ALL ")
    s"""base AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |corpus AS (
      |  SELECT vec_id, e FROM base
      |  UNION ALL SELECT vec_id + 2000000, e FROM base WHERE vec_id % 100 = 0
      |  UNION ALL SELECT vec_id + 3000000, list_transform(e, x -> x * 0.9 + 0.05)
      |    FROM base WHERE vec_id % 100 = 50),
      |v AS (SELECT vec_id AS id,
      |  list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS v FROM corpus),
      |keys AS (
      |  $keyArms),
      |cand AS (SELECT DISTINCT k1.id AS a_id, k2.id AS b_id
      |  FROM keys k1 JOIN keys k2 ON k1.t = k2.t AND k1.b = k2.b AND k1.id < k2.id),
      |scored AS (SELECT c.a_id, c.b_id,
      |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> va.v[i] * vb.v[i])) AS BIGINT) AS DOUBLE) /
      |    sqrt(CAST(CAST(list_sum(list_transform(range(1, 65), i -> va.v[i] * va.v[i])) AS BIGINT) AS DOUBLE) *
      |         CAST(CAST(list_sum(list_transform(range(1, 65), i -> vb.v[i] * vb.v[i])) AS BIGINT) AS DOUBLE)) AS cos_sim
      |  FROM cand c JOIN v va ON va.id = c.a_id JOIN v vb ON vb.id = c.b_id)""".stripMargin
  }

  /** The one-shot embedding near-dup pair SQL — dd7's gate and,
    * batch-wise == one-shot, dd25's. */
  private lazy val Dd7PairsSql: String =
    s"""WITH $dd7OracleCte
      |SELECT a_id, b_id, cos_sim FROM scored WHERE cos_sim >= 0.9""".stripMargin

  /** dd7/dd14's extended corpus: base ∪ exact copies (id+2e6) ∪
    * perturbed copies (id+3e6, x*0.9+0.05 → cosine ≈ 0.92 vs the
    * original; natural pairs max ≈ 0.51), so duplicate groups exist
    * at every sf. */
  private def dd7Corpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val exact = base.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("e"))
    val pert = base.filter(col("vec_id") % 100 === 50)
      .select((col("vec_id") + 3000000L).as("vec_id"),
        transform(col("e"), x => x * lit(0.9) + lit(0.05)).as("e"))
    base.unionAll(exact).unionAll(pert)
  }

  // PQ geometry: 16 subspaces of 4 dims (4× compression). The corpus
  // is near-uniform random — vector quantization's adversarial case —
  // and finer subspaces carry it: m=8/subDim=8 measures recall@5 0.18
  // vs ground truth at sf0.001, m=16/subDim=4 reaches 0.30 (chance is
  // ~0.01); MORE codewords per subspace does not help (random
  // codebooks saturate). SimSpec pins the measured recall.
  private[graft] val Sim5M   = 16
  private[graft] val Sim5Sub = 4

  /** The same md5-derived plane weights [[Embeddings.planeWeights]]
    * uses, embedded as DuckDB list literals — integer arithmetic is
    * identical on both engines, so bucket keys match exactly. */
  private def sim2BucketSql(t: Int, bits: Int = Sim2Bits): String =
    (0 until bits).map { i =>
      val w = graft.sim.Embeddings.planeWeights(t, i, 64)
        .mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(range(1,65), j -> ($w)[j] * v[j])) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  private def qv(scale: String) =
    s"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))"
  private val dot64 =
    "CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i])) AS BIGINT)"
  private val n2 = (v: String) =>
    s"CAST(list_sum(list_transform(range(1, 65), i -> $v[i] * $v[i])) AS BIGINT)"

  /** Lloyd's k-means unrolled as staged DuckDB CTEs — possible only
    * because [[Embeddings.kMeans]] is RNG-free and integer-exact:
    * lowest-id seeds, n²·d² integer distances, argmin tie on cluster
    * id, exactly 8 iterations. Both engines perform the identical
    * long arithmetic and the identical IEEE double division for the
    * cross-cluster normalization, so assignments (and therefore the
    * per-cluster rollup) match bit-for-bit. */
  private def sim7OracleSql: String = {
    // one assignment step: vid → argmin_cl (n·x − s)²/n², tie cl asc
    def assign(cents: String, out: String): String =
      s"""d$out AS (SELECT c.vid, ct.cl, max(ct.n) AS n,
        |    CAST(sum((ct.n * c.x - ct.si) * (ct.n * c.x - ct.si)) AS BIGINT) AS d2n2
        |  FROM comp c JOIN $cents ct ON ct.i = c.i GROUP BY 1, 2),
        |$out AS (SELECT vid, cl FROM (SELECT vid, cl, row_number() OVER (
        |    PARTITION BY vid ORDER BY CAST(d2n2 AS DOUBLE) / (n * n) ASC, cl ASC) AS rk
        |  FROM d$out) WHERE rk = 1)""".stripMargin
    // one recenter step: per (cluster, dim) integer member sums
    def recenter(a: String, out: String): String =
      s"""$out AS (SELECT a.cl, c.i, CAST(sum(c.x) AS BIGINT) AS si,
        |    count(*) AS n
        |  FROM $a a JOIN comp c ON c.vid = a.vid GROUP BY 1, 2)""".stripMargin
    val iters = (1 to 7).map(t =>
      recenter(s"a$t", s"cents$t") + ",\n" +
        assign(s"cents$t", s"a${t + 1}")).mkString(",\n")
    s"""WITH v AS (SELECT vec_id AS vid, label, ${qv("10000")} AS v FROM embeddings),
      |kk AS (SELECT count(DISTINCT label) AS k FROM v),
      |comp AS (SELECT vid, u.i, v[u.i] AS x FROM v,
      |  (SELECT unnest(range(1, 65)) AS i) u),
      |seedids AS (SELECT vid, CAST(row_number() OVER (ORDER BY vid ASC) AS INTEGER) AS cl
      |  FROM v QUALIFY cl <= (SELECT k FROM kk)),
      |cents0 AS (SELECT s.cl, c.i, c.x AS si, CAST(1 AS BIGINT) AS n
      |  FROM seedids s JOIN comp c ON c.vid = s.vid),
      |${assign("cents0", "a1")},
      |$iters,
      |bylabel AS (SELECT a.cl AS cluster, v.label, count(*) AS n
      |  FROM a8 a JOIN v ON v.vid = a.vid GROUP BY 1, 2),
      |rked AS (SELECT *, row_number() OVER (PARTITION BY cluster
      |    ORDER BY n DESC, label ASC) AS rk FROM bylabel)
      |SELECT CAST(cluster AS INTEGER) AS cluster,
      |  CAST(sum(n) AS BIGINT) AS n_members,
      |  max(CASE WHEN rk = 1 THEN label END) AS majority_label,
      |  CAST(max(CASE WHEN rk = 1 THEN n END) AS DOUBLE) /
      |    CAST(sum(n) AS BIGINT) AS purity
      |FROM rked GROUP BY 1""".stripMargin
  }

  /** Exact integer cosine between `$a.v6` and `$b.v6` (the 1e6
    * quantization) — the DuckDB twin of [[Embeddings.cosine]]. */
  private def cosSql(a: String, b: String): String =
    s"CAST(CAST(list_sum(list_transform(range(1, 65), i -> $a.v6[i] * $b.v6[i])) AS BIGINT) AS DOUBLE) / " +
      s"sqrt(CAST(CAST(list_sum(list_transform(range(1, 65), i -> $a.v6[i] * $a.v6[i])) AS BIGINT) AS DOUBLE) * " +
      s"CAST(CAST(list_sum(list_transform(range(1, 65), i -> $b.v6[i] * $b.v6[i])) AS BIGINT) AS DOUBLE))"

  /** Recall@k oracle: recomputes BOTH the approximate lists (sign-LSH
    * buckets, IVF probe) and the brute-force ground truth in DuckDB,
    * then the hit-count join — certifying the engine's recall numbers
    * end to end, not just their shape. */
  private def sim8OracleSql: String = {
    def arm(method: String, k: Int, ann: String): String =
      s"""SELECT method, k, n_queries, truth_pairs, hit_pairs,
        |  CAST(hit_pairs AS DOUBLE) / truth_pairs AS recall FROM (
        |  SELECT '$method' AS method, CAST($k AS INTEGER) AS k,
        |    (SELECT count(DISTINCT query_id) FROM bf WHERE rank <= $k) AS n_queries,
        |    (SELECT count(*) FROM bf WHERE rank <= $k) AS truth_pairs,
        |    (SELECT count(*) FROM bf t JOIN $ann a ON a.query_id = t.query_id
        |      AND a.neighbor_id = t.neighbor_id AND a.rank <= $k
        |      WHERE t.rank <= $k) AS hit_pairs)""".stripMargin
    s"""WITH v AS (SELECT vec_id AS id, label, ${qv("10000")} AS v4,
      |    ${qv("1000000")} AS v6 FROM embeddings),
      |bf AS (SELECT q.id AS query_id, c.id AS neighbor_id,
      |    row_number() OVER (PARTITION BY q.id
      |      ORDER BY ${cosSql("q", "c")} DESC, c.id ASC) AS rank
      |  FROM v q JOIN v c ON q.id % 50 = 0 AND q.id <> c.id),
      |vv AS (SELECT id, v6 AS v FROM v),
      |keys AS (SELECT id, 0 AS t, CAST(${sim2BucketSql(0)} AS BIGINT) AS b FROM vv
      |  UNION ALL SELECT id, 1 AS t, CAST(${sim2BucketSql(1)} AS BIGINT) AS b FROM vv),
      |cand AS (SELECT DISTINCT k1.id AS query_id, k2.id AS neighbor_id
      |  FROM keys k1 JOIN keys k2 ON k1.t = k2.t AND k1.b = k2.b AND k1.id <> k2.id
      |  WHERE k1.id % 50 = 0),
      |lsh AS (SELECT cd.query_id, cd.neighbor_id,
      |    row_number() OVER (PARTITION BY cd.query_id
      |      ORDER BY ${cosSql("qa", "cb")} DESC, cd.neighbor_id ASC) AS rank
      |  FROM cand cd JOIN v qa ON qa.id = cd.query_id
      |  JOIN v cb ON cb.id = cd.neighbor_id),
      |ncnt AS (SELECT label AS cl, count(*) AS n FROM v GROUP BY 1),
      |comp AS (SELECT id, label, v4, u.i FROM v,
      |  (SELECT unnest(range(1, 65)) AS i) u),
      |csum AS (SELECT label AS cl, i, CAST(sum(v4[i]) AS BIGINT) AS si
      |  FROM comp GROUP BY 1, 2),
      |qd AS (SELECT c.id AS qid, s.cl,
      |    CAST(sum((n.n * c.v4[c.i] - s.si) * (n.n * c.v4[c.i] - s.si)) AS BIGINT) AS d2
      |  FROM comp c JOIN csum s ON s.i = c.i JOIN ncnt n ON n.cl = s.cl
      |  WHERE c.id % 50 = 0 GROUP BY 1, 2),
      |probed AS (SELECT qid, cl FROM (SELECT *, row_number() OVER (
      |    PARTITION BY qid ORDER BY d2 ASC, cl ASC) AS pr FROM qd) WHERE pr <= 2),
      |ivf AS (SELECT p.qid AS query_id, c.id AS neighbor_id,
      |    row_number() OVER (PARTITION BY p.qid
      |      ORDER BY ${cosSql("q", "c")} DESC, c.id ASC) AS rank
      |  FROM probed p JOIN v c ON c.label = p.cl JOIN v q ON q.id = p.qid
      |  WHERE c.id <> p.qid)
      |${arm("lsh", 3, "lsh")}
      |UNION ALL
      |${arm("ivf", 5, "ivf")}""".stripMargin
  }

  /** sim4's staged-CTE oracle — shared with sim10, whose bucketed
    * storage must be invisible in the results. */
  private def sim4OracleSql: String =
    s"""WITH v AS (SELECT vec_id, label, ${qv("10000")} AS v4, ${qv("1000000")} AS v6
        |  FROM embeddings),
        |ncnt AS (SELECT label AS cl, count(*) AS n FROM v GROUP BY 1),
        |comp AS (SELECT vec_id, label, v4, u.i FROM v,
        |  (SELECT unnest(range(1, 65)) AS i) u),
        |csum AS (SELECT label AS cl, i, CAST(sum(v4[i]) AS BIGINT) AS si
        |  FROM comp GROUP BY 1, 2),
        |qd AS (SELECT c.vec_id AS qid, s.cl,
        |    CAST(sum((n.n * c.v4[c.i] - s.si) * (n.n * c.v4[c.i] - s.si)) AS BIGINT) AS d2
        |  FROM comp c JOIN csum s ON s.i = c.i JOIN ncnt n ON n.cl = s.cl
        |  WHERE c.vec_id % 50 = 0
        |  GROUP BY 1, 2),
        |probed AS (SELECT qid, cl FROM (SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY d2 ASC, cl ASC) AS pr FROM qd) WHERE pr <= 2),
        |scored AS (SELECT p.qid AS query_id, c.vec_id AS neighbor_id,
        |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> q.v6[i] * c.v6[i])) AS BIGINT) AS DOUBLE) /
        |    sqrt(CAST(CAST(list_sum(list_transform(range(1, 65), i -> q.v6[i] * q.v6[i])) AS BIGINT) AS DOUBLE) *
        |         CAST(CAST(list_sum(list_transform(range(1, 65), i -> c.v6[i] * c.v6[i])) AS BIGINT) AS DOUBLE)) AS cos_sim
        |  FROM probed p JOIN v c ON c.label = p.cl JOIN v q ON q.vec_id = p.qid
        |  WHERE c.vec_id <> p.qid),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5""".stripMargin

  /** DuckDB twin of [[graft.sim.HammingBands]]: band width from
    * `count(*)` of `countFrom` by the occupancy rule (clamped
    * [8,16]), 64 bits split evenly. Emits CTEs `bgeom` and
    * `bspec(bi, shf, wd)` — no trailing comma. */
  private def bandSpecSql(countFrom: String, occ: Int): String =
    s"""bgeom AS (
       |  SELECT CAST(CEIL(64.0 / bits) AS INT) AS nb FROM (
       |    SELECT GREATEST(8, LEAST(16,
       |      CAST(CEIL(LOG2(GREATEST(
       |        CAST(count(*) AS DOUBLE) / ${occ}.0, 2.0))) AS INT)))
       |      AS bits
       |    FROM $countFrom)),
       |bspec AS (
       |  SELECT CAST(i.range AS INT) AS bi,
       |    CAST((64 * i.range) // nb AS INT) AS shf,
       |    CAST((64 * (i.range + 1)) // nb
       |         - (64 * i.range) // nb AS INT) AS wd
       |  FROM bgeom CROSS JOIN range(0, 8) i WHERE i.range < nb)"""
      .stripMargin

  /** Shared mm6/dd15 oracle prelude: the image corpus's pixel and
    * perceptual-hash arithmetic replayed in SQL, straight from
    * doc_id — the DuckDB twin of [[graft.multimodal.ImagePixels]]
    * (dims by id/2, seeded RGB formula, diagonal perturbation on odd
    * ids, integer block-average 9×8 / 8×8 grids, 32-bit hi/lo bit
    * packing). Ends WITHOUT a trailing comma: mm6 appends its SELECT,
    * dd15 appends further CTEs after ",". */
  private val ImagePhashCte: String =
    """WITH ids AS (SELECT doc_id AS id FROM documents),
      |dims AS (
      |  SELECT id, 12 + ((id // 2) % 3) * 3 AS w,
      |    8 + ((id // 2) % 2) * 4 AS h FROM ids),
      |px AS (
      |  SELECT d.id, d.w, d.h, xs.range AS x, ys.range AS y,
      |    (d.id // 2) % 97 AS seed,
      |    CASE WHEN d.id % 2 = 1 AND xs.range = ys.range
      |          AND xs.range % 4 = 1 THEN 40 ELSE 0 END AS nz
      |  FROM dims d
      |  CROSS JOIN range(0, 18) xs CROSS JOIN range(0, 12) ys
      |  WHERE xs.range < d.w AND ys.range < d.h),
      |g AS (
      |  SELECT id, w, h, x, y,
      |    (299 * ((seed * 31 + x * 7 + y * 13 + x * y * (seed % 11)
      |             + nz) % 256)
      |     + 587 * ((seed * 17 + x * 11 + y * 5 + x * x * (seed % 7)
      |             + nz) % 256)
      |     + 114 * ((seed * 23 + x * 3 + y * 19 + y * y * (seed % 13)
      |             + nz) % 256)) // 1000 AS gray
      |  FROM px),
      |c9 AS (
      |  SELECT id, (x * 9) // w AS cx, (y * 8) // h AS cy,
      |    CAST(sum(gray) AS BIGINT) // count(*) AS a
      |  FROM g GROUP BY 1, 2, 3),
      |dbits AS (
      |  SELECT l.id, l.cy * 8 + l.cx AS b,
      |    CASE WHEN l.a > r.a THEN 1 ELSE 0 END AS bit
      |  FROM c9 l JOIN c9 r
      |    ON l.id = r.id AND r.cy = l.cy AND r.cx = l.cx + 1
      |  WHERE l.cx < 8),
      |dh AS (
      |  SELECT id,
      |    CAST(sum(CASE WHEN b >= 32
      |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
      |      AS BIGINT) AS dh_hi,
      |    CAST(sum(CASE WHEN b < 32
      |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END)
      |      AS BIGINT) AS dh_lo
      |  FROM dbits GROUP BY id),
      |c8 AS (
      |  SELECT id, (x * 8) // w AS cx, (y * 8) // h AS cy,
      |    CAST(sum(gray) AS BIGINT) // count(*) AS a
      |  FROM g GROUP BY 1, 2, 3),
      |am AS (SELECT id, CAST(sum(a) AS BIGINT) // 64 AS m
      |  FROM c8 GROUP BY id),
      |abits AS (
      |  SELECT c.id, c.cy * 8 + c.cx AS b,
      |    CASE WHEN c.a > am.m THEN 1 ELSE 0 END AS bit
      |  FROM c8 c JOIN am ON c.id = am.id),
      |ah AS (
      |  SELECT id,
      |    CAST(sum(CASE WHEN b >= 32
      |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
      |      AS BIGINT) AS ah_hi,
      |    CAST(sum(CASE WHEN b < 32
      |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END)
      |      AS BIGINT) AS ah_lo
      |  FROM abits GROUP BY id)
      |""".stripMargin

  /** Shared mm7/dd16 oracle prelude: the audio corpus's waveform,
    * frame-energy, and fingerprint bit-packing arithmetic replayed in
    * SQL straight from doc_id — the DuckDB twin of
    * [[graft.multimodal.MediaContent]]. Ends WITHOUT a trailing
    * comma: mm7 appends its SELECT, dd16 appends further CTEs. */
  private val AudioFpCte: String =
    """WITH ids AS (SELECT doc_id AS id FROM documents),
      |par AS (
      |  SELECT id, 2112 + (id % 4) * 256 AS n,
      |    8000 + (id % 3) * 4000 AS sr, (id // 2) % 97 AS seed
      |  FROM ids),
      |ts AS (
      |  SELECT p.id, p.n, p.sr, p.seed, t.range AS t
      |  FROM par p CROSS JOIN range(0, 2880) t WHERE t.range < p.n),
      |smp AS (
      |  SELECT id, n, sr, t // 32 AS f,
      |    (((((t + 1) * (2654435761 + seed * 97561)) % 65521) % 2048
      |       - 1024)
      |     + CASE WHEN id % 2 = 1 AND t % 499 = 3 THEN 200 ELSE 0 END)
      |      AS s
      |  FROM ts),
      |en AS (
      |  SELECT id, n, sr, f, CAST(sum(s * s) AS BIGINT) AS e
      |  FROM smp GROUP BY 1, 2, 3, 4),
      |abits AS (
      |  SELECT a.id, a.n, a.sr, a.f - 1 AS b,
      |    CASE WHEN a.e > prev.e THEN 1 ELSE 0 END AS bit
      |  FROM en a JOIN en prev ON a.id = prev.id AND prev.f = a.f - 1
      |  WHERE a.f >= 1 AND a.f <= 64),
      |fp AS (
      |  SELECT id, n, sr,
      |    CAST(sum(CASE WHEN b >= 32
      |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
      |      AS BIGINT) AS fp_hi,
      |    CAST(sum(CASE WHEN b < 32
      |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END)
      |      AS BIGINT) AS fp_lo
      |  FROM abits GROUP BY 1, 2, 3)
      |""".stripMargin

  /** Shared mm8/dd17 oracle prelude: sampling plan, per-frame pixels,
    * and per-frame dHash replayed in SQL straight from doc_id — the
    * DuckDB twin of [[graft.multimodal.MediaContent]]'s video arm
    * (pair-keyed texture and frame count; diagonal perturbation on
    * odd ids). Ends WITHOUT a trailing comma: mm8 appends its SELECT,
    * dd17 appends further CTEs. */
  private val VideoFrameCte: String =
    """WITH ids AS (SELECT doc_id AS id FROM documents),
      |par AS (
      |  SELECT id, 12 + ((id // 2) % 3) * 4 AS w,
      |    8 + ((id // 2) % 2) * 4 AS h,
      |    8 + ((id // 2) % 5) * 3 - CASE WHEN id % 2 = 1
      |      AND (id // 2) % 3 = 2 AND (id // 2) % 5 >= 1
      |      THEN 5 ELSE 0 END AS tf,
      |    CASE WHEN id % 2 = 1 AND (id // 2) % 3 = 2
      |      AND (id // 2) % 5 >= 1 THEN 5 ELSE 0 END AS trim,
      |    (id // 2) % 97 AS seed
      |  FROM ids),
      |plan1 AS (
      |  SELECT *, least((tf * 100) // 500, 8) AS nfr,
      |    (tf * 100) // 500 AS total FROM par),
      |sfr AS (
      |  SELECT p.id, p.w, p.h, p.seed, p.trim,
      |    least(((i.range * p.total) // p.nfr) * 5, p.tf - 1) AS f
      |  FROM plan1 p CROSS JOIN range(0, 8) i WHERE i.range < p.nfr),
      |vpx AS (
      |  SELECT s.id, s.w, s.h, s.f, s.seed, s.trim,
      |    xs.range AS x, ys.range AS y,
      |    CASE WHEN s.id % 2 = 1 AND xs.range = ys.range
      |          AND xs.range % 4 = 1 THEN 40 ELSE 0 END AS nz
      |  FROM sfr s CROSS JOIN range(0, 20) xs CROSS JOIN range(0, 12) ys
      |  WHERE xs.range < s.w AND ys.range < s.h),
      |vg AS (
      |  SELECT id, w, h, f, x, y,
      |    (299 * ((seed * 31 + x * 7 + y * 13 + (f + trim) * 29
      |             + x * y * (seed % 11) + nz) % 256)
      |     + 587 * ((seed * 17 + x * 11 + y * 5 + (f + trim) * 37
      |             + x * x * (seed % 7) + nz) % 256)
      |     + 114 * ((seed * 23 + x * 3 + y * 19 + (f + trim) * 41
      |             + y * y * (seed % 13) + nz) % 256)) // 1000 AS gray
      |  FROM vpx),
      |vc9 AS (
      |  SELECT id, f, w, h, (x * 9) // w AS cx, (y * 8) // h AS cy,
      |    CAST(sum(gray) AS BIGINT) // count(*) AS a
      |  FROM vg GROUP BY 1, 2, 3, 4, 5, 6),
      |vdbits AS (
      |  SELECT l.id, l.f, l.w, l.h, l.cy * 8 + l.cx AS b,
      |    CASE WHEN l.a > r.a THEN 1 ELSE 0 END AS bit
      |  FROM vc9 l JOIN vc9 r ON l.id = r.id AND l.f = r.f
      |    AND r.cy = l.cy AND r.cx = l.cx + 1
      |  WHERE l.cx < 8),
      |vfh AS (
      |  SELECT id, f, w, h,
      |    CAST(sum(CASE WHEN b >= 32
      |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
      |      AS BIGINT) AS dh_hi,
      |    CAST(sum(CASE WHEN b < 32
      |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END)
      |      AS BIGINT) AS dh_lo
      |  FROM vdbits GROUP BY 1, 2, 3, 4)
      |""".stripMargin

  /** dd15's oracle (and dd18's: the incremental index must equal the
    * one-shot pass exactly): banded-LSH candidates under the
    * corpus-derived geometry, exact Hamming ≤ 8 verify. */
  private lazy val Dd15OracleSql: String =
    ImagePhashCte + ",\n" + bandSpecSql("ids", occ = 4) + ",\n" +
      """bands AS (
        |  SELECT d.id, b.bi,
        |    CAST(((CAST(d.dh_hi AS UBIGINT) * 4294967296
        |           + CAST(d.dh_lo AS UBIGINT)) >> b.shf)
        |      & ((CAST(1 AS UBIGINT) << b.wd) - 1) AS BIGINT) AS bv
        |  FROM dh d CROSS JOIN bspec b),
        |cand AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM bands a JOIN bands b
        |    ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id)
        |SELECT c.id1, c.id2,
        |  CAST(bit_count(xor(h1.dh_lo, h2.dh_lo)) +
        |       bit_count(xor(h1.dh_hi, h2.dh_hi)) AS BIGINT) AS hamming
        |FROM cand c JOIN dh h1 ON c.id1 = h1.id
        |JOIN dh h2 ON c.id2 = h2.id
        |WHERE bit_count(xor(h1.dh_lo, h2.dh_lo)) +
        |      bit_count(xor(h1.dh_hi, h2.dh_hi)) <= 8""".stripMargin

  /** dd17's oracle (and dd21's: the incremental frame index must
    * equal the one-shot offset-alignment pass exactly). */
  private lazy val Dd17OracleSql: String =
    VideoFrameCte + ",\n" + bandSpecSql("ids", occ = 4) + ",\n" +
      """vbands AS (
        |  SELECT d.id, d.f, b.bi,
        |    CAST(((CAST(d.dh_hi AS UBIGINT) * 4294967296
        |           + CAST(d.dh_lo AS UBIGINT)) >> b.shf)
        |      & ((CAST(1 AS UBIGINT) << b.wd) - 1) AS BIGINT) AS bv
        |  FROM vfh d CROSS JOIN bspec b),
        |cand AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2,
        |    CAST(a.f - b.f AS BIGINT) AS off
        |  FROM vbands a JOIN vbands b
        |    ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id),
        |al AS (
        |  SELECT c.id1, c.id2, c.off,
        |    bit_count(xor(f1.dh_lo, f2.dh_lo)) +
        |    bit_count(xor(f1.dh_hi, f2.dh_hi)) AS ham
        |  FROM cand c JOIN vfh f1 ON f1.id = c.id1
        |  JOIN vfh f2 ON f2.id = c.id2 AND f2.f = f1.f - c.off),
        |ag AS (
        |  SELECT id1, id2, off, CAST(count(*) AS BIGINT) AS n_aligned,
        |    CAST(max(ham) AS BIGINT) AS max_ham
        |  FROM al GROUP BY 1, 2, 3),
        |nfv AS (SELECT id, count(*) AS nf FROM vfh GROUP BY id),
        |best AS (
        |  SELECT ag.id1, ag.id2, ag.off, ag.n_aligned, ag.max_ham,
        |    row_number() OVER (PARTITION BY ag.id1, ag.id2
        |      ORDER BY ag.n_aligned DESC, ag.off ASC) AS rn
        |  FROM ag JOIN nfv n1 ON n1.id = ag.id1
        |  JOIN nfv n2 ON n2.id = ag.id2
        |  WHERE ag.max_ham <= 8
        |    AND ag.n_aligned >= GREATEST(n1.nf, n2.nf) - 1)
        |SELECT id1, id2, n_aligned, off, max_ham FROM best WHERE rn = 1"""
        .stripMargin

  val oracle: Map[String, String] = Map(
    "sim7_kmeans_diversity" -> sim7OracleSql,
    "sim8_recall_report" -> sim8OracleSql,
    "sim9_outlier_filter" ->
      s"""WITH q AS (SELECT vec_id AS vid, label AS cl, ${qv("10000")} AS v
        |  FROM embeddings),
        |ncnt AS (SELECT cl, count(*) AS n FROM q GROUP BY 1),
        |comp AS (SELECT q.vid, q.cl, q.v, u.i FROM q,
        |  (SELECT unnest(range(1, 65)) AS i) u),
        |csum AS (SELECT cl, i, CAST(sum(v[i]) AS BIGINT) AS si
        |  FROM comp GROUP BY 1, 2),
        |dist AS (SELECT c.vid, c.cl,
        |    CAST(sum((n.n * c.v[c.i] - s.si) * (n.n * c.v[c.i] - s.si))
        |      AS BIGINT) AS d2n2
        |  FROM comp c JOIN csum s ON s.cl = c.cl AND s.i = c.i
        |  JOIN ncnt n ON n.cl = c.cl
        |  GROUP BY c.vid, c.cl),
        |rked AS (SELECT vid, cl, d2n2,
        |    row_number() OVER (PARTITION BY cl
        |      ORDER BY d2n2 DESC, vid ASC) AS rk,
        |    count(*) OVER (PARTITION BY cl) AS n_label
        |  FROM dist)
        |SELECT vid, cl AS label, d2n2,
        |  CAST(CASE WHEN rk <= n_label // 20 THEN 1 ELSE 0 END AS INT)
        |    AS is_outlier
        |FROM rked""".stripMargin,
    "sim1_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, ${qv("1000000")} AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS neighbor_id, ${qv("1000000")} AS cv FROM embeddings),
        |scored AS (SELECT query_id, neighbor_id,
        |    CAST($dot64 AS DOUBLE) /
        |    sqrt(CAST(${n2("qv")} AS DOUBLE) * CAST(${n2("cv")} AS DOUBLE)) AS cos_sim
        |  FROM q JOIN c ON query_id <> neighbor_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5""".stripMargin,
    "sim2_lsh_ann" -> {
      val keyArms = (0 until Sim2Tables).map { t =>
        s"SELECT id, $t AS t, CAST(${sim2BucketSql(t)} AS BIGINT) AS b FROM v"
      }.mkString("\n        |  UNION ALL ")
      s"""WITH v AS (SELECT vec_id AS id, ${qv("1000000")} AS v FROM embeddings),
        |keys AS (
        |  $keyArms),
        |cand AS (SELECT DISTINCT k1.id AS query_id, k2.id AS neighbor_id
        |  FROM keys k1 JOIN keys k2 ON k1.t = k2.t AND k1.b = k2.b AND k1.id <> k2.id),
        |scored AS (SELECT c.query_id, c.neighbor_id,
        |    CAST(CAST(list_sum(list_transform(range(1, 65), i -> qa.v[i] * cb.v[i])) AS BIGINT) AS DOUBLE) /
        |    sqrt(CAST(CAST(list_sum(list_transform(range(1, 65), i -> qa.v[i] * qa.v[i])) AS BIGINT) AS DOUBLE) *
        |         CAST(CAST(list_sum(list_transform(range(1, 65), i -> cb.v[i] * cb.v[i])) AS BIGINT) AS DOUBLE)) AS cos_sim
        |  FROM cand c JOIN v qa ON qa.id = c.query_id JOIN v cb ON cb.id = c.neighbor_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 3""".stripMargin
    },
    "dd7_embed_neardup" -> Dd7PairsSql,
    // batch-wise == one-shot is the dd25 contract (deterministic keys
    // + exact integer cosine — nothing to tolerate): dd7's SQL
    "dd25_incremental_embed" -> Dd7PairsSql,
    // the same pair graph contracted to components (recursive reach
    // over the symmetric ≥0.9 edges), min id canonical
    "dd14_semantic_dedup" ->
      s"""WITH RECURSIVE $dd7OracleCte,
        |edges AS (SELECT a_id AS a, b_id AS b FROM scored
        |  WHERE cos_sim >= 0.9),
        |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
        |reach(start, node) AS (
        |  SELECT vec_id, vec_id FROM corpus
        |  UNION
        |  SELECT r.start, s.b FROM reach r JOIN sym s ON s.a = r.node)
        |SELECT start AS vec_id, min(node) AS canonical_id,
        |  CASE WHEN start = min(node) THEN 1 ELSE 0 END AS is_canonical
        |FROM reach GROUP BY start""".stripMargin,
    "sim5_pq_topk" ->
      s"""WITH v AS (SELECT vec_id AS id, ${qv("10000")} AS v FROM embeddings),
        |js AS (SELECT unnest(range(0, $Sim5M)) AS j),
        |subs AS (SELECT id, j,
        |    list_transform(range(1, ${Sim5Sub + 1}), i -> v[j*$Sim5Sub + i]) AS sub
        |  FROM v, js),
        |cw AS (SELECT j, id AS c, sub AS cwv FROM subs WHERE id < 16),
        |enc AS (SELECT s.id, s.j, w.c,
        |    CAST(list_sum(list_transform(range(1, ${Sim5Sub + 1}),
        |      i -> (s.sub[i] - w.cwv[i]) * (s.sub[i] - w.cwv[i]))) AS BIGINT) AS d2
        |  FROM subs s JOIN cw w ON w.j = s.j),
        |codes AS (SELECT id, j, c AS code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id, j ORDER BY d2, c) AS rn
        |    FROM enc) t WHERE rn = 1),
        |lut AS (SELECT s.id AS query_id, s.j, w.c,
        |    CAST(list_sum(list_transform(range(1, ${Sim5Sub + 1}),
        |      i -> (s.sub[i] - w.cwv[i]) * (s.sub[i] - w.cwv[i]))) AS BIGINT) AS pd2
        |  FROM subs s JOIN cw w ON w.j = s.j WHERE s.id % 50 = 0),
        |adc AS (SELECT l.query_id, c.id AS neighbor_id,
        |    CAST(sum(l.pd2) AS BIGINT) AS adc_d2
        |  FROM codes c JOIN lut l ON l.j = c.j AND l.c = c.code
        |  WHERE c.id <> l.query_id GROUP BY 1, 2),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc_d2, neighbor_id) AS rank FROM adc)
        |SELECT query_id, neighbor_id, adc_d2, rank FROM ranked
        |WHERE rank <= 5""".stripMargin,
    // sim12 ingests batch-wise into the PERSISTED index under
    // geometry pinned from the same corpus: its results must equal
    // the one-shot IVF-PQ pass — the oracle IS sim6's SQL
    "sim12_ann_index" -> Sim6OracleSql,
    "sim6_ivfpq_topk" -> Sim6OracleSql,
    "sim4_ivf_search" -> sim4OracleSql,
    // same storage-invisible semantics: the bucketed layout must not
    // change a single neighbor or score
    "sim10_bucketed_ivf" -> sim4OracleSql,
    "sim11_hybrid_rrf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
        |tfx AS (SELECT doc_id, tok, count(*) AS tf FROM toks
        |  WHERE tok IN ('hash', 'join', 'vector') GROUP BY 1, 2),
        |dfreq AS (SELECT tok, count(*) AS df FROM tfx GROUP BY 1),
        |stats AS (SELECT
        |  CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n_docs,
        |  CAST((SELECT sum(len) FROM lens) AS DOUBLE) AS s_toks),
        |bmscored AS (
        |  SELECT t.doc_id, t.tok,
        |    ((st.n_docs - f.df + CAST(0.5 AS DOUBLE)) /
        |      (f.df + CAST(0.5 AS DOUBLE))) *
        |    ((t.tf * CAST(2.2 AS DOUBLE)) /
        |      (t.tf + CAST(0.3 AS DOUBLE) +
        |        (CAST(0.9 AS DOUBLE) * l.len) /
        |          (st.s_toks / st.n_docs))) AS score
        |  FROM tfx t JOIN dfreq f USING (tok) JOIN lens l USING (doc_id),
        |    stats st),
        |bm AS (SELECT doc_id,
        |    coalesce(sum(CASE WHEN tok = 'hash' THEN score END),
        |      CAST(0 AS DOUBLE))
        |    + coalesce(sum(CASE WHEN tok = 'join' THEN score END),
        |      CAST(0 AS DOUBLE))
        |    + coalesce(sum(CASE WHEN tok = 'vector' THEN score END),
        |      CAST(0 AS DOUBLE)) AS bm25
        |  FROM bmscored GROUP BY 1),
        |lex AS (SELECT doc_id, r_lex FROM (SELECT doc_id, row_number()
        |    OVER (ORDER BY bm25 DESC, doc_id) AS r_lex FROM bm)
        |  WHERE r_lex <= 50),
        |qv0 AS (SELECT ${qv("1000000")} AS qv FROM embeddings
        |  WHERE vec_id = 0),
        |cand AS (SELECT vec_id, ${qv("1000000")} AS cv FROM embeddings),
        |semscored AS (SELECT vec_id,
        |    CAST($dot64 AS DOUBLE) /
        |    sqrt(CAST(${n2("qv")} AS DOUBLE) *
        |         CAST(${n2("cv")} AS DOUBLE)) AS cos
        |  FROM cand, qv0),
        |sem AS (SELECT vec_id, r_sem FROM (SELECT vec_id, row_number()
        |    OVER (ORDER BY cos DESC, vec_id) AS r_sem FROM semscored)
        |  WHERE r_sem <= 50),
        |fused AS (SELECT coalesce(l.doc_id, s.vec_id) AS id,
        |    CAST(l.r_lex AS BIGINT) AS r_lex,
        |    CAST(s.r_sem AS BIGINT) AS r_sem,
        |    CAST(1000000 // (60 + coalesce(l.r_lex, 1000))
        |      + 1000000 // (60 + coalesce(s.r_sem, 1000)) AS BIGINT)
        |      AS rrf_ppm
        |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id)
        |SELECT id, r_lex, r_sem, rrf_ppm FROM fused
        |ORDER BY rrf_ppm DESC, id LIMIT 10""".stripMargin,

    "sim3_ivf_centroid" ->
      s"""WITH q AS (SELECT vec_id AS vid, label AS true_label, ${qv("10000")} AS v
        |  FROM embeddings),
        |ncnt AS (SELECT true_label AS cl, count(*) AS n FROM q GROUP BY 1),
        |comp AS (SELECT q.vid, q.true_label, q.v, u.i FROM q,
        |  (SELECT unnest(range(1, 65)) AS i) u),
        |csum AS (SELECT true_label AS cl, i, CAST(sum(v[i]) AS BIGINT) AS si
        |  FROM comp GROUP BY 1, 2),
        |dists AS (SELECT c.vid, c.true_label, s.cl,
        |    CAST(sum((n.n * c.v[c.i] - s.si) * (n.n * c.v[c.i] - s.si)) AS BIGINT) AS d2
        |  FROM comp c JOIN csum s ON s.i = c.i JOIN ncnt n ON n.cl = s.cl
        |  GROUP BY c.vid, c.true_label, s.cl),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY vid
        |    ORDER BY d2 ASC, cl ASC) AS rk FROM dists)
        |SELECT vid, true_label, cl AS assigned_label,
        |  CASE WHEN cl = true_label THEN 1 ELSE 0 END AS is_match
        |FROM ranked WHERE rk = 1""".stripMargin,
    // The Spark side decodes REAL pixel grids out of genuine BMP/PNG
    // bytes (zlib inflate + un-filter) and hashes them; the oracle
    // replays the pixel + block-average + bit-packing arithmetic
    // straight from doc_id. A hash match certifies encoder, decoder,
    // gray conversion, downsample, and packing together.
    "mm6_image_phash" ->
      (ImagePhashCte +
      """SELECT dims.id AS doc_id,
        |  CASE WHEN dims.id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
        |  CAST(dims.w AS INT) AS width, CAST(dims.h AS INT) AS height,
        |  dh.dh_hi, dh.dh_lo, ah.ah_hi, ah.ah_lo
        |FROM dims JOIN dh ON dims.id = dh.id
        |JOIN ah ON dims.id = ah.id""".stripMargin),
    "dd15_image_neardup" -> Dd15OracleSql,
    // cur2: the full multimodal curation chain replayed blind —
    // image + audio hash arithmetic (the mm6/mm7 preludes, audio
    // CTEs renamed to avoid the shared-name collision), shared band
    // geometry, per-modality pairs, recursive-CTE connected
    // components, md5-bucket shard packing
    "cur2_multimodal_curation" ->
      (ImagePhashCte.replaceFirst("^WITH ", "WITH RECURSIVE ") + ",\n" +
      """apar AS (
        |  SELECT id, 2112 + (id % 4) * 256 AS n, (id // 2) % 97 AS seed
        |  FROM ids),
        |ats AS (
        |  SELECT p.id, p.n, p.seed, t.range AS t
        |  FROM apar p CROSS JOIN range(0, 2880) t WHERE t.range < p.n),
        |asmp AS (
        |  SELECT id, t // 32 AS f,
        |    (((((t + 1) * (2654435761 + seed * 97561)) % 65521) % 2048
        |       - 1024)
        |     + CASE WHEN id % 2 = 1 AND t % 499 = 3 THEN 200 ELSE 0 END)
        |      AS s
        |  FROM ats),
        |aen AS (
        |  SELECT id, f, CAST(sum(s * s) AS BIGINT) AS e
        |  FROM asmp GROUP BY 1, 2),
        |fpbits AS (
        |  SELECT a.id, a.f - 1 AS b,
        |    CASE WHEN a.e > prev.e THEN 1 ELSE 0 END AS bit
        |  FROM aen a JOIN aen prev ON a.id = prev.id AND prev.f = a.f - 1
        |  WHERE a.f >= 1 AND a.f <= 64),
        |afp AS (
        |  SELECT id,
        |    CAST(sum(CASE WHEN b >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
        |      AS BIGINT) AS fp_hi,
        |    CAST(sum(CASE WHEN b < 32
        |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END)
        |      AS BIGINT) AS fp_lo
        |  FROM fpbits GROUP BY 1),
        |""".stripMargin + bandSpecSql("ids", occ = 4) + ",\n" +
      """ibands AS (
        |  SELECT d.id, b.bi,
        |    CAST(((CAST(d.dh_hi AS UBIGINT) * 4294967296
        |           + CAST(d.dh_lo AS UBIGINT)) >> b.shf)
        |      & ((CAST(1 AS UBIGINT) << b.wd) - 1) AS BIGINT) AS bv
        |  FROM dh d CROSS JOIN bspec b),
        |ipairs AS (
        |  SELECT DISTINCT c.a, c.b FROM (
        |    SELECT DISTINCT a.id AS a, b.id AS b
        |    FROM ibands a JOIN ibands b
        |      ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id) c
        |  JOIN dh h1 ON c.a = h1.id JOIN dh h2 ON c.b = h2.id
        |  WHERE bit_count(xor(h1.dh_lo, h2.dh_lo)) +
        |        bit_count(xor(h1.dh_hi, h2.dh_hi)) <= 8),
        |abands AS (
        |  SELECT d.id, b.bi,
        |    CAST(((CAST(d.fp_hi AS UBIGINT) * 4294967296
        |           + CAST(d.fp_lo AS UBIGINT)) >> b.shf)
        |      & ((CAST(1 AS UBIGINT) << b.wd) - 1) AS BIGINT) AS bv
        |  FROM afp d CROSS JOIN bspec b),
        |apairs AS (
        |  SELECT DISTINCT c.a, c.b FROM (
        |    SELECT DISTINCT a.id AS a, b.id AS b
        |    FROM abands a JOIN abands b
        |      ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id) c
        |  JOIN afp h1 ON c.a = h1.id JOIN afp h2 ON c.b = h2.id
        |  WHERE bit_count(xor(h1.fp_lo, h2.fp_lo)) +
        |        bit_count(xor(h1.fp_hi, h2.fp_hi)) <= 8),
        |medges AS (SELECT a, b FROM ipairs UNION SELECT a, b FROM apairs),
        |msym AS (SELECT a, b FROM medges UNION SELECT b, a FROM medges),
        |reach(start, node) AS (
        |  SELECT id, id FROM ids
        |  UNION
        |  SELECT r.start, s.b FROM reach r JOIN msym s ON s.a = r.node),
        |cc AS (SELECT start AS id, min(node) AS canonical_id
        |  FROM reach GROUP BY start),
        |members AS (SELECT canonical_id,
        |    CAST(count(*) AS BIGINT) AS n_members
        |  FROM cc GROUP BY 1),
        |sur AS (
        |  SELECT cc.id, m.n_members,
        |    CAST(d.w * d.h * 3 AS BIGINT) + CAST(p.n * 2 AS BIGINT)
        |      AS bytes
        |  FROM cc JOIN members m ON m.canonical_id = cc.id
        |  JOIN dims d ON d.id = cc.id
        |  JOIN apar p ON p.id = cc.id
        |  WHERE cc.id = cc.canonical_id),
        |bkt AS (
        |  SELECT *, CAST(
        |    (strpos('0123456789abcdef',
        |            substr(md5(CAST(id AS VARCHAR)), 1, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef',
        |            substr(md5(CAST(id AS VARCHAR)), 2, 1)) - 1)
        |    AS INT) AS bucket
        |  FROM sur)
        |SELECT id, n_members, bytes, bucket,
        |  CAST(floor((CAST(sum(bytes) OVER (PARTITION BY bucket
        |      ORDER BY id) AS BIGINT) - 1) / 65536.0) AS BIGINT) AS shard
        |FROM bkt""".stripMargin),

    // dd20: the mm6 hashes unioned with their GIF re-encodes (same
    // dHash, ids shifted 10M), banded under geometry from the
    // combined count, exact Hamming verify
    "dd20_crosscodec_neardup" ->
      (ImagePhashCte + ",\n" +
      """allh AS (
        |  SELECT id, dh_hi, dh_lo FROM dh
        |  UNION ALL SELECT id + 10000000, dh_hi, dh_lo FROM dh),
        |""".stripMargin + bandSpecSql("allh", occ = 4) + ",\n" +
      """xbands AS (
        |  SELECT d.id, b.bi,
        |    CAST(((CAST(d.dh_hi AS UBIGINT) * 4294967296
        |           + CAST(d.dh_lo AS UBIGINT)) >> b.shf)
        |      & ((CAST(1 AS UBIGINT) << b.wd) - 1) AS BIGINT) AS bv
        |  FROM allh d CROSS JOIN bspec b),
        |xcand AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM xbands a JOIN xbands b
        |    ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id)
        |SELECT c.id1, c.id2,
        |  CAST(bit_count(xor(h1.dh_lo, h2.dh_lo)) +
        |       bit_count(xor(h1.dh_hi, h2.dh_hi)) AS BIGINT) AS hamming
        |FROM xcand c JOIN allh h1 ON c.id1 = h1.id
        |JOIN allh h2 ON c.id2 = h2.id
        |WHERE bit_count(xor(h1.dh_lo, h2.dh_lo)) +
        |      bit_count(xor(h1.dh_hi, h2.dh_hi)) <= 8""".stripMargin),

    // mm11 replays the DC-exact JPEG corpus: block-constant pixels
    // from doc_id arithmetic, then the standard 9×8 dHash fold — a
    // hash match certifies Huffman + DC prediction + dequant + IDCT
    "mm11_jpeg_pixels" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |jpx AS (
        |  SELECT i.id, xs.range AS x, ys.range AS y,
        |    ((((i.id // 2) % 97) * 31 + (xs.range // 8) * 47
        |      + (ys.range // 8) * 59
        |      + (xs.range // 8) * (ys.range // 8)
        |        * (((i.id // 2) % 97) % 11)) % 200) + 28
        |    + CASE WHEN i.id % 2 = 1 AND xs.range // 8 = 1
        |            AND ys.range // 8 = 1 THEN 12 ELSE 0 END AS gray
        |  FROM ids i CROSS JOIN range(0, 24) xs CROSS JOIN range(0, 16) ys),
        |jc9 AS (
        |  SELECT id, (x * 9) // 24 AS cx, (y * 8) // 16 AS cy,
        |    CAST(sum(gray) AS BIGINT) // count(*) AS a
        |  FROM jpx GROUP BY 1, 2, 3),
        |jdbits AS (
        |  SELECT l.id, l.cy * 8 + l.cx AS b,
        |    CASE WHEN l.a > r.a THEN 1 ELSE 0 END AS bit
        |  FROM jc9 l JOIN jc9 r
        |    ON l.id = r.id AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8),
        |jdh AS (
        |  SELECT id,
        |    CAST(sum(CASE WHEN b >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
        |      AS BIGINT) AS dh_hi,
        |    CAST(sum(CASE WHEN b < 32
        |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END)
        |      AS BIGINT) AS dh_lo
        |  FROM jdbits GROUP BY id)
        |SELECT ids.id AS doc_id, 'jpeg' AS format,
        |  CAST(24 AS INT) AS width, CAST(16 AS INT) AS height,
        |  jdh.dh_hi, jdh.dh_lo
        |FROM ids JOIN jdh ON ids.id = jdh.id""".stripMargin,

    // mm12 replays the color corpus's LUMA plane: block-constant
    // lumas from doc_id arithmetic over the 32×16 canvas, the 9×8
    // dHash fold, and the sampling label predicted from id parity —
    // a match certifies 3-component SOF parse + four-table Huffman +
    // interleaved-MCU sync (incl. chroma AC skip) + DC prediction
    "mm12_jpeg_color" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |jpx AS (
        |  SELECT i.id, xs.range AS x, ys.range AS y,
        |    (((i.id % 97) * 31 + (xs.range // 8) * 47
        |      + (ys.range // 8) * 59
        |      + (xs.range // 8) * (ys.range // 8) * ((i.id % 97) % 11))
        |      % 200) + 28 AS gray
        |  FROM ids i CROSS JOIN range(0, 32) xs CROSS JOIN range(0, 16) ys),
        |jc9 AS (
        |  SELECT id, (x * 9) // 32 AS cx, (y * 8) // 16 AS cy,
        |    CAST(sum(gray) AS BIGINT) // count(*) AS a
        |  FROM jpx GROUP BY 1, 2, 3),
        |jdbits AS (
        |  SELECT l.id, l.cy * 8 + l.cx AS b,
        |    CASE WHEN l.a > r.a THEN 1 ELSE 0 END AS bit
        |  FROM jc9 l JOIN jc9 r
        |    ON l.id = r.id AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8),
        |jdh AS (
        |  SELECT id,
        |    CAST(sum(CASE WHEN b >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
        |      AS BIGINT) AS dh_hi,
        |    CAST(sum(CASE WHEN b < 32
        |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END)
        |      AS BIGINT) AS dh_lo
        |  FROM jdbits GROUP BY id)
        |SELECT ids.id AS doc_id,
        |  CASE WHEN ids.id % 2 = 0 THEN '420' ELSE '444' END AS sampling,
        |  CAST(32 AS INT) AS width, CAST(16 AS INT) AS height,
        |  jdh.dh_hi, jdh.dh_lo
        |FROM ids JOIN jdh ON ids.id = jdh.id""".stripMargin,
    // mm16 = mm12's luma replay with the sampling label read from the
    // PROGRESSIVE frame header — hash equality across coding paths
    "mm16_jpeg_progressive" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |jpx AS (
        |  SELECT i.id, xs.range AS x, ys.range AS y,
        |    (((i.id % 97) * 31 + (xs.range // 8) * 47
        |      + (ys.range // 8) * 59
        |      + (xs.range // 8) * (ys.range // 8) * ((i.id % 97) % 11))
        |      % 200) + 28 AS gray
        |  FROM ids i CROSS JOIN range(0, 32) xs CROSS JOIN range(0, 16) ys),
        |jc9 AS (
        |  SELECT id, (x * 9) // 32 AS cx, (y * 8) // 16 AS cy,
        |    CAST(sum(gray) AS BIGINT) // count(*) AS a
        |  FROM jpx GROUP BY 1, 2, 3),
        |jdbits AS (
        |  SELECT l.id, l.cy * 8 + l.cx AS b,
        |    CASE WHEN l.a > r.a THEN 1 ELSE 0 END AS bit
        |  FROM jc9 l JOIN jc9 r
        |    ON l.id = r.id AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8),
        |jdh AS (
        |  SELECT id,
        |    CAST(sum(CASE WHEN b >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
        |      AS BIGINT) AS dh_hi,
        |    CAST(sum(CASE WHEN b < 32
        |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END)
        |      AS BIGINT) AS dh_lo
        |  FROM jdbits GROUP BY id)
        |SELECT ids.id AS doc_id,
        |  CASE WHEN ids.id % 2 = 0 THEN 'p420' ELSE 'p444' END AS sampling,
        |  CAST(32 AS INT) AS width, CAST(16 AS INT) AS height,
        |  jdh.dh_hi, jdh.dh_lo
        |FROM ids JOIN jdh ON ids.id = jdh.id""".stripMargin,
    // mm14 replays the PDF corpus's expected TEXT from the tokens:
    // 8-token lines, parenthesized first word on lines ≡ 2 (mod 4),
    // filter arm from id parity — blind to the container bytes
    "mm14_pdf_text" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |p AS (SELECT t.doc_id, t.n, u.i AS i,
        |    t.w[CAST(u.i*8+1 AS INTEGER):CAST(u.i*8+8 AS INTEGER)] AS v
        |  FROM t, unnest(range(0, (t.n+7)//8)) AS u(i)),
        |r AS (SELECT doc_id, i,
        |    CASE WHEN i % 4 = 2 THEN '(' || v[1] || ')' ELSE v[1] END ||
        |    CASE WHEN len(v) > 1
        |         THEN ' ' || array_to_string(v[2:CAST(len(v) AS INTEGER)],
        |                                     ' ')
        |         ELSE '' END AS line
        |  FROM p),
        |agg AS (SELECT doc_id,
        |    string_agg(line, chr(10) ORDER BY i) AS text_out
        |  FROM r GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CASE WHEN t.doc_id % 2 = 0 THEN 'flate' ELSE 'raw' END
        |    AS pdf_filter,
        |  CAST((t.n+7)//8 AS BIGINT) AS n_lines, a.text_out
        |FROM t JOIN agg a USING (doc_id)""".stripMargin,
    // mm9 decodes LZW-compressed GIF bytes whose luma equals the mm6
    // texture — the oracle replays the same gray arithmetic, so a
    // match certifies the GIF round trip
    "mm9_gif_pixels" ->
      (ImagePhashCte +
      """SELECT dims.id AS doc_id, 'gif' AS format,
        |  CAST(dims.w AS INT) AS width, CAST(dims.h AS INT) AS height,
        |  dh.dh_hi, dh.dh_lo
        |FROM dims JOIN dh ON dims.id = dh.id""".stripMargin),
    // mm10 decodes rice/fixed-predictor FLAC back to the mm7
    // waveform; the oracle replays waveform + fingerprint arithmetic
    // and predicts the per-id subframe type
    "mm10_flac_samples" ->
      (AudioFpCte +
      """SELECT id AS doc_id,
        |  CASE WHEN id % 3 = 0 THEN 'verbatim'
        |       WHEN id % 3 = 1 THEN 'fixed1' ELSE 'fixed2' END
        |    AS subframe,
        |  CAST(sr AS INT) AS sample_rate, CAST(n AS INT) AS n_samples,
        |  fp_hi, fp_lo
        |FROM fp""".stripMargin),
    // batch-wise == one-shot is the dd18 contract, so its oracle IS
    // dd15's SQL — the gate pins the incremental index's output to
    // the whole-corpus pass bit for bit
    "dd18_incremental_phash" -> Dd15OracleSql,
    "mm7_audio_fingerprint" ->
      (AudioFpCte +
      """SELECT id AS doc_id, CAST(sr AS INT) AS sample_rate,
        |  CAST(n AS INT) AS n_samples, fp_hi, fp_lo
        |FROM fp""".stripMargin),
    "dd16_audio_neardup" ->
      (AudioFpCte + ",\n" + bandSpecSql("ids", occ = 4) + ",\n" +
      """bands AS (
        |  SELECT d.id, b.bi,
        |    CAST(((CAST(d.fp_hi AS UBIGINT) * 4294967296
        |           + CAST(d.fp_lo AS UBIGINT)) >> b.shf)
        |      & ((CAST(1 AS UBIGINT) << b.wd) - 1) AS BIGINT) AS bv
        |  FROM fp d CROSS JOIN bspec b),
        |cand AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2
        |  FROM bands a JOIN bands b
        |    ON a.bi = b.bi AND a.bv = b.bv AND a.id < b.id)
        |SELECT c.id1, c.id2,
        |  CAST(bit_count(xor(h1.fp_lo, h2.fp_lo)) +
        |       bit_count(xor(h1.fp_hi, h2.fp_hi)) AS BIGINT) AS hamming
        |FROM cand c JOIN fp h1 ON c.id1 = h1.id
        |JOIN fp h2 ON c.id2 = h2.id
        |WHERE bit_count(xor(h1.fp_lo, h2.fp_lo)) +
        |      bit_count(xor(h1.fp_hi, h2.fp_hi)) <= 8""".stripMargin),
    // mm13 replays the UNTRIMMED mm8 texture under the sample-table
    // corpus: frame count from (id//2)%5, the 2 fps plan, per-pixel
    // luma + 9×8 dHash — blind to the container bytes
    "mm13_mp4_samples" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |par AS (
        |  SELECT id, 12 + ((id // 2) % 3) * 4 AS w,
        |    8 + ((id // 2) % 2) * 4 AS h,
        |    8 + ((id // 2) % 5) * 3 AS tf,
        |    (id // 2) % 97 AS seed
        |  FROM ids),
        |plan1 AS (
        |  SELECT *, least((tf * 100) // 500, 8) AS nfr,
        |    (tf * 100) // 500 AS total FROM par),
        |sfr AS (
        |  SELECT p.id, p.w, p.h, p.seed,
        |    least(((i.range * p.total) // p.nfr) * 5, p.tf - 1) AS f
        |  FROM plan1 p CROSS JOIN range(0, 8) i WHERE i.range < p.nfr),
        |vpx AS (
        |  SELECT s.id, s.w, s.h, s.f, s.seed,
        |    xs.range AS x, ys.range AS y,
        |    CASE WHEN s.id % 2 = 1 AND xs.range = ys.range
        |          AND xs.range % 4 = 1 THEN 40 ELSE 0 END AS nz
        |  FROM sfr s CROSS JOIN range(0, 20) xs CROSS JOIN range(0, 12) ys
        |  WHERE xs.range < s.w AND ys.range < s.h),
        |vg AS (
        |  SELECT id, w, h, f, x, y,
        |    (299 * ((seed * 31 + x * 7 + y * 13 + f * 29
        |             + x * y * (seed % 11) + nz) % 256)
        |     + 587 * ((seed * 17 + x * 11 + y * 5 + f * 37
        |             + x * x * (seed % 7) + nz) % 256)
        |     + 114 * ((seed * 23 + x * 3 + y * 19 + f * 41
        |             + y * y * (seed % 13) + nz) % 256)) // 1000 AS gray
        |  FROM vpx),
        |vc9 AS (
        |  SELECT id, f, w, h, (x * 9) // w AS cx, (y * 8) // h AS cy,
        |    CAST(sum(gray) AS BIGINT) // count(*) AS a
        |  FROM vg GROUP BY 1, 2, 3, 4, 5, 6),
        |vdbits AS (
        |  SELECT l.id, l.f, l.w, l.h, l.cy * 8 + l.cx AS b,
        |    CASE WHEN l.a > r.a THEN 1 ELSE 0 END AS bit
        |  FROM vc9 l JOIN vc9 r ON l.id = r.id AND l.f = r.f
        |    AND r.cy = l.cy AND r.cx = l.cx + 1
        |  WHERE l.cx < 8),
        |vfh AS (
        |  SELECT id, f, w, h,
        |    CAST(sum(CASE WHEN b >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END)
        |      AS BIGINT) AS dh_hi,
        |    CAST(sum(CASE WHEN b < 32
        |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END)
        |      AS BIGINT) AS dh_lo
        |  FROM vdbits GROUP BY 1, 2, 3, 4)
        |SELECT id AS doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  dh_hi, dh_lo
        |FROM vfh""".stripMargin,
    "mm8_video_frames" ->
      (VideoFrameCte +
      """SELECT id AS doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  dh_hi, dh_lo
        |FROM vfh""".stripMargin),
    "dd17_video_neardup" -> Dd17OracleSql,
    // mm15 replays the sampled-frame GIF re-encode: the mm8 hash CTE
    // (trims included) re-keyed by the sample ORDINAL
    "mm15_gif_anim_frames" ->
      (VideoFrameCte +
      """SELECT id AS doc_id,
        |  CAST(row_number() OVER (PARTITION BY id ORDER BY f) - 1
        |    AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  dh_hi, dh_lo
        |FROM vfh""".stripMargin),
    // dd23: every re-encode verifies against its source at offset 0,
    // Hamming 0, with every sampled slot aligned — n_aligned is the
    // sampling plan's slot count, replayed from doc_id
    "dd23_crosscontainer_video" ->
      (VideoFrameCte +
      """SELECT id AS id1, id + 20000000 AS id2,
        |  CAST(nfr AS BIGINT) AS n_aligned, CAST(0 AS BIGINT) AS off,
        |  CAST(0 AS BIGINT) AS max_ham
        |FROM plan1""".stripMargin),
    // batch-wise == one-shot is the dd21 contract (the dd18 argument
    // at sequence grain): its oracle IS dd17's SQL
    "dd21_incremental_video" -> Dd17OracleSql,
    // The Spark side PARSES these values back out of synthesized
    // PNG/BMP/WAV bytes; the oracle predicts them arithmetically
    // (header sizes: PNG 33, BMP 54, WAV 44). A hash match therefore
    // certifies the binary encode→decode round trip.
    "mm4_gif_flac_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'gif' ELSE 'flac' END AS format,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 64 + doc_id * 7 % 1920
        |       ELSE 8000 + doc_id * 37 % 40000 END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 64 + doc_id * 13 % 1080
        |       ELSE 1 + doc_id % 8 END AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) +
        |       CASE WHEN doc_id % 2 = 0 THEN 13 ELSE 42 END AS BIGINT)
        |    AS n_bytes
        |FROM documents""".stripMargin,
    "mm1_media_meta" ->
      """SELECT doc_id,
        |  ['png', 'bmp', 'wav'][CAST(doc_id % 3 + 1 AS INTEGER)] AS format,
        |  CAST(64 + doc_id * 7 % 1920 AS INTEGER) AS width,
        |  CAST(64 + doc_id * 13 % 1080 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text))
        |       + [33, 54, 44][CAST(doc_id % 3 + 1 AS INTEGER)] AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents""".stripMargin,
    // AVI header size = 88; us_per_frame = 1000000 // fps; duration =
    // frames * us_per_frame // 1000 in integer ms. The sampling plan
    // mirrors frameSampleIndices: total = duration // 500 (2 fps),
    // n = min(total, 8), index_i = i * total // n.
    "mm2_video_meta" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    CAST(1000000 // ([10, 24, 30][CAST(doc_id % 3 + 1 AS INTEGER)])
        |         AS INTEGER) AS us_per_frame,
        |    CAST(10 + doc_id % 240 AS INTEGER) AS total_frames,
        |    CAST(64 + doc_id * 7 % 1920 AS INTEGER) AS width,
        |    CAST(64 + doc_id * 13 % 1080 AS INTEGER) AS height,
        |    CAST(octet_length(encode(text)) + 88 AS BIGINT) AS n_bytes
        |  FROM documents),
        |v2 AS (
        |  SELECT *, CAST(CAST(total_frames AS BIGINT) * us_per_frame // 1000
        |                 AS BIGINT) AS duration_ms FROM v),
        |v3 AS (
        |  SELECT *, CAST(duration_ms // 500 AS INTEGER) AS total_s,
        |    CAST(least(duration_ms // 500, 8) AS INTEGER) AS n FROM v2)
        |SELECT doc_id, 'avi' AS format, width, height, us_per_frame,
        |  total_frames, duration_ms, n_bytes,
        |  CASE WHEN n > 0
        |    THEN array_to_string(list_transform(range(0, n),
        |           i -> CAST(i * total_s // n AS INTEGER)), ',')
        |    ELSE '' END AS sample_idx
        |FROM v3""".stripMargin,
    // JPEG header = 39 bytes (SOI 2 + APP0 18 + SOF0 19); MP4 header
    // = 240 (ftyp 16 + moov 216 + mdat header 8); mp4 duration_ms =
    // (10 + doc_id % 240) * 100 with timescale 1000.
    // WebP header = 30 bytes (RIFF 12 + VP8X chunk 8 + payload 10);
    // MP3 header = 14 (empty ID3v2 10 + frame header 4); sample rate
    // by the MPEG1 index table, mono exactly when doc_id % 4 = 1.
    "mm5_webp_mp3_meta" ->
      """SELECT doc_id, 'webp' AS format,
        |  CAST(64 + doc_id * 7 % 1920 AS INTEGER) AS width,
        |  CAST(64 + doc_id * 13 % 1080 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) + 30 AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, 'mp3' AS format,
        |  CAST([44100, 48000, 32000][CAST(doc_id % 3 + 1 AS INTEGER)]
        |    AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END AS INTEGER)
        |    AS height,
        |  CAST(octet_length(encode(text)) + 14 AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin,
    "mm3_jpeg_mp4_meta" ->
      """SELECT doc_id, 'jpeg' AS format,
        |  CAST(64 + doc_id * 7 % 1920 AS INTEGER) AS width,
        |  CAST(64 + doc_id * 13 % 1080 AS INTEGER) AS height,
        |  CAST(0 AS BIGINT) AS duration_ms,
        |  CAST(octet_length(encode(text)) + 39 AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, 'mp4' AS format,
        |  CAST(64 + doc_id * 7 % 1920 AS INTEGER) AS width,
        |  CAST(64 + doc_id * 13 % 1080 AS INTEGER) AS height,
        |  CAST((10 + doc_id % 240) * 100 AS BIGINT) AS duration_ms,
        |  CAST(octet_length(encode(text)) + 240 AS BIGINT) AS n_bytes
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin
  )

  /** The one-shot IVF-PQ SQL — sim6's gate and, batch-wise ==
    * one-shot, sim12's. */
  private lazy val Sim6OracleSql: String =
      s"""WITH v AS (SELECT vec_id AS id, label, ${qv("10000")} AS v FROM embeddings),
        |js AS (SELECT unnest(range(0, $Sim5M)) AS j),
        |subs AS (SELECT id, j,
        |    list_transform(range(1, ${Sim5Sub + 1}), i -> v[j*$Sim5Sub + i]) AS sub
        |  FROM v, js),
        |cw AS (SELECT j, id AS c, sub AS cwv FROM subs WHERE id < 16),
        |enc AS (SELECT s.id, s.j, w.c,
        |    CAST(list_sum(list_transform(range(1, ${Sim5Sub + 1}),
        |      i -> (s.sub[i] - w.cwv[i]) * (s.sub[i] - w.cwv[i]))) AS BIGINT) AS d2
        |  FROM subs s JOIN cw w ON w.j = s.j),
        |codes AS (SELECT id, j, c AS code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id, j ORDER BY d2, c) AS rn
        |    FROM enc) t WHERE rn = 1),
        |lut AS (SELECT s.id AS query_id, s.j, w.c,
        |    CAST(list_sum(list_transform(range(1, ${Sim5Sub + 1}),
        |      i -> (s.sub[i] - w.cwv[i]) * (s.sub[i] - w.cwv[i]))) AS BIGINT) AS pd2
        |  FROM subs s JOIN cw w ON w.j = s.j WHERE s.id % 50 = 0),
        |ncnt AS (SELECT label AS cl, count(*) AS n FROM v GROUP BY 1),
        |comp AS (SELECT id, label, v, u.i FROM v,
        |  (SELECT unnest(range(1, ${Sim5M * Sim5Sub + 1})) AS i) u),
        |csum AS (SELECT label AS cl, i, CAST(sum(v[i]) AS BIGINT) AS si
        |  FROM comp GROUP BY 1, 2),
        |qd AS (SELECT c.id AS qid, s.cl,
        |    CAST(sum((n.n * c.v[c.i] - s.si) * (n.n * c.v[c.i] - s.si)) AS BIGINT) AS d2
        |  FROM comp c JOIN csum s ON s.i = c.i JOIN ncnt n ON n.cl = s.cl
        |  WHERE c.id % 50 = 0 GROUP BY 1, 2),
        |probed AS (SELECT qid, cl FROM (SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY d2 ASC, cl ASC) AS pr FROM qd) WHERE pr <= 2),
        |adc AS (SELECT l.query_id, c.id AS neighbor_id,
        |    CAST(sum(l.pd2) AS BIGINT) AS adc_d2
        |  FROM codes c JOIN v cv ON cv.id = c.id
        |  JOIN probed p ON p.cl = cv.label
        |  JOIN lut l ON l.j = c.j AND l.c = c.code AND l.query_id = p.qid
        |  WHERE c.id <> l.query_id GROUP BY 1, 2),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc_d2, neighbor_id) AS rank FROM adc)
        |SELECT query_id, neighbor_id, adc_d2, rank FROM ranked
        |WHERE rank <= 5""".stripMargin
}
