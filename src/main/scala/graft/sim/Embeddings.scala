package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Numeric design: embeddings are quantized to integers
  * (round(x * 1e6)) before any reduction, so dot products and norms
  * are EXACT integer sums — order-independent, parallel-safe, and
  * bit-identical in any engine. The only floating-point op is the
  * final per-pair cosine (one divide + one sqrt), which is IEEE-
  * deterministic. 64-dim × |x|≤1e6 keeps every sum ≪ 2^63.
  *
  * Scale design: brute-force top-k is the correctness baseline
  * (queries × corpus, fine when queries ≪ corpus and the query side
  * broadcasts); the sign-LSH bucket variant is the 100 TB path — the
  * pair join keys on a hyperplane-sign bucket so candidate count
  * tracks bucket occupancy, not N². An IVF-style coarse quantizer
  * (label centroids) covers partition-pruned search.
  */
object Embeddings {

  /** Quantized integer embedding (array<long>), exact downstream math. */
  def quantize(emb: Column, scale: Double = 1e6): Column =
    transform(emb, x => round(x.cast(DoubleType) * scale).cast(LongType))

  /** [[quantize]] plus a LOUD dimension guard: if `size(emb) != dim`,
    * zip_with against the `dim`-sized hyperplanes would pad with
    * nulls, null the dot product, fail every `>= 0` sign test, and
    * silently drop EVERY vector into bucket 0 — degrading the LSH
    * join to a full O(N²) cross product. A dimension mismatch must be
    * an error, not a quadratic slowdown. */
  def quantizeChecked(emb: Column, dim: Int, scale: Double = 1e6): Column =
    when(size(emb) === dim, quantize(emb, scale))
      .otherwise(raise_error(concat(
        lit(s"embedding dimension mismatch: expected $dim, got "),
        size(emb).cast("string"))))

  // Internal caches register with [[graft.util.CacheScope]]: a
  // lazy-plan API cannot unpersist its own cache (the returned frame
  // still references it), so the query driver releases the batch
  // after consuming each result.
  private def cacheTracked(df: DataFrame): DataFrame =
    graft.util.CacheScope.track(df)

  /** Exact integer dot product of two quantized embeddings. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)

  /** Exact integer squared norm. */
  def qnorm2(a: Column): Column = qdot(a, a)

  /** Cosine from exact integer parts (single deterministic fp step). */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast(DoubleType) / sqrt(n2a.cast(DoubleType) * n2b.cast(DoubleType))

  /** Brute-force cosine top-k: for each row of `queries`, the k nearest
    * rows of `corpus` (excluding self). Query side is the small side —
    * broadcast it so the corpus scan never shuffles. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     embCol: String, k: Int): DataFrame = {
    // norms precomputed per side — computing them per PAIR would cost
    // |Q|×|C| redundant array folds.
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(embCol)).as("qv"))
      .withColumn("qn2", qnorm2(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(embCol)).as("cv"))
      .withColumn("cn2", qnorm2(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(qdot(col("qv"), col("cv")), col("qn2"), col("cn2"))
          .as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Deterministic pseudo-random hyperplane weights: component
    * (table, bit, j) is a signed 16-bit integer carved from
    * md5("plane:table:bit:j") — seeded randomness with no RNG state,
    * reproducible in any engine or language (the oracle SQL embeds
    * the same integers as literals). Round 1 used the first `bits`
    * coordinate axes as planes: bucket count was frozen at 2^12
    * forever and axis-aligned signs correlate with coordinate
    * sign-imbalance; md5-derived planes are balanced and `bits` /
    * `tables` scale with the corpus. */
  def planeWeights(table: Int, bit: Int, dim: Int): Array[Long] =
    Array.tabulate(dim) { j =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"plane:$table:$bit:$j".getBytes("UTF-8"))
      (((h(0) & 0xff) << 8) | (h(1) & 0xff)).toLong - 32768L
    }

  /** Hyperplane-sign LSH key for one table: bit i = sign of the EXACT
    * integer dot product of the quantized vector with plane (table, i).
    * |w| ≤ 2^15 and |v_j| ≤ ~1e6 keep the 64-term sum ≪ 2^63. */
  def signBucket(qv: Column, table: Int, bits: Int, dim: Int): Column =
    (0 until bits).map { i =>
      when(qdot(qv, typedLit(planeWeights(table, i, dim).toSeq)) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k with multi-table probing: `tables` independent
    * hyperplane sets; a pair is a candidate if it collides in ANY
    * table (union → distinct), then scored exactly like brute force.
    * Knobs: `bits` sets bucket granularity (occupancy ~ N/2^bits per
    * table — grow bits with the corpus), `tables` trades work for
    * recall (miss probability decays exponentially in table count).
    * No stage is ever O(N²): candidates track bucket collisions. */
  def lshTopK(vectors: DataFrame, idCol: String, embCol: String,
              k: Int, bits: Int = 8, tables: Int = 2, dim: Int = 64): DataFrame = {
    // cached: feeds the key explode and both sides of the scoring join
    val v = cacheTracked(vectors
      .select(col(idCol).as("id"), quantizeChecked(col(embCol), dim).as("v"))
      .withColumn("n2", qnorm2(col("v"))))
    val keyed = v.select(col("id"), explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signBucket(col("v"), t, bits, dim).as("b"))): _*))
        .as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.b").as("b"))
    val cand = keyed.select(col("t"), col("b"), col("id").as("query_id"))
      .join(keyed.select(col("t"), col("b"), col("id").as("neighbor_id")),
        Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val scored = cand
      .join(v.select(col("id").as("query_id"), col("v").as("qv"),
        col("n2").as("qn2")), "query_id")
      .join(v.select(col("id").as("neighbor_id"), col("v").as("cv"),
        col("n2").as("cn2")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(qdot(col("qv"), col("cv")), col("qn2"), col("cn2"))
          .as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member
    * of the dedup family (exact / MinHash / SimHash / n-gram Jaccard /
    * THIS). Candidates come from hyperplane-sign LSH bucket collisions
    * (any of `tables` tables), then the EXACT integer cosine keeps
    * pairs ≥ `threshold`. Ordered (a < b) so each pair appears once.
    * Never O(N²): pair work tracks bucket occupancy (~N/2^bits per
    * table), and both the bucketing and the scoring are deterministic,
    * so the candidate SET itself is reproducible in any engine. */
  def nearDupPairs(vectors: DataFrame, idCol: String, embCol: String,
                   threshold: Double, bits: Int = 8, tables: Int = 2,
                   dim: Int = 64): DataFrame = {
    // cached: feeds the key explode and both sides of the scoring join
    val v = cacheTracked(vectors
      .select(col(idCol).as("id"), quantizeChecked(col(embCol), dim).as("v"))
      .withColumn("n2", qnorm2(col("v"))))
    val keyed = v.select(col("id"), explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signBucket(col("v"), t, bits, dim).as("b"))): _*))
        .as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.b").as("b"))
    val cand = keyed.select(col("t"), col("b"), col("id").as("a_id"))
      .join(keyed.select(col("t"), col("b"), col("id").as("b_id")), Seq("t", "b"))
      .filter(col("a_id") < col("b_id")) // ordered: half the pair work of <>
      .select("a_id", "b_id").distinct()
    cand
      .join(v.select(col("id").as("a_id"), col("v").as("av"), col("n2").as("an2")),
        "a_id")
      .join(v.select(col("id").as("b_id"), col("v").as("bv"), col("n2").as("bn2")),
        "b_id")
      .select(col("a_id"), col("b_id"),
        cosine(qdot(col("av"), col("bv")), col("an2"), col("bn2")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** IVF-style coarse assignment: exact integer label centroids
    * (component sums + counts; never a floating mean), then each
    * vector assigned to the centroid minimizing n²·d² =
    * |n·x − s|² — all integer. Overflow bound: with scale 1e4 and
    * |x| ≤ 1, each of the 64 addends is ≤ n²·(2e4)² so the sum is
    * ≤ n²·2.56e10, which stays under 2^63 only for n ≤ ~19k
    * vectors/label; at larger scale, shard labels or widen the
    * accumulator to DecimalType. */
  /** Exact integer label centroids as (cl, n, s): component sums via
    * posexplode + (label, component) partial agg, NOT `dim` separate
    * sum(element_at(v, i)) columns — 64 aggregate buffers generate a
    * Janino compile measured in seconds (pure fixed overhead), while
    * the exploded form is one tiny two-column sum — still exact
    * integer math and still map-side combinable, with shuffle volume
    * |labels|·dim per task. The array re-assembles ordered by
    * component (array_sort on the struct sorts by its first field). */
  private[sim] def labelCentroids(q: DataFrame, labelCol: String): DataFrame =
    q.select(col(labelCol).as("cl"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cl"), col("i"))
      .agg(sum(col("x")).as("si"), count(lit(1)).as("ni"))
      .groupBy(col("cl"))
      .agg(max(col("ni")).as("n"),
        transform(array_sort(collect_list(struct(col("i"), col("si")))),
          t => t.getField("si")).as("s"))
      .select(col("cl"), col("n"), col("s"))

  /** Integer centroid distance: n²·d² = |n·x − s|² (never a floating
    * mean). Expects columns `v` (quantized vector), `s`, `n`. */
  private[sim] def dist2n2: Column = aggregate(
    zip_with(col("v"), col("s"), (x, si) => {
      val d = col("n") * x - si; d * d
    }), lit(0L), _ + _)

  /** Centroid-distance OUTLIER flagging — the embedding-space noise
    * filter (mislabeled / off-topic / garbled documents sit far from
    * their cluster's center) a curation pipeline runs before
    * sampling. Each vector scores the exact integer n²·d² distance
    * to its OWN label centroid ([[labelCentroids]] — never a
    * floating mean), ranks within the label (distance desc, id asc —
    * fully deterministic), and the top 1/`denom` per label flag as
    * outliers (integer division; every label keeps at least one
    * flagged row when it has ≥ denom members, zero otherwise — a
    * pure count rule, no quantile estimation). Scale: centroids are
    * |labels| rows (broadcast); the rank is one shuffle on label —
    * at 100 TB the corpus is already partitioned by label for IVF,
    * making the window exchange-free. */
  def centroidOutliers(vectors: DataFrame, idCol: String, embCol: String,
                       labelCol: String, denom: Int = 20,
                       dim: Int = 64): DataFrame = {
    require(denom >= 2, "denom must be >= 2")
    val q = cacheTracked(vectors.select(col(idCol).as("vid"),
      col(labelCol).as("cl"),
      quantizeChecked(col(embCol), dim, 1e4).as("v")))
    val cents = labelCentroids(q, "cl")
    val scored = q.join(broadcast(cents), "cl")
      .select(col("vid"), col("cl").as("label"), dist2n2.as("d2n2"))
    val w = Window.partitionBy("label")
      .orderBy(col("d2n2").desc, col("vid").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .withColumn("n_label", count(lit(1)).over(Window.partitionBy("label")))
      .select(col("vid"), col("label"), col("d2n2"),
        // floor-division threshold: exact for any count < 2^53, and
        // identical to DuckDB's `//` integer division
        when(col("rk") <= floor(col("n_label") / lit(denom)), 1)
          .otherwise(0).as("is_outlier"))
  }

  def centroidAssign(vectors: DataFrame, idCol: String, embCol: String,
                     labelCol: String, dim: Int = 64): DataFrame = {
    // cached: feeds both the centroid aggregation and the scoring join
    val q = cacheTracked(vectors.select(col(idCol).as("vid"),
      col(labelCol).as("true_label"),
      quantizeChecked(col(embCol), dim, 1e4).as("v")))
    val cents = labelCentroids(q, "true_label")
    val scored = q.join(broadcast(cents))
      .select(col("vid"), col("true_label"), col("cl"), dist2n2.as("d2"))
    val w = Window.partitionBy("vid").orderBy(col("d2").asc, col("cl").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("vid"), col("true_label"), col("cl").as("assigned_label"),
        when(col("cl") === col("true_label"), 1).otherwise(0).as("is_match"))
  }

  /** Deterministic Lloyd's k-means over quantized embeddings — the
    * semantic-diversity primitive (cluster-balanced sampling, semantic
    * dedup buckets, topic mixing) a curation pipeline runs before
    * sampling. Fully deterministic at any parallelism:
    *   - seeds are the `k` LOWEST-id vectors (no RNG — reproducible
    *     and testable; k-means++ randomization adds recall, not
    *     correctness, and a caller can pre-shuffle ids);
    *   - distances are the integer n²·d² form ([[dist2n2]] — exact
    *     int arithmetic, no float-sum order sensitivity);
    *   - argmin ties break on cluster id.
    * Per iteration: one broadcast of k centroid rows + one shuffle for
    * the re-aggregation — at corpus scale the iteration cost is a
    * single pass regardless of k. Clusters that lose all members
    * disappear (documented Lloyd's behavior). Returns
    * (vid, cluster) — the final assignment. */
  def kMeans(vectors: DataFrame, idCol: String, embCol: String, k: Int,
             iters: Int, dim: Int = 64): DataFrame = {
    require(k >= 1 && iters >= 1, s"kMeans needs k >= 1, iters >= 1")
    val q = cacheTracked(vectors.select(col(idCol).as("vid"),
      quantizeChecked(col(embCol), dim, 1e4).as("v")))
    val seeds = q.orderBy(col("vid").asc).limit(k)
      .select(row_number().over(Window.orderBy(col("vid").asc))
        .cast("int").as("cl"),
        lit(1L).as("n"), col("v").as("s"))
    def assign(cents: DataFrame): DataFrame = {
      // dist2n2 is the n²-scaled |n·x − s|²; clusters carry DIFFERENT
      // member counts, so the cross-cluster argmin must normalize by
      // n² (labelCentroids-based assignment within equal-n labels can
      // skip this; k-means cannot — unnormalized argmin silently
      // biases toward small clusters)
      val scored = q.join(broadcast(cents))
        .select(col("vid"), col("v"), col("cl"),
          (dist2n2.cast("double") / (col("n") * col("n"))).as("d2"))
      // argmin by (d2, cl) as ONE aggregation instead of a
      // row_number window: min_by's lexicographic struct ordering is
      // the window's (d2 asc, cl asc) rank-1 exactly, and the agg
      // does partial map-side combining where the window shuffles
      // every scored row and sorts (guide §2.3) — per iteration the
      // k-way scored explosion collapses before the exchange
      scored.groupBy(col("vid")).agg(min_by(struct(col("v"), col("cl")),
          struct(col("d2"), col("cl"))).as("m"))
        .select(col("vid"), col("m.v").as("v"), col("m.cl").as("cl"))
    }
    var assigned = assign(seeds)
    for (_ <- 2 to iters) {
      // re-center on the integer per-dimension sums of the current
      // members (labelCentroids' exact shape, cluster id as label);
      // localCheckpoint caps the lineage across iterations
      val cents = labelCentroids(assigned.select(col("cl"), col("v")), "cl")
      assigned = assign(cents).localCheckpoint(true)
    }
    assigned.select(col("vid"), col("cl").as("cluster"))
  }

  /** IVF search — the pruned-scan ANN path [[centroidAssign]]'s coarse
    * quantizer exists FOR: each query probes its `nprobe` nearest
    * label centroids (exact integer n²·d², ties by label) and scores
    * exact cosine ONLY against corpus vectors in those clusters, so
    * per-query work is `nprobe/|labels|` of the corpus instead of all
    * of it. At 100 TB the corpus is partitioned/bucketed BY label, so
    * the probe list prunes entire partitions from the scan; centroids
    * are |labels| rows — always broadcast. Self-matches excluded, like
    * [[bruteForceTopK]] (which is this operator's recall oracle at
    * nprobe = |labels|). */
  def ivfSearch(vectors: DataFrame, idCol: String, embCol: String,
                labelCol: String, queryPred: Column, k: Int, nprobe: Int,
                dim: Int = 64): DataFrame = {
    // one cache, both quantizations: 1e4 for the overflow-bounded
    // centroid metric (see centroidAssign), 1e6 for the cosine
    val v = cacheTracked(vectors.select(col(idCol).as("id"),
      col(labelCol).as("cl"),
      quantizeChecked(col(embCol), dim, 1e4).as("v"),
      quantizeChecked(col(embCol), dim).as("cv"))
      .withColumn("cn2", qnorm2(col("cv"))))
    val cents = labelCentroids(v, "cl")
    val qs = v.filter(queryPred)
      .select(col("id").as("query_id"), col("v"),
        col("cv").as("qv"), col("cn2").as("qn2"))
    val pw = Window.partitionBy("query_id").orderBy(col("d2").asc, col("cl").asc)
    val probed = qs.join(broadcast(cents))
      .select(col("query_id"), col("qv"), col("qn2"), col("cl"), dist2n2.as("d2"))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nprobe)
      .select("query_id", "qv", "qn2", "cl")
    // the IVF join: candidates = probed clusters only (corpus side
    // arrives partitioned by cl; at scale this is partition pruning)
    val scored = probed.join(
        v.select(col("id").as("neighbor_id"), col("cl"), col("cv"), col("cn2")),
        Seq("cl"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(qdot(col("qv"), col("cv")), col("qn2"), col("cn2")).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Product-quantization ANN (ADC form): vectors are compressed to
    * `m` codebook codes (one per subspace) and queries score against
    * the CODES, not the vectors — at 100 TB the corpus held in memory
    * shrinks from `m·subDim` floats to `m` code bytes per vector, and
    * per-(query, vector) work becomes `m` lookup-table adds instead
    * of a `dim`-wide dot product. This is the memory story
    * IVF (scan pruning) and sign-LSH (candidate pruning) don't cover;
    * real systems stack all three (IVF-PQ).
    *
    * Determinism: all distances are exact integers on 1e4-quantized
    * values; the codebook is the subvectors of the `nTrain` smallest
    * ids (sampling init — the first step of k-means, run for zero
    * iterations so both engines derive the identical codebook);
    * argmin ties break toward the smaller code id. Codes are the
    * training vector ids (stable, need not be dense).
    *
    * Costs at scale: encode is |corpus|·m·nTrain integer ops through
    * one broadcast join (the codebook is tiny by construction); the
    * ADC lookup table is |queries|·m·nTrain rows, broadcast; scoring
    * shuffles only (query, neighbor, partial) triples that aggregate
    * to m rows per pair via partial aggregation. */
  private[sim] def subD2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** (id, j, sub): the m subvectors of every quantized vector. */
  private[sim] def pqSubs(q: DataFrame, m: Int, subDim: Int): DataFrame =
    q.select(col("id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("j"),
          slice(col("v"), j * subDim + 1, subDim).as("sub"))): _*)).as("s"))
      .select(col("id"), col("s.j").as("j"), col("s.sub").as("sub"))

  /** Codebook: subvectors of the `nTrain` smallest ids (sampling init,
    * zero k-means iterations — deterministic on both engines). */
  private[sim] def pqCodebook(subs: DataFrame, nTrain: Int): DataFrame =
    subs.filter(col("id") < nTrain)
      .select(col("j"), col("id").as("c"), col("sub").as("cw"))

  /** Encode: nearest codeword per (vector, subspace), ties → smaller c. */
  private[sim] def pqCodes(subs: DataFrame, codebook: DataFrame): DataFrame = {
    val ew = Window.partitionBy("id", "j").orderBy(col("d2").asc, col("c").asc)
    subs.join(broadcast(codebook), Seq("j"))
      .select(col("id"), col("j"), col("c"),
        subD2(col("sub"), col("cw")).as("d2"))
      .withColumn("rn", row_number().over(ew)).filter(col("rn") === 1)
      .select(col("id"), col("j"), col("c").as("code"))
  }

  /** ADC lookup table: query-subvector ↔ codeword partial distances
    * (queryPred selects query rows by the internal `id` column). */
  private[sim] def pqLut(subs: DataFrame, codebook: DataFrame,
                    queryPred: Column): DataFrame =
    subs.filter(queryPred)
      .select(col("id").as("query_id"), col("j"), col("sub").as("qsub"))
      .join(broadcast(codebook), Seq("j"))
      .select(col("query_id"), col("j"), col("c"),
        subD2(col("qsub"), col("cw")).as("pd2"))

  private[sim] def adcRank(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_d2").asc, col("neighbor_id").asc)
    joined
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"))
      .agg(sum(col("pd2")).as("adc_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc_d2", "rank")
  }

  def pqTopK(vectors: DataFrame, idCol: String, embCol: String,
             queryPred: Column, k: Int, m: Int = 8, subDim: Int = 8,
             nTrain: Int = 16): DataFrame = {
    val q = cacheTracked(vectors.select(col(idCol).as("id"),
      quantizeChecked(col(embCol), m * subDim, 1e4).as("v")))
    val subs = pqSubs(q, m, subDim)
    val codebook = pqCodebook(subs, nTrain)
    val codes = pqCodes(subs, codebook)
    val lut = pqLut(subs, codebook, queryPred)
    adcRank(codes.join(broadcast(lut),
      codes("j") === lut("j") && lut("c") === codes("code")), k)
  }

  /** IVF-PQ — the stacked form real vector stores deploy: IVF prunes
    * WHICH vectors a query touches (only the `nprobe` nearest
    * clusters), PQ shrinks WHAT is touched (m code bytes instead of
    * `dim` floats). At 100 TB the corpus codes are
    * partitioned/bucketed by cluster label, the probe list prunes
    * partitions from the scan, and the scored representation is the
    * compressed one — both reductions multiply. With
    * `nprobe = |labels|` this degrades to exactly [[pqTopK]]
    * (spec-pinned), the same way [[ivfSearch]] degrades to
    * [[bruteForceTopK]]. */
  def ivfPqTopK(vectors: DataFrame, idCol: String, embCol: String,
                labelCol: String, queryPred: Column, k: Int, nprobe: Int,
                m: Int = 8, subDim: Int = 8, nTrain: Int = 16): DataFrame = {
    val q = cacheTracked(vectors.select(col(idCol).as("id"),
      col(labelCol).as("cl"),
      quantizeChecked(col(embCol), m * subDim, 1e4).as("v")))
    val subs = pqSubs(q, m, subDim)
    val codebook = pqCodebook(subs, nTrain)
    val codes = pqCodes(subs, codebook)
      .join(q.select(col("id"), col("cl")), Seq("id"))
    val lut = pqLut(subs, codebook, queryPred)
    // IVF probe on the full vectors (integer n²·d² centroid metric)
    val cents = labelCentroids(q, "cl")
    val pw = Window.partitionBy("query_id").orderBy(col("d2").asc, col("cl").asc)
    val probed = q.filter(queryPred)
      .select(col("id").as("query_id"), col("v"))
      .join(broadcast(cents))
      .select(col("query_id"), col("cl"), dist2n2.as("d2"))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nprobe)
      .select(col("query_id").as("p_query_id"), col("cl"))
    // candidates: codes of probed clusters only, then ADC as in pqTopK
    adcRank(codes.join(broadcast(probed), Seq("cl"))
      .join(broadcast(lut),
        codes("j") === lut("j") && lut("c") === codes("code") &&
          col("p_query_id") === lut("query_id")), k)
  }
}
