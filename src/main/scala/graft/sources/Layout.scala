package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout control for scan pruning — the write-side half of
  * "filters reach the scan".
  *
  * Parquet skips row groups by min/max statistics, and a linear sort
  * clusters ONLY its leading column: a predicate on the second column
  * still reads every file. Z-ORDERING sorts by the Morton
  * (bit-interleaved) key of both columns, so each file covers a small
  * rectangle of the (a, b) space and min/max pruning works for
  * predicates on EITHER column — the standard lakehouse layout
  * technique (Delta OPTIMIZE ZORDER BY, Iceberg sort orders) expressed
  * as plain Spark: range-partition + sort on a pure integer Column
  * expression, no engine extension needed.
  *
  * At 100 TB this is the difference between "query on the non-leading
  * dimension scans the corpus" and "scans ~√files": layout is chosen
  * at WRITE time, once, for all downstream readers.
  */
object Layout {

  /** Bit-spread of a 32-bit value into even bit positions of a long
    * (classic Morton magic masks, as Column arithmetic — codegen'd,
    * no UDF). Inputs must be non-negative and < 2^31. */
  private def spread(c: Column): Column = {
    var x = c.cast(LongType)
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton interleave: bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1 — points close in (a, b) are close in key order.
    * Out-of-range inputs fail LOUDLY: the magic masks drop high bits,
    * so a negative or >= 2^31 coordinate would silently produce an
    * arbitrary key and the written layout would lose all pruning —
    * the same silent-degradation class `quantizeChecked` guards. */
  def mortonKey(a: Column, b: Column): Column = {
    def checked(c: Column): Column =
      when(c >= 0 && c < (1L << 31), c)
        .otherwise(raise_error(concat(
          lit("mortonKey input out of range [0, 2^31): "), c.cast("string"))))
    spread(checked(a)).bitwiseOR(shiftleft(spread(checked(b)), 1))
  }

  /** N-column Morton interleave (Delta `ZORDER BY (c1, ..., cn)`):
    * bit p of column j lands at position `p * n + j`, so each file of
    * a range-partitioned sort covers a small hyper-rectangle and
    * min/max pruning works on ANY of the n dimensions. Each column
    * gets `63 / n` bits (the key stays a positive long); inputs out
    * of `[0, 2^(63/n))` fail loudly like [[mortonKey]]. The bit
    * gather is a plain Column expression tree (~63 codegen'd terms
    * total) — write-time cost only. Two columns should prefer
    * [[mortonKey]]'s magic-mask fast path. */
  def mortonKeyN(cols: Seq[Column]): Column = {
    val n = cols.length
    require(n >= 2 && n <= 6, s"z-order needs 2-6 columns, got $n")
    val bits = 63 / n
    val cap = 1L << bits
    cols.zipWithIndex.map { case (c, j) =>
      val cc = when(c >= 0 && c < cap, c.cast(LongType))
        .otherwise(raise_error(concat(
          lit(s"mortonKeyN input out of range [0, 2^$bits): "),
          c.cast("string"))))
      (0 until bits).map(p =>
          shiftleft(shiftright(cc, p).bitwiseAND(lit(1L)), p * n + j))
        .reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Scala twin of [[mortonKeyN]] — bounds unchecked, test use. */
  def mortonKeyNRef(vs: Seq[Long]): Long = {
    val n = vs.length
    val bits = 63 / n
    vs.zipWithIndex.map { case (v, j) =>
      (0 until bits).map(p => ((v >> p) & 1L) << (p * n + j)).reduce(_ | _)
    }.reduce(_ | _)
  }

  /** Scala twin of [[mortonKey]] for property tests / driver-side
    * checks — same magic-mask pipeline. */
  def mortonKeyRef(a: Long, b: Long): Long = {
    def sp(v: Long): Long = {
      var x = v
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      (x | (x << 1)) & 0x5555555555555555L
    }
    sp(a) | (sp(b) << 1)
  }

  /** Greedy sequence packing for training shards: assign each
    * document a shard of ~`budgetTokens`, packing WITHIN
    * `numBuckets` independent arithmetic buckets (`id % numBuckets`)
    * so the cumulative sums are per-bucket windows — NO global sort
    * exists at any scale; bucket count is the write parallelism.
    * A document whose cumulative range straddles a boundary belongs
    * to the shard where its range STARTS (shards overflow by < 1
    * document — the greedy streaming-friendly rule every sharded
    * tokenizer pipeline uses). Shard ids are `(bucket, seq)`
    * flattened as `bucket * 1e9 + seq`; `idCol` must be integral,
    * UNIQUE, and is the ordering key within each bucket — a duplicate
    * id would make the cumulative sums order-dependent and shard
    * assignment nondeterministic under re-execution. */
  def packShards(docs: DataFrame, idCol: String, tokens: Column,
                 numBuckets: Int, budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Long.MinValue, -1)
    // a bucket whose cumulative tokens exceed 1e9 * budget would wrap
    // into the NEXT bucket's id range and shards would silently merge —
    // plausible at the 100 TB design point with small budgets or few
    // buckets, so the flattening fails loudly at write time instead
    val seq = floor(col("cum_before") / budgetTokens).cast(LongType)
    val checkedSeq = when(seq >= 0 && seq < lit(SeqRange), seq)
      .otherwise(raise_error(concat(
        lit(s"packShards: shard seq exceeds the $SeqRange id range " +
          "(raise budgetTokens or numBuckets): "), seq.cast("string"))))
    docs.select(col(idCol), tokens.as("n_tokens"))
      .withColumn("bucket", pmod(col(idCol), lit(numBuckets)).cast(LongType))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("shard_id", col("bucket") * lit(SeqRange) + checkedSeq)
  }

  /** Per-bucket shard-id range under the flattened
    * `bucket * SeqRange + seq` encoding. */
  val SeqRange = 1000000000L

  /** Write `df` z-ordered on (a, b) into `numFiles` parquet files:
    * partition by EXACT, z-cell-aligned split points of the Morton
    * key (balanced by a full histogram, not a sample), sort within
    * partitions, drop the key. Readers filter on either column and
    * row-group min/max does the pruning. */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
                    numFiles: Int): Unit =
    writeZOrderedBy(df, path, mortonKey(a, b), numFiles)

  /** [[writeZOrdered]] for 1 or 3+ dimensions: one column degenerates
    * to a plain range-clustered sort on that (integral) column — the
    * valid single-key OPTIMIZE spec — and 3+ interleave via
    * [[mortonKeyN]]. */
  /** The z-order sort key for a column list — single column as-is,
    * two via the magic-mask fast path, 3+ interleaved. Shared by the
    * full rewrite ([[writeZOrderedN]]) and the WITHIN-BUCKET sort of
    * a bucketed OPTIMIZE (where a cross-partition range sort would
    * destroy the bucket routing, but a per-partition sort clusters
    * each bucket's files/row-groups for min/max pruning for free). */
  def zKeyOf(cols: Seq[Column]): Column = cols match {
    case Seq(only) => only.cast(LongType)
    case Seq(a, b) => mortonKey(a, b)
    case more      => mortonKeyN(more)
  }

  def writeZOrderedN(df: DataFrame, path: String, cols: Seq[Column],
                     numFiles: Int): Unit =
    writeZOrderedBy(df, path, zKeyOf(cols), numFiles)

  /** The write: exact histogram split + one hash-routed shuffle.
    *
    * `repartitionByRange` would be the obvious spelling, but its split
    * points come from a SAMPLE: they land a few hundred keys off the
    * balanced ideal, and a split point that is not on a z-cell edge
    * makes the two adjacent files straddle a cell — each straddling
    * file's min/max spread in SOME dimension jumps from a sub-cube to
    * nearly the full range, and pruning on that dimension dies for
    * those files. So split points are computed EXACTLY instead, and
    * snapped to z-cell edges:
    *
    *  1. min/max of the key (column-pruned scan of the key inputs);
    *  2. a full histogram over `key >> shift` — shift chosen so the
    *     occupied key range spans ≤ ~64 buckets per file, i.e. each
    *     bucket is an aligned power-of-2 z-cell and a file boundary
    *     can sit within 1/64th of a file of the balanced ideal while
    *     staying ON a cell edge (the histogram is a ≤128k-group agg
    *     on a long — metadata-scale at any data size);
    *  3. each row's file id is an O(1) array lookup on its bucket;
    *     rows are routed to their file by hash-partitioning on a
    *     driver-precomputed PREIMAGE of the file id (an int `v` with
    *     `murmur3(v) % numFiles == fileId` — searched in microseconds),
    *     so the shuffle places each file's rows exactly, with no
    *     second sampling pass and no collisions.
    *
    * Deterministic (no sample → same input, same layout), three scans
    * total (min/max, histogram, shuffle+write) of which the first two
    * read only the z-key's input columns. The balanced-ideal deviation
    * is bounded by one bucket (= file/64), vs unbounded sampling error
    * before. */
  private def writeZOrderedBy(df: DataFrame, path: String, key: Column,
                              numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val keyed = df.withColumn("__z", key)
    val mm = keyed.agg(min(col("__z")), max(col("__z"))).first()
    if (mm.isNullAt(0)) { // empty input: schema-only write
      keyed.drop("__z").write.mode("overwrite").parquet(path)
      return
    }
    val mn = mm.getLong(0)
    val mx = mm.getLong(1)
    // shift so the occupied range fits the bucket budget; buckets are
    // aligned 2^shift-wide z-cells
    val targetBuckets = math.min(math.max(numFiles.toLong * 64L, 64L), 1L << 17)
    var shift = 0
    while (shift < 63 && ((mx >> shift) - (mn >> shift)) >= targetBuckets)
      shift += 1
    val minBucket = mn >> shift
    val nBuckets = ((mx >> shift) - minBucket + 1).toInt
    val bucketOf = (shiftright(col("__z"), shift) - minBucket).cast("int")
    val hist = keyed.select(bucketOf.as("__b"))
      .groupBy("__b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = hist.map(_._2).sum
    // greedy: a bucket joins the open file; the file closes (at the
    // bucket's trailing z-cell edge) once it holds its balanced share
    val bucketToPid = new Array[Int](nBuckets)
    var pid = 0
    var cum = 0L
    var hi = 0
    for (b <- 0 until nBuckets) {
      bucketToPid(b) = pid
      if (hi < hist.length && hist(hi)._1 == b) { cum += hist(hi)._2; hi += 1 }
      while (pid < numFiles - 1 && cum >= (pid + 1).toLong * total / numFiles)
        pid += 1
    }
    // hash-route exactly: v_i is a murmur3 preimage of file id i under
    // Spark's HashPartitioning (seed 42), so repartition(n, __h) sends
    // file i's rows to partition i and nowhere else. One ascending
    // sweep keeps the first v hitting each residue — coupon-collector
    // O(n ln n) hash calls total (a per-residue restart would be
    // O(n^2), minutes at 100k files)
    val preimage = new Array[Int](numFiles)
    val taken = new Array[Boolean](numFiles)
    var found = 0
    var v = 0
    while (found < numFiles) {
      val r = java.lang.Math.floorMod(
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42), numFiles)
      if (!taken(r)) { taken(r) = true; preimage(r) = v; found += 1 }
      v += 1
    }
    val route = typedLit(bucketToPid.map(preimage).toSeq)
    keyed
      .withColumn("__h", element_at(route, bucketOf + 1))
      .repartition(numFiles, col("__h"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__h")
      .write.mode("overwrite").parquet(path)
    ()
  }
}
