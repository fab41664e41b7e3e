package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.read.HasPartitionKey
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Hash-bucketed table layout + storage-partitioned joins (SPJ) for
  * `graft-manifest` tables — the "pay the shuffle once at write"
  * contract of classic bucketed tables, on the manifest layer.
  *
  * Declared at CREATE with
  * `TBLPROPERTIES ('bucketBy' = '<n>,<col>[,<col2>...]')`:
  *
  *   - every bucketed batch write routes through [[routed]]: the
  *     per-row flat bucket index (`pmod(murmur3_42(k_i), n)`
  *     Horner'd) passes through as the shuffle partition id
  *     VERBATIM, so each task writes the rows of exactly one bucket
  *     group and the task's partition index IS the flat index;
  *   - each bucketed write records an EXPLICIT file → bucket map in
  *     the dir's `_bucketed` sidecar (see [[writeMarkerFiles]]), so
  *     bucket identity never depends on Spark's part-file naming
  *     surviving version upgrades or custom committers;
  *   - the scan groups planned files by bucket across ALL batches and
  *     reports `KeyGroupedPartitioning` with one `bucket(n, k_i)`
  *     transform per key, so a join of two graft tables bucketed the
  *     same way — or an aggregation on the bucket columns — plans
  *     with NO shuffle on the bucketed side(s) (Spark's
  *     storage-partitioned join, v2.bucketing);
  *   - [[graft.plans.GraftCatalog]] doubles as the FunctionCatalog
  *     that resolves the `bucket` transform, which is how Spark
  *     proves both sides cluster identically (and can shuffle a
  *     NON-bucketed side into this partitioning).
  *
  * At 100 TB this is the difference between shuffling the fact table
  * on every key join and never shuffling it again after ingest.
  *
  * Composition scope (round 10): the FULL DML surface is
  * bucket-preserving — INSERT/COPY, INSERT OVERWRITE, TRUNCATE,
  * MERGE / UPDATE / DELETE (copy-on-write AND merge-on-read DV),
  * OPTIMIZE (incremental, healing foreign batches; ZORDER BY sorts
  * WITHIN buckets), the native V1 batch write, the streaming sink
  * (single-key epochs route through the write's required
  * distribution, verified per row; MULTI-key epochs route TASK-side
  * through the rolling per-bucket writer — see
  * GraftManifestRollingBucketWriter), and SHALLOW CLONE (markers are
  * per-dir, so the fork inherits the layout). `columnMapping`
  * composes (the spec's keys are LOGICAL; markers and the Sinks
  * layer carry their immutable PHYSICAL twins, so renames never
  * detach the layout) and `deletionVectors` composes (a DV delete
  * moves no rows; a DV update's appended batch bucket-routes like
  * any other write). ALTER COLUMN TYPE on a bucket key (round 10)
  * widens via the layout GENERATION (murmur3 of the same value
  * differs across types, so the widen bumps [[Spec.gen]]: stale
  * markers degrade the report, OPTIMIZE heals hashed under the
  * widened type). Remaining refusal: DROP COLUMN of a bucket key.
  * Runtime file
  * pruning on bucketed scans filters files WITHIN each reported
  * bucket group and keeps empty groups present, so the reported
  * partitioning stays sound. Static stats/bloom skipping applies
  * before grouping — skipped files only shrink their bucket's group.
  */
object Bucketing {

  /** `'bucketBy' = '<n>,<col>[,<col2>...]'`: `n` buckets PER KEY —
    * multi-key tables lay out the PRODUCT grid (n^k groups), because
    * Spark's SPJ machinery requires every reported partition
    * transform to reference exactly one column
    * (KeyGroupedShuffleSpec asserts one leaf per expression), so a
    * composite key is expressed as one `bucket(n, k_i)` transform
    * per key. Keys are LOGICAL column names at the catalog/scan
    * layer; the Sinks/file layer receives the PHYSICAL twins on
    * columnMapping tables. */
  /** `gen` is the LAYOUT GENERATION: part of the rendered identity
    * (and so of every marker header) but not of the routing
    * arithmetic. It exists for the one metadata change that leaves
    * `n` and the key NAMES intact while silently changing the
    * routing FUNCTION — widening a bucket key's type (murmur3 hashes
    * int 5 and bigint 5 differently). The retype bumps `gen`, every
    * existing dir's marker header mismatches, the scan degrades to a
    * shuffle (correct results, never a stale grouping), and the next
    * OPTIMIZE — whose `_optimized` stamp also carries the render —
    * rewrites every dir hashed under the widened type and stamps the
    * new generation. The same degrade→heal lifecycle as REBUCKET. */
  final case class Spec(n: Int, keys: Seq[String], gen: Int = 0) {
    def key: String = keys.head // single-key convenience
    /** Product-grid size: the number of bucket groups (and of write
      * partitions) — n for one key, n² for two, … */
    def totalGroups: Int = BigInt(n).pow(keys.size).toInt
  }

  def parse(s: String): Spec = {
    val (main, gen) = s.split(';') match {
      case Array(m)    => (m, 0)
      case Array(m, g) =>
        (m, g.trim.stripPrefix("gen=").toIntOption.filter(_ > 0)
          .getOrElse(throw new IllegalArgumentException(
            s"bucketBy generation suffix must be ';gen=<positive int>', " +
              s"got '$s'")))
      case _ => throw new IllegalArgumentException(
        s"bucketBy has more than one ';' suffix: '$s'")
    }
    val parts = main.split(',').map(_.trim)
    require(parts.length >= 2 && parts(0).toIntOption.exists(_ >= 2),
      s"bucketBy must be '<numBuckets>,<column>[,<column2>...]' with " +
        s"numBuckets >= 2, got '$s'")
    require(parts.tail.forall(_.nonEmpty), s"bucketBy has an empty column: '$s'")
    require(parts.tail.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
      .length == parts.length - 1, s"bucketBy repeats a column: '$s'")
    require(BigInt(parts(0).toInt).pow(parts.length - 1) <= (1 << 16),
      s"bucketBy group grid capped at 65536 " +
        s"(${parts(0)}^${parts.length - 1} buckets), got '$s'")
    Spec(parts(0).toInt, parts.tail.toSeq, gen)
  }

  def render(s: Spec): String =
    s"${s.n},${s.keys.mkString(",")}" +
      (if (s.gen > 0) s";gen=${s.gen}" else "")

  /** ONE key column's bucket — EXACTLY Spark's single-column
    * `pmod(hash(col), n)` (Murmur3, seed 42): the same function the
    * single-key write's `repartition(n, col)` routes with, the
    * multi-key flat index composes from, and [[BucketBound]] exposes
    * to Spark's SPJ planner. */
  def bucketOf(value: Any, dt: DataType, n: Int): Int = {
    val h = Murmur3HashFunction.hash(value, dt, 42L).toInt
    ((h % n) + n) % n
  }

  /** The spec's PHYSICAL twin under a column mapping — what the file
    * layer (routing, markers) carries; identity when `cols` is
    * empty. A bucket key missing from the mapping is corrupt table
    * state and fails loudly at every call site identically. */
  def physical(spec: Spec, cols: Seq[SchemaLog.Col]): Spec =
    if (cols.isEmpty) spec
    else spec.copy(keys = spec.keys.map(k =>
      cols.find(_.logical.equalsIgnoreCase(k)).map(_.physical)
        .getOrElse(throw new IllegalArgumentException(
          s"bucketBy key '$k' is not in the table's column mapping " +
            s"(have: ${cols.map(_.logical).mkString(", ")})"))))

  /** Flat group index of a per-key bucket vector — Horner over the
    * product grid: `((b₁·n)+b₂)·n+…`. The write stage's partition
    * index IS this number, and the `_bucketed` map records it. */
  def flatten(dims: Seq[Int], spec: Spec): Int =
    dims.foldLeft(0)((acc, b) => acc * spec.n + b)

  /** Flat index → per-key bucket vector (the partition KEY Spark
    * groups on: one value per reported `bucket(n, k_i)` transform). */
  def dims(flat: Int, spec: Spec): Seq[Int] = {
    var f = flat
    val out = new Array[Int](spec.keys.size)
    var i = spec.keys.size - 1
    while (i >= 0) { out(i) = f % spec.n; f /= spec.n; i -= 1 }
    out.toSeq
  }

  /** Route `df` so the write stage's partition index EQUALS the flat
    * bucket index: the per-row index (`pmod(hash(k_i), n)` Horner'd
    * over the keys — identical to [[bucketOf]]/[[flatten]]) passes
    * through as the partition id VERBATIM
    * ([[org.apache.spark.sql.catalyst.expressions
    * .DirectShufflePartitionID]] → ShufflePartitionIdPassThrough).
    *
    * Deliberately NOT `repartition(n, cols)`: the HashPartitioning
    * spelling has two silent failure modes — EnsureRequirements can
    * ELIDE the exchange when the child already carries
    * HashPartitioning(keys, n) (an aggregation on the bucket keys
    * under shuffle.partitions == n) and AQE may then COALESCE that
    * satisfying upstream exchange, leaving one file holding several
    * buckets' rows under a one-bucket marker (silently dropped SPJ
    * matches). The pass-through requirement is never satisfied by an
    * upstream hash exchange (no elision) and its REPARTITION_BY_NUM
    * origin is never coalesced — the invariant holds by plan
    * construction, with no session-conf gymnastics. (The streaming
    * sink, which cannot use this operator, verifies every row's
    * bucket task-side instead.) */
  def routed(df: org.apache.spark.sql.DataFrame, spec: Spec)
    : org.apache.spark.sql.DataFrame = {
    // catalyst expressions built DIRECTLY (a functions._ Column rides
    // a ColumnNode wrapper that does not survive analysis inside a
    // hand-built plan): pmod(murmur3_42(k_i), n) Horner'd — the exact
    // bucketOf/flatten arithmetic, codegen'd per row
    import org.apache.spark.sql.catalyst.expressions.{Add, Literal, Multiply, Murmur3Hash, Pmod}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val flat = spec.keys
      .map(k => Pmod(new Murmur3Hash(Seq(UnresolvedAttribute.quoted(k))),
        Literal(spec.n)): org.apache.spark.sql.catalyst.expressions.Expression)
      .reduceLeft((a, b) => Add(Multiply(a, Literal(spec.n)), b))
    val plan = org.apache.spark.sql.catalyst.plans.logical
      .RepartitionByExpression(
        Seq(org.apache.spark.sql.catalyst.expressions
          .DirectShufflePartitionID(flat)),
        df.queryExecution.analyzed,
        Some(spec.totalGroups))
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(df.sparkSession, plan)
  }

  /** Bucket id from a written part-file name (`part-00003-uuid…` →
    * bucket 3; the streaming sink's `part-3.parquet` → bucket 3):
    * the repartition's partition index IS the bucket, and Spark's
    * writers put that index first in the file name. FALLBACK only —
    * dirs written since round 9 carry the explicit file → bucket map
    * in their `_bucketed` sidecar, which [[fileBuckets]] prefers. */
  private val PartIdx = "part-(\\d+)[-.].*".r
  def bucketOfFile(fileName: String): Option[Int] = fileName match {
    case PartIdx(i) => i.toIntOption
    case _          => None
  }

  /** All files of one bucket group across every committed batch —
    * the unit of SPJ parallelism. `bucketId` is the FLAT product
    * index; `dims` its per-key vector, which is the partition key
    * Spark groups on (one value per reported `bucket(n, k_i)`
    * transform). `files` may be EMPTY: runtime filtering prunes
    * files within a group but must keep the group present (the
    * reported partition count is part of the plan). */
  final case class BucketPartition(bucketId: Int, dims: Seq[Int],
                                   files: Array[ManifestFilePartition])
    extends InputPartition with HasPartitionKey {
    override def partitionKey(): InternalRow =
      new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(dims.map(b => b: Any).toArray)
  }

  /** Per-batch-dir LAYOUT MARKER (`_bucketed`): written ONLY by the
    * bucket-routing write paths, and demanded by the scan before it
    * reports partitioning. Without it, ANY spark write's `part-i`
    * file names would parse as bucket ids while the rows are NOT
    * bucket-routed — the scan would report a clustering that is
    * false and joins would silently drop matches.
    *
    * Format: line 1 is `render(spec)` (with PHYSICAL key names on
    * columnMapping tables — physical ids never change, so a rename
    * cannot orphan the marker); every following line is
    * `<fileName>\t<bucketId>` — the explicit map recorded AT WRITE
    * TIME, when the partition-index ↔ bucket equivalence provably
    * held, so reads never re-derive bucket identity from file-name
    * conventions. Markers without map lines (round-8 dirs) fall back
    * to [[bucketOfFile]] name parsing. */
  val Marker = "_bucketed"

  /** Bare marker — the EMPTY-dir case (TRUNCATE, a nothing-matched
    * rewrite): trivially bucket-consistent, no files to map. */
  def writeMarker(dir: String, spec: Spec): Unit =
    graft.util.AtomicText.writeAtomically(s"$dir/$Marker", render(spec) + "\n")

  /** Marker with an EXPLICIT file → bucket map (ADVICE round 8: name
    * parsing is a convention, not a contract — freeze the
    * interpretation at write time). Used right after a bucket-routed
    * write: lists the dir's data files and records each one's bucket
    * from the partition index in its name, failing loudly if any
    * name does not parse (a bucket-routed write always names its
    * files by partition index — an unparseable name here means the
    * write was NOT routed and the marker must not be written). */
  def writeMarkerWithFiles(spark: org.apache.spark.sql.SparkSession,
                           dir: String, spec: Spec): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && n.endsWith(".parquet") &&
            !n.startsWith(".") && !n.startsWith("_")
        }
        .map { st =>
          val n = st.getPath.getName
          val b = bucketOfFile(n).getOrElse(throw new IllegalStateException(
            s"bucketed write produced unmappable file name $n under $dir"))
          require(b < spec.totalGroups,
            s"file $n parses to bucket $b >= ${spec.totalGroups} groups — " +
              "the write was not bucket-routed")
          n -> b
        }
    writeMarkerFiles(dir, spec, entries)
  }

  /** Marker from KNOWN (fileName, bucketId) pairs — the streaming
    * sink's commit path, where each epoch file's bucket is its
    * writer task's partition id. */
  def writeMarkerFiles(dir: String, spec: Spec,
                       entries: Seq[(String, Int)]): Unit =
    graft.util.AtomicText.writeAtomically(s"$dir/$Marker",
      (render(spec) +: entries.sortBy(_._1).map { case (f, b) => s"$f\t$b" })
        .mkString("", "\n", "\n"))

  def markerMatches(dir: String, spec: Spec): Boolean =
    graft.util.AtomicText.readLines(s"$dir/$Marker").headOption
      .contains(render(spec))

  /** The dir's file → bucket resolver under `spec`: None when the
    * dir carries no matching layout marker (FOREIGN layout — its
    * names prove nothing about its rows). With a matching marker,
    * the returned function answers from the explicit map when the
    * marker carries one (a file ABSENT from the map is foreign →
    * None), and falls back to name parsing for round-8 bare
    * markers. */
  def fileBuckets(dir: String, spec: Spec): Option[String => Option[Int]] = {
    val lines = graft.util.AtomicText.readLines(s"$dir/$Marker")
    if (!lines.headOption.contains(render(spec))) None
    else {
      val mapped = lines.drop(1).flatMap { l =>
        val i = l.indexOf('\t')
        if (i <= 0) None
        else l.substring(i + 1).toIntOption.map(l.substring(0, i) -> _)
      }.toMap
      if (mapped.nonEmpty) Some(mapped.get _)
      else Some(bucketOfFile _)
    }
  }

  /** Group per-file partitions by bucket id; None — report unknown
    * partitioning, never a wrong one — when any file's BATCH DIR
    * lacks a matching layout marker or any file fails to resolve.
    * `requiredKeys` (runtime filtering) pads the result with EMPTY
    * groups so the reported partition-key set never shrinks out
    * from under the planner. `resolverOf` lets the scan share one
    * marker-read cache across pruning and grouping (the default
    * reads per call). */
  def groupByBucket(parts: Array[InputPartition], spec: Spec,
                    requiredKeys: Option[Seq[Int]] = None,
                    resolverOf: Option[String => Option[String => Option[Int]]] = None)
    : Option[Array[InputPartition]] = {
    val files = parts.map {
      case f: ManifestFilePartition => f
      case _                        => return None
    }
    // per-dir marker reads fan out over the shared namespace pool —
    // a 1000-dir table must not pay 1000 SEQUENTIAL object-store
    // round trips at plan time
    val dirs = files.map(f =>
      f.filePath.substring(0, f.filePath.lastIndexOf('/'))).distinct.toSeq
    val resolve = resolverOf.getOrElse {
      val m = GraftManifestSource
        .parallelMap(dirs)(d => d -> fileBuckets(d, spec)).toMap
      m.apply _
    }
    val withBucket = files.map { f =>
      val dir = f.filePath.substring(0, f.filePath.lastIndexOf('/'))
      val name = f.filePath.substring(f.filePath.lastIndexOf('/') + 1)
      resolve(dir).flatMap(_(name)) match {
        case Some(b) if b < spec.totalGroups => b -> f
        case _                               => return None
      }
    }
    val grouped = withBucket.groupBy(_._1)
    val keys = requiredKeys match {
      case Some(req) =>
        // runtime filtering must PRESERVE the reported key set —
        // a bucket whose files all pruned still plans, empty
        if (!grouped.keySet.subsetOf(req.toSet)) return None
        req.sorted
      case None => grouped.keys.toSeq.sorted
    }
    Some(keys.map(b => BucketPartition(b, dims(b, spec),
      grouped.getOrElse(b, Array.empty).map(_._2)): InputPartition).toArray)
  }

  /** The `bucket` function [[graft.plans.GraftCatalog]] serves —
    * Spark resolves the table-reported `bucket(n, cols...)` transform
    * against it and uses (canonicalName, numBuckets, columns)
    * equality to prove two scans cluster identically. `produceResult`
    * computes the same routing the writer used, so Spark may also
    * SHUFFLE a non-bucketed join side into this partitioning
    * (spark.sql.sources.v2.bucketing.shuffle.enabled). */
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): graft-manifest hash bucket " +
        "(pmod(murmur3_42(col), numBuckets)); composite keys report " +
        "one bucket transform per column (product grid)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets, col) — composite keys bind one " +
          s"transform per column; got ${inputType.simpleString}")
      BucketBound(inputType.fields(1).dataType)
    }
  }

  final case class BucketBound(keyType: DataType)
    extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${keyType.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      Integer.valueOf(bucketOf(input.get(1, keyType), keyType, n))
    }
  }
}
