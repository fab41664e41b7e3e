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
  * Declared at CREATE with `TBLPROPERTIES ('bucketBy' = '<n>,<col>')`:
  *
  *   - every INSERT/COPY batch `repartition(n, col)`s before writing,
  *     so each task writes the rows of exactly one bucket and the
  *     part-file INDEX in the file name IS the bucket id
  *     (`HashPartitioning` routes row → partition
  *     `pmod(murmur3(col, seed 42), n)` — the same function
  *     [[GraftBucketFunction]] exposes to Spark);
  *   - the scan groups planned files by bucket across ALL batches and
  *     reports `KeyGroupedPartitioning(bucket(n, col))`, so a join of
  *     two graft tables bucketed the same way — or an aggregation on
  *     the bucket column — plans with NO shuffle on the bucketed
  *     side(s) (Spark's storage-partitioned join, v2.bucketing);
  *   - [[graft.plans.GraftCatalog]] doubles as the FunctionCatalog
  *     that resolves the `bucket` transform, which is how Spark
  *     proves both sides cluster identically.
  *
  * At 100 TB this is the difference between shuffling the fact table
  * on every key join and never shuffling it again after ingest.
  *
  * Scope (round 8): append-shaped writes only — MERGE / UPDATE /
  * DELETE / OPTIMIZE refuse on bucketed tables (a rewrite that does
  * not preserve bucketing would silently break the layout invariant;
  * bucket-preserving rewrites are the follow-up). Runtime file
  * pruning is disabled on bucketed scans: a filter arriving after
  * planning could change the reported group count out from under the
  * planner. Static stats/bloom skipping still applies — skipped
  * files only shrink their bucket's group.
  */
object Bucketing {

  /** `'bucketBy' = '<n>,<col>'`. */
  final case class Spec(n: Int, key: String)

  def parse(s: String): Spec = {
    val parts = s.split(',').map(_.trim)
    require(parts.length == 2 && parts(0).toIntOption.exists(_ >= 2),
      s"bucketBy must be '<numBuckets>,<column>' with numBuckets >= 2, " +
        s"got '$s'")
    require(parts(0).toInt <= (1 << 16),
      s"bucketBy numBuckets capped at 65536, got ${parts(0)}")
    Spec(parts(0).toInt, parts(1))
  }

  def render(s: Spec): String = s"${s.n},${s.key}"

  /** Row → bucket, EXACTLY Spark's `HashPartitioning` routing
    * (`pmod(murmur3(value, seed 42), n)`) — what makes the write-side
    * `repartition(n, col)` layout and this function's answers agree,
    * and therefore makes the reported partitioning sound. */
  def bucketOf(value: Any, dt: DataType, n: Int): Int = {
    val h = Murmur3HashFunction.hash(value, dt, 42L).toInt
    ((h % n) + n) % n
  }

  /** Bucket id from a written part-file name (`part-00003-...` →
    * bucket 3): the repartition's partition index IS the bucket, and
    * Spark's writer puts that index first in the file name. None for
    * files not written through the bucketed path. */
  private val PartIdx = "part-(\\d+)-.*".r
  def bucketOfFile(fileName: String): Option[Int] = fileName match {
    case PartIdx(i) => i.toIntOption
    case _          => None
  }

  /** All files of one bucket across every committed batch — the unit
    * of SPJ parallelism, keyed by the bucket id Spark groups on. */
  final case class BucketPartition(bucketId: Int,
                                   files: Array[ManifestFilePartition])
    extends InputPartition with HasPartitionKey {
    override def partitionKey(): InternalRow =
      new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](bucketId))
  }

  /** Per-batch-dir LAYOUT MARKER (`_bucketed`, content `n,key`):
    * written ONLY by the bucket-routing write paths, and demanded by
    * the scan before it reports partitioning. Without it, ANY spark
    * write's `part-i` file names would parse as bucket ids while the
    * rows are NOT bucket-routed — the scan would report a clustering
    * that is false and joins would silently drop matches. */
  val Marker = "_bucketed"

  def writeMarker(dir: String, spec: Spec): Unit =
    graft.util.AtomicText.writeAtomically(s"$dir/$Marker", render(spec) + "\n")

  def markerMatches(dir: String, spec: Spec): Boolean =
    graft.util.AtomicText.readLines(s"$dir/$Marker").headOption
      .contains(render(spec))

  /** Group per-file partitions by bucket id; None — report unknown
    * partitioning, never a wrong one — when any file's BATCH DIR
    * lacks a matching layout marker or any file name does not parse. */
  def groupByBucket(parts: Array[InputPartition], spec: Spec)
    : Option[Array[InputPartition]] = {
    val files = parts.map {
      case f: ManifestFilePartition => f
      case _                        => return None
    }
    val dirs = files.map(f =>
      f.filePath.substring(0, f.filePath.lastIndexOf('/'))).distinct
    if (!dirs.forall(markerMatches(_, spec))) return None
    val withBucket = files.map { f =>
      val name = f.filePath.substring(f.filePath.lastIndexOf('/') + 1)
      bucketOfFile(name) match {
        case Some(b) if b < spec.n => b -> f
        case _                     => return None
      }
    }
    Some(withBucket.groupBy(_._1).toArray.sortBy(_._1).map {
      case (b, fs) => BucketPartition(b, fs.map(_._2)): InputPartition
    })
  }

  /** The `bucket` function [[graft.plans.GraftCatalog]] serves —
    * Spark resolves the table-reported `bucket(n, col)` transform
    * against it and uses (canonicalName, numBuckets, column) equality
    * to prove two scans cluster identically. `produceResult` computes
    * the same routing the writer used, so Spark may also SHUFFLE a
    * non-bucketed join side into this partitioning
    * (spark.sql.sources.v2.bucketing.shuffle.enabled). */
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): graft-manifest hash bucket " +
        "(pmod(murmur3_42(col), numBuckets))"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
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
      val v = input.get(1, keyType)
      Integer.valueOf(bucketOf(v, keyType, n))
    }
  }
}
