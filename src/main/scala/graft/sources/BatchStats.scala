package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.sources._

import graft.util.AtomicText

/** Manifest-level DATA SKIPPING — the Delta-stats shape on plain
  * parquet. At ingest, one pass over the batch's parquet FOOTERS
  * (driver-side, no Spark job — the stats already exist in every
  * file) aggregates per-column min/max into a tiny `_stats.tsv`
  * sidecar inside the batch dir. At PLAN time the DSv2 scan evaluates
  * pushed filters against each candidate dir's sidecar and drops
  * directories that provably contain no matching row — they never
  * become input partitions, so a point query over years of committed
  * history opens only the dirs whose range overlaps.
  *
  * Soundness rules:
  *   - bounds are TYPED, never collapsed to Double: integer kinds keep
  *     exact Longs (a nanosecond timestamp or snowflake id above 2^53
  *     would alias neighbouring values in double space and a strict
  *     comparison could prune a file that still matches), floating
  *     kinds keep Doubles, strings keep raw UTF-8 bytes. Comparisons
  *     run in BigDecimal (numerics, exact for every Long and every
  *     Double) or unsigned byte order (strings — the same order
  *     parquet UTF8 stats and Spark's UTF8String comparator use, so
  *     no collation trap);
  *   - DATE (INT32/date) and TIMESTAMP (INT64/micros-millis-nanos)
  *     columns prune against java.sql / java.time filter literals in
  *     their native integer domain; string bounds longer than
  *     [[MaxStringBound]] are truncated OUTWARD (min = prefix,
  *     max = prefix with last byte incremented) so they stay covering;
  *   - a file is dropped only when a pushed filter PROVABLY excludes
  *     `[min, max]`; missing sidecar, missing column, a kind/value
  *     mismatch, or a filter shape outside the supported set ⇒ read
  *     the file (skipping is an optimization, never a correctness
  *     lever — same contract as row-group min/max inside the files,
  *     one level up);
  *   - null semantics: min/max ignore nulls, and every supported
  *     comparison filter is null-rejecting, so pruning on value
  *     bounds alone is exact. NULL COUNTS are tracked separately
  *     (`NC` sidecar lines, per file per column, type-agnostic —
  *     they exist even for columns whose values are outside the
  *     bounds surface): `IsNull` prunes a file with zero nulls,
  *     `IsNotNull` prunes an all-null file, and every null-rejecting
  *     comparison also prunes an all-null file (its value bounds
  *     don't exist, but no row can match). A chunk whose null count
  *     parquet did not record poisons the column's null info only —
  *     value-bound pruning is unaffected;
  *   - NaN ordering (Spark ranks NaN above every double): parquet-mr
  *     NaN-poisons double chunk stats, which this collector drops, so
  *     files this engine writes are safe; a FOREIGN writer that
  *     excludes NaN from its stats is outside the soundness envelope —
  *     the same caveat Spark's own row-group filtering carries.
  */
object BatchStats {

  private[sources] val SidecarName = "_stats.tsv"

  /** Longest stored string bound; longer values truncate outward. */
  private val MaxStringBound = 64

  /** Typed per-column `[lo, hi]`. `kind` distinguishes the integer
    * domains so a filter literal of the WRONG class never prunes:
    * `L` plain integer, `DT` date epoch days, `TS` timestamp
    * epoch micros, `TN` local (no-timezone) timestamp micros. */
  sealed trait Bounds
  final case class LongBounds(kind: String, lo: Long, hi: Long) extends Bounds
  final case class DoubleBounds(lo: Double, hi: Double) extends Bounds
  final case class BytesBounds(lo: Array[Byte], hi: Array[Byte]) extends Bounds

  /** Known-exact null accounting for one column of one file. */
  final case class NullCount(nulls: Long, rows: Long)

  /** Everything the sidecar knows about one file: typed value bounds
    * per column, and null counts per column (independent surfaces — a
    * column can have either, both, or neither). */
  final case class FileStats(bounds: Map[String, Bounds],
                             nulls: Map[String, NullCount])

  /** Scan the dir's parquet footers and write the sidecar — PER FILE
    * bounds, so planning can skip individual files of a z-ordered
    * compaction, not just whole append batches. Call after the batch
    * lands, before (or after) the manifest commit — the sidecar lives
    * INSIDE the batch dir, so it inherits the batch's visibility and
    * vacuum lifecycle. */
  def writeSidecar(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val perFile = collectBounds(conf, dir)
    val body = perFile.toSeq.sortBy(_._1).flatMap { case (f, fs) =>
      fs.bounds.toSeq.sortBy(_._1).map { case (c, b) =>
        val (k, lo, hi) = b match {
          case LongBounds(kind, lo, hi) => (kind, lo.toString, hi.toString)
          case DoubleBounds(lo, hi)     => ("D", lo.toString, hi.toString)
          case BytesBounds(lo, hi) =>
            ("S", Base64.getEncoder.encodeToString(lo),
              Base64.getEncoder.encodeToString(hi))
        }
        s"$f\t$c\t$k\t$lo\t$hi"
      } ++ fs.nulls.toSeq.sortBy(_._1).map { case (c, nc) =>
        s"$f\t$c\tNC\t${nc.nulls}\t${nc.rows}"
      }
    }.mkString("", "\n", "\n")
    AtomicText.writeAtomically(s"$dir/$SidecarName", body)
  }

  /** Per-file, per-column typed bounds over every row group; columns
    * with complete stats and a supported physical/logical type only. */
  private def collectBounds(conf: Configuration, dir: String)
    : Map[String, FileStats] = {
    import scala.jdk.CollectionConverters._
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") &&
        !n.startsWith(".") && !n.startsWith("_")
    }
    files.map { st =>
      val acc = scala.collection.mutable.Map.empty[String, Bounds]
      val dropped = scala.collection.mutable.Set.empty[String]
      val nullAcc = scala.collection.mutable.Map.empty[String, NullCount]
      val nullDropped = scala.collection.mutable.Set.empty[String]
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.foreach { chunk =>
          val name = chunk.getPath.toDotString
          val stats: org.apache.parquet.column.statistics.Statistics[_] =
            chunk.getStatistics
          val usable =
            stats != null && !stats.isEmpty && stats.hasNonNullValue
          chunkBounds(chunk, if (usable) Some(stats) else None) match {
            case Supported(None) =>
              // a single chunk without usable stats poisons the column:
              // bounds would under-cover and pruning would drop live rows
              dropped += name; acc.remove(name); ()
            case Supported(Some(b)) if !dropped.contains(name) =>
              acc.update(name, acc.get(name).fold(b)(widen(_, b)))
            case _ => () // unsupported type: never in the sidecar
          }
          // null counts are TYPE-AGNOSTIC — tracked even for columns
          // whose values are outside the bounds surface; an unset
          // chunk count poisons only the null info, never the bounds
          if (stats != null && stats.isNumNullsSet && stats.getNumNulls >= 0
              && !nullDropped.contains(name)) {
            val add = NullCount(stats.getNumNulls, block.getRowCount)
            nullAcc.update(name, nullAcc.get(name).fold(add)(a =>
              NullCount(a.nulls + add.nulls, a.rows + add.rows)))
          } else {
            nullDropped += name; nullAcc.remove(name); ()
          }
        }
      } finally reader.close()
      st.getPath.getName -> FileStats(acc.toMap, nullAcc.toMap)
    }.toMap
  }

  /** `Supported(Some(b))` = stats usable; `Supported(None)` = the type
    * is skippable but THIS chunk has no usable stats (poison);
    * `Unsupported` = type outside the stats surface. */
  private sealed trait ChunkStats
  private final case class Supported(b: Option[Bounds]) extends ChunkStats
  private case object Unsupported extends ChunkStats

  private def chunkBounds(
      chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
      stats: Option[org.apache.parquet.column.statistics.Statistics[_]])
    : ChunkStats = {
    val logical = chunk.getPrimitiveType.getLogicalTypeAnnotation
    def longs(kind: String) = Supported(stats.map { s =>
      val lo = s.genericGetMin.asInstanceOf[Number].longValue
      val hi = s.genericGetMax.asInstanceOf[Number].longValue
      LongBounds(kind, lo, hi)
    })
    chunk.getPrimitiveType.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT32 => logical match {
        case null                                    => longs("L")
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
          if i.isSigned                              => longs("L")
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => longs("DT")
        case _                                       => Unsupported
      }
      case PrimitiveTypeName.INT64 => logical match {
        case null                                    => longs("L")
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
          if i.isSigned                              => longs("L")
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          // normalize to micros, widening OUTWARD where the unit
          // conversion is lossy (nanos → floor(lo), ceil(hi))
          val kind = if (t.isAdjustedToUTC) "TS" else "TN"
          import LogicalTypeAnnotation.TimeUnit
          Supported(stats.map { s =>
            val lo = s.genericGetMin.asInstanceOf[Number].longValue
            val hi = s.genericGetMax.asInstanceOf[Number].longValue
            t.getUnit match {
              case TimeUnit.MICROS => LongBounds(kind, lo, hi)
              case TimeUnit.MILLIS => LongBounds(kind,
                Math.multiplyExact(lo, 1000L), Math.multiplyExact(hi, 1000L))
              case TimeUnit.NANOS  => LongBounds(kind,
                Math.floorDiv(lo, 1000L), -Math.floorDiv(-hi, 1000L))
            }
          })
        case _ => Unsupported
      }
      case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
        // NaN/Infinity bounds are not finitely comparable — a chunk
        // carrying them poisons the column (prune-nothing), it must
        // never crash the plan
        Supported(stats.flatMap { s =>
          val lo = s.genericGetMin.asInstanceOf[Number].doubleValue
          val hi = s.genericGetMax.asInstanceOf[Number].doubleValue
          if (lo.isNaN || hi.isNaN || lo.isInfinite || hi.isInfinite) None
          else Some(DoubleBounds(lo, hi))
        })
      case PrimitiveTypeName.BINARY => logical match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
          // truncate outward: a min PREFIX is <= the min; the max
          // prefix must be bumped past every value it covers — an
          // all-0xFF prefix cannot be bumped, so that chunk poisons
          // the column like a stats-less one
          Supported(stats.flatMap { s =>
            val lo = s.genericGetMin
              .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
            val hi = s.genericGetMax
              .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
            truncateUpper(hi).map(h => BytesBounds(lo.take(MaxStringBound), h))
          })
        case _ => Unsupported
      }
      case _ => Unsupported
    }
  }

  /** Smallest byte string GREATER than every string with prefix
    * `bytes`: increment the last non-0xFF byte, dropping the tail.
    * None when all bytes are 0xFF — no finite successor exists. */
  private def bump(bytes: Array[Byte]): Option[Array[Byte]] = {
    var i = bytes.length - 1
    while (i >= 0 && bytes(i) == 0xFF.toByte) i -= 1
    if (i < 0) None
    else {
      val out = bytes.take(i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  /** Upper string bound truncated to a COVERING bound: keep the first
    * [[MaxStringBound]] bytes and [[bump]] them past every string the
    * prefix covers. None when no finite bump exists — the column is
    * unprunable for this chunk. */
  private def truncateUpper(bytes: Array[Byte]): Option[Array[Byte]] =
    if (bytes.length <= MaxStringBound) Some(bytes)
    else bump(bytes.take(MaxStringBound))

  /** Accumulate row-group bounds into file bounds. Kinds always agree
    * within one physical column; mismatch (corrupt metadata) widens to
    * nothing — caller treats it as poison via exception-free math. */
  private def widen(a: Bounds, b: Bounds): Bounds = (a, b) match {
    case (LongBounds(k, lo1, hi1), LongBounds(k2, lo2, hi2)) if k == k2 =>
      LongBounds(k, math.min(lo1, lo2), math.max(hi1, hi2))
    case (DoubleBounds(lo1, hi1), DoubleBounds(lo2, hi2)) =>
      DoubleBounds(math.min(lo1, lo2), math.max(hi1, hi2))
    case (BytesBounds(lo1, hi1), BytesBounds(lo2, hi2)) =>
      BytesBounds(if (unsignedCompare(lo1, lo2) <= 0) lo1 else lo2,
        if (unsignedCompare(hi1, hi2) >= 0) hi1 else hi2)
    case _ => a // heterogeneous kinds never arise from one parquet column
  }

  /** Sidecar bounds for `dir` keyed by file name, None when absent or
    * unparsable (⇒ no pruning — an old-format or torn sidecar must
    * degrade to a full read, never to a wrong skip). */
  /** Plan-time snapshot cache: stats re-parse only when the sidecar's
    * (mtime, length) changes — see [[SidecarCache]]. */
  private val cache =
    new SidecarCache[Option[Map[String, FileStats]]](maxEntries = 8192)

  def read(conf: Configuration, dir: String)
    : Option[Map[String, FileStats]] = {
    val p = new HPath(s"$dir/$SidecarName")
    val fs = p.getFileSystem(conf)
    cache.cached(fs, p)(parseSidecar(p)).flatten
  }

  private def parseSidecar(p: HPath): Option[Map[String, FileStats]] =
    try parseLines(AtomicText.readLines(p.toString))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Lenient sidecar-line parse, shared with [[StatsCheckpoint]]
    * (which embeds dirs' raw stats lines verbatim): any malformed
    * input degrades to "no pruning", never an error. */
  private[sources] def parseLines(lines: Seq[String])
    : Option[Map[String, FileStats]] =
    try {
      val parsed = lines.map { l =>
        val Array(f, c, k, lo, hi) = l.split('\t')
        val cell: Either[Bounds, NullCount] = k match {
          case "L" | "DT" | "TS" | "TN" =>
            Left(LongBounds(k, lo.toLong, hi.toLong))
          case "D" => Left(DoubleBounds(lo.toDouble, hi.toDouble))
          case "S" => Left(BytesBounds(Base64.getDecoder.decode(lo),
            Base64.getDecoder.decode(hi)))
          case "NC" => Right(NullCount(lo.toLong, hi.toLong))
        }
        (f, c, cell)
      }
      Some(parsed.groupBy(_._1).view.mapValues { rows =>
        FileStats(
          rows.collect { case (_, c, Left(b)) => c -> b }.toMap,
          rows.collect { case (_, c, Right(nc)) => c -> nc }.toMap)
      }.toMap)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** True when the file MAY contain a row satisfying every pushed
    * filter (filters are conjunctive). Unknown columns or filter
    * shapes never prune. */
  def mayMatch(stats: FileStats, filters: Seq[Filter]): Boolean =
    !filters.exists(excludes(stats, _))

  /** Bounds-only [[mayMatch]] — no null accounting (tests and callers
    * that assembled raw bounds by hand). */
  def mayMatch(bounds: Map[String, Bounds], filters: Seq[Filter]): Boolean =
    mayMatch(FileStats(bounds, Map.empty), filters)

  /** Filter literal → comparable in the bound's domain. None = the
    * literal does not belong to this bound's domain (or is not finite)
    * ⇒ no pruning. Numerics compare in BigDecimal: exact for every
    * Long (no 2^53 aliasing) and every finite Double. */
  private def comparable(b: Bounds, v: Any): Option[(BigDecimal, BigDecimal, BigDecimal)] = {
    def big(x: Any): Option[BigDecimal] = x match {
      case n: java.lang.Byte    => Some(BigDecimal(n.longValue))
      case n: java.lang.Short   => Some(BigDecimal(n.longValue))
      case n: java.lang.Integer => Some(BigDecimal(n.longValue))
      case n: java.lang.Long    => Some(BigDecimal(n.longValue))
      case n: java.lang.Float if !n.isNaN && !n.isInfinite =>
        Some(BigDecimal(new java.math.BigDecimal(n.doubleValue)))
      case n: java.lang.Double if !n.isNaN && !n.isInfinite =>
        Some(BigDecimal(new java.math.BigDecimal(n.doubleValue)))
      case n: java.math.BigDecimal => Some(BigDecimal(n))
      case n: BigDecimal        => Some(n)
      case _                    => None
    }
    b match {
      case LongBounds("L", lo, hi) =>
        big(v).map((BigDecimal(lo), BigDecimal(hi), _))
      case LongBounds("DT", lo, hi) =>
        val days: Option[Long] = v match {
          case d: java.sql.Date       => Some(d.toLocalDate.toEpochDay)
          case d: java.time.LocalDate => Some(d.toEpochDay)
          case _                      => None
        }
        days.map(d => (BigDecimal(lo), BigDecimal(hi), BigDecimal(d)))
      case LongBounds("TS", lo, hi) =>
        val micros: Option[Long] = v match {
          case t: java.sql.Timestamp =>
            Some(Math.addExact(Math.multiplyExact(
              Math.floorDiv(t.getTime, 1000L), 1000000L),
              t.getNanos / 1000L))
          case t: java.time.Instant =>
            Some(Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L),
              t.getNano / 1000L))
          case _ => None
        }
        micros.map(m => (BigDecimal(lo), BigDecimal(hi), BigDecimal(m)))
      case LongBounds("TN", lo, hi) =>
        val micros: Option[Long] = v match {
          case t: java.time.LocalDateTime =>
            val i = t.toInstant(java.time.ZoneOffset.UTC)
            Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
              i.getNano / 1000L))
          case _ => None
        }
        micros.map(m => (BigDecimal(lo), BigDecimal(hi), BigDecimal(m)))
      case DoubleBounds(lo, hi) // belt-and-braces vs hand-edited sidecars
        if !lo.isNaN && !hi.isNaN && !lo.isInfinite && !hi.isInfinite =>
        big(v).map((BigDecimal(new java.math.BigDecimal(lo)),
          BigDecimal(new java.math.BigDecimal(hi)), _))
      case _ => None
    }
  }

  private def strBytes(v: Any): Option[Array[Byte]] = v match {
    case s: String => Some(s.getBytes(StandardCharsets.UTF_8))
    case _         => None
  }

  /** Unsigned lexicographic byte order — parquet UTF8 stats order and
    * Spark's UTF8String order agree on exactly this. */
  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Provable exclusion of `[min, max]` (or null accounting) by one
    * filter. Every comparison shape is null-rejecting, so an all-null
    * column excludes it even without value bounds. */
  private def excludes(st: FileStats, f: Filter): Boolean = {
    val b = st.bounds
    // no row of this file carries a value in column c — provable only
    // from a KNOWN null count covering every row
    def allNull(c: String): Boolean =
      st.nulls.get(c).exists(nc => nc.nulls == nc.rows && nc.rows > 0)
    def noNull(c: String): Boolean = st.nulls.get(c).exists(_.nulls == 0)
    def cmp(c: String, v: Any)(p: (Int, Int) => Boolean): Boolean =
      allNull(c) || b.get(c).exists { bd =>
        comparable(bd, v) match {
          case Some((lo, hi, x)) => p(x.compare(lo), x.compare(hi))
          case None => (bd, strBytes(v)) match {
            case (BytesBounds(lo, hi), Some(s)) =>
              p(unsignedCompare(s, lo), unsignedCompare(s, hi))
            case _ => false
          }
        }
      }
    f match {
      case EqualTo(c, v) if v != null       => cmp(c, v)((l, h) => l < 0 || h > 0)
      case EqualNullSafe(c, v) if v != null => cmp(c, v)((l, h) => l < 0 || h > 0)
      case EqualNullSafe(c, null)   => noNull(c) // <=> NULL matches only nulls
      case GreaterThan(c, v)        => cmp(c, v)((_, h) => h >= 0)
      case GreaterThanOrEqual(c, v) => cmp(c, v)((_, h) => h > 0)
      case LessThan(c, v)           => cmp(c, v)((l, _) => l <= 0)
      case LessThanOrEqual(c, v)    => cmp(c, v)((l, _) => l < 0)
      case IsNull(c)                => noNull(c)
      case IsNotNull(c)             => allNull(c)
      case In(c, vs) =>
        vs.nonEmpty && vs.forall(v =>
          v != null && cmp(c, v)((l, h) => l < 0 || h > 0))
      case StringStartsWith(c, prefix) =>
        // matching rows satisfy prefix <= value < bump(prefix); a file
        // wholly below or wholly at/above that window cannot match
        allNull(c) || b.get(c).exists {
          case BytesBounds(lo, hi) =>
            val p = prefix.getBytes(StandardCharsets.UTF_8)
            unsignedCompare(hi, p) < 0 ||
              bump(p).exists(up => unsignedCompare(lo, up) >= 0)
          case _ => false
        }
      case And(l, r) => excludes(st, l) || excludes(st, r)
      case Or(l, r)  => excludes(st, l) && excludes(st, r)
      case _         => false
    }
  }

  /** Provable FULL coverage — the dual of [[excludes]]: TRUE only
    * when EVERY row of the file satisfies `f`, from bounds + null
    * counts alone. The retention fast-path uses it to un-name whole
    * dirs without reading a byte; false negatives only cost the fast
    * path (the row-level delete takes over), false positives would
    * DELETE LIVE ROWS — so every branch demands a zero null count
    * (comparisons are null-rejecting: one NULL row breaks coverage)
    * and bounds that provably pin every value. Sidecar bounds cover
    * every row group by construction ([[writeSidecar]] drops a
    * column whose coverage is partial), so "bounds present" means
    * "bounds bound every row". */
  def mustMatch(st: FileStats, f: Filter): Boolean = {
    val b = st.bounds
    def allNull(c: String): Boolean =
      st.nulls.get(c).exists(nc => nc.nulls == nc.rows)
    def noNull(c: String): Boolean = st.nulls.get(c).exists(_.nulls == 0)
    // p receives (filterValue.compare(lo), filterValue.compare(hi))
    def cmp(c: String, v: Any)(p: (Int, Int) => Boolean): Boolean =
      noNull(c) && b.get(c).exists { bd =>
        comparable(bd, v) match {
          case Some((lo, hi, x)) => p(x.compare(lo), x.compare(hi))
          case None => (bd, strBytes(v)) match {
            case (BytesBounds(lo, hi), Some(s)) =>
              p(unsignedCompare(s, lo), unsignedCompare(s, hi))
            case _ => false
          }
        }
      }
    f match {
      case LessThan(c, v) if v != null           => cmp(c, v)((_, h) => h > 0)
      case LessThanOrEqual(c, v) if v != null    => cmp(c, v)((_, h) => h >= 0)
      case GreaterThan(c, v) if v != null        => cmp(c, v)((l, _) => l < 0)
      case GreaterThanOrEqual(c, v) if v != null => cmp(c, v)((l, _) => l <= 0)
      case EqualTo(c, v) if v != null  => cmp(c, v)((l, h) => l == 0 && h == 0)
      case In(c, vs) => vs.exists(v =>
        v != null && cmp(c, v)((l, h) => l == 0 && h == 0))
      case IsNotNull(c) => noNull(c)
      case IsNull(c)    => allNull(c)
      case StringStartsWith(c, prefix) =>
        // lo >= prefix and hi < bump(prefix) pin every value (all are
        // within [lo, hi]) to the prefix window
        noNull(c) && b.get(c).exists {
          case BytesBounds(lo, hi) =>
            val p = prefix.getBytes(StandardCharsets.UTF_8)
            unsignedCompare(lo, p) >= 0 &&
              bump(p).exists(up => unsignedCompare(hi, up) < 0)
          case _ => false
        }
      case And(l, r) => mustMatch(st, l) && mustMatch(st, r)
      case Or(l, r)  => mustMatch(st, l) || mustMatch(st, r)
      case _         => false
    }
  }
}

/** Convenience: batch append + stats sidecar in one call. */
object StatsSinks {
  /** `bloomColumns` additionally writes a [[BloomIndex]] sidecar for
    * point-lookup pruning — without it a batch-loaded table has no
    * bloom coverage until its first compaction rebuild, so every
    * equality probe (merge key lookups included) falls back to
    * min/max ranges alone. Same opt-in contract as the streaming
    * sink's `bloomColumns` option: unindexable types fail loudly. */
  def appendBatchStats(df: DataFrame, root: String, batchId: Int,
                       bloomColumns: Seq[String] = Nil): Unit = {
    Sinks.appendBatch(df, root, batchId)
    BatchStats.writeSidecar(df.sparkSession, s"$root/batch=$batchId")
    if (bloomColumns.nonEmpty)
      BloomIndex.writeSidecar(df.sparkSession, s"$root/batch=$batchId",
        bloomColumns)
  }

  /** CHECK constraints on the write path (Delta `ALTER TABLE ADD
    * CONSTRAINT` semantics): every named predicate must hold on every
    * row of the batch or NOTHING lands — one aggregate pass counts all
    * violations together (no per-constraint scans) and the failure
    * names each violated constraint with its row count, the
    * fail-loud-with-evidence shape of the reference's integrity abort
    * (`orders.py:121-133`). NULL counts as a violation: a constraint
    * that cannot be PROVEN true is not true (Delta's rule). */
  def appendBatchChecked(df: DataFrame, root: String, batchId: Int,
                         constraints: Map[String, org.apache.spark.sql.Column],
                         bloomColumns: Seq[String] = Nil)
    : Unit = {
    require(constraints.nonEmpty, "no constraints given — use appendBatch")
    import org.apache.spark.sql.functions.{coalesce, count, lit, sum, when}
    val named = constraints.toSeq
    val counts = df.agg(
      count(lit(1)).as("__rows"),
      named.map { case (name, c) =>
        coalesce(sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)), lit(0L))
          .as(s"__viol_$name")
      }: _*).collect().head
    val violated = named.zipWithIndex
      .map { case ((name, _), i) => name -> counts.getLong(i + 1) }
      .filter(_._2 > 0)
    if (violated.nonEmpty)
      throw new IllegalStateException(
        s"batch $batchId violates CHECK constraints: " +
          violated.map { case (n, c) => s"$n ($c rows)" }.mkString(", ") +
          s" — nothing written (${counts.getLong(0)} rows rejected)")
    Sinks.appendBatch(df, root, batchId)
    BatchStats.writeSidecar(df.sparkSession, s"$root/batch=$batchId")
    if (bloomColumns.nonEmpty)
      BloomIndex.writeSidecar(df.sparkSession, s"$root/batch=$batchId",
        bloomColumns)
  }
}
