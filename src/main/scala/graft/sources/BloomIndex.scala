package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Base64

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

import graft.util.AtomicText

/** PER-FILE BLOOM FILTER INDEX — the point-lookup complement to
  * [[BatchStats]] min/max skipping (Delta's `bloomFilterIndex`
  * shape). Range stats cannot prune equality probes on
  * high-cardinality identifiers once every file's `[min, max]` spans
  * the id space (uniform ids overlap everywhere); a per-file bloom
  * answers "does file F possibly contain v?" directly, so an
  * `id = v` / `id IN (...)` point query over years of committed
  * batches opens only the files whose bloom admits the value.
  *
  * Build cost is one Spark pass over the freshly-landed batch
  * (grouped by file, streaming through each group — memory per task
  * is the bloom bits, never the rows), opt-in per sink call, and the
  * sidecar lives inside the batch dir so it inherits the batch's
  * visibility and vacuum lifecycle exactly like `_stats.tsv`.
  *
  * Soundness rules (the same contract as [[BatchStats]] — skipping is
  * an optimization, never a correctness lever):
  *   - a bloom has NO false negatives, so "definitely absent" is
  *     provable and pruning on it is exact; false positives only cost
  *     a read;
  *   - only STRING and signed-integral columns are indexable; the
  *     filter literal must belong to the indexed domain (a Long
  *     literal against a string bloom never prunes);
  *   - nulls are not inserted, and every supported equality filter is
  *     null-rejecting, so null rows can never be lost to pruning;
  *   - missing sidecar, unparsable line, unknown column, or a filter
  *     shape outside {EqualTo, EqualNullSafe, In, And, Or} ⇒ read the
  *     file.
  *
  * The merge probe ([[Sinks.statsCandidateDirs]]) stays range-based:
  * it prunes with the matched keys' `[min, max]` without collecting
  * the key set, which is the right trade at bulk-backfill scale —
  * bloom membership would need the driver to hold every key.
  */
object BloomIndex {

  private val SidecarName = "_bloom.tsv"

  /** Default false-positive probability — 1% costs ~9.6 bits/row,
    * ~1.2 MB per million rows per column. */
  val DefaultFpp = 0.01

  /** True when `dt` can carry a bloom index. */
  def indexable(dt: DataType): Boolean = kindOf(dt).nonEmpty

  /** Indexed-domain tag: `L` signed integral, `S` UTF-8 string. */
  private def kindOf(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("L")
    case StringType                                    => Some("S")
    case _                                             => None
  }

  /** Build per-file blooms for `cols` over every parquet file in
    * `dir` and write the `_bloom.tsv` sidecar. One Spark job: rows
    * stream through a per-file group; blooms are sized from the
    * files' footer row counts (exact, already on the driver from the
    * stats pass shape). Unsupported column types fail loudly — the
    * index is explicit opt-in, a silently-skipped column would look
    * indexed but never prune. */
  def writeSidecar(spark: SparkSession, dir: String, cols: Seq[String],
                   fpp: Double = DefaultFpp): Unit = {
    require(cols.nonEmpty, "no columns to index")
    val df = spark.read.parquet(dir)
    val kinds: Map[String, String] = cols.map { c =>
      val f = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"bloom index column '$c' not in $dir schema ${df.schema.simpleString}"))
      c -> kindOf(f.dataType).getOrElse(
        throw new IllegalArgumentException(
          s"bloom index column '$c' has unindexable type ${f.dataType.simpleString} " +
            "(string and signed integral only)"))
    }.toMap
    val rowsPerFile = fileRowCounts(spark.sparkContext.hadoopConfiguration, dir)
    val colsSeq = cols // stable order into the closure
    val kindsB = kinds
    val lines: Seq[(String, String, String, String)] = df
      .select(input_file_name().as("__file") +: colsSeq.map(col): _*)
      .groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroups { (fileUri, rows) =>
        // input_file_name() is a percent-ENCODED URI; the footer
        // listing's names are DECODED fs paths. Normalize through
        // java.net.URI (correct %XX decoding — URLDecoder would also
        // eat literal '+') or the undersizing is silent: a missing
        // lookup would fall back to expected=1, FPP→1, and the file's
        // bloom would prune nothing while looking indexed. A name
        // still absent after decoding fails loudly per the opt-in
        // contract.
        val name = {
          val decoded = try new java.net.URI(fileUri).getPath catch {
            case _: java.net.URISyntaxException => fileUri
          }
          new HPath(decoded).getName
        }
        val expected = math.max(1L, rowsPerFile.getOrElse(name,
          throw new IllegalStateException(
            s"bloom index: scanned file $name (from $fileUri) has no " +
              "footer row count — file listing and scan disagree; " +
              "rebuild the sidecar after the directory settles")))
        val blooms = colsSeq.map(c => BloomFilter.create(expected, fpp))
        rows.foreach { r =>
          var i = 0
          while (i < colsSeq.length) {
            val v = r.get(i + 1)
            if (v != null) kindsB(colsSeq(i)) match {
              case "L" => blooms(i).putLong(v.asInstanceOf[Number].longValue)
              case "S" => blooms(i).putString(v.asInstanceOf[String])
            }
            i += 1
          }
        }
        colsSeq.indices.iterator.map { i =>
          val bos = new ByteArrayOutputStream()
          blooms(i).writeTo(bos)
          (name, colsSeq(i), kindsB(colsSeq(i)),
            Base64.getEncoder.encodeToString(bos.toByteArray))
        }
      }(Encoders.product[(String, String, String, String)])
      .collect().toSeq
    val body = lines.sortBy(l => (l._1, l._2))
      .map { case (f, c, k, b) => s"$f\t$c\t$k\t$b" }
      .mkString("", "\n", "\n")
    AtomicText.writeAtomically(s"$dir/$SidecarName", body)
  }

  /** Exact per-file row counts from the parquet footers (driver-side,
    * no Spark job — mirrors [[BatchStats.writeSidecar]]'s pass). */
  private def fileRowCounts(conf: Configuration, dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
    }.map { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try st.getPath.getName -> reader.getFooter.getBlocks.asScala
        .map(_.getRowCount).sum
      finally reader.close()
    }.toMap
  }

  /** Column names indexed in `dir`'s sidecar — names only, no bloom
    * deserialization (a coverage probe, not a read). Empty when the
    * sidecar is absent or torn. */
  def indexedColumns(conf: Configuration, dir: String): Set[String] = {
    val p = new HPath(s"$dir/$SidecarName")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Set.empty
    else try AtomicText.readLines(p.toString)
      .flatMap(_.split('\t').lift(1)).toSet
    catch { case scala.util.control.NonFatal(_) => Set.empty }
  }

  /** Maintenance continuity: a compaction/z-order/merge REWRITES files
    * whose blooms die with them — without this, every maintenance op
    * silently downgrades point lookups back to full scans (the same
    * contract as re-statting the output with [[BatchStats]]). Rebuilds
    * on `target` the union of columns indexed anywhere in `inputDirs`,
    * restricted to columns the rewritten output still carries with an
    * indexable type (schema evolution may have dropped or retyped
    * one — best-effort continuity, unlike [[writeSidecar]]'s loud
    * opt-in contract). Returns the columns rebuilt. */
  def carryOver(spark: SparkSession, inputDirs: Seq[String],
                target: String, fpp: Double = DefaultFpp): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val wanted = inputDirs.flatMap(indexedColumns(conf, _)).toSet
    if (wanted.isEmpty) return Set.empty
    val schema = spark.read.parquet(target).schema
    val cols = wanted.filter(c =>
      schema.fields.exists(f => f.name == c && kindOf(f.dataType).nonEmpty))
    if (cols.nonEmpty) writeSidecar(spark, target, cols.toSeq.sorted, fpp)
    cols
  }

  /** Sidecar blooms for `dir` keyed by file name then column; None
    * when absent or unparsable (⇒ no pruning, like a torn
    * `_stats.tsv`). */
  /** Plan-time snapshot cache ([[SidecarCache]]): bloom bit arrays
    * are the expensive deserialization, and the heavy entries —
    * megabytes per dir at production row counts — so the cap is much
    * smaller than the stats cache's. */
  private val cache = new SidecarCache[
    Option[Map[String, Map[String, (String, BloomFilter)]]]](maxEntries = 256)

  def read(conf: Configuration, dir: String)
    : Option[Map[String, Map[String, (String, BloomFilter)]]] = {
    val p = new HPath(s"$dir/$SidecarName")
    val fs = p.getFileSystem(conf)
    cache.cached(fs, p)(parseSidecar(p)).flatten
  }

  private def parseSidecar(p: HPath)
    : Option[Map[String, Map[String, (String, BloomFilter)]]] =
    try {
      Some(AtomicText.readLines(p.toString).map { l =>
        val Array(f, c, k, b) = l.split('\t')
        require(k == "L" || k == "S", s"unknown bloom kind $k")
        val bloom = BloomFilter.readFrom(
          new ByteArrayInputStream(Base64.getDecoder.decode(b)))
        (f, c, (k, bloom))
      }.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** True when the file MAY contain a row satisfying every pushed
    * filter (conjunctive), judged on bloom membership alone. */
  def mayMatch(blooms: Map[String, (String, BloomFilter)],
               filters: Seq[Filter]): Boolean =
    !filters.exists(excludes(blooms, _))

  /** `Some(false)` = the bloom PROVES v absent; `Some(true)` = maybe
    * present; None = literal outside the indexed domain (no pruning). */
  private def contains(kb: (String, BloomFilter), v: Any): Option[Boolean] =
    (kb._1, v) match {
      case ("L", n: java.lang.Byte)    => Some(kb._2.mightContainLong(n.longValue))
      case ("L", n: java.lang.Short)   => Some(kb._2.mightContainLong(n.longValue))
      case ("L", n: java.lang.Integer) => Some(kb._2.mightContainLong(n.longValue))
      case ("L", n: java.lang.Long)    => Some(kb._2.mightContainLong(n.longValue))
      case ("S", s: String)            => Some(kb._2.mightContainString(s))
      case _                           => None
    }

  /** Provable exclusion by one filter. Equality only — blooms answer
    * membership, nothing else. */
  private def excludes(b: Map[String, (String, BloomFilter)], f: Filter): Boolean =
    f match {
      case EqualTo(c, v) if v != null =>
        b.get(c).flatMap(contains(_, v)).contains(false)
      case EqualNullSafe(c, v) if v != null =>
        b.get(c).flatMap(contains(_, v)).contains(false)
      case In(c, vs) =>
        vs.nonEmpty && vs.forall(v =>
          v != null && b.get(c).flatMap(contains(_, v)).contains(false))
      case And(l, r) => excludes(b, l) || excludes(b, r)
      case Or(l, r)  => excludes(b, l) && excludes(b, r)
      case _         => false
    }
}
