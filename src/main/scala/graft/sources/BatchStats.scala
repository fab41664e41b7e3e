package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
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
  *   - numeric leaf columns only (INT32/INT64/FLOAT/DOUBLE): total
  *     order is unambiguous; strings stay unskipped (collation traps);
  *   - a dir is dropped only when a pushed filter PROVABLY excludes
  *     `[min, max]`; missing sidecar, missing column, or a filter
  *     shape outside the supported set ⇒ read the dir (skipping is an
  *     optimization, never a correctness lever — same contract as
  *     row-group min/max inside the files, one level up);
  *   - null semantics: min/max ignore nulls, and every supported
  *     comparison filter is null-rejecting, so pruning on value
  *     bounds alone is exact; IsNull/IsNotNull are deliberately
  *     NOT evaluated against stats.
  */
object BatchStats {

  private val SidecarName = "_stats.tsv"

  /** Scan the dir's parquet footers and write the sidecar — PER FILE
    * bounds, so planning can skip individual files of a z-ordered
    * compaction, not just whole append batches. Call after the batch
    * lands, before (or after) the manifest commit — the sidecar lives
    * INSIDE the batch dir, so it inherits the batch's visibility and
    * vacuum lifecycle. */
  def writeSidecar(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val perFile = collectBounds(conf, dir)
    val body = perFile.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, (lo, hi)) => s"$f\t$c\t$lo\t$hi" }
    }.mkString("", "\n", "\n")
    AtomicText.writeAtomically(s"$dir/$SidecarName", body)
  }

  /** Per-file, per-column [min, max] over every row group, numeric
    * leaves only, columns with complete stats only. */
  private def collectBounds(conf: Configuration, dir: String)
    : Map[String, Map[String, (Double, Double)]] = {
    import scala.jdk.CollectionConverters._
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") &&
        !n.startsWith(".") && !n.startsWith("_")
    }
    files.map { st =>
      val acc = scala.collection.mutable.Map.empty[String, (Double, Double)]
      val dropped = scala.collection.mutable.Set.empty[String]
      val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.foreach { chunk =>
          val name = chunk.getPath.toDotString
          val stats: org.apache.parquet.column.statistics.Statistics[_] =
            chunk.getStatistics
          val numeric = chunk.getPrimitiveType.getPrimitiveTypeName match {
            case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 |
                 org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 |
                 org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.FLOAT |
                 org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.DOUBLE => true
            case _ => false
          }
          if (!numeric || stats == null || stats.isEmpty || !stats.hasNonNullValue) {
            // a single chunk without stats poisons the column: bounds
            // would under-cover and pruning would drop live rows
            if (numeric) { dropped += name; acc.remove(name); () }
          } else if (!dropped.contains(name)) {
            val lo = stats.genericGetMin match { case n: Number => n.doubleValue }
            val hi = stats.genericGetMax match { case n: Number => n.doubleValue }
            val cur = acc.get(name)
            acc.update(name,
              (cur.fold(lo)(c => math.min(c._1, lo)),
                cur.fold(hi)(c => math.max(c._2, hi))))
          }
        }
      } finally reader.close()
      st.getPath.getName -> acc.toMap
    }.toMap
  }

  /** Sidecar bounds for `dir` keyed by file name, None when absent
    * (⇒ no pruning). */
  def read(conf: Configuration, dir: String)
    : Option[Map[String, Map[String, (Double, Double)]]] = {
    val p = new HPath(s"$dir/$SidecarName")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else Some(AtomicText.readLines(p.toString).map { l =>
      val Array(f, c, lo, hi) = l.split('\t')
      (f, c, lo.toDouble, hi.toDouble)
    }.groupBy(_._1).view.mapValues(_.map(t => t._2 -> (t._3, t._4)).toMap)
      .toMap)
  }

  /** True when the dir MAY contain a row satisfying every pushed
    * filter (filters are conjunctive). Unknown columns or filter
    * shapes never prune. */
  def mayMatch(bounds: Map[String, (Double, Double)],
               filters: Seq[Filter]): Boolean =
    !filters.exists(excludes(bounds, _))

  private def num(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue)
    case _         => None
  }

  /** Provable exclusion of `[min, max]` by one filter. */
  private def excludes(b: Map[String, (Double, Double)], f: Filter): Boolean =
    f match {
      case EqualTo(c, v) => b.get(c).zip(num(v))
        .exists { case ((lo, hi), x) => x < lo || x > hi }
      case GreaterThan(c, v) => b.get(c).zip(num(v))
        .exists { case ((_, hi), x) => x >= hi }
      case GreaterThanOrEqual(c, v) => b.get(c).zip(num(v))
        .exists { case ((_, hi), x) => x > hi }
      case LessThan(c, v) => b.get(c).zip(num(v))
        .exists { case ((lo, _), x) => x <= lo }
      case LessThanOrEqual(c, v) => b.get(c).zip(num(v))
        .exists { case ((lo, _), x) => x < lo }
      case In(c, vs) =>
        val ds = vs.flatMap(num(_))
        ds.length == vs.length && b.get(c)
          .exists { case (lo, hi) => ds.forall(x => x < lo || x > hi) }
      case And(l, r) => excludes(b, l) || excludes(b, r)
      case Or(l, r)  => excludes(b, l) && excludes(b, r)
      case _         => false
    }
}

/** Convenience: batch append + stats sidecar in one call. */
object StatsSinks {
  def appendBatchStats(df: DataFrame, root: String, batchId: Int): Unit = {
    Sinks.appendBatch(df, root, batchId)
    BatchStats.writeSidecar(df.sparkSession, s"$root/batch=$batchId")
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
                         constraints: Map[String, org.apache.spark.sql.Column])
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
  }
}
