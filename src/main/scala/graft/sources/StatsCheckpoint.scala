package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

import graft.util.AtomicText

/** Manifest-level planning CHECKPOINT — the Delta-checkpoint shape
  * for plan-time metadata. Without it, the FIRST plan over a table
  * pays O(dirs) namespace work: one listing plus one stats-sidecar
  * read per committed directory ([[SidecarCache]] removes repeat
  * parses, not the first-plan fan-out). A checkpoint rolls every
  * committed dir's file listing (name, length, mtime) and raw stats
  * lines into ONE file next to the manifest (`<manifest>.ckpt`), so a
  * plan reads one file for the whole table — at 10k dirs on a remote
  * FS that is the difference between one round-trip and tens of
  * thousands.
  *
  * Soundness comes from immutability, not freshness: committed dirs
  * never change, so a checkpoint entry is valid for as long as its
  * dir stays committed. Dirs committed AFTER the checkpoint simply
  * are not in it and take the per-dir path — correctness never
  * depends on the checkpoint being current, only planning cost does.
  * Maintenance (compact / merge / optimize) replaces dirs with NEW
  * ones, which likewise fall back per-dir until the next checkpoint;
  * stale entries for un-named dirs are dead weight, never consulted.
  * Rewrite the checkpoint after maintenance or a batch of appends —
  * one cheap metadata pass, atomically replaced.
  *
  * The scan still probes each dir's existence (one namespace op) so
  * the missing-committed-dir failure stays LOUD at plan time, and
  * bloom sidecars stay per-dir (megabytes each; only read under
  * pushed equality). Format: `#version=<v>`, then
  * `F\t<dir>\t<name>\t<len>\t<mtime>` per visible parquet file and
  * `S\t<dir>\t<raw stats line>` per stats-sidecar line. */
object StatsCheckpoint {

  def ckptPath(manifestPath: String): String = manifestPath + ".ckpt"

  /** One checkpointed dir: its visible parquet files and parsed
    * per-file stats (None = dir had no usable stats sidecar). */
  final case class DirEntry(files: Seq[(String, Long, Long)],
                            stats: Option[Map[String, BatchStats.FileStats]])

  /** Roll the manifest's CURRENT committed dirs into one checkpoint
    * file (atomic replace). Returns the number of dirs covered.
    * Per-dir gathering (one listing + one sidecar read each) fans out
    * over a bounded driver-side pool — sequential round-trips would
    * make the maintenance pass itself O(dirs) in LATENCY on a remote
    * FS, the cost the checkpoint exists to amortize away. Output
    * order stays deterministic (dirs in manifest order). */
  def write(spark: SparkSession, manifestPath: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val manifest = new TxnManifest(manifestPath)
    val dirs = manifest.committedDirsAll()
    def gather(dir: String): String = {
      val section = new StringBuilder
      val p = new HPath(dir)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p)
        .filter { st =>
          val n = st.getPath.getName
          st.isFile && n.endsWith(".parquet") &&
            !n.startsWith(".") && !n.startsWith("_")
        }
        .foreach { st =>
          section ++= s"F\t$dir\t${st.getPath.getName}\t${st.getLen}" +
            s"\t${st.getModificationTime}\n"
        }
      AtomicText.readLines(s"$dir/${BatchStats.SidecarName}")
        .foreach(l => section ++= s"S\t$dir\t$l\n")
      section.toString
    }
    val sections = GraftManifestSource.parallelMap(dirs)(gather)
    AtomicText.writeAtomically(ckptPath(manifestPath),
      s"#version=${manifest.version()}\n" + sections.mkString)
    dirs.size
  }

  /** Parsed checkpoint, served through the (path, mtime, length)
    * snapshot cache — one parse per checkpoint rewrite, one status
    * probe per plan. None = no checkpoint (or torn: degrade to the
    * per-dir path, never an error). */
  def read(conf: Configuration, manifestPath: String)
    : Option[Map[String, DirEntry]] = {
    val p = new HPath(ckptPath(manifestPath))
    val fs = p.getFileSystem(conf)
    cache.cached(fs, p)(parse(p)).flatten
  }

  private val cache =
    new SidecarCache[Option[Map[String, DirEntry]]](maxEntries = 16)

  private def parse(p: HPath): Option[Map[String, DirEntry]] =
    try {
      val lines = AtomicText.readLines(p.toString)
        .filterNot(_.startsWith("#"))
      val files = collection.mutable.LinkedHashMap
        .empty[String, collection.mutable.ArrayBuffer[(String, Long, Long)]]
      val stats = collection.mutable.LinkedHashMap
        .empty[String, collection.mutable.ArrayBuffer[String]]
      lines.foreach { l =>
        l.split('\t').toSeq match {
          case Seq("F", dir, name, len, mtime) =>
            files.getOrElseUpdate(dir, collection.mutable.ArrayBuffer.empty)
              .append((name, len.toLong, mtime.toLong))
          case "S" +: dir +: rest =>
            stats.getOrElseUpdate(dir, collection.mutable.ArrayBuffer.empty)
              .append(rest.mkString("\t"))
          case other =>
            throw new IllegalArgumentException(s"bad ckpt line: $other")
        }
      }
      Some(files.map { case (dir, fl) =>
        dir -> DirEntry(fl.toSeq,
          stats.get(dir).flatMap(sl => BatchStats.parseLines(sl.toSeq)))
      }.toMap)
    } catch { case scala.util.control.NonFatal(_) => None }
}
