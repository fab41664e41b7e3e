package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-access WARC record fetch — the consumer of CDX coordinates.
  *
  * A CDX index (Common Crawl's `cdx-*.gz` shape: URI → file, member
  * offset, member length) exists so a petabyte archive can serve
  * SINGLE records without scanning files: `.warc.gz` members are
  * independently-inflatable gzip members, so `seek(offset)` +
  * `read(length)` + one member inflate yields exactly one record.
  * `fetch` is the distributed form of that access path: each input
  * row seeks straight to its member — bytes touched per row are
  * `length`, never the file. Reference behavior: the reference's ETL
  * re-reads sources whole; random access is the capability a 100 TB
  * archive adds on top.
  *
  * Rows are sorted within partitions by (file, offset) first, so a
  * lookup batch that clusters in few files degrades gracefully into
  * forward-only seeks on a cached stream instead of handle churn.
  * `mapPartitions` here is the binary-decode precedent (multimodal
  * codecs) — seek-driven I/O has no declarative Column form.
  */
object WarcFetch {

  /** One fetched record (payload as the reader's ISO-8859-1 view —
    * byte-preserving, same contract as the `graft-warc` scan). */
  final case class Hit(file: String, offset: Long, rtype: String,
                       rec_id: String, uri: String, payload: String)

  /** Fetch the records named by `cdx` rows. Required input columns:
    * `file`, `offset`, `length` (the graft-warc CDX coordinates).
    * MEMBER-grain: each input row yields every record of its member —
    * one record for conforming `.warc.gz` (one member per record),
    * the whole file for plain `.warc` (the scan reports offset 0 /
    * length = file size for those). Callers fetching from coordinate
    * sets that may repeat a member dedupe on (file, offset) first. */
  def fetch(cdx: DataFrame): DataFrame = {
    val spark = cdx.sparkSession
    import spark.implicits._
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    cdx.select(col("file").cast("string"), col("offset").cast("long"),
        col("length").cast("long"))
      .sortWithinPartitions("file", "offset")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curPath: String = null
        var curIn: org.apache.hadoop.fs.FSDataInputStream = null
        // a consumer that stops early (limit, take) never reaches the
        // drained-iterator close below — the task boundary does
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            if (curIn != null) { curIn.close(); curIn = null }
          })
        def stream(path: String): org.apache.hadoop.fs.FSDataInputStream = {
          if (path != curPath) {
            if (curIn != null) curIn.close()
            val p = new org.apache.hadoop.fs.Path(path)
            curIn = p.getFileSystem(serConf.value).open(p)
            curPath = path
          }
          curIn
        }
        val out = it.flatMap { case (file, off, len) =>
          val in = stream(file)
          in.seek(off)
          val member = new Array[Byte](len.toInt)
          in.readFully(member)
          val bytes =
            if (file.endsWith(".gz"))
              new WarcFile.GzipMemberIterator(
                new java.io.ByteArrayInputStream(member)).next()
            else member
          WarcFile.parseRecords(bytes).map { r =>
            Hit(file, off, r.rtype, r.recId, r.uri,
              new String(r.payload, "ISO-8859-1"))
          }
        }
        // close the tail handle once the partition is drained
        new Iterator[Hit] {
          override def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && curIn != null) { curIn.close(); curIn = null }
            h
          }
          override def next(): Hit = out.next()
        }
      }
      .toDF()
  }

  /** The CDX build pass: one full scan of the archive (what Common
    * Crawl's cdx-indexer jobs do), never re-run per lookup. `rtypes`
    * pushes down so skipped records never construct rows. */
  def cdxIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
               rtype: Option[String] = Some("response")): DataFrame = {
    val scan = spark.read.format("graft-warc").load(dir)
    val filtered = rtype.fold(scan)(t => scan.filter(col("rtype") === t))
    filtered.select(col("file"), col("offset"), col("length"),
      col("rtype"), col("rec_id"), col("uri"), col("content_length"))
  }

  /** Digest-extended CDX rows (cdxj's `digest` field): md5 of the
    * payload bytes, for dedup-aware replay tooling. Same single scan
    * — the digest costs one hash over bytes already inflated. */
  def cdxIndexWithDigest(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame =
    spark.read.format("graft-warc").load(dir)
      .select(col("file"), col("offset"), col("length"), col("rtype"),
        col("rec_id"), col("uri"), col("content_length"),
        md5(col("payload")).as("digest"))
}
