package graft.sources

import java.util
import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-warc` — a DSv2 reader for the file format web crawls
  * actually ship: `.warc.gz`, a concatenation of gzip MEMBERS with
  * one WARC record each (ISO 28500 §annex; the member-per-record
  * layout is what lets a reader skip records without inflating the
  * whole file). This is the entry-point I/O the t31 capsule-per-row
  * grain left open (ref has no WARC surface at all): a crawl corpus
  * arrives as millions of ~1 GB `.warc.gz` files, and the first
  * pipeline stage must split them into record rows.
  *
  * Split grain: one InputPartition per FILE — gzip members are not
  * seekable without an external index, so the file is the natural
  * task unit (Common Crawl sizes files to ~1 GB for exactly this
  * reason). Within a task the members stream: the reader holds ONE
  * inflated record at a time, never the file.
  *
  * Pushdown: column pruning reaches the reader (an un-projected
  * `payload` is never materialized into a row — the bytes still
  * inflate, because a member's extent is only knowable by inflating
  * it, but the per-record string allocation is skipped) and `rtype`
  * equality/IN filters skip non-matching records before row
  * construction (a `WHERE rtype = 'response'` over a real crawl
  * drops ⅔ of all rows at the scan). Both are visible in
  * `.explain` (`ReadSchema`/`PushedFilters`); Spark re-applies the
  * filters post-scan, so acceptance is purely an optimization.
  *
  * Gzip framing is decoded dependency-free per RFC 1952 (the
  * Inflater/PNG-IDAT precedent): fixed header, FEXTRA/FNAME/
  * FCOMMENT/FHCRC optional fields, raw-deflate body, CRC32 + ISIZE
  * trailer — both verified, loudly.
  *
  * Cluster parity (round 16): every FileSystem access — listing,
  * stream planning, record reading, corpus writing — resolves
  * through the SESSION's Hadoop configuration
  * (`sessionState.newHadoopConf()`, serialized to executors as
  * Spark's own FileFormat does), never a bare `new Configuration()`:
  * on a real cluster the s3a credentials / defaultFS / viewfs mounts
  * live there, and a from-scratch conf silently reads the wrong
  * namespace. Listing is RECURSIVE (Common Crawl lands as
  * `segments/∗/warc/∗.warc.gz` — a single-level listing would read a
  * nested layout as an empty corpus), and a batch scan that matches
  * ZERO files refuses loudly instead of returning an empty relation
  * (the same loud-over-silent posture as the stream's vanished-file
  * guard; an empty STREAM root stays legal — the tail's whole job is
  * waiting for files to land).
  */
object WarcFile {

  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("rec_ix", LongType, nullable = false),
    StructField("rtype", StringType, nullable = true),
    StructField("rec_id", StringType, nullable = true),
    StructField("uri", StringType, nullable = true),
    StructField("refers_to", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = true),
    // compressed byte range of the record's gzip member — the CDX
    // coordinates (Common Crawl's cdx `offset`/`length` fields);
    // `WarcFetch` seeks straight to one member with them
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false)))

  /** One parsed WARC record (headers + the Content-Length payload).
    * `refersTo` carries `WARC-Refers-To` — null except on `revisit`
    * records, which name their original capture with it. */
  final case class Rec(rtype: String, recId: String, uri: String,
                       refersTo: String, payload: Array[Byte])

  /** Parse the WARC records of one decompressed member by
    * Content-Length accounting (payloads legally contain the record
    * terminator — the JVM twin of [[graft.text.WarcExtract]]'s
    * Column fold). Conforming `.warc.gz` files carry ONE record per
    * member; a multi-record member still walks. Trailing bytes that
    * are not a record refuse loudly — inside a gzip member there is
    * no innocent garbage. */
  def parseRecords(m: Array[Byte]): Seq[Rec] = {
    val s = new String(m, "ISO-8859-1")
    val out = Seq.newBuilder[Rec]
    var pos = 0
    while (pos < s.length) {
      require(s.startsWith("WARC/", pos),
        s"WARC member: no record magic at offset $pos")
      val hEnd = s.indexOf("\r\n\r\n", pos)
      require(hEnd > 0, "WARC member: header never terminates")
      val hdr = s.substring(pos, hEnd)
      def h(name: String): String = {
        val at = hdr.indexOf(s"\r\n$name: ")
        if (at < 0) null
        else {
          val from = at + name.length + 4
          val to = hdr.indexOf("\r\n", from)
          hdr.substring(from, if (to < 0) hdr.length else to)
        }
      }
      val clen = h("Content-Length")
      require(clen != null, "WARC member: record without Content-Length")
      val len = clen.trim.toInt
      val start = hEnd + 4
      require(start + len + 4 <= s.length,
        s"WARC member: Content-Length $len runs past the member end")
      require(s.startsWith("\r\n\r\n", start + len),
        "WARC member: payload not followed by the record terminator")
      out += Rec(h("WARC-Type"), h("WARC-Record-ID"), h("WARC-Target-URI"),
        h("WARC-Refers-To"),
        java.util.Arrays.copyOfRange(m, start, start + len))
      pos = start + len + 4
    }
    out.result()
  }

  /** Recursive `.warc(.gz)` listing under `root` (a single file lists
    * as itself) — name-sorted, so both the batch split order and the
    * stream's (count, last-name) offsets are stable across nested
    * layouts. */
  def listWarcFiles(fs: org.apache.hadoop.fs.FileSystem,
                    root: org.apache.hadoop.fs.Path)
    : Seq[(String, Long)] = {
    val st = fs.getFileStatus(root)
    def walk(s: org.apache.hadoop.fs.FileStatus): Seq[(String, Long)] =
      if (s.isFile) {
        val n = s.getPath.toString
        if (n.endsWith(".warc.gz") || n.endsWith(".warc"))
          Seq((n, s.getLen))
        else Nil
      } else fs.listStatus(s.getPath).toSeq.flatMap(walk)
    walk(st).sortBy(_._1)
  }

  // --------------------------------------------------- gzip member framing

  /** Encode one gzip member (RFC 1952): fixed header (no optional
    * fields, MTIME 0, OS 255 = unknown), raw-deflate body, CRC32 +
    * ISIZE little-endian. */
  def gzipMember(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
      0xff.toByte), 0, 10)
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue)
    le32(payload.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** Streaming member-wise decoder over an InputStream: yields each
    * member's decompressed bytes, verifying CRC32 and ISIZE, holding
    * one member at a time. Concatenated members (the `.warc.gz`
    * layout) walk until EOF; a torn trailer or failed checksum
    * refuses loudly. */
  final class GzipMemberIterator(in: java.io.InputStream)
    extends Iterator[Array[Byte]] {
    private val buf = new Array[Byte](1 << 16)
    private var bufPos = 0
    private var bufLen = 0
    private var eof = false
    private var readTotal = 0L

    /** Compressed byte range of the member the last `next()` returned
      * — the CDX coordinates: `seek(lastMemberOffset)` +
      * `read(lastMemberLength)` re-yields exactly that member without
      * touching the rest of the file (members are independently
      * inflatable; deflate streams are not seekable WITHIN). */
    var lastMemberOffset: Long = -1L
    var lastMemberLength: Long = -1L

    /** Bytes of `in` consumed so far = bytes fetched minus the
      * unread tail of the buffer. */
    private def consumed: Long = readTotal - (bufLen - bufPos)

    private def fill(): Unit =
      if (!eof && bufPos == bufLen) {
        val n = in.read(buf)
        if (n < 0) eof = true else { bufPos = 0; bufLen = n; readTotal += n }
      }

    private def u8(): Int = {
      fill()
      require(!eof, "gzip: truncated member")
      val b = buf(bufPos) & 0xff
      bufPos += 1
      b
    }

    private def skip(n: Int): Unit = (0 until n).foreach(_ => u8())
    private def skipZeroTerminated(): Unit = while (u8() != 0) ()

    override def hasNext: Boolean = { fill(); !eof }

    override def next(): Array[Byte] = {
      val mStart = consumed
      // ---- header (RFC 1952 §2.3)
      require(u8() == 0x1f && u8() == 0x8b, "gzip: bad magic")
      require(u8() == 8, "gzip: compression method must be deflate")
      val flg = u8()
      skip(6) // MTIME + XFL + OS
      if ((flg & 4) != 0) { val xlen = u8() | (u8() << 8); skip(xlen) }
      if ((flg & 8) != 0) skipZeroTerminated()  // FNAME
      if ((flg & 16) != 0) skipZeroTerminated() // FCOMMENT
      if ((flg & 2) != 0) skip(2)               // FHCRC
      // ---- raw deflate body
      val inf = new java.util.zip.Inflater(true)
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val chunk = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        if (inf.needsInput()) {
          fill()
          require(!eof, "gzip: deflate stream truncated")
          inf.setInput(buf, bufPos, bufLen - bufPos)
          bufPos = bufLen // consumed below via getRemaining
        }
        val n = inf.inflate(chunk)
        require(n > 0 || !inf.needsDictionary(),
          "gzip: deflate stream needs a preset dictionary")
        out.write(chunk, 0, n)
      }
      // return the bytes the Inflater read past the deflate end
      bufPos -= inf.getRemaining
      inf.end()
      val payload = out.toByteArray
      // ---- trailer: CRC32 + ISIZE (mod 2^32), little-endian
      def le32(): Long =
        u8().toLong | (u8().toLong << 8) | (u8().toLong << 16) |
          (u8().toLong << 24)
      val crcStored = le32()
      val isize = le32()
      val crc = new java.util.zip.CRC32
      crc.update(payload)
      require(crc.getValue == crcStored,
        f"gzip: CRC mismatch (stored 0x$crcStored%08x, " +
          f"computed 0x${crc.getValue}%08x)")
      require((payload.length.toLong & 0xffffffffL) == isize,
        s"gzip: ISIZE $isize != decompressed length ${payload.length}")
      lastMemberOffset = mStart
      lastMemberLength = consumed - mStart
      payload
    }
  }
}

final class GraftWarcProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-warc"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcFile.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftWarcTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("graft-warc: path required")))
}

final class GraftWarcTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft-warc `$root`"
  override def schema(): StructType = WarcFile.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownFilters {
      // the SESSION's Hadoop conf, captured at plan time — cluster FS
      // settings (s3a credentials, defaultFS) ride into every listing
      // and read below
      private val hconf = org.apache.spark.sql.SparkSession.active
        .sessionState.newHadoopConf()
      private var required: StructType = WarcFile.Schema
      private var pushed: Array[Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        // accept rtype equality/IN and uri prefixes (records skip
        // before row build — per-host slices of a shared crawl
        // archive are the common read, and most records are other
        // hosts); everything returns for Spark's post-scan
        // re-evaluation
        pushed = filters.filter {
          case EqualTo("rtype", _: String)        => true
          case In("rtype", _)                     => true
          case StringStartsWith("uri", _: String) => true
          case _                                  => false
        }
        filters
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def build(): Scan =
        new GraftWarcScan(root, required, pushed, hconf)
    }
}

final case class WarcFilePartition(path: String, length: Long)
  extends InputPartition

final class GraftWarcScan(root: String, required: StructType,
                          pushed: Array[Filter],
                          hconf: org.apache.hadoop.conf.Configuration)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  private val serConf = new org.apache.spark.util.SerializableConfiguration(hconf)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftWarcScan(root=$root, " +
      s"readSchema=[${required.fieldNames.mkString(",")}], " +
      s"pushedFilters=[${pushed.mkString(",")}])"

  /** Skip-rate observability: members/records/bytes per scan surface
    * in the SQL UI next to Spark's own rows-output — the rtype
    * pushdown's effect (`warcRecordsSkipped` vs `warcRecordsRead`)
    * is visible per query instead of needing log spelunking. */
  override def supportedCustomMetrics()
    : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new WarcMembersMetric, new WarcRecordsMetric,
      new WarcRecordsSkippedMetric, new WarcBytesInflatedMetric)

  private lazy val files: Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(root)
    WarcFile.listWarcFiles(p.getFileSystem(hconf), p)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // an empty BATCH scan is a misconfigured path until proven
    // otherwise (nested layouts used to read as empty before the
    // recursive walk) — refuse loudly; the stream path stays lenient
    require(files.nonEmpty,
      s"graft-warc: 0 .warc/.warc.gz files matched under $root — " +
        "wrong root, or the corpus has not landed")
    files.map { case (path, len) => WarcFilePartition(path, len) }.toArray
  }

  /** Compressed bytes on disk — same conservative broadcast basis as
    * the manifest scan: without it a DSv2 relation reports ∞ and a
    * join against a small record set never auto-broadcasts. */
  override def estimateStatistics()
    : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(files.map(_._2).sum)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }

  private def pushedRtypes: Option[Set[String]] = {
    val sets = pushed.toSeq.collect {
      case EqualTo("rtype", v: String) => Set(v)
      case In("rtype", vs)             => vs.collect { case s: String => s }.toSet
    }
    sets.reduceOption(_ intersect _)
  }

  /** Conjunction of pushed uri prefixes — a record survives only if
    * its uri starts with ALL of them (that is what pushing several
    * StartsWith filters means). */
  private def pushedUriPrefixes: Seq[String] =
    pushed.toSeq.collect { case StringStartsWith("uri", p) => p }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, pushedRtypes, pushedUriPrefixes, serConf)

  /** STREAMING tail of the landing directory — crawl dumps land as
    * files over hours/days, and the pipeline follows them. Offsets
    * are (count, last-name) over the LEXICOGRAPHICALLY sorted file
    * list: each micro-batch reads exactly the files between the two
    * counts, which is exactly-once iff names arrive MONOTONICALLY —
    * the contract every crawl layout satisfies (Common Crawl segment
    * paths are timestamped; the test writer's part numbers ascend).
    * A file that appears BEHIND the committed watermark would
    * otherwise be silently skipped forever, so the planner refuses
    * loudly instead (rename it forward or re-land it — the same
    * loud-over-silent posture as the index torn guards). Files are
    * immutable once landed (the gzip trailer makes a torn copy fail
    * its CRC rather than half-read). */
  override def toMicroBatchStream(checkpointLocation: String)
    : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(root, required, pushedRtypes,
      pushedUriPrefixes, serConf)
}

final class WarcMembersMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "warcMembersRead"
  override def description(): String = "gzip members inflated"
}
final class WarcRecordsMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "warcRecordsRead"
  override def description(): String = "WARC records emitted"
}
final class WarcRecordsSkippedMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "warcRecordsSkipped"
  override def description(): String =
    "WARC records skipped by rtype/uri pushdown"
}
final class WarcBytesInflatedMetric
  extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "warcBytesInflated"
  override def description(): String = "decompressed member bytes"
}
private final case class WarcTaskMetric(name: String, value: Long)
  extends org.apache.spark.sql.connector.metric.CustomTaskMetric

final case class WarcStreamOffset(n: Int, last: String)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val esc = last.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"n":$n,"last":"$esc"}"""
  }
}

final class WarcMicroBatchStream(root: String, required: StructType,
                                 rtypes: Option[Set[String]],
                                 uriPrefixes: Seq[String],
                                 serConf: org.apache.spark.util.SerializableConfiguration)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {
  import org.apache.spark.sql.connector.read.streaming.Offset

  /** Per-trigger progress metrics: how far the tail has committed
    * into the landing dir and how much is still waiting — the
    * catch-up observability an operator reads off
    * `StreamingQueryProgress.sources[i].metrics` without log
    * spelunking (the manifest stream's scan-metric move at the
    * SOURCE grain). */
  override def metrics(latestConsumedOffset: java.util.Optional[Offset])
    : java.util.Map[String, String] = {
    val committed =
      if (latestConsumedOffset.isPresent)
        latestConsumedOffset.get.asInstanceOf[WarcStreamOffset].n
      else 0
    val landed = listFiles().size
    val m = new java.util.HashMap[String, String]()
    m.put("filesCommitted", committed.toString)
    m.put("filesLanded", landed.toString)
    m.put("filesPending", math.max(0, landed - committed).toString)
    m
  }

  private def listFiles(): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(serConf.value)
    if (!fs.exists(p)) Seq.empty
    else WarcFile.listWarcFiles(fs, p).map(_._1)
  }

  override def initialOffset(): Offset = WarcStreamOffset(0, "")
  override def latestOffset(): Offset = {
    val fs = listFiles()
    WarcStreamOffset(fs.size, fs.lastOption.getOrElse(""))
  }
  override def deserializeOffset(json: String): Offset = {
    val m = """\{"n":(\d+),"last":"(.*)"\}""".r
    json match {
      case m(n, last) => WarcStreamOffset(n.toInt,
        last.replace("\\\"", "\"").replace("\\\\", "\\"))
      case _ => throw new IllegalArgumentException(
        s"graft-warc: unparseable stream offset $json")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
    : Array[InputPartition] = {
    val s = start.asInstanceOf[WarcStreamOffset]
    val e = end.asInstanceOf[WarcStreamOffset]
    val fs = listFiles()
    require(fs.size >= e.n,
      s"graft-warc: ${e.n - fs.size} file(s) VANISHED from $root after " +
        "the offset was planned — landed files must be immutable")
    val batch = fs.slice(s.n, e.n)
    // monotone-naming contract: a file sorting at/behind the committed
    // watermark would be skipped silently forever — refuse loudly
    val behind = if (s.last.isEmpty) Nil else batch.filter(_ <= s.last)
    require(behind.isEmpty,
      s"graft-warc: file(s) ${behind.mkString(",")} landed BEHIND the " +
        s"committed watermark '${s.last}' — names must ascend (re-land " +
        "them under a later name)")
    batch.map(p => WarcFilePartition(p, 0L): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, rtypes, uriPrefixes, serConf)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class WarcReaderFactory(required: StructType,
                              rtypes: Option[Set[String]],
                              uriPrefixes: Seq[String],
                              serConf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
    : PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[WarcFilePartition]
    val path = new org.apache.hadoop.fs.Path(part.path)
    val fs = path.getFileSystem(serConf.value)
    val raw = fs.open(path)
    var nMembers = 0L
    var nRecords = 0L
    var nSkipped = 0L
    var bytesInflated = 0L
    // (member bytes, compressed offset, compressed length) — the
    // offsets ride along so `offset`/`length` project the CDX
    // coordinates of each record's member
    val members: Iterator[(Array[Byte], Long, Long)] =
      (if (part.path.endsWith(".gz")) {
         val gz = new WarcFile.GzipMemberIterator(raw)
         gz.map(m => (m, gz.lastMemberOffset, gz.lastMemberLength))
       } else Iterator.single { // plain .warc: one "member" = the file
         val out = new java.io.ByteArrayOutputStream
         val buf = new Array[Byte](1 << 16)
         var n = raw.read(buf)
         while (n >= 0) { out.write(buf, 0, n); n = raw.read(buf) }
         (out.toByteArray, 0L, out.size.toLong)
       }).map { t => nMembers += 1; bytesInflated += t._1.length; t }
    val fileUtf8 = UTF8String.fromString(part.path)
    val cols = required.fieldNames
    var recIx = -1L
    val rows: Iterator[InternalRow] = members
      .flatMap { case (m, off, len) =>
        WarcFile.parseRecords(m).map(r => (r, off, len)) }
      .map { case (r, off, len) => recIx += 1; (r, recIx, off, len) }
      .collect { case (r, ix, off, len) if {
          val keep = rtypes.forall(_.contains(r.rtype)) &&
            uriPrefixes.forall(p => r.uri != null && r.uri.startsWith(p))
          if (keep) nRecords += 1 else nSkipped += 1
          keep
        } =>
        InternalRow.fromSeq(cols.toSeq.map {
          case "file"           => fileUtf8
          case "rec_ix"         => ix
          case "rtype"          => UTF8String.fromString(r.rtype)
          case "rec_id"         => UTF8String.fromString(r.recId)
          case "uri"            =>
            if (r.uri == null) null else UTF8String.fromString(r.uri)
          case "refers_to"      =>
            if (r.refersTo == null) null
            else UTF8String.fromString(r.refersTo)
          case "content_length" => r.payload.length.toLong
          case "payload"        =>
            UTF8String.fromString(new String(r.payload, "ISO-8859-1"))
          case "offset"         => off
          case "length"         => len
        })
      }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = raw.close()
      override def currentMetricsValues()
        : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(WarcTaskMetric("warcMembersRead", nMembers),
          WarcTaskMetric("warcRecordsRead", nRecords),
          WarcTaskMetric("warcRecordsSkipped", nSkipped),
          WarcTaskMetric("warcBytesInflated", bytesInflated))
    }
  }
}

/** Test-corpus `.warc.gz` writer: the documents table rendered into
  * real multi-member gzip WARC files — one gzip member per record
  * (the Common Crawl layout), `nFiles` range-partitioned files, rows
  * sorted within each so content is deterministic across retries and
  * bench passes. */
object WarcGz {
  /** `prefix` names the wave — streaming tails require file names to
    * ASCEND across landings (the WarcMicroBatchStream contract), so a
    * later wave lands under a later prefix. */
  def writeCorpus(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, dir: String, nFiles: Int,
                  prefix: String = "part",
                  encodeHttp: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    writeRendered(docs, idCol,
      graft.text.WarcExtract.renderWarcRecords(
        col(idCol), split(col(textCol), " "), encodeHttp),
      dir, nFiles, prefix)
  }

  /** WET export: the corpus's TEXT column as `conversion` records —
    * one gzip member per record, the container Common Crawl ships
    * extracted text in. `textCol` is the (already-extracted) text. */
  def writeWet(docs: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, dir: String, nFiles: Int,
               prefix: String = "wet"): Unit = {
    import org.apache.spark.sql.functions._
    writeRendered(docs, idCol,
      graft.text.WarcExtract.renderWetRecords(col(idCol), col(textCol)),
      dir, nFiles, prefix)
  }

  /** Arbitrary caller-rendered record arrays (the writeWet shape,
    * public): e.g. capsules that mix `response` and `revisit`
    * records — crawl-time dedup writes a revisit naming the original
    * capture instead of re-storing the body. */
  def writeRecords(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   records: org.apache.spark.sql.Column, dir: String,
                   nFiles: Int, prefix: String = "part"): Unit =
    writeRendered(docs, idCol, records, dir, nFiles, prefix)

  private def writeRendered(docs: org.apache.spark.sql.DataFrame,
                            idCol: String,
                            records: org.apache.spark.sql.Column,
                            dir: String, nFiles: Int,
                            prefix: String): Unit = {
    import org.apache.spark.sql.functions._
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      docs.sparkSession.sessionState.newHadoopConf())
    val recs = docs
      .repartitionByRange(nFiles, col(idCol))
      .sortWithinPartitions(idCol)
      .select(records.as("recs"))
    recs.foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(
          f"$dir/$prefix-$pid%05d.warc.gz")
        val fs = path.getFileSystem(serConf.value)
        val out = fs.create(path, true)
        try it.foreach { row =>
          row.getSeq[String](0).foreach { rec =>
            val m = WarcFile.gzipMember(rec.getBytes("ISO-8859-1"))
            out.write(m, 0, m.length)
          }
        } finally out.close()
    }
  }

  /** Land a wave into a LIVE landing directory: write to a staging
    * dir, then move the files in ASCENDING name order. A parallel
    * in-place write cannot honor the micro-batch tail's
    * monotone-naming contract — tasks finish out of order, and a
    * listing between two completions commits a watermark PAST a
    * yet-to-appear smaller name (the stream's behind-watermark guard
    * then refuses, correctly but fatally). Rename-in-order makes
    * every intermediate listing a legal prefix of the wave. */
  def landCorpus(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, landDir: String, nFiles: Int,
                 prefix: String = "part",
                 encodeHttp: Boolean = false): Unit = {
    val stage = s"${landDir}_stage_$prefix"
    writeCorpus(docs, idCol, textCol, stage, nFiles, prefix, encodeHttp)
    val conf = docs.sparkSession.sessionState.newHadoopConf()
    val sp = new org.apache.hadoop.fs.Path(stage)
    val fs = sp.getFileSystem(conf)
    val land = new org.apache.hadoop.fs.Path(landDir)
    if (!fs.exists(land)) fs.mkdirs(land)
    fs.listStatus(sp).filter(_.isFile).map(_.getPath)
      .sortBy(_.getName).foreach { f =>
        require(fs.rename(f, new org.apache.hadoop.fs.Path(land, f.getName)),
          s"landCorpus: rename of $f failed")
      }
    fs.delete(sp, true)
    ()
  }
}
