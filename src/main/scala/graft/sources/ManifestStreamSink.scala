package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Path => HPath}
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Streaming WRITE side of the `graft-manifest` format — with
  * [[GraftManifestProvider]]'s read side this closes the loop: a
  * Structured Streaming query can terminate INTO a manifest-committed
  * table, and any number of downstream consumers (the DSv2 source, the
  * driver-loop consumer, plain `readCommitted`) tail it with the same
  * visibility guarantees.
  *
  * Exactly-once without a commit coordinator:
  *   - each epoch writes `<root>/batch=<epochId>/part-<partitionId>
  *     .parquet` — names are DETERMINISTIC in (epoch, partition) and
  *     opened in OVERWRITE mode, so a replayed epoch (post-crash) or a
  *     retried task rewrites its own bytes instead of accumulating
  *     duplicates;
  *   - the driver-side `commit(epoch)` then names the directory in the
  *     [[TxnManifest]] — the ONLY visibility point. Re-committing the
  *     same epoch replaces its manifest line (idempotent), and a crash
  *     BEFORE the manifest commit leaves an invisible orphan dir that
  *     the next replay overwrites and vacuum's grace period tolerates.
  *
  * The sink assumes it is the manifest's single writer (same contract
  * as the CDC producer loop) and that epoch ids — Spark's monotonically
  * increasing micro-batch ids — are the manifest's batch ids. Append
  * output mode only: a manifest is an immutable log, so complete/update
  * modes (which truncate) are rejected at the capability level.
  *
  * Epoch-id OWNERSHIP (the Delta streaming-sink `(appId, version)`
  * guard): a sidecar log next to the manifest records which query
  * committed each epoch id. Re-committing an id is allowed only for
  * the SAME query (the post-crash replay window, where Spark re-runs
  * an epoch whose manifest commit landed but whose WAL entry did not);
  * a DIFFERENT writer — a restart against a fresh checkpointLocation
  * whose epoch counter reset to 0, or a batch producer already using
  * the id — fails loudly instead of silently un-naming committed
  * batches and overwriting their dirs.
  */
final class GraftManifestStreamingWrite(root: String, manifestPath: String,
                                        schema: StructType, queryId: String,
                                        bloomCols: Seq[String] = Nil,
                                        schemaLogPath: Option[String] = None,
                                        bucketSpec: Option[Bucketing.Spec] = None)
  extends StreamingWrite {

  // columnMapping tables: resolve the logical->physical BINDING once
  // per QUERY — the binding keys on PHYSICAL ids, so a metadata-only
  // RENAME during the stream's lifetime never touches the writer
  // (files carry physical names; readers pick up the new logical name
  // immediately). Spark re-constructs the streaming write every
  // micro-batch, so the first resolution persists to a query-scoped
  // sidecar (`<manifest>.sink/<queryId>.binding`) and later
  // constructions read it back — a rename between epochs therefore
  // cannot re-bind a RUNNING query. A RESTART whose plan schema no
  // longer matches the stored binding's logical names re-binds
  // against the current log (the user evolved the query with the
  // table). The stream's schema must cover exactly the mapping's
  // logical columns, the appendBatchMapped contract.
  private val binding: Option[Seq[SchemaLog.Col]] = schemaLogPath.map { lp =>
    // logical-name matching is CASE-INSENSITIVE, like every other
    // mapped path (Physicalizer/alignTo) and Spark's own resolution
    def lower(ns: Iterable[String]) =
      ns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val bindPath = SinkEpochLog.dir(manifestPath) + s"/$queryId.binding"
    val stored = SchemaLog.parseCols(
      graft.util.AtomicText.readLines(bindPath))
    if (stored.nonEmpty &&
        lower(stored.map(_.logical)) == lower(schema.fieldNames)) stored
    else {
      val (_, cols) = new SchemaLog(lp).current()
      require(cols.nonEmpty, s"schema log $lp not initialized")
      val missing = lower(cols.map(_.logical)) -- lower(schema.fieldNames)
      require(missing.isEmpty,
        s"graft-manifest streaming sink is missing mapped logical " +
          s"columns $missing")
      val extra = lower(schema.fieldNames) -- lower(cols.map(_.logical))
      require(extra.isEmpty,
        s"graft-manifest streaming sink carries unmapped columns $extra")
      graft.util.AtomicText.writeAtomically(bindPath,
        SchemaLog.renderCols(cols))
      cols
    }
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // ship the session's Hadoop+SQL conf to the tasks the way Spark's
    // own file writers do, then pin the write-path keys
    // ParquetWriteSupport/SparkToParquetSchemaConverter ASSERT on —
    // newHadoopConfWithOptions only carries explicitly-set confs, so
    // session defaults for these would otherwise arrive as null
    val spark = SparkSession.active
    val sql = spark.sessionState.conf
    val hconf = spark.sessionState.newHadoopConfWithOptions(Map.empty)
    hconf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.writeLegacyParquetFormat.toString)
    hconf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.parquetOutputTimestampType.toString)
    hconf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.parquetFieldIdWriteEnabled.toString)
    hconf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    hconf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    hconf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    GraftManifestWriterFactory(root, manifestPath, queryId, schema.json,
      new org.apache.spark.util.SerializableConfiguration(hconf),
      schemaLogPath, binding.map(SchemaLog.renderCols), bucketSpec)
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    require(epochId <= Int.MaxValue, s"epoch $epochId exceeds manifest id range")
    val id = epochId.toInt
    val manifest = new TxnManifest(manifestPath)
    // ownership re-check (the authoritative claim happened task-side
    // at write start, before any bytes moved); idempotent for replays.
    // The mapping payload rides along for the ZERO-PARTITION epoch
    // case — without it a crash after this claim would leave an
    // empty-payload claim that wedges every replay's binding
    // validation ('bound physical columns no longer exist')
    SinkEpochLog.claim(manifestPath, id, queryId, manifest,
      payload = schemaLogPath.fold("") { lp =>
        SchemaLog.renderCols(new SchemaLog(lp).current()._2)
      })
    // prune STRAY deterministic part files from a previous, WIDER
    // attempt of this epoch: a replay with fewer partitions (changed
    // parallelism after a crash) rewrites part-0..k but would leave
    // the dead attempt's part-(k+1).. visible after the commit —
    // the commit messages name exactly this attempt's files
    val committedNames = messages.flatMap {
      case GraftManifestFileCommitted(p, _)  => Seq(new HPath(p).getName)
      case GraftManifestFilesCommitted(files) =>
        files.map(f => new HPath(f._1).getName)
      case _ => Nil
    }.toSet
    val dir = new HPath(s"$root/batch=$epochId")
    val fc = fileContextFor(dir)
    // an epoch that planned ZERO partitions wrote no files and never
    // created its dir — the manifest commit below names it regardless
    // (epoch id = batch id is the exactly-once invariant), so make
    // the dir exist: parquet listing over an EMPTY dir is benign,
    // over a MISSING dir it fails the whole table's read
    if (!fc.util().exists(dir))
      fc.mkdir(dir, org.apache.hadoop.fs.permission.FsPermission
        .getDirDefault, true)
    if (fc.util().exists(dir)) {
      fc.util().listStatus(dir)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.getName.startsWith(".") &&
          !committedNames.contains(st.getPath.getName))
        .foreach(st => fc.delete(st.getPath, false))
    }
    // stat the epoch before it becomes visible: sink-fed tables stay
    // data-skippable like every other committing surface (driver-side
    // footer pass over the epoch's files); declared bloom columns are
    // indexed with it (one extra pass over the fresh epoch)
    SparkSession.getActiveSession.foreach { s =>
      BatchStats.writeSidecar(s, s"$root/batch=$epochId")
      if (bloomCols.nonEmpty)
        BloomIndex.writeSidecar(s, s"$root/batch=$epochId", bloomCols)
    }
    // bucketed tables: single-key epochs routed through the write's
    // required distribution (partition id = bucket id — every task
    // verified its rows against that claim at write time); MULTI-key
    // epochs routed task-side through the rolling per-bucket writer
    // (each file holds exactly one flat-grid bucket by construction).
    // Either way the layout marker + EXPLICIT file → bucket map land
    // before the commit — SPJ survives streaming ingest
    bucketSpec.foreach { b =>
      val entries = messages.flatMap {
        case GraftManifestFileCommitted(p, bucket) =>
          Seq(new HPath(p).getName -> bucket)
        case GraftManifestFilesCommitted(files) =>
          files.map { case (p, bucket) => new HPath(p).getName -> bucket }
        case _ => Nil
      }.toSeq
      Bucketing.writeMarkerFiles(s"$root/batch=$epochId", b, entries)
    }
    manifest.commit(id, Seq(s"$root/batch=$epochId"), Some(queryId))
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    // Three cases, most-protective first:
    //   - the epoch dir is manifest-named (crash after commit, before
    //     Spark's WAL write — the replay window): reader-visible data;
    //     sweep only hidden `.tmp` attempt files;
    //   - WE own the epoch (or nobody does) and it was never
    //     committed: invisible; delete the dir whole so a later replay
    //     with fewer partitions cannot inherit stale part files, and
    //     RELEASE the ownership claim — a never-committed epoch must
    //     not wedge a future query that legitimately reuses the id;
    //   - ANOTHER query owns the epoch: this abort belongs to a losing
    //     racer — touch nothing, the owner's files are not ours.
    val p = new HPath(s"$root/batch=$epochId")
    val fc = fileContextFor(p)
    val id = if (epochId <= Int.MaxValue) Some(epochId.toInt) else None
    val manifestNamed = id.exists(i =>
      new TxnManifest(manifestPath).committed().get(i)
        .exists(_.contains(s"$root/batch=$epochId")))
    val owner = id.flatMap(i => SinkEpochLog.ownerOf(manifestPath, i))
    if (manifestNamed) {
      if (fc.util().exists(p))
        fc.util().listStatus(p)
          .filter(st => st.isFile && st.getPath.getName.startsWith("."))
          .foreach(st => fc.delete(st.getPath, false))
    } else if (owner.forall(_ == queryId)) {
      if (fc.util().exists(p)) { fc.delete(p, true); () }
      id.foreach(i => SinkEpochLog.release(manifestPath, i, queryId))
    }
    ()
  }

  private def fileContextFor(p: HPath): FileContext = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    if (p.toUri.getScheme == null) FileContext.getFileContext(conf)
    else FileContext.getFileContext(p.toUri, conf)
  }
}

/** Sidecar ownership log `<manifest>.sink/<epochId>`: one tiny file
  * per sink epoch, created EXCLUSIVELY (the same CAS primitive as the
  * manifest's version claims) with the owning query id as content.
  * Exclusive create makes concurrent claims race-free — two queries
  * claiming the same epoch serialize on the filesystem's atomic
  * create, and claims for DIFFERENT epochs never touch each other's
  * files (no read-modify-write of a shared file to lose). */
private[graft] object SinkEpochLog {

  def dir(manifestPath: String): String = manifestPath + ".sink"
  def path(manifestPath: String, epochId: Int): String =
    s"${dir(manifestPath)}/$epochId"

  /** Per-JVM memo of (manifest, epoch, query) triples that passed —
    * each executor pays the metadata IO once per epoch, not per task. */
  private val passed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int, String)]()

  /** Claim `epochId` for `queryId`, failing loudly when the id is
    * owned by a different query or already committed to the manifest
    * by a non-sink producer. Idempotent for replays of the same query.
    * Called task-side at WRITE START (before any bytes move — a
    * driver-commit-time check alone would fire only after the epoch
    * dir's deterministic file names were already overwritten) and
    * again driver-side at commit. */
  /** Current owner of an epoch id, if claimed. */
  def ownerOf(manifestPath: String, epochId: Int): Option[String] =
    graft.util.AtomicText.readLines(path(manifestPath, epochId)).headOption

  /** The claim's payload lines (everything after the owner id) — the
    * epoch-pinned column-mapping snapshot for mapped-table sinks. */
  def payloadOf(manifestPath: String, epochId: Int): Seq[String] =
    graft.util.AtomicText.readLines(path(manifestPath, epochId)).drop(1)

  /** Release a claim this query holds on a NEVER-COMMITTED epoch (the
    * abort path) so the id stays usable by a future query. No-op when
    * the claim is absent or held by someone else. */
  def release(manifestPath: String, epochId: Int, queryId: String): Unit =
    if (ownerOf(manifestPath, epochId).contains(queryId)) {
      val p = new HPath(path(manifestPath, epochId))
      val conf = SparkSession.getActiveSession
        .map(_.sparkContext.hadoopConfiguration).getOrElse(new Configuration())
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) { fs.delete(p, false); () }
      passed.remove((manifestPath, epochId, queryId)); ()
    }

  def claim(manifestPath: String, epochId: Int, queryId: String,
            manifest: TxnManifest, payload: String = ""): Unit = {
    val key = (manifestPath, epochId, queryId)
    if (passed.contains(key)) return
    ownerOf(manifestPath, epochId) match {
      case Some(owner) if owner == queryId => () // same-query replay
      case Some(owner) => refuseOwned(epochId, owner, queryId)
      case None =>
        if (manifest.committed().contains(epochId))
          throw new IllegalStateException(
            s"epoch $epochId is already a committed manifest batch id " +
              "(from a non-sink producer) — committing would un-name its " +
              "dirs; choose a manifest this sink owns exclusively")
        if (!graft.util.AtomicText.createExclusive(
            path(manifestPath, epochId),
            queryId + "\n" + (if (payload.isEmpty) "" else payload + "\n"))) {
          // lost the create race: the winner writes its id right after
          // the exclusive create, so briefly poll through the
          // created-but-not-yet-written window (concurrent tasks of
          // the SAME query race here routinely)
          var owner = ownerOf(manifestPath, epochId)
          var waits = 0
          while (owner.isEmpty && waits < 100) {
            Thread.sleep(10); owner = ownerOf(manifestPath, epochId); waits += 1
          }
          owner match {
            case Some(o) if o == queryId => ()
            case Some(o) => refuseOwned(epochId, o, queryId)
            case None => throw new IllegalStateException(
              s"epoch $epochId ownership file exists but never received " +
                "an owner id — a claimant died mid-write; delete " +
                s"${path(manifestPath, epochId)} to recover")
          }
        }
    }
    passed.add(key); ()
  }

  private def refuseOwned(epochId: Int, owner: String, queryId: String): Nothing =
    throw new IllegalStateException(
      s"epoch $epochId already committed by streaming query $owner " +
        s"(this query: $queryId) — a restart against a fresh " +
        "checkpointLocation resets epoch ids to 0 and would " +
        "silently overwrite committed batches; resume from the " +
        "original checkpoint or point the sink at a fresh manifest")
}

private final case class GraftManifestWriterFactory(
    root: String, manifestPath: String, queryId: String, schemaJson: String,
    serConf: org.apache.spark.util.SerializableConfiguration,
    schemaLogPath: Option[String] = None,
    bindingLines: Option[String] = None,
    bucketSpec: Option[Bucketing.Spec] = None)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    // ownership CLAIM before any bytes move: task-side commit() renames
    // files into the (possibly reader-visible) epoch dir ahead of the
    // driver's manifest commit, so a wrong-writer epoch is refused here,
    // race-free via the exclusive create. Metadata-scale (memoized per
    // executor per epoch).
    //
    // columnMapping tables additionally pin ONE SchemaLog snapshot per
    // epoch in the claim payload (atomic with the exclusive create):
    // every task of the epoch validates the query-start binding against
    // THAT snapshot, so a concurrent ALTER lands between epochs, never
    // inside one. The binding itself keys on PHYSICAL ids — a RENAME
    // passes validation untouched; a DROP (or drop+re-ADD, which mints
    // a fresh physical id) of a bound column refuses loudly: writing
    // to a dead physical id would be silently invisible data.
    require(epochId <= Int.MaxValue, s"epoch $epochId exceeds manifest id range")
    val payload = schemaLogPath.fold("") { lp =>
      SchemaLog.renderCols(new SchemaLog(lp).current()._2)
    }
    SinkEpochLog.claim(manifestPath, epochId.toInt, queryId,
      new TxnManifest(manifestPath), payload = payload)
    val logical = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[StructType]
    val schema = bindingLines match {
      case None => logical
      case Some(lines) =>
        val bound = SchemaLog.parseCols(lines.split('\n').toSeq)
        val pinned = SchemaLog.parseCols(
          SinkEpochLog.payloadOf(manifestPath, epochId.toInt))
        val live = pinned.map(_.physical).toSet
        val dead = bound.map(_.physical).filterNot(live.contains)
        require(dead.isEmpty,
          s"epoch $epochId: bound physical columns $dead no longer " +
            "exist in the column mapping (a mid-stream DROP COLUMN, or " +
            "drop + re-ADD) — restart the query against the current " +
            "schema; rows written to a dead physical id would be " +
            "invisible")
        val toPhys = bound.map(c =>
          c.logical.toLowerCase(java.util.Locale.ROOT) -> c.physical).toMap
        StructType(logical.fields.map(f =>
          f.copy(name = toPhys(f.name.toLowerCase(java.util.Locale.ROOT)))))
    }
    val conf = new Configuration(serConf.value)
    ParquetWriteSupport.setSchema(schema, conf)
    // attempt-UNIQUE temp, renamed to the deterministic target only in
    // the coordinator-authorized commit(): under speculation two
    // attempts of one partition write concurrently, and bytes-level
    // interleaving on a shared file would corrupt it — only one
    // attempt's commit() runs (useCommitCoordinator default), so the
    // rename has a single owner. Epoch replays re-rename over the old
    // target; everything stays invisible until the manifest commit.
    val dir = s"$root/batch=$epochId"
    bucketSpec match {
      case Some(b) if b.keys.size > 1 =>
        // MULTI-key (product-grid) routing has no connector
        // distribution spelling (partition id would have to equal the
        // Horner'd flat index, which no HashPartitioning produces) —
        // so the TASK routes instead: the rolling writer splits its
        // rows into per-bucket files (each file holds exactly ONE
        // flat-grid bucket by construction, whatever the upstream
        // distribution did), and the commit records the explicit
        // file → bucket map. Keys are PHYSICAL names.
        val idx = b.keys.map { k =>
          val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(k))
          require(i >= 0,
            s"bucketBy key '$k' is missing from the sink's write " +
              s"schema ${schema.simpleString}")
          i
        }
        new GraftManifestRollingBucketWriter(dir, partitionId, taskId,
          conf, b, idx.toArray, idx.map(schema.fields(_).dataType).toArray)
      case b =>
        // single-key: the epoch routed through the write's required
        // distribution, so THIS task's partition id IS the bucket id —
        // verified per row (the check turns a planner that stopped
        // honoring the distribution into a loud failure, never a
        // marker that silently mis-groups joins). Keys are PHYSICAL
        // names, resolved against the physical write schema.
        val routing = b.map { spec =>
          val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(spec.key))
          require(i >= 0,
            s"bucketBy key '${spec.key}' is missing from the sink's write " +
              s"schema ${schema.simpleString}")
          BucketRouting(spec.n, i, schema.fields(i).dataType, partitionId)
        }
        new GraftManifestDataWriter(
          new HPath(s"$dir/.part-$partitionId-$taskId.tmp.parquet"),
          new HPath(s"$dir/part-$partitionId.parquet"), conf, partitionId,
          routing)
    }
  }
}

/** Per-row bucket verification for a bucketed streaming epoch: every
  * row this task writes must hash to the task's partition id under
  * the table's routing function — allocation-free on the hot path. */
private final case class BucketRouting(n: Int, keyIdx: Int,
                                       keyType: org.apache.spark.sql
                                         .types.DataType,
                                       partitionId: Int) {
  def check(row: InternalRow): Unit = {
    val b = Bucketing.bucketOf(row.get(keyIdx, keyType), keyType, n)
    if (b != partitionId)
      throw new IllegalStateException(
        s"bucketed streaming sink: a row of partition $partitionId hashes " +
          s"to bucket $b — the epoch was not routed through the write's " +
          "required distribution; the layout marker would lie")
  }
}

/** One InternalRow parquet writer, overwrite mode — shared by the
  * single-file epoch writer and the rolling per-bucket writer. */
private object SinkParquet {
  private final class B(p: HPath)
    extends ParquetWriter.Builder[InternalRow, B](p) {
    override def self(): B = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }
  def open(p: HPath, conf: Configuration): ParquetWriter[InternalRow] =
    new B(p)
      .withConf(conf)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
}

private final class GraftManifestDataWriter(tmp: HPath, target: HPath,
                                            conf: Configuration,
                                            partitionId: Int = -1,
                                            routing: Option[BucketRouting] = None)
  extends DataWriter[InternalRow] {

  private val writer = SinkParquet.open(tmp, conf)

  // FileSystem (not FileContext): on a checksummed local FS the facade
  // renames/deletes the .crc sidecar together with the file, and the
  // delete+rename non-atomicity is harmless here — the single
  // authorized committer owns the target, which stays invisible until
  // the manifest commit
  private def fs = target.getFileSystem(conf)

  override def write(record: InternalRow): Unit = {
    routing.foreach(_.check(record))
    writer.write(record)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
    GraftManifestFileCommitted(target.toString, partitionId)
  }

  override def abort(): Unit = {
    writer.close()
    if (fs.exists(tmp)) { fs.delete(tmp, false); () }
  }

  override def close(): Unit = ()
}

/** Task-side routing for a MULTI-key bucketed streaming epoch: the
  * product-grid flat index has no connector-distribution spelling
  * (no HashPartitioning makes partition id equal the Horner'd index),
  * so instead of demanding a distribution this writer SPLITS its rows
  * into per-bucket files — each file holds exactly one flat-grid
  * bucket BY CONSTRUCTION, whatever the upstream distribution did,
  * and the commit message carries the explicit (file, bucket) map the
  * epoch marker records. Soundness therefore never depends on the
  * planner; the upstream clustered-on-keys distribution the write
  * still requests only keeps the FILE COUNT down (equal key tuples
  * co-locate). At most [[GraftManifestRollingBucketWriter.MaxOpen]]
  * parquet writers are open per task — an evicted bucket that
  * reappears opens a NEW file (seq suffix), so handles and writer
  * buffers stay bounded at any grid size; many small files heal at
  * the next OPTIMIZE (compactBucketed preserves the layout).
  *
  * File names are deterministic in (partition, seq): a replayed epoch
  * overwrites its own bytes, and the driver commit prunes stray names
  * from any wider previous attempt — the same exactly-once story as
  * the single-file writer. */
private final class GraftManifestRollingBucketWriter(
    dir: String, partitionId: Int, taskId: Long, conf: Configuration,
    spec: Bucketing.Spec, keyIdx: Array[Int],
    keyTypes: Array[org.apache.spark.sql.types.DataType])
  extends DataWriter[InternalRow] {

  import GraftManifestRollingBucketWriter.MaxOpen

  // access-ordered: iteration starts at the least-recently-written
  // bucket, which is the one evicted when the open-writer cap hits
  private val open = new java.util.LinkedHashMap[
    Int, (HPath, HPath, ParquetWriter[InternalRow])](16, 0.75f, true)
  private val closed =
    scala.collection.mutable.ArrayBuffer.empty[(HPath, HPath, Int)]
  private var seq = 0

  private def fs = new HPath(dir).getFileSystem(conf)

  private def writerFor(bucket: Int): ParquetWriter[InternalRow] = {
    val have = open.get(bucket)
    if (have != null) have._3
    else {
      if (open.size() >= MaxOpen) {
        val it = open.entrySet().iterator()
        val eldest = it.next()
        val (tmp, target, w) = eldest.getValue
        w.close()
        closed += ((tmp, target, eldest.getKey))
        it.remove()
      }
      val tmp = new HPath(
        s"$dir/.part-$partitionId-$taskId-$seq.tmp.parquet")
      val target = new HPath(s"$dir/part-$partitionId-$seq.parquet")
      seq += 1
      val w = SinkParquet.open(tmp, conf)
      open.put(bucket, (tmp, target, w))
      w
    }
  }

  override def write(record: InternalRow): Unit = {
    var flat = 0
    var i = 0
    while (i < keyIdx.length) {
      flat = flat * spec.n +
        Bucketing.bucketOf(record.get(keyIdx(i), keyTypes(i)),
          keyTypes(i), spec.n)
      i += 1
    }
    writerFor(flat).write(record)
  }

  override def commit(): WriterCommitMessage = {
    open.forEach((b, v) => { v._3.close(); closed += ((v._1, v._2, b)) })
    open.clear()
    val committed = closed.map { case (tmp, target, bucket) =>
      if (fs.exists(target)) fs.delete(target, false)
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"rename $tmp -> $target failed")
      target.toString -> bucket
    }.toSeq
    GraftManifestFilesCommitted(committed)
  }

  override def abort(): Unit = {
    open.forEach((_, v) => { v._3.close(); closed += ((v._1, v._2, -1)) })
    open.clear()
    closed.foreach { case (tmp, _, _) =>
      if (fs.exists(tmp)) { fs.delete(tmp, false); () }
    }
  }

  override def close(): Unit = ()
}

private object GraftManifestRollingBucketWriter {
  /** Concurrently open parquet writers per task — bounds file handles
    * and writer buffers independently of the bucket-grid size. */
  val MaxOpen = 64
}

private[graft] final case class GraftManifestFileCommitted(path: String,
                                                           partitionId: Int = -1)
  extends WriterCommitMessage

/** Commit message of [[GraftManifestRollingBucketWriter]]: every file
  * this task renamed into the epoch dir, with the flat-grid bucket id
  * each file's rows all share. */
private[graft] final case class GraftManifestFilesCommitted(
    files: Seq[(String, Int)])
  extends WriterCommitMessage
