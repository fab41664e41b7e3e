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
  */
final class GraftManifestStreamingWrite(root: String, manifestPath: String,
                                        schema: StructType)
  extends StreamingWrite {

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
    GraftManifestWriterFactory(root, schema.json,
      new org.apache.spark.util.SerializableConfiguration(hconf))
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    require(epochId <= Int.MaxValue, s"epoch $epochId exceeds manifest id range")
    // stat the epoch before it becomes visible: sink-fed tables stay
    // data-skippable like every other committing surface (driver-side
    // footer pass over the epoch's files)
    SparkSession.getActiveSession.foreach(s =>
      BatchStats.writeSidecar(s, s"$root/batch=$epochId"))
    new TxnManifest(manifestPath)
      .commit(epochId.toInt, Seq(s"$root/batch=$epochId"))
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    // best-effort: the dir is invisible either way (never committed);
    // a replay of the epoch overwrites it file-for-file
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    val p = new HPath(s"$root/batch=$epochId")
    val fc =
      if (p.toUri.getScheme == null) FileContext.getFileContext(conf)
      else FileContext.getFileContext(p.toUri, conf)
    if (fc.util().exists(p)) { fc.delete(p, true); () }
  }
}

private final case class GraftManifestWriterFactory(
    root: String, schemaJson: String,
    serConf: org.apache.spark.util.SerializableConfiguration)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[StructType]
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
    new GraftManifestDataWriter(
      new HPath(s"$dir/.part-$partitionId-$taskId.tmp.parquet"),
      new HPath(s"$dir/part-$partitionId.parquet"), conf)
  }
}

private final class GraftManifestDataWriter(tmp: HPath, target: HPath,
                                            conf: Configuration)
  extends DataWriter[InternalRow] {

  private final class B(p: HPath)
    extends ParquetWriter.Builder[InternalRow, B](p) {
    override def self(): B = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  private val writer = new B(tmp)
    .withConf(conf)
    .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
    .withCompressionCodec(CompressionCodecName.SNAPPY)
    .build()

  // FileSystem (not FileContext): on a checksummed local FS the facade
  // renames/deletes the .crc sidecar together with the file, and the
  // delete+rename non-atomicity is harmless here — the single
  // authorized committer owns the target, which stays invisible until
  // the manifest commit
  private def fs = target.getFileSystem(conf)

  override def write(record: InternalRow): Unit = writer.write(record)

  override def commit(): WriterCommitMessage = {
    writer.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"rename $tmp -> $target failed")
    GraftManifestFileCommitted(target.toString)
  }

  override def abort(): Unit = {
    writer.close()
    if (fs.exists(tmp)) { fs.delete(tmp, false); () }
  }

  override def close(): Unit = ()
}

private final case class GraftManifestFileCommitted(path: String)
  extends WriterCommitMessage
