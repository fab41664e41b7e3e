package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct.
  *
  * The heavy per-item work (decode, feature-extract, resize,
  * frame-sample) runs via `mapPartitions` over batches — the Scala
  * analogue of a vectorized pandas UDF: one decoder instantiation per
  * partition, streamed row iterators, no per-row JVM↔native churn. The
  * actual codec call is STUBBED (`decodeStub`) with a deterministic
  * fake — the container has no image/audio libs — but the Spark-side
  * contract (schema, batching, partitioning, null behavior) is real
  * and tested; swap `decodeStub` for an opencv/ffmpeg binding at
  * deployment.
  *
  * Scale notes: media blobs dominate row size — keep them OUT of
  * shuffle keys, repartition by id before decode so work units are
  * even, and project metadata-only columns for any relational step
  * (Catalyst prunes the binary column from scans that don't need it).
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class MediaMeta(id: Long, format: String, width: Int,
                             height: Int, n_bytes: Long, checksum: String)

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Reads "format" from the first payload byte and synthesizes
    * dimensions from a payload digest; replace the body with the real
    * binding (e.g. javacv) in production. Everything around it —
    * batch iteration, schema, null-safety — is the production path. */
  def decodeStub(payload: Array[Byte]): (String, Int, Int) = {
    val b0 = if (payload.isEmpty) 0 else payload(0) & 0xff
    val fmt = (b0 % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    val digest = payload.foldLeft(17L)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffff)
    (fmt, (64 + digest % 1920).toInt, (64 + digest % 1080).toInt)
  }

  /** Decode/feature-extract over partitions (pandas-UDF-equivalent
    * batch shape): one iterator pass, constant memory. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts etc.)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (fmt, w, h) = decodeStub(r.payload)
        val sum = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaMeta(r.id, fmt, w, h, r.payload.length.toLong, sum)
      }
    }
  }

  /** Frame-sampling plan for video payloads: deterministic frame
    * indices at `fps` over `durationMs`, capped at `maxFrames` —
    * pure column expression, the decode of each sampled frame then
    * fans out through [[extractMeta]]. */
  def frameSampleIndices(durationMs: org.apache.spark.sql.Column, fps: Double,
                         maxFrames: Int): org.apache.spark.sql.Column = {
    val total = floor(durationMs / lit(1000.0 / fps)).cast(IntegerType)
    val n     = least(total, lit(maxFrames))
    when(n > 0, transform(sequence(lit(0), n - 1),
      i => (i * total / n).cast(IntegerType))).otherwise(array())
  }

  /** Wrap a string-keyed table as media rows (payload = UTF-8 bytes) —
    * the testdata stand-in for a real blob store read. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }
}
