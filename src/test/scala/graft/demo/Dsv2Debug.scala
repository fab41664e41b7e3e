// sbt "Test/runMain graft.tools.Dsv2Debug" — manual DSv2 restart debug
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.{Sinks, TxnManifest}

object Dsv2Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("dsv2dbg_").toString
    val root = s"$base/data"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)
    def batchDf(ids: Long*) = ids.map(i => (i, s"v$i")).toDF("id", "v")

    Sinks.appendBatch(batchDf(1, 2), root, 0); man.commit(0, Seq(s"$root/batch=0"))
    Sinks.appendBatch(batchDf(3, 4), root, 1); man.commit(1, Seq(s"$root/batch=1"))

    val outDir = s"$base/out"
    def start() = spark.readStream.format("graft-manifest")
      .option("manifest", manPath).load(root)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", s"$base/ckpt").start()

    def dumpState(tag: String): Unit = {
      println(s"DBG $tag rows=" + spark.read.parquet(outDir).count())
      val ofs = new java.io.File(s"$base/ckpt/offsets")
      if (ofs.exists()) ofs.listFiles().filterNot(_.getName.startsWith("."))
        .sortBy(_.getName).foreach { f =>
        val body = scala.io.Source.fromFile(f).mkString.replace("\n", " ~ ")
        println(s"DBG offset ${f.getName} >> $body")
      }
      val com = new java.io.File(s"$base/ckpt/commits")
      if (com.exists())
        println("DBG commits: " + com.listFiles().map(_.getName).sorted.mkString(","))
    }

    val q = start()
    q.processAllAvailable()
    dumpState("mid-run1")
    Sinks.appendBatch(batchDf(5, 6), root, 2); man.commit(2, Seq(s"$root/batch=2"))
    q.processAllAvailable()
    q.stop()
    dumpState("after-run1")

    Sinks.appendBatch(batchDf(7), root, 3); man.commit(3, Seq(s"$root/batch=3"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    dumpState("after-run2")
    println("DBG final: " + spark.read.parquet(outDir).orderBy("id")
      .collect().map(_.getLong(0)).mkString(","))
    spark.stop()
  }
}
