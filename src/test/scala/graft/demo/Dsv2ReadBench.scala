// sbt "Test/runMain graft.tools.Dsv2ReadBench" — DSv2 reader vs native
// parquet scan on identical committed data (sanity, not a benchmark
// suite: run 2-3x and compare floors; machine load dominates spreads)
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, TxnManifest}

object Dsv2ReadBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("dsv2rb_").toString
    val root = s"$base/t"
    val manPath = s"$base/_commits"
    val man = new TxnManifest(manPath)
    val ev = graft.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    for (i <- 0 until 4) {
      Sinks.appendBatch(ev.filter(pmod(col("event_id"), lit(4)) === i), root, i)
      man.commit(i, Seq(s"$root/batch=$i"))
    }
    val dirs = man.committedDirs(root)
    def time(tag: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime(); val n = body
      println(f"RB $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
    }
    def viaNative = spark.read.parquet(dirs: _*)
    def viaFormat = spark.read.format("graft-manifest")
      .option("manifest", manPath).load(root)
    time("native full agg")(
      viaNative.agg(sum("value")).collect().head.getDouble(0).toLong)
    time("dsv2   full agg")(
      viaFormat.agg(sum("value")).collect().head.getDouble(0).toLong)
    time("native filter+project")(
      viaNative.where(col("event_id") > 5000).select("user_id").count())
    time("dsv2   filter+project")(
      viaFormat.where(col("event_id") > 5000).select("user_id").count())
    spark.stop()
  }
}
