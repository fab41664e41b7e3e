package graft.demo

import org.apache.spark.sql.SparkSession

/** Runnable sample: CDC loop interrupted after 2 batches, then resumed
  * by a fresh WatermarkStore instance (simulated process restart).
  * Batch directories are keyed by start watermark, so the resumed run
  * continues — no collision with, and no rewrite of, committed batches.
  * Run: sbt "Test/runMain graft.demo.CdcResumeDemo"
  */
object CdcResumeDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val base = java.nio.file.Files.createTempDirectory("cdc_resume_").toString
    def sink(b: org.apache.spark.sql.DataFrame, wm: Long): Unit =
      b.write.mode("overwrite").parquet(base + s"/out/batch=$wm")

    val store1 = new graft.ops.Cdc.WatermarkStore(spark, base + "/wm", -1L)
    val n1 = graft.ops.Cdc.runLoop(ev, "event_id", "t", store1, 3000,
      df => df, sink, maxBatches = 2)
    println(s"FIRST RUN: batches=$n1 dirs=" +
      new java.io.File(base + "/out").list().sorted.mkString(","))

    val store2 = new graft.ops.Cdc.WatermarkStore(spark, base + "/wm", -1L)
    val n2 = graft.ops.Cdc.runLoop(ev, "event_id", "t", store2, 3000,
      df => df, sink)
    println(s"RESUME: batches=$n2 dirs=" +
      new java.io.File(base + "/out").list().sorted.mkString(","))

    val out = spark.read.parquet(base + "/out")
    println(s"TOTAL=${out.count()} DISTINCT=${out.select("event_id").distinct().count()}")
    spark.stop()
  }
}
