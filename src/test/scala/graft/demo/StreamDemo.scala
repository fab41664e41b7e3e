package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Runnable sample consumer of `graft.streaming.EventStreams`:
  * streams events through the windowed aggregation into a parquet
  * sink with checkpointing, demonstrating append-mode emission of
  * closed windows as the watermark advances.
  * Run: sbt "Test/runMain graft.demo.StreamDemo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("stream_demo_").toString
    val mem = MemoryStream[(Long, String, String, Double)]
    val src = mem.toDF().toDF("event_id", "ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val q = graft.streaming.EventStreams.windowedAgg(src)
      .writeStream.format("parquet")
      .option("path", base + "/out")
      .option("checkpointLocation", base + "/ckpt")
      .outputMode("append").start()
    mem.addData((1L, "2024-01-01 00:10:00", "click", 1.0),
      (2L, "2024-01-01 00:40:00", "click", 2.0),
      (3L, "2024-01-01 01:05:00", "view", 3.0))
    q.processAllAvailable()
    mem.addData((9L, "2024-01-01 05:00:00", "view", 0.5))
    q.processAllAvailable()
    mem.addData((10L, "2024-01-01 09:00:00", "view", 0.5))
    q.processAllAvailable()
    println("=== CLOSED WINDOWS EMITTED TO PARQUET ===")
    spark.read.parquet(base + "/out").orderBy("bucket_start", "event_type").show(false)
    q.stop()

    // stream-static enrichment: dim resolved per micro-batch
    val mem2 = MemoryStream[(Long, String, String, Double)]
    val dim = Seq(("click", 1), ("view", 2)).toDF("event_type", "type_id")
    val enriched = graft.streaming.EventStreams.enrich(
      mem2.toDF().toDF("event_id", "ts_s", "event_type", "value"),
      dim, Seq("event_type"))
    val q2 = enriched.writeStream.format("parquet")
      .option("path", base + "/enriched")
      .option("checkpointLocation", base + "/ckpt2")
      .outputMode("append").start()
    mem2.addData((1L, "t", "click", 1.0), (2L, "t", "view", 2.0),
      (3L, "t", "scroll", 3.0))
    q2.processAllAvailable()
    println("=== ENRICHED STREAM ===")
    spark.read.parquet(base + "/enriched")
      .orderBy("event_id").select("event_id", "event_type", "type_id").show(false)
    q2.stop(); spark.stop()
  }
}
