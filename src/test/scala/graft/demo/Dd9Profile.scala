// sbt "Test/runMain graft.tools.Dd9Profile" — phase timing for dd9
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Dd9Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, (System.nanoTime(),
          j.properties.getProperty("spark.job.description", "?").take(80)))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStart.get(j.jobId)).foreach { case (t0, desc) =>
          println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $desc")
        }
      }
    })
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val dir = java.nio.file.Files.createTempDirectory("dd9prof_").toString
      val docs = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val all = docs.unionAll(docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" perturbed")).as("text")))
      val p0 = t("ingest batch 0")(graft.text.DedupIndex.ingestBatch(
        all.filter(col("doc_id") % 2 === 0), "doc_id", "text", dir, 0))
      val p1 = t("ingest batch 1")(graft.text.DedupIndex.ingestBatch(
        all.filter(col("doc_id") % 2 === 1), "doc_id", "text", dir, 1))
      t("union count")(p0.unionAll(p1).count())
      graft.util.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
