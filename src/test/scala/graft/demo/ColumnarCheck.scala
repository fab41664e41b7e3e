// sbt "Test/runMain graft.tools.ColumnarCheck" — is the DSv2 scan columnar?
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, TxnManifest}

object ColumnarCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("colchk_").toString
    val man = new TxnManifest(s"$base/_c")
    Sinks.appendBatch((1 to 100).map(i => (i.toLong, i * 1.0)).toDF("id", "m"),
      s"$base/t", 0)
    man.commit(0, Seq(s"$base/t/batch=0"))
    val df = spark.read.format("graft-manifest")
      .option("manifest", s"$base/_c").load(s"$base/t")
      .agg(sum("m"))
    df.collect()
    println("PLAN " + df.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Columnar") || l.contains("BatchScan"))
      .mkString(" | "))
    spark.stop()
  }
}
