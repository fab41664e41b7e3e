package graft
import org.apache.spark.sql.SparkSession
object TmpWiden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq(1).toDF("a").write.mode("overwrite").parquet("/tmp/widetest/m1")
    Seq(2L).toDF("a").write.mode("overwrite").parquet("/tmp/widetest/m2")
    try {
      val r = spark.read.option("mergeSchema", true)
        .parquet("/tmp/widetest/m1", "/tmp/widetest/m2")
      println("MERGE-SCHEMA " + r.schema.simpleString)
      r.collect().foreach(x => println("ROW " + x))
      println("MERGE-OK")
    } catch { case e: Throwable => println("MERGE-FAIL: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
