package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Live JDBC execution path (SURVEY.md §2.1 S1/S3/S8) against an
  * embedded Derby database — the closest offline stand-in for the
  * reference's SQL Server endpoints (`accounts.py:44-45,128`). Derby
  * ships with Spark, and in local mode the partition readers run
  * in-JVM, so the in-memory DB is visible to every "executor".
  */
class JdbcSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // one-time seed (suite body runs before test registration executes)
  private lazy val seeded: Unit = {
    withConn { c =>
      val st = c.createStatement()
      st.execute(
        "CREATE TABLE accounts (id BIGINT PRIMARY KEY, name VARCHAR(32), bal DOUBLE)")
      val ps = c.prepareStatement("INSERT INTO accounts VALUES (?, ?, ?)")
      (1 to 1000).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"acct$i")
        ps.setDouble(3, i * 1.5); ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    }
  }

  test("S1 — partitioned full-table backfill: N concurrent range cursors") {
    seeded
    val df = Sources.jdbcFullTable(spark, url, "accounts", "id", 1L, 1000L, 4).load()
    assert(df.rdd.getNumPartitions == 4, "range partitioning must yield 4 JDBC cursors")
    assert(df.count() == 1000)
    assert(df.agg(sum("id")).first().getLong(0) == 500500L)
  }

  test("S3 — keyset pagination drains the table in watermark order") {
    seeded
    var wm = 0L
    var total = 0L
    var batches = 0
    var done = false
    while (!done) {
      val batch = Sources
        .jdbcKeysetAnsi(spark, url, "accounts", "id", wm, 300, Seq("id", "name"))
        .load()
      val rows = batch.agg(count(lit(1)), max(col("id"))).first()
      if (rows.getLong(0) == 0) done = true
      else {
        val mx = rows.getLong(1)
        assert(mx > wm, "keyset batches must advance the watermark")
        wm = mx; total += rows.getLong(0); batches += 1
      }
    }
    assert(total == 1000)
    assert(batches == 4) // 300+300+300+100
  }

  test("S8 — JDBC write-back round-trips through the database") {
    val out = Seq((1L, "x", 9.5), (2L, "y", -1.0)).toDF("id", "v", "score")
    out.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", "sunk").save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "sunk").load()
    assert(back.count() == 2)
    assert(back.filter(col("id") === 1L).select("v").first().getString(0) == "x")
  }
}
