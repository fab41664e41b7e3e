package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
import graft.sources.{Sinks, StatsSinks, TxnManifest}

/** Incremental materialized views ([[graft.plans.GraftMvs]]): the
  * refreshed view must equal Spark's own aggregate over the CURRENT
  * source — after appends, updates, deletes, group birth and group
  * death — while additive refreshes never read the base table. */
class MvSpec extends SparkSuite {
  import spark.implicits._

  private def tempBase(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mv_$tag").toString

  /** Register a CDF-enabled source table seeded with `rows`. */
  private def newSource(tag: String, rows: DataFrame): (String, String, TxnManifest) = {
    val base = tempBase(tag)
    val root = s"$base/src"
    val man = new TxnManifest(s"$base/manifest.tsv")
    StatsSinks.appendBatchStats(rows, root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    GraftSqlTables.register(s"mv_${tag}_src", GraftSqlTables.Entry(root,
      s"$base/manifest.tsv", keys = Seq("id"), cdf = true))
    (s"mv_${tag}_src", base, man)
  }

  private def seed(n: Int): DataFrame =
    spark.range(n).select(col("id"),
      (col("id") % 4).cast("int").as("grp"),
      when(col("id") % 7 === 0, lit(null).cast("long"))
        .otherwise(col("id") * 3).as("m"),
      (col("id") % 100).cast("decimal(12,2)").as("d"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("additive MV: bootstrap, DML delta, group death — equals direct aggregate") {
    val (src, base, man) = newSource("add", seed(200))
    GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_add LOCATION '$base/mv' AS " +
        s"SELECT grp, count(*) AS n, count(m) AS nm, sum(m) AS sm, " +
        s"sum(d) AS sd, avg(m) AS am FROM $src WHERE id % 10 != 9 GROUP BY grp")
    def expected: DataFrame = {
      val e = GraftSqlTables.lookup(Seq(src)).get
      Sinks.readCommitted(spark, e.root, new TxnManifest(e.manifestPath))
        .where("id % 10 != 9").groupBy("grp")
        .agg(count(lit(1)).as("n"), count(col("m")).as("nm"),
          sum("m").as("sm"), sum("d").as("sd"), avg("m").as("am"))
    }
    val r1 = GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_add")
      .collect().head
    assert(r1.getBoolean(2), "bootstrap refresh must apply")
    assert(sortedRows(GraftMvs.read(spark, "mv_add")) == sortedRows(expected))
    assert(GraftMvs.read(spark, "mv_add").schema.map(f => (f.name, f.dataType))
      == expected.schema.map(f => (f.name, f.dataType)),
      "served types must match Spark's own aggregate types")

    // delta wave: append a new group (grp arrives only via id range),
    // update some measures, delete others — all CDF-recorded
    val e = GraftSqlTables.lookup(Seq(src)).get
    StatsSinks.appendBatchStats(seed(260).where("id >= 200"), e.root, 1)
    man.commit(1, Seq(s"${e.root}/batch=1"))
    GraftSql.execute(spark, s"UPDATE $src SET m = m + 1000 WHERE id % 11 = 3")
    GraftSql.execute(spark, s"DELETE FROM $src WHERE id % 13 = 5")
    val r2 = GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_add")
      .collect().head
    assert(r2.getBoolean(2) && r2.getInt(0) == 0 && r2.getInt(1) == 3)
    assert(sortedRows(GraftMvs.read(spark, "mv_add")) == sortedRows(expected))

    // group death: remove every remaining grp=2 row
    GraftSql.execute(spark, s"DELETE FROM $src WHERE grp = 2")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_add")
    val after = GraftMvs.read(spark, "mv_add")
    assert(after.where("grp = 2").count() == 0, "dead group must vanish")
    assert(sortedRows(after) == sortedRows(expected))

    // no-op refresh: applied=false and the MV manifest does not move
    val mvMan = new TxnManifest(s"$base/mv/manifest.tsv")
    val v = mvMan.version()
    val r3 = GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_add")
      .collect().head
    assert(!r3.getBoolean(2) && mvMan.version() == v,
      "a no-op refresh must commit nothing")
    GraftSql.execute(spark, "DROP MATERIALIZED VIEW mv_add")
  }

  test("additive refresh cost is O(delta), never a base-table scan") {
    val (src, base, man) = newSource("blind", seed(20000))
    GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_blind LOCATION '$base/mv' AS " +
        s"SELECT grp, count(*) AS n, sum(m) AS sm FROM $src GROUP BY grp")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_blind")
    // 50-row delta against a 20000-row base: the refresh may read the
    // delta and the touched MV groups, but a base scan would show up
    // as ≥20000 records read
    val e = GraftSqlTables.lookup(Seq(src)).get
    StatsSinks.appendBatchStats(seed(20050).where("id >= 20000"), e.root, 1)
    man.commit(1, Seq(s"${e.root}/batch=1"))
    val recordsRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_blind")
      Thread.sleep(1500) // drain the listener bus
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(recordsRead.get < 2000,
      s"incremental refresh read ${recordsRead.get} records — the " +
        "20000-row base table must not be scanned")
    val got = GraftMvs.read(spark, "mv_blind")
      .agg(sum("n")).collect().head.getLong(0)
    assert(got == 20050, s"expected 20050 rows counted, got $got")
    GraftSql.execute(spark, "DROP MATERIALIZED VIEW mv_blind")
  }

  test("recompute MV (min/max): delete of a group's max and a whole group") {
    val (src, base, _) = newSource("mm", seed(100))
    GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_mm LOCATION '$base/mv' AS " +
        s"SELECT grp, min(m) AS mn, max(m) AS mx, count(*) AS n, " +
        s"sum(m) AS sm FROM $src GROUP BY grp")
    def expected: DataFrame = {
      val e = GraftSqlTables.lookup(Seq(src)).get
      Sinks.readCommitted(spark, e.root, new TxnManifest(e.manifestPath))
        .groupBy("grp").agg(min("m").as("mn"), max("m").as("mx"),
          count(lit(1)).as("n"), sum("m").as("sm"))
    }
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_mm")
    assert(sortedRows(GraftMvs.read(spark, "mv_mm")) == sortedRows(expected))

    // the current max of grp=3 is id=99 → m=297; delete it
    GraftSql.execute(spark, s"DELETE FROM $src WHERE id = 99")
    // and kill grp=1 entirely
    GraftSql.execute(spark, s"DELETE FROM $src WHERE grp = 1")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_mm")
    val got = GraftMvs.read(spark, "mv_mm")
    assert(got.where("grp = 1").count() == 0)
    assert(sortedRows(got) == sortedRows(expected))
    GraftSql.execute(spark, "DROP MATERIALIZED VIEW mv_mm")
  }

  test("CREATE refusals name the unsupported shape") {
    val (src, base, _) = newSource("bad", seed(10))
    def refuse(select: String, frag: String): Unit = {
      val ex = intercept[Exception](GraftSql.execute(spark,
        s"CREATE MATERIALIZED VIEW mv_bad LOCATION '$base/mv' AS $select"))
      assert(ex.getMessage != null && ex.getMessage.contains(frag),
        s"message '${ex.getMessage}' should mention '$frag'")
    }
    refuse(s"SELECT grp, sum(m) FROM $src GROUP BY grp", "alias every aggregate")
    refuse(s"SELECT grp, count(DISTINCT m) AS n FROM $src GROUP BY grp",
      "DISTINCT")
    refuse(s"SELECT grp, first(m) AS f FROM $src GROUP BY grp", "first")
    refuse(s"SELECT grp, m FROM $src", "GROUP BY")
    refuse(s"SELECT a.grp, count(*) AS n FROM $src a JOIN $src b " +
      "ON a.id = b.id GROUP BY a.grp", "bare registered table")
    refuse(s"SELECT grp, sum(m) AS __s FROM $src GROUP BY grp", "internal")
    val ex = intercept[Exception](GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_bad LOCATION '$base/mv' AS " +
        "SELECT x, count(*) AS n FROM not_a_table GROUP BY x"))
    assert(ex.getMessage.contains("not a registered"))
  }
}
