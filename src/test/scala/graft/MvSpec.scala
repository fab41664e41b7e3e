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
    refuse(s"SELECT grp, sum(DISTINCT m) AS n FROM $src GROUP BY grp",
      "DISTINCT")
    refuse(s"SELECT grp, first(m) AS f FROM $src GROUP BY grp", "first")
    refuse(s"SELECT grp, m FROM $src", "GROUP BY")
    refuse(s"SELECT a.grp, count(*) AS n FROM $src a JOIN $src b " +
      "ON a.id = b.id GROUP BY a.grp", "self-join")
    refuse(s"SELECT grp, sum(m) AS __s FROM $src GROUP BY grp", "internal")
    val ex = intercept[Exception](GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_bad LOCATION '$base/mv' AS " +
        "SELECT x, count(*) AS n FROM not_a_table GROUP BY x"))
    assert(ex.getMessage.contains("not a registered"))
  }

  test("count(DISTINCT) MV maintains through recompute mode") {
    val (src, base, _) = newSource("cd", seed(300))
    GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_cd LOCATION '$base/mv' AS " +
        s"SELECT grp, count(DISTINCT d) AS dd, count(*) AS n " +
        s"FROM $src GROUP BY grp")
    def expected: DataFrame = {
      val e = GraftSqlTables.lookup(Seq(src)).get
      Sinks.readCommitted(spark, e.root, new TxnManifest(e.manifestPath))
        .groupBy("grp")
        .agg(countDistinct(col("d")).as("dd"), count(lit(1)).as("n"))
    }
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_cd")
    assert(sortedRows(GraftMvs.read(spark, "mv_cd")) == sortedRows(expected))
    // deletes that remove SOME occurrences of shared d values (d has
    // duplicates within a group) and updates that collapse values
    GraftSql.execute(spark, s"DELETE FROM $src WHERE id < 40")
    GraftSql.execute(spark, s"UPDATE $src SET d = 0 WHERE id % 17 = 3")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_cd")
    assert(sortedRows(GraftMvs.read(spark, "mv_cd")) == sortedRows(expected))
    GraftSql.execute(spark, "DROP MATERIALIZED VIEW mv_cd")
  }

  test("fresh MV accelerates matching SELECTs; stale serves from base") {
    val (src, base, man) = newSource("acc", seed(400))
    GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_acc LOCATION '$base/mv' AS " +
        s"SELECT grp, count(*) AS n, sum(m) AS sm, avg(m) AS am " +
        s"FROM $src WHERE id % 10 != 9 GROUP BY grp")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_acc")
    val e = GraftSqlTables.lookup(Seq(src)).get
    def direct: DataFrame =
      Sinks.readCommitted(spark, e.root, new TxnManifest(e.manifestPath))
        .where("id % 10 != 9").groupBy("grp")
        .agg(sum("m").as("sm"), count(lit(1)).as("n"))
    val q = s"SELECT grp, sum(m) AS sm, count(*) AS n FROM $src " +
      "WHERE id % 10 != 9 GROUP BY grp"

    val served = GraftSql.execute(spark, q)
    val plan1 = served.queryExecution.executedPlan.toString
    assert(!plan1.contains(e.root),
      "a fresh MV must serve without touching the base table")
    assert(plan1.contains(s"$base/mv/data"),
      "the accelerated plan must scan the MV store")
    assert(sortedRows(served) == sortedRows(direct))

    // stale view: new base data, no refresh → compute from the base
    StatsSinks.appendBatchStats(seed(440).where("id >= 400"), e.root, 1)
    man.commit(1, Seq(s"${e.root}/batch=1"))
    val fallback = GraftSql.execute(spark, q)
    assert(fallback.queryExecution.executedPlan.toString.contains(e.root),
      "a stale MV must never serve")
    assert(sortedRows(fallback) == sortedRows(direct))

    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_acc")
    assert(!GraftSql.execute(spark, q).queryExecution.executedPlan
      .toString.contains(e.root), "refreshed → accelerated again")

    // residual key predicate: applied above the serve
    val res = GraftSql.execute(spark, s"SELECT grp, avg(m) AS am FROM $src " +
      "WHERE id % 10 != 9 AND grp >= 2 GROUP BY grp")
    assert(!res.queryExecution.executedPlan.toString.contains(e.root))
    assert(sortedRows(res) == sortedRows(
      Sinks.readCommitted(spark, e.root, new TxnManifest(e.manifestPath))
        .where("id % 10 != 9 AND grp >= 2").groupBy("grp")
        .agg(avg("m").as("am"))))

    // ORDER BY / LIMIT wrappers re-attach around the serve
    val top = GraftSql.execute(spark, s"SELECT grp, sum(m) AS sm FROM $src " +
      "WHERE id % 10 != 9 GROUP BY grp ORDER BY sm DESC LIMIT 2")
    assert(!top.queryExecution.executedPlan.toString.contains(e.root))
    assert(top.collect().map(_.getInt(0)).toSeq ==
      direct.orderBy(col("sm").desc).limit(2).collect()
        .map(_.getInt(0)).toSeq)
    GraftSql.execute(spark, "DROP MATERIALIZED VIEW mv_acc")
  }

  test("rollup rewrite: coarser GROUP BY and global aggregates") {
    val (src, base, _) = newSource("roll", seed(500))
    // two-key view; queries at (grp) and global grain both serve
    val e = GraftSqlTables.lookup(Seq(src)).get
    GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_roll LOCATION '$base/mv' AS " +
        s"SELECT grp, d, count(*) AS n, sum(m) AS sm, avg(m) AS am, " +
        s"min(m) AS mn, max(m) AS mx FROM $src GROUP BY grp, d")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_roll")
    def committed: DataFrame =
      Sinks.readCommitted(spark, e.root, new TxnManifest(e.manifestPath))

    val coarse = GraftSql.execute(spark,
      s"SELECT grp, sum(m) AS sm, avg(m) AS am, min(m) AS mn, " +
        s"count(*) AS n FROM $src GROUP BY grp")
    assert(!coarse.queryExecution.executedPlan.toString.contains(e.root),
      "coarser-grain query must roll up from the MV store")
    assert(sortedRows(coarse) == sortedRows(
      committed.groupBy("grp").agg(sum("m").as("sm"), avg("m").as("am"),
        min("m").as("mn"), count(lit(1)).as("n"))))
    assert(coarse.schema.map(f => (f.name, f.dataType)) ==
      committed.groupBy("grp").agg(sum("m").as("sm"), avg("m").as("am"),
        min("m").as("mn"), count(lit(1)).as("n"))
        .schema.map(f => (f.name, f.dataType)),
      "rollup must serve the direct aggregate's types")

    val global = GraftSql.execute(spark,
      s"SELECT count(*) AS n, sum(m) AS sm, max(m) AS mx FROM $src")
    assert(!global.queryExecution.executedPlan.toString.contains(e.root))
    assert(sortedRows(global) == sortedRows(
      committed.agg(count(lit(1)).as("n"), sum("m").as("sm"),
        max("m").as("mx"))))
    GraftSql.execute(spark, "DROP MATERIALIZED VIEW mv_roll")
  }

  test("join MV: fact delta folds through the dim; dim move recomputes") {
    val base = tempBase("join")
    def mkTable(tag: String, rows: DataFrame, keys: Seq[String])
      : (String, TxnManifest) = {
      val root = s"$base/$tag"
      val man = new TxnManifest(s"$base/$tag.manifest.tsv")
      StatsSinks.appendBatchStats(rows, root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      GraftSqlTables.register(s"mv_join_$tag", GraftSqlTables.Entry(root,
        s"$base/$tag.manifest.tsv", keys = keys, cdf = true))
      (s"mv_join_$tag", man)
    }
    val (fact, _) = mkTable("fact", spark.range(3000).select(col("id"),
      (col("id") % 10).cast("int").as("sk"),
      (col("id") * 2).as("qty")), Seq("id"))
    val (dim, _) = mkTable("dim", spark.range(10).select(
      col("id").cast("int").as("k"),
      (col("id") % 3).cast("int").as("nk")), Seq("k"))
    GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_join LOCATION '$base/mv' AS " +
        s"SELECT d.nk, count(*) AS n, sum(f.qty) AS sq " +
        s"FROM $fact f JOIN $dim d ON f.sk = d.k GROUP BY d.nk")
    def expected: DataFrame = {
      val ef = GraftSqlTables.lookup(Seq(fact)).get
      val ed = GraftSqlTables.lookup(Seq(dim)).get
      val f = Sinks.readCommitted(spark, ef.root,
        new TxnManifest(ef.manifestPath))
      val dd = Sinks.readCommitted(spark, ed.root,
        new TxnManifest(ed.manifestPath))
      f.join(dd, f("sk") === dd("k")).groupBy("nk")
        .agg(count(lit(1)).as("n"), sum("qty").as("sq"))
    }
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_join")
    assert(sortedRows(GraftMvs.read(spark, "mv_join")) == sortedRows(expected))

    // fact wave → the incremental arm: ΔF ⋈ D folds additively and
    // the 3000-row fact base is never re-scanned
    GraftSql.execute(spark, s"DELETE FROM $fact WHERE id % 7 = 2")
    GraftSql.execute(spark, s"UPDATE $fact SET qty = qty + 5 WHERE id % 11 = 0")
    val recordsRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_join")
      Thread.sleep(1500) // drain the listener bus
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(recordsRead.get < 2500,
      s"fact-delta refresh read ${recordsRead.get} records — the " +
        "3000-row fact base must not be scanned")
    assert(sortedRows(GraftMvs.read(spark, "mv_join")) == sortedRows(expected))

    // dim move → the full-recompute arm, group death included:
    // relabel nk=2 dims onto nk=0, so group 2 must vanish
    GraftSql.execute(spark, s"UPDATE $dim SET nk = 0 WHERE nk = 2")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_join")
    val after = GraftMvs.read(spark, "mv_join")
    assert(after.where("nk = 2").count() == 0,
      "a group emptied by the dim relabel must vanish")
    assert(sortedRows(after) == sortedRows(expected))
    GraftSql.execute(spark, "DROP MATERIALIZED VIEW mv_join")
  }

  test("FROM substitution: registered tables and views without temp views") {
    val (src, base, _) = newSource("sub", seed(50))
    val e = GraftSqlTables.lookup(Seq(src)).get
    // a plain SELECT over the registered graft table now resolves
    val rows = GraftSql.execute(spark,
      s"SELECT id, m FROM $src WHERE grp = 1 ORDER BY id").collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) % 4 == 1))
    // and a registered MV is addressable FROM SQL, serving current contents
    GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW mv_sub LOCATION '$base/mv' AS " +
        s"SELECT grp, count(*) AS n FROM $src GROUP BY grp")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW mv_sub")
    val mvRows = GraftSql.execute(spark,
      "SELECT grp, n FROM mv_sub WHERE grp != 0 ORDER BY grp").collect()
    assert(mvRows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(mvRows.map(_.getLong(1)).sum ==
      Sinks.readCommitted(spark, e.root, new TxnManifest(e.manifestPath))
        .where("grp != 0").count())
    GraftSql.execute(spark, "DROP MATERIALIZED VIEW mv_sub")
  }
}
