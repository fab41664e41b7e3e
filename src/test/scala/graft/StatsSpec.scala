package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.sources.{BatchStats, StatsSinks, TxnManifest}

/** Typed-bounds data-skipping specs: exact Long bounds past 2^53,
  * date/string pruning, and the never-prune-a-live-row contract. */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.collect()
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      .head.metrics("manifestFilesRead").value
  }

  private def freshTable(prefix: String): (String, String, TxnManifest) = {
    val base = java.nio.file.Files.createTempDirectory(prefix).toString
    val root = s"$base/t"
    val manPath = s"$base/manifest.tsv"
    (root, manPath, new TxnManifest(manPath))
  }

  private def load(root: String, manPath: String) =
    spark.read.format("graft-manifest").option("manifest", manPath).load(root)

  test("long bounds above 2^53 never alias: strict filters keep live files") {
    // 2^60 and 2^60 + 1 collapse to the same Double; double-space
    // bounds would prune `id > 2^60` even though the file holds a
    // matching row (the ADVICE correctness trap)
    val big = 1L << 60
    val (root, manPath, man) = freshTable("stats_big_")
    StatsSinks.appendBatchStats(Seq(big, big + 1).toDF("id"), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    assert(load(root, manPath).where($"id" > big).as[Long].collect()
      .toSeq == Seq(big + 1))
    // and the same bound evaluated directly: may-match, not excluded
    val b = Map("id" -> (BatchStats.LongBounds("L", big, big + 1): BatchStats.Bounds))
    assert(BatchStats.mayMatch(b, Seq(GreaterThan("id", big))))
    assert(BatchStats.mayMatch(b, Seq(LessThan("id", big + 1))))
    // exact exclusion still prunes when truly out of range
    assert(!BatchStats.mayMatch(b, Seq(GreaterThan("id", big + 1))))
    assert(!BatchStats.mayMatch(b, Seq(EqualTo("id", big - 1))))
  }

  test("null-count pruning: IsNull, IsNotNull, and all-null files vs comparisons") {
    val (root, manPath, man) = freshTable("stats_null_")
    // batch 0: no nulls; batch 1: v entirely null (bounds don't exist
    // for it — only the null count can prune)
    StatsSinks.appendBatchStats(
      Seq((1L, Some("a")), (2L, Some("b"))).toDF("id", "v"), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    StatsSinks.appendBatchStats(
      Seq((3L, None: Option[String]), (4L, None)).toDF("id", "v"), root, 1)
    man.commit(1, Seq(s"$root/batch=1"))
    val all = scanFiles(load(root, manPath))

    // IS NULL opens only the all-null file; results exact
    val qNull = load(root, manPath).where($"v".isNull)
    assert(qNull.select("id").as[Long].collect().toSet == Set(3L, 4L))
    assert(scanFiles(load(root, manPath).where($"v".isNull).select("id")) < all)
    // IS NOT NULL opens only the no-null file
    assert(load(root, manPath).where($"v".isNotNull).count() == 2)
    assert(scanFiles(load(root, manPath).where($"v".isNotNull).select("id")) < all)
    // equality on v: the all-null file has NO value bounds for v, yet
    // the null count alone excludes it (null-rejecting comparison)
    assert(scanFiles(load(root, manPath).where($"v" === "a").select("id")) < all)
    // direct evaluation of the accounting
    import org.apache.spark.sql.sources.{IsNull => FIsNull, IsNotNull => FIsNotNull}
    val allNull = BatchStats.FileStats(Map.empty,
      Map("v" -> BatchStats.NullCount(5, 5)))
    val noNulls = BatchStats.FileStats(Map.empty,
      Map("v" -> BatchStats.NullCount(0, 5)))
    val mixed = BatchStats.FileStats(Map.empty,
      Map("v" -> BatchStats.NullCount(2, 5)))
    assert(!BatchStats.mayMatch(allNull, Seq(FIsNotNull("v"))))
    assert(!BatchStats.mayMatch(allNull, Seq(EqualTo("v", "x"))))
    assert(BatchStats.mayMatch(allNull, Seq(FIsNull("v"))))
    assert(!BatchStats.mayMatch(noNulls, Seq(FIsNull("v"))))
    assert(BatchStats.mayMatch(noNulls, Seq(FIsNotNull("v"))))
    assert(BatchStats.mayMatch(mixed, Seq(FIsNull("v"))))
    assert(BatchStats.mayMatch(mixed, Seq(FIsNotNull("v"))))
    // unknown column: never prune; zero-row accounting: never prune
    assert(BatchStats.mayMatch(allNull, Seq(FIsNotNull("w"))))
    val empty = BatchStats.FileStats(Map.empty,
      Map("v" -> BatchStats.NullCount(0, 0)))
    assert(BatchStats.mayMatch(empty, Seq(FIsNotNull("v"))))
  }

  test("date predicates prune files (reference CreatedOn > ... shape)") {
    val (root, manPath, man) = freshTable("stats_date_")
    def month(m: Int) = (1 to 20).map(d =>
      (m * 100 + d, java.sql.Date.valueOf(f"2025-$m%02d-$d%02d")))
      .toDF("id", "created_on")
    StatsSinks.appendBatchStats(month(1), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    StatsSinks.appendBatchStats(month(6), root, 1)
    man.commit(1, Seq(s"$root/batch=1"))
    val all = scanFiles(load(root, manPath))
    val q = load(root, manPath)
      .where($"created_on" > lit(java.sql.Date.valueOf("2025-03-01")))
    assert(q.count() == 20) // results exact: only June rows
    assert(scanFiles(load(root, manPath)
      .where($"created_on" > lit(java.sql.Date.valueOf("2025-03-01"))).select("id")) < all,
      "expected the January file pruned by date stats")
    // boundary: filter exactly at a file's max must NOT prune it for >=
    assert(load(root, manPath)
      .where($"created_on" >= lit(java.sql.Date.valueOf("2025-01-20")))
      .count() == 21)
  }

  test("string predicates prune files; results stay exact") {
    val (root, manPath, man) = freshTable("stats_str_")
    StatsSinks.appendBatchStats(
      (1 to 20).map(i => (i, f"apple_$i%03d")).toDF("id", "name"), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    StatsSinks.appendBatchStats(
      (21 to 40).map(i => (i, f"zebra_$i%03d")).toDF("id", "name"), root, 1)
    man.commit(1, Seq(s"$root/batch=1"))
    val all = scanFiles(load(root, manPath))
    // equality on a value outside batch 0's [apple_001, apple_020]
    assert(load(root, manPath).where($"name" === "zebra_030").count() == 1)
    assert(scanFiles(load(root, manPath)
      .where($"name" === "zebra_030").select("id")) < all)
    // prefix pushdown: StartsWith window excludes the apple file
    assert(load(root, manPath).where($"name".startsWith("zebra")).count() == 20)
    assert(scanFiles(load(root, manPath)
      .where($"name".startsWith("zebra")).select("id")) < all)
    // range: name < "apple_010" cannot live in the zebra file
    assert(load(root, manPath).where($"name" < "apple_010").count() == 9)
    assert(scanFiles(load(root, manPath)
      .where($"name" < "apple_010").select("id")) < all)
  }

  test("timestamp predicates prune files (micros-typed bounds)") {
    val (root, manPath, man) = freshTable("stats_ts_")
    val s2 = spark
    s2.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      def hour(h: Int) = (1 to 10).map(m =>
        (h * 100 + m, java.sql.Timestamp.valueOf(f"2025-01-01 $h%02d:$m%02d:00")))
        .toDF("id", "ts")
      StatsSinks.appendBatchStats(hour(1), root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      StatsSinks.appendBatchStats(hour(20), root, 1)
      man.commit(1, Seq(s"$root/batch=1"))
      val all = scanFiles(load(root, manPath))
      val cut = java.sql.Timestamp.valueOf("2025-01-01 12:00:00")
      assert(load(root, manPath).where($"ts" > lit(cut)).count() == 10)
      assert(scanFiles(load(root, manPath)
        .where($"ts" > lit(cut)).select("id")) < all)
    } finally s2.conf.unset("spark.sql.parquet.outputTimestampType")
  }

  test("conservative shapes never prune: mismatched kinds, unknown filters, bad sidecar") {
    val longB = Map("x" -> (BatchStats.LongBounds("L", 0L, 9L): BatchStats.Bounds))
    // string literal against long bounds: no pruning, never a crash
    assert(BatchStats.mayMatch(longB, Seq(EqualTo("x", "not_a_number"))))
    // date literal against plain-long bounds: domain mismatch, kept
    assert(BatchStats.mayMatch(longB,
      Seq(EqualTo("x", java.sql.Date.valueOf("1970-01-11")))))
    // NaN / infinity literals are not comparable: kept
    val dblB = Map("x" -> (BatchStats.DoubleBounds(0.0, 1.0): BatchStats.Bounds))
    assert(BatchStats.mayMatch(dblB, Seq(GreaterThan("x", Double.NaN))))
    assert(BatchStats.mayMatch(dblB,
      Seq(GreaterThan("x", Double.PositiveInfinity))))
    // null-test filters are never evaluated against value bounds
    assert(BatchStats.mayMatch(longB, Seq(IsNull("x"), IsNotNull("x"))))
    // In prunes only when EVERY element is provably absent
    assert(!BatchStats.mayMatch(longB, Seq(In("x", Array(100L, 200L)))))
    assert(BatchStats.mayMatch(longB, Seq(In("x", Array(100L, 5L)))))
    assert(BatchStats.mayMatch(longB, Seq(In("x", Array(100L, null)))))
    // a torn/unparsable sidecar degrades to "no pruning", not an error
    val dir = java.nio.file.Files.createTempDirectory("stats_torn_").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_stats.tsv"), "old\tformat\t1\t2\n")
    assert(BatchStats.read(spark.sparkContext.hadoopConfiguration, dir).isEmpty)
  }

  test("property: exclusion is sound — bounds never prune a value they cover") {
    // the invariant the whole stats engine rests on: if excludes()
    // prunes, NO row in [lo, hi] satisfies the filter. Randomized over
    // full-range Longs (including near 2^63, the double-aliasing trap),
    // doubles, and filter shapes.
    val rnd = new scala.util.Random(42)
    def holdsLong(x: Long, f: Filter): Boolean = f match {
      case EqualTo(_, v: Long)            => x == v
      case GreaterThan(_, v: Long)        => x > v
      case GreaterThanOrEqual(_, v: Long) => x >= v
      case LessThan(_, v: Long)           => x < v
      case LessThanOrEqual(_, v: Long)    => x <= v
      case In(_, vs)                      => vs.contains(x)
      case _                              => true
    }
    for (_ <- 1 to 500) {
      val data = Seq.fill(rnd.nextInt(8) + 1)(
        if (rnd.nextBoolean()) rnd.nextLong()
        else (1L << 60) + rnd.nextInt(16) - 8)
      val b = Map("x" -> (BatchStats.LongBounds("L", data.min, data.max)
        : BatchStats.Bounds))
      val v =
        if (rnd.nextBoolean()) rnd.nextLong()
        else data(rnd.nextInt(data.length)) + rnd.nextInt(3) - 1
      for (f <- Seq[Filter](EqualTo("x", v), GreaterThan("x", v),
          GreaterThanOrEqual("x", v), LessThan("x", v),
          LessThanOrEqual("x", v), In("x", Array[Any](v, rnd.nextLong())))) {
        val pruned = !BatchStats.mayMatch(b, Seq(f))
        assert(!(pruned && data.exists(holdsLong(_, f))),
          s"unsound prune: $f over [${data.min}, ${data.max}]")
      }
    }
  }

  test("property: string bounds from real footers never prune a present value") {
    // end to end through parquet + sidecar, exercising the >64-byte
    // truncate-outward path and non-ASCII bytes: every string PRESENT
    // in the file must survive every filter that matches it
    val rnd = new scala.util.Random(7)
    def randStr(): String = {
      val n = rnd.nextInt(90) + 1 // many exceed MaxStringBound=64
      Seq.fill(n)(
        if (rnd.nextBoolean()) ('a' + rnd.nextInt(26)).toChar.toString
        else if (rnd.nextBoolean()) "é" else "日").mkString.take(n)
    }
    val values = Seq.fill(40)(randStr())
    val (root, manPath, man) = freshTable("stats_prop_")
    // ONE part file: the per-file bounds below must cover every value
    StatsSinks.appendBatchStats(
      values.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "name")
        .coalesce(1),
      root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    val bounds = BatchStats
      .read(spark.sparkContext.hadoopConfiguration, s"$root/batch=0").get
      .values.head
    for (s <- values; f <- Seq[Filter](EqualTo("name", s),
        StringStartsWith("name", s.take(rnd.nextInt(s.length) + 1)),
        GreaterThanOrEqual("name", s), LessThanOrEqual("name", s))) {
      assert(BatchStats.mayMatch(bounds, Seq(f)),
        s"pruned a filter satisfied by present value '$s': $f")
    }
    // and equality on values PAST the bounds does prune (non-vacuous)
    assert(!BatchStats.mayMatch(bounds, Seq(EqualTo("name", "￿￿"))))
  }

  test("data skipping holds through a schemaLog mapping (filters translate)") {
    // a mapped table's stats sidecars carry PHYSICAL names; the scan
    // must translate its logical pushed filters so files still prune —
    // a mapped table losing skipping is a silent 100×-scan regression
    import graft.sources.SchemaLog
    val (root, manPath, man) = freshTable("stats_mapped_")
    val logPath = s"$root/_schema_log"
    val log = new SchemaLog(logPath)
    log.init(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))))
    // two disjoint-range single-file batches → disjoint id bounds
    SchemaLog.appendBatchMapped(
      (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1),
      root, log, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    SchemaLog.appendBatchMapped(
      (1000L until 1100L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1),
      root, log, 1)
    man.commit(1, Seq(s"$root/batch=1"))
    def mapped = spark.read.format("graft-manifest")
      .option("manifest", manPath).option("schemaLog", logPath).load(root)
    // the LOGICAL filter prunes down to one file
    assert(scanFiles(mapped.where($"id" >= 1000L)) == 1L)
    assert(mapped.where($"id" >= 1000L).count() == 100L)
    // after a metadata-only RENAME the new name prunes identically
    log.rename("id", "doc_id")
    assert(scanFiles(mapped.where($"doc_id" < 100L)) == 1L)
    assert(mapped.where($"doc_id" < 100L).count() == 100L)
    // correctness under a filter that cannot translate post-drop:
    // dropped column's stats never consulted, rows still exact
    log.rename("doc_id", "id")
    assert(mapped.where($"id" === 50L).count() == 1L)
  }

  test("Infinity/NaN in double data never crashes a filtered scan") {
    // a column containing +/-Infinity gets infinite footer bounds —
    // the sidecar must poison that column (no pruning), and any
    // pushed filter over it must run, not throw from BigDecimal
    val (root, manPath, man) = freshTable("stats_inf_")
    StatsSinks.appendBatchStats(
      Seq((1L, 1.0), (2L, Double.PositiveInfinity), (3L, Double.NaN),
        (4L, -2.0)).toDF("id", "m"), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    assert(load(root, manPath).where($"m" < -1.0).count() == 1)
    // Spark orders NaN above every double: both Inf and NaN match
    assert(load(root, manPath).where($"m" > 100.0).count() == 2)
    // hand-edited sidecar with infinite bounds: conservative, no crash
    val infB = Map("m" -> (BatchStats.DoubleBounds(
      Double.NegativeInfinity, Double.PositiveInfinity): BatchStats.Bounds))
    assert(BatchStats.mayMatch(infB, Seq(GreaterThan("m", 5.0))))
  }
}
