package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    // (event_id, ts, event_type, value)
    (1L, "2024-01-01 00:10:00", "click", 1.0),
    (2L, "2024-01-01 00:40:00", "click", 2.0),
    (3L, "2024-01-01 01:05:00", "view", 3.0),
    (4L, "2024-01-01 01:30:00", "click", 4.0))

  private def toDf(s: Seq[(Long, String, String, Double)]) =
    s.toDF("event_id", "ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("streaming windowedAgg over MemoryStream == batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Double)]
    val streamed = EventStreams.windowedAgg(
      mem.toDF().toDF("event_id", "ts_s", "event_type", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
    val q = streamed.writeStream.format("memory")
      .queryName("agg_out").outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("agg_out")
        .orderBy("bucket_start", "event_type")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      val want = EventStreams.windowedAgg(toDf(rows))
        .orderBy("bucket_start", "event_type")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == want.toSeq)
      assert(got.toSeq == Seq(
        ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 01:00:00.0", "click", 1L, 4.0),
        ("2024-01-01 01:00:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming session windows merge by inactivity gap == batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Double)]
    // click: 00:10 + 00:40 (gap 30m: touching -> ONE session when the
    // next event lands within the gap; 00:40 is exactly at the edge of
    // [00:10+30m) so it EXTENDS the session), then nothing -> closes.
    // view: single event -> its own session.
    val streamed = EventStreams.sessionizeStream(
      mem.toDF().toDF("event_id", "ts_s", "event_type", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
    val q = streamed.writeStream.format("memory")
      .queryName("sess_out").outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      def key(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("event_type", "session_start").collect()
          .map(r => (r.getString(0), r.getTimestamp(1).toString,
            r.getTimestamp(2).toString, r.getLong(3))).toSeq
      val got  = key(spark.table("sess_out"))
      val want = key(EventStreams.sessionizeStream(toDf(rows)))
      assert(got == want)
      // click events at 00:10/00:40/01:30 with a 30m gap: 00:40 lands
      // exactly on 00:10's close and merges; 01:30 starts a new session
      assert(got == Seq(
        ("click", "2024-01-01 00:10:00.0", "2024-01-01 01:10:00.0", 2L),
        ("click", "2024-01-01 01:30:00.0", "2024-01-01 02:00:00.0", 1L),
        ("view",  "2024-01-01 01:05:00.0", "2024-01-01 01:35:00.0", 1L)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched clicks after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, String)]
    val buys = MemoryStream[(Long, Long, String, Double)]
    val joined = EventStreams.intervalJoinStream(
      clicks.toDF().toDF("click_id", "user_id", "ts_s")
        .withColumn("ts_l", col("ts_s").cast("timestamp")).drop("ts_s"),
      buys.toDF().toDF("buy_id", "uid", "ts_s", "amount")
        .withColumnRenamed("uid", "user_id")
        .withColumn("ts_r", col("ts_s").cast("timestamp")).drop("ts_s"),
      key = "user_id", lag = "1 hour", joinType = "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("loj_out").outputMode("append").start()
    try {
      buys.addData((100L, 1L, "2024-01-01 00:10:00", 5.0))
      clicks.addData(
        (1L, 1L, "2024-01-01 01:00:00"),  // matched
        (3L, 3L, "2024-01-01 01:00:00"))  // no purchase → NULL row
      q.processAllAvailable()
      // push both watermarks far past the clicks so the unmatched
      // left row becomes provably unmatchable and must emit
      buys.addData((999L, 8L, "2024-01-01 09:00:00", 0.0))
      clicks.addData((999L, 9L, "2024-01-01 09:00:00"))
      q.processAllAvailable()
      buys.addData((998L, 8L, "2024-01-01 18:00:00", 0.0))
      clicks.addData((998L, 9L, "2024-01-01 18:00:00"))
      q.processAllAvailable()
      val got = spark.table("loj_out")
        .filter(col("click_id") < 900)
        .select("click_id", "buy_id")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
      assert(got == Seq((1L, 100L), (3L, -1L)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to recent purchases") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, String)]
    val buys = MemoryStream[(Long, Long, String, Double)]
    val joined = EventStreams.intervalJoinStream(
      clicks.toDF().toDF("click_id", "user_id", "ts_s")
        .withColumn("ts_l", col("ts_s").cast("timestamp")).drop("ts_s"),
      buys.toDF().toDF("buy_id", "uid", "ts_s", "amount")
        .withColumnRenamed("uid", "user_id")
        .withColumn("ts_r", col("ts_s").cast("timestamp")).drop("ts_s"),
      key = "user_id", lag = "1 hour")
    val q = joined.writeStream.format("memory")
      .queryName("ij_out").outputMode("append").start()
    try {
      buys.addData(
        (100L, 1L, "2024-01-01 00:10:00", 5.0),   // 50 min before click → in window
        (101L, 1L, "2024-01-01 02:00:00", 7.0),   // after the click → out
        (102L, 2L, "2024-01-01 00:50:00", 9.0))   // other user
      clicks.addData(
        (1L, 1L, "2024-01-01 01:00:00"),
        (2L, 2L, "2024-01-01 01:40:00"),
        (3L, 3L, "2024-01-01 01:00:00"))          // no purchase → no row (inner)
      // advance both watermarks so the joined rows become emittable
      // (distinct users so the advancers can't join each other)
      buys.addData((999L, 8L, "2024-01-01 09:00:00", 0.0))
      clicks.addData((999L, 9L, "2024-01-01 09:00:00"))
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .select("click_id", "buy_id", "amount")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(got.toSeq == Seq((1L, 100L, 5.0), (2L, 102L, 9.0)))
    } finally q.stop()
  }

  test("stateful runningTotals accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("run_out")
      .outputMode("update").start()
    try {
      mem.addData(EventStreams.UserEvent(7L, 1.5), EventStreams.UserEvent(7L, 2.5))
      q.processAllAvailable()
      mem.addData(EventStreams.UserEvent(7L, 4.0))
      q.processAllAvailable()
      val last = spark.table("run_out").filter(col("user_id") === 7)
        .orderBy(col("n_events").desc).first()
      assert(last.getLong(1) == 3L && last.getDouble(2) == 8.0)
    } finally q.stop()
  }

  test("stream-static enrichment join resolves dims per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Double)]
    val dim = Seq(("click", 1), ("view", 2)).toDF("event_type", "type_id")
    val enriched = graft.streaming.EventStreams.enrich(
      mem.toDF().toDF("event_id", "ts_s", "event_type", "value"),
      dim, Seq("event_type"))
    val q = enriched.writeStream.format("memory")
      .queryName("enrich_out").outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .groupBy("type_id").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == Map(1 -> 3L, 2 -> 1L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replayed ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Double)]
    val deduped = EventStreams.dedupStream(
      mem.toDF().toDF("event_id", "ts_s", "event_type", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData(rows.head) // replay of event_id=1
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 4)
    } finally q.stop()
  }

  test("spark.readStream.table over a catalog table streams commits") {
    // the catalog's loadTable serves MICRO_BATCH_READ, so a SQL user
    // tails a DDL-owned named table with .table() — no format/options
    import graft.plans.{GraftCatalog, GraftSql}
    val wh = java.nio.file.Files.createTempDirectory("graft_rst_wh_").toString
    spark.conf.set("spark.sql.catalog.grst", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grst.warehouse", wh)
    GraftSql.execute(spark, "DROP TABLE IF EXISTS grst.ev")
    GraftSql.execute(spark,
      """CREATE TABLE grst.ev (id BIGINT, v STRING) USING `graft-manifest`
        |TBLPROPERTIES ('keys' = 'id')""".stripMargin)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("grst_src1")
    GraftSql.execute(spark, "INSERT INTO grst.ev SELECT * FROM grst_src1")
    val outDir = s"$wh/out"
    val q = spark.readStream.table("grst.ev")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$wh/ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).select("id").as[Long]
        .collect().toSet == Set(1L, 2L))
      Seq((3L, "c")).toDF("id", "v").createOrReplaceTempView("grst_src2")
      GraftSql.execute(spark, "INSERT INTO grst.ev SELECT * FROM grst_src2")
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).select("id").as[Long]
        .collect().toSet == Set(1L, 2L, 3L))
    } finally q.stop()
    GraftSql.execute(spark, "DROP TABLE IF EXISTS grst.ev")
  }

  test("graft-manifest DSv2 source: committed-only, incremental, restart exactly-once") {
    import graft.sources.{Sinks, TxnManifest}
    val base = java.nio.file.Files.createTempDirectory("graft_dsv2_").toString
    val root = s"$base/data"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)
    def batchDf(ids: Long*) = ids.map(i => (i, s"v$i")).toDF("id", "v")

    // empty manifest = table that doesn't exist yet: a READ fails
    // loudly at scan build (a WRITE may bootstrap it — sink test)
    intercept[IllegalStateException] {
      spark.read.format("graft-manifest")
        .option("manifest", manPath).load(root).collect()
    }

    Sinks.appendBatch(batchDf(1, 2), root, 0); man.commit(0, Seq(s"$root/batch=0"))
    Sinks.appendBatch(batchDf(3, 4), root, 1); man.commit(1, Seq(s"$root/batch=1"))
    Sinks.appendBatch(batchDf(90, 91), root, 5) // orphan: data landed, never committed

    val outDir = s"$base/out"
    def start() = spark.readStream.format("graft-manifest")
      .option("manifest", manPath).load(root)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    def sunk(): Set[Long] =
      spark.read.parquet(outDir).select("id").as[Long].collect().toSet

    val q = start()
    try {
      q.processAllAvailable()
      assert(sunk() == Set(1L, 2L, 3L, 4L)) // orphan invisible
      // a commit while the stream is live arrives as its own micro-batch
      Sinks.appendBatch(batchDf(5, 6), root, 2); man.commit(2, Seq(s"$root/batch=2"))
      q.processAllAvailable()
      assert(sunk() == Set(1L, 2L, 3L, 4L, 5L, 6L))
    } finally q.stop()

    // a batch committed while the stream is DOWN; restart resumes from
    // the checkpointed offset — new rows once, old rows not re-delivered
    Sinks.appendBatch(batchDf(7), root, 3); man.commit(3, Seq(s"$root/batch=3"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(sunk() == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
      assert(spark.read.parquet(outDir).count() == 7) // exactly-once, no dups
    } finally q2.stop()

    // the batch view is the readCommitted twin (orphan stays invisible)
    val batchRead = spark.read.format("graft-manifest")
      .option("manifest", manPath).load(root)
    assert(batchRead.select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))

    // custom metrics: the executed scan reports files/bytes admitted
    val metered = spark.read.format("graft-manifest")
      .option("manifest", manPath).load(root)
    metered.collect()
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scanExec = metered.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head
    // ≥ 1 file per committed batch; exact count is write-layout detail
    assert(scanExec.metrics("manifestFilesRead").value >= 4)
    assert(scanExec.metrics("manifestBytesRead").value > 0)
    // empty-projection path (count over zero columns) works too
    assert(metered.count() == 7)

    // time travel: the table as of batch 1 (ids 0 and 1 only)
    val asOf = spark.read.format("graft-manifest")
      .option("manifest", manPath).option("versionAsOf", "1").load(root)
    assert(asOf.select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
    // startingBatchId: a fresh stream that skips history
    val lateOnly = s"$base/lateOnly"
    val q3 = spark.readStream.format("graft-manifest")
      .option("manifest", manPath).option("startingBatchId", "2").load(root)
      .writeStream.format("parquet")
      .option("path", lateOnly).option("checkpointLocation", s"$base/ckpt3")
      .start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(lateOnly).select("id").as[Long].collect().toSet ==
      Set(7L))

    // pruning + pushdown reach the scan: a 1-column projection reads
    // ONE column, and the filter is reported pushed (row-group skip)
    val pruned = spark.read.format("graft-manifest")
      .option("manifest", manPath).load(root)
      .where($"id" > 3L).select("id")
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val scan = pruned.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head
    assert(scan.readSchema().fieldNames.toSeq == Seq("id"),
      s"expected pruned scan, got ${scan.description()}")
    assert(scan.description().contains("GreaterThan(id,3)"),
      s"expected pushed filter in ${scan.description()}")
    assert(pruned.as[Long].collect().toSet == Set(4L, 5L, 6L, 7L))
  }

  test("graft-manifest changeFeed stream: row-level deltas, restart exactly-once") {
    import graft.sources.{Sinks, TxnManifest}
    val base = java.nio.file.Files.createTempDirectory("graft_cdfs_").toString
    val root = s"$base/data"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)
    def batchDf(ids: Long*) = ids.map(i => (i, s"v$i")).toDF("id", "v")
    Sinks.appendBatch(batchDf(1, 2), root, 0); man.commit(0, Seq(s"$root/batch=0"))
    Sinks.appendBatch(batchDf(3, 4), root, 1); man.commit(1, Seq(s"$root/batch=1"))

    val outDir = s"$base/out"
    def start() = spark.readStream.format("graft-manifest")
      .option("manifest", manPath).option("changeFeed", "true").load(root)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    def sunk() = spark.read.parquet(outDir)
      .select("id", "_change_type", "_commit_batch")
      .as[(Long, String, Int)].collect().toSeq.sorted

    // phase 1: history arrives as inserts
    val q = start()
    try q.processAllAvailable() finally q.stop()
    assert(sunk() == Seq(
      (1L, "insert", 0), (2L, "insert", 0),
      (3L, "insert", 1), (4L, "insert", 1)).sortBy(identity))

    // while DOWN: a MERGE with cdf (update 2, delete 3, insert 9 —
    // batch 2, which COLLAPSES batches 0/1 the consumer already
    // drained), a DV delete with cdf (batch 3), and an append (4)
    Sinks.merge(spark, Some(batchDf(2, 9)), Some(Seq(3L).toDF("id")),
      root, man, Seq("id"), mergeId = 2, cdf = true)
    Sinks.mergeDeleteDV(spark, Seq(4L).toDF("id"), root, man, Seq("id"),
      mergeId = 3, cdf = true)
    Sinks.appendBatch(batchDf(20), root, 4); man.commit(4, Seq(s"$root/batch=4"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // restart serves ONLY the new commits — row-level deltas, exactly
    // once, never a replay of the rewritten dirs' kept rows
    val after = sunk()
    assert(after.filter(_._3 == 2).sorted == Seq(
      (2L, "update_postimage", 2), (2L, "update_preimage", 2),
      (3L, "delete", 2), (9L, "insert", 2)).sorted)
    assert(after.contains((4L, "delete", 3)))
    assert(after.contains((20L, "insert", 4)))
    assert(after.size == 10, s"exactly-once violated: $after")

    // the BATCH face (Delta table_changes): same deltas for an
    // explicit (startingBatchId, endingBatchId] range
    val tc = spark.read.format("graft-manifest")
      .option("manifest", manPath).option("changeFeed", "true")
      .option("startingBatchId", "1").option("endingBatchId", "3")
      .load(root)
      .select("id", "_change_type", "_commit_batch")
      .as[(Long, String, Int)].collect().toSeq.sorted
    assert(tc == Seq(
      (2L, "update_postimage", 2), (2L, "update_preimage", 2),
      (3L, "delete", 2), (9L, "insert", 2),
      (4L, "delete", 3)).sorted)

    // a compaction serves ZERO deltas (no-change marker), not a replay
    Sinks.compact(spark, root, man, compactId = 10, numFiles = 1)
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(sunk().size == 10, "compaction must not re-deliver rows")

    // a cdf=false merge poisons the feed LOUDLY on the next trigger
    Sinks.merge(spark, Some(batchDf(1)), None, root, man, Seq("id"),
      mergeId = 11, cdf = false)
    val q4 = start()
    val poisoned = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q4.processAllAvailable() finally q4.stop()
    }
    assert(poisoned.getMessage.contains("without change tracking") ||
      Option(poisoned.getCause).exists(_.getMessage.contains("without change tracking")))
  }

  test("changeFeed composes with schemaLog: rename mid-stream, deltas under current names") {
    import graft.sources.{SchemaLog, Sinks, TxnManifest}
    val base = java.nio.file.Files.createTempDirectory("graft_cdfmap_").toString
    val root = s"$base/data"
    val manPath = s"$base/manifest.tsv"
    val logPath = s"$base/schema.log"
    val man = new TxnManifest(manPath)
    val log = new SchemaLog(logPath)
    def batchDf(ids: Long*) = ids.map(i => (i, s"v$i")).toDF("id", "v")
    log.init(batchDf().schema)
    SchemaLog.appendBatchMapped(batchDf(1, 2), root, log, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    SchemaLog.appendBatchMapped(batchDf(3, 4), root, log, 1)
    man.commit(1, Seq(s"$root/batch=1"))

    // (id, 2nd-column NAME, 2nd-column value, change type, commit)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Int)]
    def run(): Unit = {
      val q = spark.readStream.format("graft-manifest")
        .option("manifest", manPath).option("schemaLog", logPath)
        .option("changeFeed", "true").load(root)
        .writeStream.option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val name = df.columns(1)
          got.synchronized {
            got ++= df.collect().map(r => (r.getLong(0), name,
              r.getString(1),
              r.getString(df.columns.indexOf("_change_type")),
              r.getInt(df.columns.indexOf("_commit_batch"))))
          }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    // phase 1: history as inserts under the ORIGINAL logical name
    run()
    assert(got.sorted.toSeq == Seq(
      (1L, "v", "v1", "insert", 0), (2L, "v", "v2", "insert", 0),
      (3L, "v", "v3", "insert", 1), (4L, "v", "v4", "insert", 1)).sorted)

    // while the stream is DOWN: metadata-only rename, then a tracked
    // merge — the restart must serve the new deltas under the NEW
    // name from the SAME checkpoint (mapping re-captured at build,
    // Delta's evolution-at-restart contract)
    log.rename("v", "w")
    SchemaLog.mergeUpsertMapped(spark,
      Seq((2L, "V2"), (9L, "V9")).toDF("id", "w"), root, man, log,
      Seq("id"), mergeId = 2, cdf = true)
    got.clear()
    run()
    assert(got.sorted.toSeq == Seq(
      (2L, "w", "V2", "update_postimage", 2),
      (2L, "w", "v2", "update_preimage", 2),
      (9L, "w", "V9", "insert", 2)).sorted,
      s"got: ${got.sorted.toSeq}")

    // the BATCH face (table_changes) under the same mapping: history
    // written BEFORE the rename serves under the name used TODAY
    val tc = spark.read.format("graft-manifest")
      .option("manifest", manPath).option("schemaLog", logPath)
      .option("changeFeed", "true")
      .option("startingBatchId", "1").option("endingBatchId", "2")
      .load(root)
    assert(tc.columns.toSeq ==
      Seq("id", "w", "_change_type", "_commit_batch"))
    assert(tc.select("id", "w", "_change_type")
      .as[(Long, String, String)].collect().sorted.toSeq == Seq(
      (2L, "V2", "update_postimage"), (2L, "v2", "update_preimage"),
      (9L, "V9", "insert")).sorted)
  }

  test("graft-manifest admission control: bounded drain and AvailableNow ceiling") {
    import graft.sources.{Sinks, TxnManifest}
    val base = java.nio.file.Files.createTempDirectory("graft_dsv2ac_").toString
    val root = s"$base/data"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)
    def batchDf(ids: Long*) = ids.map(i => (i, s"v$i")).toDF("id", "v")
    for (i <- 0 until 3) {
      Sinks.appendBatch(batchDf(10L * i + 1, 10L * i + 2), root, i)
      man.commit(i, Seq(s"$root/batch=$i"))
    }

    // maxBatchesPerTrigger=1: a 3-batch backlog drains in 3 bounded,
    // checkpointed micro-batches, not one giant catch-up batch
    val outA = s"$base/outA"
    val qa = spark.readStream.format("graft-manifest")
      .option("manifest", manPath)
      .option("maxBatchesPerTrigger", "1").load(root)
      .writeStream.format("parquet")
      .option("path", outA).option("checkpointLocation", s"$base/ckptA").start()
    try qa.processAllAvailable() finally qa.stop()
    assert(spark.read.parquet(outA).count() == 6)
    val offsetLog = new java.io.File(s"$base/ckptA/offsets")
      .listFiles().filterNot(_.getName.startsWith(".")).map(_.getName).sorted
    assert(offsetLog.toSeq == Seq("0", "1", "2"),
      s"expected one micro-batch per manifest batch, got ${offsetLog.toSeq}")

    // Trigger.AvailableNow: the ceiling is the committed set at query
    // start — a commit landing mid-run waits for the next start
    val outB = s"$base/outB"
    def startB() = spark.readStream.format("graft-manifest")
      .option("manifest", manPath)
      .option("maxBatchesPerTrigger", "1").load(root)
      .writeStream.format("parquet")
      .option("path", outB).option("checkpointLocation", s"$base/ckptB")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val qb = startB()
    // ceiling is captured at stream start, before the first micro-batch
    // — wait for progress so the late commit deterministically lands
    // mid-run, after the capture
    while (qb.recentProgress.isEmpty && qb.isActive) Thread.sleep(50)
    Sinks.appendBatch(batchDf(91L), root, 7); man.commit(7, Seq(s"$root/batch=7"))
    qb.awaitTermination()
    assert(spark.read.parquet(outB).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 11L, 12L, 21L, 22L))
    // the next AvailableNow run picks up exactly the late batch
    val qb2 = startB()
    qb2.awaitTermination()
    assert(spark.read.parquet(outB).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 11L, 12L, 21L, 22L, 91L))
  }

  test("graft-manifest source: additive evolution mid-stream serves the start schema") {
    import graft.sources.{Sinks, TxnManifest}
    val base = java.nio.file.Files.createTempDirectory("graft_dsv2ev_").toString
    val root = s"$base/data"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)
    Sinks.appendBatch(Seq((1L, "a")).toDF("id", "v"), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))

    val outDir = s"$base/out"
    val q = spark.readStream.format("graft-manifest")
      .option("manifest", manPath).load(root)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      // a batch with an EXTRA column commits mid-stream: the stream's
      // schema was fixed at start, so the new column is ignored (not a
      // crash) — rows arrive projected to the start schema. A restart
      // (fresh inferSchema) is the upgrade point, as with Delta.
      Sinks.appendBatch(Seq((2L, "b", 9.9)).toDF("id", "v", "extra"), root, 1)
      man.commit(1, Seq(s"$root/batch=1"))
      q.processAllAvailable()
      val got = spark.read.parquet(outDir)
      assert(got.columns.toSeq == Seq("id", "v"))
      assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L))
      // and a batch MISSING a column serves NULL for it (parquet clip)
      Sinks.appendBatch(Seq(Tuple1(3L)).toDF("id"), root, 2)
      man.commit(2, Seq(s"$root/batch=2"))
      q.processAllAvailable()
      val r3 = spark.read.parquet(outDir).filter($"id" === 3L).collect().head
      assert(r3.isNullAt(r3.fieldIndex("v")))
    } finally q.stop()
  }

  test("graft-manifest data skipping: stats sidecars prune whole dirs at plan time") {
    import graft.sources.{BatchStats, StatsSinks, Sinks, TxnManifest}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val base = java.nio.file.Files.createTempDirectory("graft_skip_").toString
    val root = s"$base/data"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)
    def batchDf(ids: Range) = ids.map(i => (i.toLong, i * 1.5)).toDF("id", "m")
    // three batches with DISJOINT id ranges, stats sidecars written
    StatsSinks.appendBatchStats(batchDf(0 until 10), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    StatsSinks.appendBatchStats(batchDf(100 until 110), root, 1)
    man.commit(1, Seq(s"$root/batch=1"))
    // and one WITHOUT a sidecar — must always be read
    Sinks.appendBatch(batchDf(200 until 210), root, 2)
    man.commit(2, Seq(s"$root/batch=2"))

    def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
        .head.metrics("manifestFilesRead").value
    }
    def load() = spark.read.format("graft-manifest")
      .option("manifest", manPath).load(root)

    val all = scanFiles(load())
    // a point-range filter prunes batch 0 and batch 1's dirs cannot
    // both match; the sidecar-less batch 2 is always read
    val pruned = load().where($"id" >= 100L && $"id" < 110L)
    assert(pruned.select("id").as[Long].collect().toSet ==
      (100L until 110L).toSet)
    val prunedFiles = scanFiles(pruned)
    assert(prunedFiles < all,
      s"expected dir pruning: $prunedFiles vs $all files")
    // a filter satisfiable in NO batch: both sidecar'd dirs prune out
    // of the plan; only the sidecar-less dir is scanned (and its rows
    // are then filtered to zero — skipping is an optimization, results
    // are identical)
    val none = load().where($"id" > 1000L)
    assert(none.count() == 0)
    val noneFiles = scanFiles(load().where($"id" > 1000L).select("id"))
    assert(noneFiles < prunedFiles,
      s"expected only the sidecar-less dir planned: $noneFiles vs $prunedFiles")
    assert(load().where($"m" < -5.0).count() == 0) // double column, same
    // stats evaluation is conservative: strings/unknown shapes never prune
    assert(BatchStats.mayMatch(
      Map("id" -> BatchStats.LongBounds("L", 0L, 9L)),
      Seq(org.apache.spark.sql.sources.IsNotNull("id"))))
  }

  test("graft-manifest + schemaLog: evolved tables stream under logical names") {
    import graft.sources.{SchemaLog, Sinks, TxnManifest}
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_dsv2sl_").toString
    val root = s"$base/t"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)
    val log = new SchemaLog(s"$base/_schema")
    log.init(StructType(Seq(StructField("id", LongType),
      StructField("v", StringType))))
    SchemaLog.appendBatchMapped(Seq((1L, "a")).toDF("id", "v"), root, log, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    log.rename("v", "w") // metadata-only; batch 0 untouched
    SchemaLog.appendBatchMapped(Seq((2L, "b")).toDF("id", "w"), root, log, 1)
    man.commit(1, Seq(s"$root/batch=1"))

    // batch read resolves the mapping: logical names, both batches
    val batch = spark.read.format("graft-manifest")
      .option("manifest", manPath).option("schemaLog", s"$base/_schema")
      .load(root)
    assert(batch.columns.toSeq == Seq("id", "w"))
    assert(batch.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
    // projection through the mapping still prunes (logical name in,
    // physical column out)
    assert(batch.select("w").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "b"))

    // streaming read under the mapping
    val outDir = s"$base/out"
    val q = spark.readStream.format("graft-manifest")
      .option("manifest", manPath).option("schemaLog", s"$base/_schema")
      .load(root)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", s"$base/ckpt").start()
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(outDir)
      assert(got.columns.toSeq == Seq("id", "w"))
      assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L))
    } finally q.stop()
  }

  test("streaming exact dedup == batch canonical form (dropDuplicates state)") {
    // the streaming twin of dd1: content-hash dedup with streaming
    // state — first arrival wins across micro-batches, exactly the
    // batch canonical form when arrival order == the batch tiebreak
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .withColumn("h", md5(col("text")))
      .dropDuplicates("h")
      .writeStream.format("memory").queryName("sdd_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "aa"), (2L, "bb"))
      q.processAllAvailable()
      // duplicates arriving in LATER micro-batches are state-filtered
      mem.addData((3L, "aa"), (4L, "cc"), (5L, "bb"))
      q.processAllAvailable()
      val got = spark.table("sdd_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 4L), got.toString)
    } finally q.stop()
  }

  test("streaming MinHash-LSH near-dup == batch candidate pairs (band-bucket state)") {
    // the streaming twin of dd2: near-dup detection AT INGEST. The
    // batch pipeline's groupBy signature step has a per-ROW spelling
    // (array_min over the shingle hashes — identical min, identical
    // md5'#seed' domain), so each doc carries its own signature with
    // NO aggregation; docs explode to band keys and
    // flatMapGroupsWithState keyed by band bucket holds the
    // first-arrival doc id per bucket — a later doc sharing any
    // band emits as a near-dup of that first. At 100 TB state is
    // one long per OCCUPIED bucket (not per doc), the same banding
    // economics as the batch job.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 3; val numHashes = 8; val rowsPerBand = 2
    val numBands = numHashes / rowsPerBand
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "an entirely different document about spark shuffles here",
      3L -> "the quick brown fox jumps over the lazy dog tonight", // ~1
      4L -> "catalyst plans optimize logical trees into physical plans",
      5L -> "an entirely different document about spark shuffles there", // ~2
      6L -> "the quick brown fox jumps over the lazy dog today") // ==1
    def withBands(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val toks = split(col("text"), " ")
      val shing = array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      val sigs = (0 until numHashes).map(s =>
        array_min(transform(col("shing"),
          x => md5(concat(x, lit(s"#$s"))))).as(s"mh$s"))
      df.filter(size(toks) >= k).withColumn("shing", shing)
        .select(col("doc_id") +: sigs: _*)
        .select(col("doc_id"), explode(array((0 until numBands).map { b =>
          concat_ws("|", lit(b.toString) +: (0 until rowsPerBand)
            .map(r => col(s"mh${b * rowsPerBand + r}")): _*)
        }: _*)).as("bkey"))
    }
    val mem = MemoryStream[(Long, String)]
    val q = withBands(mem.toDF().toDF("doc_id", "text"))
      .as[(Long, String)].map(_.swap)
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(String, Long)],
         st: org.apache.spark.sql.streaming.GroupState[Long]) => {
          // sort within the micro-batch so "first" matches the batch
          // job's min-id canonical pick under id-ordered arrival
          val ids = rows.map(_._2).toSeq.sorted.distinct
          val first = if (st.exists) st.get else ids.head
          if (!st.exists) st.update(first)
          ids.filter(_ != first).map(id => (id, first)).iterator
        })
      .toDF("doc_id", "dup_of")
      .writeStream.format("memory").queryName("slsh_out")
      .outputMode("append").start()
    try {
      // first four docs in one epoch, the rest later — state carries
      // the occupied buckets across micro-batches
      mem.addData(docs.take(4): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(4): _*)
      q.processAllAvailable()
      val streamed = spark.table("slsh_out").select("doc_id")
        .as[Long].collect().toSet
      // batch twin on the same corpus: a doc is a near-dup iff it
      // pairs (shared band) with a LOWER id
      val batchDocs = docs.toDF("doc_id", "text")
      val sig = graft.text.MinHash.signatures(
        graft.text.MinHash.shingles(batchDocs, "doc_id", "text", k),
        "doc_id", numHashes)
      val expect = graft.text.MinHash
        .candidatePairs(sig, "doc_id", numHashes, rowsPerBand)
        .select("b").as[Long].collect().toSet
      assert(streamed == expect,
        s"streaming flagged $streamed, batch candidate pairs say $expect")
      assert(expect.nonEmpty && !expect.contains(1L) && !expect.contains(2L))
    } finally q.stop()
  }

  test("streaming image near-dup == batch banded candidates (Hamming-band state)") {
    // the streaming twin of dd15 — perceptual near-dup AT INGEST,
    // completing the multimodal arc the MinHash twin above opened for
    // text: each arriving image DECODES per row (the scan-speed
    // mapPartitions contract holds inside a stream's map), bands its
    // 64-bit dHash under the SAME corpus-derived geometry the batch
    // pass uses, and flatMapGroupsWithState keyed by band bucket
    // holds the first-arrival doc id per occupied bucket — a later
    // image sharing any band emits as a near-dup of that first. At
    // 100 TB state is one long per OCCUPIED bucket, the banding
    // economics of the batch job carried into the stream.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.multimodal.ImagePixels
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids: Seq[Long] = 0L until 12L // planted twins (2k, 2k+1)
    val bspec = graft.sim.HammingBands.spec(
      graft.sim.HammingBands.bits(ids.size, occ = 4))
    def bandKeys(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val ufp = shiftleft(col("hi"), 32).bitwiseOR(col("lo"))
      df.select(col("doc_id"),
        explode(array(bspec.zipWithIndex.map { case ((shf, wd), i) =>
          concat_ws("|", lit(i.toString),
            shiftrightunsigned(ufp, shf).bitwiseAND(lit((1L << wd) - 1))
              .cast("string"))
        }: _*)).as("bkey"))
    }
    def decoded(df: org.apache.spark.sql.Dataset[Long])
      : org.apache.spark.sql.DataFrame =
      df.map { id =>
        val (_, w, h, px) = ImagePixels.decodePixels(
          ImagePixels.imagePayload(id))
        val (hi, lo) = ImagePixels.dHash(w, h, px)
        (id, hi, lo)
      }.toDF("doc_id", "hi", "lo")
    val mem = MemoryStream[Long]
    val q = bandKeys(decoded(mem.toDS()))
      .as[(Long, String)].map(_.swap)
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(String, Long)],
         st: org.apache.spark.sql.streaming.GroupState[Long]) => {
          val batch = rows.map(_._2).toSeq.sorted.distinct
          val first = if (st.exists) st.get else batch.head
          if (!st.exists) st.update(first)
          batch.filter(_ != first).map(id => (id, first)).iterator
        })
      .toDF("doc_id", "dup_of")
      .writeStream.format("memory").queryName("sphash_out")
      .outputMode("append").start()
    try {
      mem.addData(ids.take(5): _*)
      q.processAllAvailable()
      mem.addData(ids.drop(5): _*)
      q.processAllAvailable()
      val streamed = spark.table("sphash_out").select("doc_id")
        .as[Long].collect().toSet
      // batch twin: an image is a near-dup iff it shares a band with
      // a LOWER id (the dd15 candidate step under the same geometry)
      val batchBands = bandKeys(decoded(ids.toDS()))
      val expect = batchBands.as("a").join(batchBands.as("b"),
          col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id")).as[Long].collect().toSet
      assert(streamed == expect,
        s"streaming flagged $streamed, batch candidates say $expect")
      // every odd twin pairs with its even original
      assert((1L until 12L by 2).forall(expect.contains),
        s"planted twins missing from $expect")
    } finally q.stop()
  }

  test("streaming video near-dup: in-stream proposals == batch collisions; verdict == one-shot") {
    // the dd21 arc completed at the STREAM grain (round 14): videos
    // arrive, sampled frames decode per row, frame hashes band under
    // the corpus geometry, and flatMapGroupsWithState keyed by frame
    // band holds every (video, frame) seen per occupied bucket — a
    // new frame colliding with a stored one emits an OFFSET PROPOSAL
    // (id1, id2, off), exactly the batch index's collision step. The
    // verdict stays a batch join against the id-bucketed frame store
    // ([[PhashIndex.offsetVerdict]], shared code): stream proposes at
    // ingest, the exchange-free verify confirms — the architecture a
    // 100 TB pipeline actually runs. Pinned: streamed proposals ==
    // batch collisions, and verdict(proposals) == the one-shot
    // ingestVideoBatch pairs.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.multimodal.{MediaContent, PhashIndex}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids: Seq[Long] = 0L until 24L // includes head-trimmed twins
    val bspec = graft.sim.HammingBands.spec(
      graft.sim.HammingBands.bits(ids.size, occ = 4))
    def frameHashes(df: org.apache.spark.sql.Dataset[Long])
      : org.apache.spark.sql.DataFrame =
      MediaContent.hashSampledFrames(
        df.map(id => graft.multimodal.Multimodal.MediaRow(
          id, MediaContent.aviPixelBytes(id)))).toDF()
        .select(col("doc_id").as("id"), col("frame_idx").as("fi"),
          col("dh_hi").as("hi"), col("dh_lo").as("lo"))
    def bandKeys(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val ufp = shiftleft(col("hi"), 32).bitwiseOR(col("lo"))
      df.select(col("id"), col("fi"),
        explode(array(bspec.zipWithIndex.map { case ((shf, wd), i) =>
          concat_ws("|", lit(i.toString),
            shiftrightunsigned(ufp, shf).bitwiseAND(lit((1L << wd) - 1))
              .cast("string"))
        }: _*)).as("bkey"))
    }
    val mem = MemoryStream[Long]
    val q = bandKeys(frameHashes(mem.toDS()))
      .select(col("bkey"), col("id"), col("fi").cast("int"))
      .as[(String, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(String, Long, Int)],
         st: org.apache.spark.sql.streaming.GroupState[Seq[(Long, Int)]]) => {
          var acc = if (st.exists) st.get else Seq.empty[(Long, Int)]
          val out = scala.collection.mutable.Buffer.empty[(Long, Long, Long)]
          for ((_, id, fi) <- rows.toSeq.sortBy(r => (r._2, r._3))) {
            for ((id2, fi2) <- acc if id2 != id) {
              val p = if (id < id2) (id, id2, (fi - fi2).toLong)
                      else (id2, id, (fi2 - fi).toLong)
              out += p
            }
            acc = acc :+ ((id, fi))
          }
          st.update(acc)
          out.distinct.iterator
        })
      .toDF("id1", "id2", "off")
      .writeStream.format("memory").queryName("svid_out")
      .outputMode("append").start()
    try {
      mem.addData(ids.take(9): _*)
      q.processAllAvailable()
      mem.addData(ids.drop(9): _*)
      q.processAllAvailable()
      val proposals = spark.table("svid_out").distinct()
      // batch collision step under the same geometry (dd21's shape)
      val frames = frameHashes(ids.toDS()).localCheckpoint()
      val bands = bandKeys(frames)
      val expect = bands.as("a").join(bands.as("b"),
          col("a.bkey") === col("b.bkey") && col("a.id") =!= col("b.id"))
        .select(least(col("a.id"), col("b.id")).as("id1"),
          greatest(col("a.id"), col("b.id")).as("id2"),
          when(col("a.id") < col("b.id"), col("a.fi") - col("b.fi"))
            .otherwise(col("b.fi") - col("a.fi")).cast("long").as("off"))
        .distinct()
      def key3(df: org.apache.spark.sql.DataFrame) = df
        .select("id1", "id2", "off").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(key3(proposals) == key3(expect),
        "streamed proposals must equal the batch collision step")
      // shared verdict code: stream-proposed pairs confirm to exactly
      // the one-shot index pairs
      val dir = java.nio.file.Files
        .createTempDirectory("svid_idx_").toString
      def key5(df: org.apache.spark.sql.DataFrame) = df
        .select("id1", "id2", "n_aligned", "off", "max_ham").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val oneShot = key5(PhashIndex.ingestVideoBatch(
        frames.withColumnRenamed("fi", "frame_idx"), dir, 0,
        graft.sim.HammingBands.bits(ids.size, occ = 4)))
      val streamedVerdict = key5(
        PhashIndex.offsetVerdict(proposals, frames))
      assert(streamedVerdict == oneShot,
        "verdict over streamed proposals must equal the one-shot pairs")
      assert(oneShot.nonEmpty, "corpus must contain sequence near-dups")
    } finally q.stop()
  }

  test("streaming WRITE into a columnMapping table: rename lands between epochs") {
    import graft.sources.{SchemaLog, Sinks, TxnManifest}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_mapsink_").toString
    val root = s"$base/t"
    val manPath = s"$base/_commits"
    val logPath = s"$base/_schema"
    val log = new SchemaLog(logPath)
    log.init(StructType(Seq(StructField("id", LongType),
      StructField("v", StringType))))
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "v")
      .writeStream.format("graft-manifest")
      .option("manifest", manPath).option("schemaLog", logPath)
      .option("checkpointLocation", s"$base/ckpt")
      .start(root)
    try {
      ms.addData((1L, "a"))
      q.processAllAvailable()
      // files carry PHYSICAL names
      val fileCols = spark.read.parquet(s"$root/batch=0").columns.toSet
      assert(fileCols == Set("p0", "p1"), fileCols.toString)
      // RENAME between epochs: the binding keys on physical ids, so
      // the stream keeps writing; readers serve the NEW logical name
      // for old and new epochs alike
      log.rename("v", "w")
      ms.addData((2L, "b"))
      q.processAllAvailable()
      val got = SchemaLog.readCommittedMapped(spark, root,
        new TxnManifest(manPath), log)
      assert(got.columns.toSeq == Seq("id", "w"))
      assert(got.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
    } finally q.stop()

    // DROP of a bound column mid-stream refuses at the next epoch
    // (writing to a dead physical id would be invisible data) —
    // fresh table: the epoch-ownership guard correctly refuses a new
    // checkpoint against the first manifest
    val root2 = s"$base/t2"
    val man2 = s"$base/_commits2"
    val log2Path = s"$base/_schema2"
    val log2 = new SchemaLog(log2Path)
    log2.init(StructType(Seq(StructField("id", LongType),
      StructField("w", StringType))))
    val ms2 = MemoryStream[(Long, String)]
    val q2 = ms2.toDF().toDF("id", "w")
      .writeStream.format("graft-manifest")
      .option("manifest", man2).option("schemaLog", log2Path)
      .option("checkpointLocation", s"$base/ckpt2")
      .start(root2)
    try {
      ms2.addData((3L, "c"))
      q2.processAllAvailable()
      log2.drop("w")
      log2.add("w", StringType) // fresh physical id p2 — p1 is dead
      ms2.addData((4L, "d"))
      val e = intercept[Exception](q2.processAllAvailable())
      assert(e.getMessage.contains("no longer exist") ||
        Option(e.getCause).exists(_.getMessage.contains("no longer exist")),
        e.getMessage)
    } finally q2.stop()
  }

  test("graft-manifest stream over a MERGE is an upsert feed for keyed sinks") {
    import graft.sources.{Sinks, TxnManifest}
    val base = java.nio.file.Files.createTempDirectory("graft_upfeed_").toString
    val root = s"$base/t"
    val manPath = s"$base/_commits"
    val man = new TxnManifest(manPath)
    Sinks.appendBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))

    // keyed-idempotent sink: last write per id wins (the CDC-upsert
    // consumer shape the scaladoc prescribes for merged tables)
    val state = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val q = spark.readStream.format("graft-manifest")
      .option("manifest", manPath).load(root)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => state.put(r.getLong(0), r.getString(1)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(state.size() == 2 && state.get(2L) == "b")
      // MERGE while the stream is live: update id 2, insert id 3 —
      // the merge batch re-delivers the rewritten dir's KEPT row (1)
      // alongside the changes, and the keyed sink converges
      Sinks.mergeUpsert(spark, Seq((2L, "b2"), (3L, "c")).toDF("id", "v"),
        root, man, keys = Seq("id"), mergeId = 50)
      q.processAllAvailable()
      assert(state.get(1L) == "a" && state.get(2L) == "b2" && state.get(3L) == "c")
      assert(state.size() == 3)
      // and the batch view agrees with the converged keyed state
      val table = Sinks.readCommitted(spark, root, man)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      import scala.jdk.CollectionConverters._
      assert(table == state.asScala.toMap)
    } finally q.stop()
  }

  test("graft-manifest sink: streaming write bootstraps and closes the loop") {
    import graft.sources.{Sinks, TxnManifest}
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_dsv2w_").toString
    val root = s"$base/table"
    val manPath = s"$base/manifest.tsv"

    // write INTO a fresh (empty) manifest: the sink bootstraps the table
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("graft-manifest")
      .option("manifest", manPath)
      .option("path", root)
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      // visible ONLY through the manifest — and readable by the source twin
      val man = new TxnManifest(manPath)
      assert(Sinks.readCommitted(spark, root, man).count() == 2)
      mem.addData((3L, "c"))
      q.processAllAvailable()
      val got = spark.read.format("graft-manifest")
        .option("manifest", manPath).load(root)
        .select("id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L))
      // each epoch is one committed manifest batch
      assert(new TxnManifest(manPath).committed().keySet == Set(0, 1))
    } finally q.stop()

    // full circle: the DSv2 SOURCE streams what the DSv2 SINK wrote
    val outDir = s"$base/relay"
    val relay = spark.readStream.format("graft-manifest")
      .option("manifest", manPath).load(root)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", s"$base/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    relay.awaitTermination()
    assert(spark.read.parquet(outDir).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
  }

  test("graft-manifest sink: epoch ownership refuses a second writer, allows replay") {
    import graft.sources.{SinkEpochLog, Sinks, TxnManifest}
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_dsv2own_").toString
    val root = s"$base/table"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)

    def startQuery(mem: MemoryStream[(Long, String)], ckpt: String) =
      mem.toDF().toDF("id", "v")
        .writeStream.format("graft-manifest")
        .option("manifest", manPath).option("path", root)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val mem1 = MemoryStream[(Long, String)]
    val q1 = startQuery(mem1, s"$base/ckpt")
    try {
      mem1.addData((1L, "a")); q1.processAllAvailable()
      assert(man.committed().keySet == Set(0))
    } finally q1.stop()

    // restart from the SAME checkpoint: epochs continue, commits flow
    // (a fresh MemoryStream starts at offset 0, which the checkpoint
    // has already consumed — feed a placeholder batch to advance past
    // the committed offset, then the real data)
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((1L, "a-replayed-offset"))
    val q1b = startQuery(mem2, s"$base/ckpt")
    try {
      mem2.addData((2L, "b")); q1b.processAllAvailable()
      assert(Sinks.readCommitted(spark, root, man)
        .select("id").as[Long].collect().toSet == Set(1L, 2L))
    } finally q1b.stop()

    // a FRESH checkpoint resets epoch ids to 0 — committing would
    // silently un-name batch 0 and overwrite its dir; must fail loudly
    val mem3 = MemoryStream[(Long, String)]
    val q2 = startQuery(mem3, s"$base/ckpt_fresh")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      mem3.addData((99L, "clobber")); q2.processAllAvailable()
      q2.awaitTermination(10000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.getMessage != null) &&
      causes(err).exists(c => c.getMessage != null &&
        c.getMessage.contains("already committed by streaming query")),
      s"expected the epoch-ownership failure, got: $err")
    // ...and batch 0's data survived untouched
    assert(Sinks.readCommitted(spark, root, man)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))

    // ownership log unit surface: same-owner replay is idempotent;
    // an id the MANIFEST already holds from a batch producer refuses
    SinkEpochLog.claim(manPath, 7, "queryA", man)
    SinkEpochLog.claim(manPath, 7, "queryA", man) // replay: no throw
    val e2 = intercept[IllegalStateException] {
      SinkEpochLog.claim(manPath, 7, "queryB", man)
    }
    assert(e2.getMessage.contains("already committed by streaming query"))
    man.commit(42, Seq(s"$root/batch=42"))
    val e3 = intercept[IllegalStateException] {
      SinkEpochLog.claim(manPath, 42, "queryC", man)
    }
    assert(e3.getMessage.contains("non-sink producer"))
  }

  test("graft-manifest sink commit prunes stale parts from a wider dead attempt") {
    import graft.sources.{GraftManifestFileCommitted, GraftManifestStreamingWrite, Sinks, TxnManifest}
    val base = java.nio.file.Files.createTempDirectory("graft_dsv2st_").toString
    val root = s"$base/table"
    val manPath = s"$base/manifest.tsv"
    // a dead 2-partition attempt left part-0 and part-1; the replay
    // ran with ONE partition and its commit messages name only part-0
    val dir = s"$root/batch=0"
    Seq((1L, "live")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/stage0")
    Seq((99L, "stale")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/stage1")
    def onePart(stage: String, name: String): String = {
      import scala.jdk.CollectionConverters._
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val dst = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.copy(src, dst)
      dst.toString
    }
    val keep = onePart(s"$base/stage0", "part-0.parquet")
    onePart(s"$base/stage1", "part-1.parquet")
    val write = new GraftManifestStreamingWrite(root, manPath,
      new org.apache.spark.sql.types.StructType().add("id", "long").add("v", "string"), "q")
    write.commit(0, Array(GraftManifestFileCommitted(keep)))
    // the stale part is gone BEFORE visibility; readers serve only the
    // replay's rows
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "part-1.parquet")))
    assert(Sinks.readCommitted(spark, root, new TxnManifest(manPath))
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("graft-manifest sink: MULTI-key bucketed epochs roll per-bucket files") {
    import graft.sources.{Bucketing, Sinks, TxnManifest}
    import org.apache.spark.sql.types.LongType
    val base = java.nio.file.Files.createTempDirectory("graft_mkbs_").toString
    val rootA = s"$base/in"
    val manAPath = s"$base/man_a.tsv"
    val manA = new TxnManifest(manAPath)
    // 500 rows over a 9×9 = 81-bucket grid, written by ONE task
    // (shuffle.partitions = 1): 81 > MaxOpen = 64, so the rolling
    // writer MUST evict, close, and reopen per-bucket files — the
    // invariant under test is that every written file still holds
    // exactly one flat-grid bucket and the marker map says which
    val src = spark.range(0, 500)
      .selectExpr("id AS a", "id % 37 AS b", "concat('v', id) AS v")
    Sinks.appendBatch(src, rootA, 0)
    manA.commit(0, Seq(s"$rootA/batch=0"))
    val rootB = s"$base/out"
    val manBPath = s"$base/man_b.tsv"
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val q = spark.readStream.format("graft-manifest")
        .option("manifest", manAPath).load(rootA)
        .writeStream.format("graft-manifest")
        .option("manifest", manBPath)
        .option("path", rootB)
        .option("bucketBy", "9,a,b")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    // content round-trips exactly
    val back = Sinks.readCommitted(spark, rootB, new TxnManifest(manBPath))
    assert(back.count() == 500)
    assert(back.selectExpr("sum(a)").as[Long].head() == (0L until 500L).sum)
    // the marker carries the explicit file → bucket map, more files
    // than buckets touched once proves eviction-reopen happened
    val spec = Bucketing.parse("9,a,b")
    val dir = s"$rootB/batch=0"
    val resolve = Bucketing.fileBuckets(dir, spec)
      .getOrElse(fail(s"no matching _bucketed marker under $dir"))
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")
        && !f.getName.startsWith("_"))
    assert(files.length > 64,
      s"expected eviction-reopened rolls (> MaxOpen files), got ${files.length}")
    // every file holds exactly one bucket and the map names it
    files.foreach { f =>
      val mapped = resolve(f.getName).getOrElse(
        fail(s"${f.getName} missing from the marker's file map"))
      spark.read.parquet(f.getPath).select("a", "b").collect().foreach { r =>
        val flat = Bucketing.flatten(Seq(
          Bucketing.bucketOf(r.getLong(0), LongType, spec.n),
          Bucketing.bucketOf(r.getLong(1), LongType, spec.n)), spec)
        assert(flat == mapped,
          s"file ${f.getName} mapped to bucket $mapped holds a row of $flat")
      }
    }
    // the bucketed scan accepts the layout: grouping succeeds (no
    // degradation), so SPJ is available on the streamed-in table
    val parts = files.map(f => graft.sources.ManifestFilePartition(
      f.getPath, f.length, f.lastModified)
      : org.apache.spark.sql.connector.read.InputPartition)
    assert(Bucketing.groupByBucket(parts, spec).isDefined,
      "streamed multi-key epoch must group by bucket without degradation")
  }

  test("graft-manifest sink abort never deletes a committed epoch dir") {
    import graft.sources.{GraftManifestStreamingWrite, TxnManifest}
    val base = java.nio.file.Files.createTempDirectory("graft_dsv2ab_").toString
    val root = s"$base/table"
    val manPath = s"$base/manifest.tsv"
    // simulate the replay window: epoch 0 is manifest-committed (the
    // crash happened AFTER the manifest commit, before Spark's WAL
    // write), its dir holds visible data plus a stale attempt temp
    val dir = java.nio.file.Paths.get(s"$root/batch=0")
    java.nio.file.Files.createDirectories(dir)
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(dir.toString)
    java.nio.file.Files.writeString(dir.resolve(".part-0-99.tmp.parquet"), "x")
    new TxnManifest(manPath).commit(0, Seq(s"$root/batch=0"))

    val write = new GraftManifestStreamingWrite(root, manPath,
      new org.apache.spark.sql.types.StructType().add("id", "long"), "q")
    write.abort(0, Array.empty) // failed replay of the committed epoch
    // committed data still served; only the hidden temp is swept
    assert(spark.read.format("graft-manifest")
      .option("manifest", manPath).load(root).count() == 1)
    assert(!java.nio.file.Files.exists(dir.resolve(".part-0-99.tmp.parquet")))

    // an UN-committed epoch owned by ANOTHER query: a losing racer's
    // abort must not destroy the live owner's in-flight files
    import graft.sources.SinkEpochLog
    val dir9 = java.nio.file.Paths.get(s"$root/batch=9")
    java.nio.file.Files.createDirectories(dir9)
    java.nio.file.Files.writeString(dir9.resolve("part-0.parquet"), "owner-bytes")
    SinkEpochLog.claim(manPath, 9, "ownerQ", new TxnManifest(manPath))
    write.abort(9, Array.empty) // "q" aborts, but "ownerQ" owns epoch 9
    assert(java.nio.file.Files.exists(dir9.resolve("part-0.parquet")))

    // an un-committed epoch WE own: abort deletes the dir whole and
    // RELEASES the claim, so a future query can legitimately reuse it
    val dir5 = java.nio.file.Paths.get(s"$root/batch=5")
    java.nio.file.Files.createDirectories(dir5)
    java.nio.file.Files.writeString(dir5.resolve("part-0.parquet"), "stale")
    SinkEpochLog.claim(manPath, 5, "q", new TxnManifest(manPath))
    write.abort(5, Array.empty)
    assert(!java.nio.file.Files.exists(dir5))
    SinkEpochLog.claim(manPath, 5, "freshQuery", new TxnManifest(manPath)) // no throw
  }

  test("graft-manifest scan fails loudly when a committed dir is missing") {
    import graft.sources.{GraftManifestSource, Sinks, TxnManifest}
    val base = java.nio.file.Files.createTempDirectory("graft_dsv2gone_").toString
    val root = s"$base/table"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)
    Sinks.appendBatch(Seq((1L, "a")).toDF("id", "v"), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    Sinks.appendBatch(Seq((2L, "b")).toDF("id", "v"), root, 1)
    man.commit(1, Seq(s"$root/batch=1"))
    // destroy batch 0 out from under the manifest (bad vacuum / manual
    // rm) AFTER planning started — the plan-time listing must surface
    // the loss, not silently serve an empty batch
    import scala.jdk.CollectionConverters._
    val d = java.nio.file.Paths.get(s"$root/batch=0")
    java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    val e = intercept[IllegalStateException] {
      GraftManifestSource.partitionsFor(man, root, Int.MinValue, Int.MaxValue)
    }
    assert(e.getMessage.contains("committed data was deleted"), s"got: $e")
    // the fresh-read path also fails loudly (schema resolution finds
    // the hole first — PATH_NOT_FOUND — which is equally loud)
    intercept[Exception] {
      spark.read.format("graft-manifest")
        .option("manifest", manPath).load(root).count()
    }
    ()
  }

  test("CdcApply.collapse: preimages drop, last commit wins, deletes split") {
    import graft.streaming.CdcApply
    val batch = Seq(
      // key 1: inserted then updated — the postimage wins
      (1L, "a", "insert", 0), (1L, "a", "update_preimage", 2),
      (1L, "a2", "update_postimage", 2),
      // key 2: inserted then deleted across commits — nets to a delete
      (2L, "b", "insert", 1), (2L, "b", "delete", 3),
      // key 3: a plain insert survives as an upsert
      (3L, "c", "insert", 1)
    ).toDF("id", "v", "_change_type", "_commit_batch")
    val (ups, dels) = CdcApply.collapse(batch, Seq("id"))
    assert(ups.columns.toSeq == Seq("id", "v"))
    assert(ups.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a2", 3L -> "c"))
    assert(dels.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // a non-change-feed frame refuses loudly
    val e = intercept[IllegalArgumentException](
      CdcApply.collapse(Seq((1L, "a")).toDF("id", "v"), Seq("id")))
    assert(e.getMessage.contains("_change_type"))
  }

  test("CdcApply.applyBatch: exactly-once epochs, state-idempotent re-apply") {
    import graft.sources.{Sinks, TxnManifest}
    import graft.streaming.CdcApply
    val base = java.nio.file.Files.createTempDirectory("cdc_apply_").toString
    val root = s"$base/t"
    val manPath = s"$base/manifest.tsv"
    def state(): Map[Long, String] =
      Sinks.readCommitted(spark, root, new TxnManifest(manPath))
        .collect().map(r => r.getLong(r.fieldIndex("id")) ->
          r.getString(r.fieldIndex("v"))).toMap
    val e0 = Seq((1L, "a", "insert", 0), (2L, "b", "insert", 0))
      .toDF("id", "v", "_change_type", "_commit_batch")
    // epoch 0 bootstraps the empty downstream as an append
    assert(CdcApply.applyBatch(spark, e0, root, manPath, Seq("id"), "app", 0L))
    assert(state() == Map(1L -> "a", 2L -> "b"))
    // same epoch again: skipped (restart semantics), state untouched
    assert(!CdcApply.applyBatch(spark, e0, root, manPath, Seq("id"), "app", 0L))
    assert(state() == Map(1L -> "a", 2L -> "b"))
    // epoch 1 merges: update 1, delete 2, insert 3
    val e1 = Seq(
      (1L, "a", "update_preimage", 1), (1L, "A", "update_postimage", 1),
      (2L, "b", "delete", 1), (3L, "c", "insert", 1)
    ).toDF("id", "v", "_change_type", "_commit_batch")
    assert(CdcApply.applyBatch(spark, e1, root, manPath, Seq("id"), "app", 1L))
    assert(state() == Map(1L -> "A", 3L -> "c"))
    // the crash window: merge committed but the applied-log write was
    // lost — re-applying the SAME epoch's net changes must converge to
    // the same state (upsert same values, delete already-absent keys)
    new java.io.File(CdcApply.appliedPath(manPath, "app")).delete()
    assert(CdcApply.applyBatch(spark, e1, root, manPath, Seq("id"), "app", 1L))
    assert(state() == Map(1L -> "A", 3L -> "c"))
    assert(CdcApply.lastApplied(manPath, "app").contains(1L))
    // a second consumer app has its own epoch log
    assert(CdcApply.lastApplied(manPath, "other").isEmpty)
  }

  test("streaming MV twin: CDF-stream fold state equals the batch view") {
    import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
    import graft.sources.{StatsSinks, TxnManifest}
    val base = java.nio.file.Files
      .createTempDirectory("graft_stmv_").toString
    val root = s"$base/src"
    val manPath = s"$base/manifest.tsv"
    val man = new TxnManifest(manPath)
    def seed(n: Int) = spark.range(n).select(col("id"),
      (col("id") % 5).cast("int").as("grp"),
      when(col("id") % 7 === 0, lit(null).cast("long"))
        .otherwise(col("id") * 3).as("v"))
    StatsSinks.appendBatchStats(seed(400), root, 0)
    man.commit(0, Seq(s"$root/batch=0"))
    GraftSqlTables.register("stmv_src", GraftSqlTables.Entry(root,
      manPath, keys = Seq("id"), cdf = true))
    GraftSql.execute(spark,
      s"CREATE MATERIALIZED VIEW stmv LOCATION '$base/mv' AS " +
        "SELECT grp, count(*) AS n, sum(v) AS sv FROM stmv_src GROUP BY grp")
    GraftSql.execute(spark, "DELETE FROM stmv_src WHERE id % 9 = 2")
    GraftSql.execute(spark, "UPDATE stmv_src SET v = v + 1 WHERE id % 4 = 1")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW stmv")

    // the SS twin: a streaming aggregation over the SAME change feed,
    // folding the SAME signed weights the batch refresh folds — the
    // streaming state and the stored view must agree exactly
    val w = when(col(graft.sources.Sinks.ChangeTypeCol)
      .isin("insert", "update_postimage"), 1L).otherwise(-1L)
    def startTwin() = spark.readStream.format("graft-manifest")
      .option("manifest", manPath).option("changeFeed", "true").load(root)
      .select(col("grp"), w.as("w"), col("v"))
      .groupBy("grp").agg(sum(col("w")).as("n"),
        sum(col("w") * col("v")).as("sv"))
      .writeStream.format("memory").queryName("stmv_twin")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("complete").start()
    def twinRows() = spark.table("stmv_twin").filter(col("n") > 0)
      .collect().map(_.toString).sorted.toSeq
    def mvRows() = GraftMvs.read(spark, "stmv")
      .collect().map(_.toString).sorted.toSeq
    val q = startTwin()
    try q.processAllAvailable() finally q.stop()
    assert(twinRows() == mvRows(),
      "streaming fold state must equal the refreshed view")

    // more DML while the stream is DOWN; restart resumes the state
    // from the checkpoint and both sides converge again
    GraftSql.execute(spark, "DELETE FROM stmv_src WHERE grp = 3")
    GraftSql.execute(spark, "UPDATE stmv_src SET v = v * 2 WHERE id % 10 = 6")
    GraftSql.execute(spark, "REFRESH MATERIALIZED VIEW stmv")
    val q2 = startTwin()
    try q2.processAllAvailable() finally q2.stop()
    assert(twinRows() == mvRows(),
      "restarted twin must converge with the second refresh")
    assert(!twinRows().exists(_.contains("[3,")),
      "the killed group must be absent from both sides")
    GraftSql.execute(spark, "DROP MATERIALIZED VIEW stmv")
    GraftSqlTables.unregister("stmv_src")
  }

  test("graft-warc streaming tail: exactly-once files, restart, watermark guard") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("warc_tail_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("warc_tail_ck_").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    def land(name: String, ids: (Long, Long)): Unit = {
      val recs = docs.filter($"doc_id" >= ids._1 && $"doc_id" < ids._2)
        .orderBy($"doc_id")
        .select(graft.text.WarcExtract.renderWarcRecords(
          $"doc_id", split($"text", " ")).as("recs"))
        .collect()
      val out = new java.io.FileOutputStream(s"$dir/$name")
      try recs.foreach(_.getSeq[String](0).foreach { r =>
        out.write(graft.sources.WarcFile.gzipMember(r.getBytes("ISO-8859-1")))
      }) finally out.close()
    }
    land("part-0001.warc.gz", (0L, 10L))
    land("part-0002.warc.gz", (10L, 20L))
    val sink = java.nio.file.Files.createTempDirectory("warc_tail_snk_")
      .toString
    def start() = spark.readStream.format("graft-warc").load(dir)
      .filter($"rtype" === "response")
      .select(regexp_extract($"rec_id", "urn:graft:([0-9]+)", 1)
        .cast("long").as("doc_id"))
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def seen(): Seq[Long] = spark.read.parquet(sink)
      .as[Long].collect().toSeq.sorted
    val q = start()
    try {
      q.processAllAvailable()
      assert(seen() == (0L until 20L), s"first tail: ${seen()}")
      // a third file lands (name ascends): exactly once, no re-reads
      land("part-0003.warc.gz", (20L, 25L))
      q.processAllAvailable()
      assert(seen() == (0L until 25L), s"after landing: ${seen()}")
      // source metrics in the progress line: committed == landed,
      // nothing pending (ReportsSourceMetrics — catch-up visibility)
      val sm = q.lastProgress.sources.head.metrics
      assert(sm.get("filesCommitted") == "3" && sm.get("filesLanded") == "3"
        && sm.get("filesPending") == "0", sm.toString)
    } finally q.stop()
    // restart from the checkpoint: nothing re-delivers, new files flow
    land("part-0004.warc.gz", (25L, 30L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen() == (0L until 30L), s"after restart: ${seen()}")
      // a file landing BEHIND the committed watermark refuses loudly
      // (silent skip-forever is the failure mode this guards)
      land("part-0000-late.warc.gz", (30L, 31L))
      land("part-9999.warc.gz", (31L, 32L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(e.getMessage.contains("BEHIND the") ||
        Option(e.getCause).exists(_.getMessage.contains("BEHIND the")),
        e.getMessage)
    } finally q2.stop()
  }

  test("streaming CDX: tailed coordinates equal the batch rebuild") {
    // the lookup index a crawl archive serves from stays CURRENT as
    // waves land: the tail emits the same member coordinates the
    // batch scan reports, so a parquet-appended CDX always equals a
    // from-scratch rebuild — and records fetched through the STREAMED
    // rows are the archived bytes
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("warc_scdx_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("warc_scdx_ck_").toString
    val sink = java.nio.file.Files.createTempDirectory("warc_scdx_snk_").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    def land(name: String, ids: (Long, Long)): Unit = {
      val recs = docs.filter($"doc_id" >= ids._1 && $"doc_id" < ids._2)
        .orderBy($"doc_id")
        .select(graft.text.WarcExtract.renderWarcRecords(
          $"doc_id", split($"text", " ")).as("recs"))
        .collect()
      val out = new java.io.FileOutputStream(s"$dir/$name")
      try recs.foreach(_.getSeq[String](0).foreach { r =>
        out.write(graft.sources.WarcFile.gzipMember(r.getBytes("ISO-8859-1")))
      }) finally out.close()
    }
    land("part-0001.warc.gz", (0L, 8L))
    val q = spark.readStream.format("graft-warc").load(dir)
      .filter($"rtype" === "response")
      .select($"file", $"offset", $"length", $"rec_id")
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      land("part-0002.warc.gz", (8L, 20L))
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))
    val streamed = spark.read.parquet(sink)
      .select($"file", $"offset", $"length", $"rec_id")
      .collect().map(key).sorted.toSeq
    val rebuilt = graft.sources.WarcFetch.cdxIndex(spark, dir)
      .select($"file", $"offset", $"length", $"rec_id")
      .collect().map(key).sorted.toSeq
    assert(streamed == rebuilt,
      "streamed CDX diverges from the batch rebuild")
    // the streamed coordinates serve fetches: every response comes
    // back and re-parses to its own record id
    val hits = graft.sources.WarcFetch.fetch(spark.read.parquet(sink))
    assert(hits.count() == 20)
    assert(hits.filter($"rtype" =!= "response").count() == 0)
  }

  test("streaming span candidates == batch anchor collisions; df cap tombstones") {
    // the dd22 arc at the STREAM grain: documents arrive, anchors
    // explode per row, and flatMapGroupsWithState keyed by anchor
    // hash holds the (doc, pos) rows per occupied hash — a new anchor
    // colliding with stored rows emits the same (id1, id2, pa, delta)
    // candidates the batch probe join produces; the df cap tombstones
    // hot anchors so per-anchor state is bounded at maxDf rows.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.SpanStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 8; val maxDf = 4
    val shared = (0 until 24).map(i => s"s$i").mkString(" ")
    val shared2 = (0 until 16).map(i => s"t$i").mkString(" ")
    val boiler = (0 until 12).map(i => s"b$i").mkString(" ")
    def filler(i: Long) = (0 until 10).map(j => s"u${i}_$j").mkString(" ")
    val batch1: Seq[(Long, String)] =
      (1L to 3L).map(i => i -> s"$boiler ${filler(i)}") :+
        (101L -> s"$shared ${filler(101)}")
    val batch2: Seq[(Long, String)] =
      (4L to 6L).map(i => i -> s"$boiler ${filler(i)}") ++ Seq(
        102L -> s"${filler(102)} $shared",          // cross-batch pair
        103L -> s"$shared2 ${filler(103)}",         // within-batch pair
        104L -> s"${filler(104)} $shared2")
    val mem = MemoryStream[(Long, String)]
    val anchorRows = SpanStream.anchors(
        mem.toDF().toDF("doc_id", "text")
          .select(col("doc_id"), split(col("text"), " ").as("w")),
        "doc_id", "w", k)
      .as[SpanStream.AnchorRow]
    val q = SpanStream.candidates(anchorRows, maxDf)
      .writeStream.format("memory").queryName("sspan_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // a post-cap arrival emits NOTHING (the tombstone persists)
      mem.addData(7L -> s"$boiler ${filler(7)}")
      q.processAllAvailable()
      val streamed = spark.table("sspan_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch twin: capped anchor self-join over the whole corpus
      val all = (batch1 ++ batch2 :+ (7L -> s"$boiler ${filler(7)}"))
        .toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val anchors = SpanStream.anchors(all, "doc_id", "w", k)
      val kept = anchors.join(
        anchors.groupBy("h")
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") <= maxDf).select("h"), Seq("h"))
      val batchCands = kept.as("a")
        .join(kept.as("b"), col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"), col("a.pos"),
          (col("b.pos") - col("a.pos")).as("delta"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // cap-free anchors agree exactly; the boiler anchors (df 7 > 4)
      // are absent from the batch side, and the stream's monotone
      // row-grain cap emitted only the pre-cap prefix (docs 1..4)
      val streamedClean = streamed.filter(_._1 > 100L)
      val batchClean = batchCands.filter(_._1 > 100L)
      assert(streamedClean == batchClean && batchClean.nonEmpty,
        s"cap-free candidates diverge: ${streamedClean.size} streamed " +
          s"vs ${batchClean.size} batch")
      assert(streamedClean.exists(c => c._1 == 101L && c._2 == 102L))
      assert(streamedClean.exists(c => c._1 == 103L && c._2 == 104L))
      val boilerPairs = streamed -- streamedClean
      assert(boilerPairs.nonEmpty &&
        boilerPairs.forall(c => c._1 <= 4L && c._2 <= 4L),
        s"monotone cap: only pre-cap docs may pair, got $boilerPairs")
      assert(!streamed.exists(c => c._1 >= 5L && c._1 <= 7L ||
        c._2 >= 5L && c._2 <= 7L),
        "docs arriving at/after the cap crossing must emit nothing")
    } finally q.stop()
  }

  test("streaming span state: per-doc occurrence cap bounds row-grain spam") {
    // one document repeating a k-gram hundreds of times must not grow
    // a single anchor's state past maxDf*maxOccPerDoc rows (the doc
    // cap alone never fires — it counts DISTINCT docs); emissions
    // against a later doc are bounded by the stored prefix, not the
    // spam count
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.SpanStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 4; val maxDf = 4; val maxOcc = 3
    // doc 1: "a0 a1 a2 a3" repeated 200x -> the aligned k-gram
    // (a0 a1 a2 a3) occurs 200 times under one hash
    val spam = (0 until 200).map(_ => "a0 a1 a2 a3").mkString(" ")
    val mem = MemoryStream[(Long, String)]
    val anchorRows = SpanStream.anchors(
        mem.toDF().toDF("doc_id", "text")
          .select(col("doc_id"), split(col("text"), " ").as("w")),
        "doc_id", "w", k)
      .as[SpanStream.AnchorRow]
    val q = SpanStream.candidates(anchorRows, maxDf, maxOcc)
      .writeStream.format("memory").queryName("sspan_occ")
      .outputMode("append").start()
    try {
      mem.addData(1L -> spam)
      q.processAllAvailable()
      // the progress line reports stateful operator rows: the anchor
      // state must hold <= maxDf*maxOcc rows per distinct hash (4
      // distinct hashes in the spam cycle), not ~800
      val rowsInState = q.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      assert(rowsInState > 0 && rowsInState <= 4L, // one state row/hash
        s"state rows $rowsInState")
      // a second doc sharing the k-gram pairs against AT MOST maxOcc
      // stored occurrences of doc 1 per hash
      mem.addData(2L -> s"a0 a1 a2 a3 z0 z1 z2 z3")
      q.processAllAvailable()
      val got = spark.table("sspan_occ").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.nonEmpty && got.toSet == Set((1L, 2L)))
      // per-hash pairing bounded by the occurrence cap: the shared
      // aligned k-gram stored <= 3 rows, so <= 3 pairs from it; the
      // unaligned spam k-grams (a1 a2 a3 a0 etc.) add <= 3 each for
      // the 1 matching position -> total strictly << 200
      assert(got.size <= 4 * maxOcc, s"${got.size} pairs emitted")
    } finally q.stop()
  }
}
