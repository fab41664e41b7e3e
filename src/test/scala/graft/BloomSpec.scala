package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.sources.{BloomIndex, StatsSinks, TxnManifest}

/** Per-file bloom-index specs: point-lookup pruning where min/max
  * cannot help, and the no-false-negative soundness contract. */
class BloomSpec extends SparkSuite {
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

  test("equality probe prunes files min/max cannot (interleaved ids)") {
    val (root, manPath, man) = freshTable("bloom_ids_")
    // both batches span the FULL id range (evens vs odds), so range
    // stats overlap everywhere and only blooms can separate them
    val evens = (0 until 2000 by 2).map(i => (i.toLong, s"u$i")).toDF("id", "user")
    val odds  = (1 until 2000 by 2).map(i => (i.toLong, s"u$i")).toDF("id", "user")
    StatsSinks.appendBatchStats(evens.coalesce(1), root, 0)
    BloomIndex.writeSidecar(spark, s"$root/batch=0", Seq("id", "user"))
    man.commit(0, Seq(s"$root/batch=0"))
    StatsSinks.appendBatchStats(odds.coalesce(1), root, 1)
    BloomIndex.writeSidecar(spark, s"$root/batch=1", Seq("id", "user"))
    man.commit(1, Seq(s"$root/batch=1"))

    val all = scanFiles(load(root, manPath))
    assert(all == 2)
    // long equality: an odd id must open only batch 1's file
    val q1 = load(root, manPath).where($"id" === 1001L)
    assert(q1.select("user").as[String].collect().toSeq == Seq("u1001"))
    assert(scanFiles(load(root, manPath).where($"id" === 1001L)) == 1)
    // string equality prunes the same way
    assert(scanFiles(load(root, manPath).where($"user" === "u1002")) == 1)
    // IN-list spanning both parities opens both files, result exact
    val in = load(root, manPath).where($"id".isin(4L, 7L))
    assert(in.select("id").as[Long].collect().toSet == Set(4L, 7L))
    assert(scanFiles(load(root, manPath).where($"id".isin(4L, 7L))) == 2)
    // range filters alone never consult blooms: both files read
    assert(scanFiles(load(root, manPath).where($"id" > 100L)) == 2)
  }

  test("no false negatives: every present value survives pruning (randomized)") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(500)(rnd.nextLong())
    val (root, manPath, man) = freshTable("bloom_prop_")
    StatsSinks.appendBatchStats(values.toDF("id").repartition(4), root, 0)
    BloomIndex.writeSidecar(spark, s"$root/batch=0", Seq("id"))
    man.commit(0, Seq(s"$root/batch=0"))
    val conf = spark.sparkContext.hadoopConfiguration
    val blooms = BloomIndex.read(conf, s"$root/batch=0").get
    // a file's bloom must admit every value the file actually holds
    val byFile = spark.read.parquet(s"$root/batch=0")
      .select(input_file_name().as("f"), $"id")
      .as[(String, Long)].collect()
      .groupBy { case (f, _) => new org.apache.hadoop.fs.Path(f).getName }
    byFile.foreach { case (name, rows) =>
      val fb = blooms(name)
      rows.foreach { case (_, v) =>
        assert(BloomIndex.mayMatch(fb, Seq(EqualTo("id", v))),
          s"false negative: $v in $name")
      }
    }
    // and the scan returns exactly the matching rows for each probe
    values.take(20).foreach { v =>
      assert(load(root, manPath).where($"id" === v).count() ==
        values.count(_ == v))
    }
  }

  test("unknown column, absent sidecar, wrong-domain literal: never prune") {
    val (root, manPath, man) = freshTable("bloom_guard_")
    StatsSinks.appendBatchStats(Seq((1L, "a")).toDF("id", "s"), root, 0)
    BloomIndex.writeSidecar(spark, s"$root/batch=0", Seq("id"))
    man.commit(0, Seq(s"$root/batch=0"))
    val conf = spark.sparkContext.hadoopConfiguration
    val fb = BloomIndex.read(conf, s"$root/batch=0").get.head._2
    // column not indexed → may match
    assert(BloomIndex.mayMatch(fb, Seq(EqualTo("s", "zzz"))))
    // string literal against the long bloom → wrong domain, may match
    assert(BloomIndex.mayMatch(fb, Seq(EqualTo("id", "1"))))
    // null literal never prunes
    assert(BloomIndex.mayMatch(fb, Seq(EqualTo("id", null))))
    // In with any null never prunes
    assert(BloomIndex.mayMatch(fb, Seq(In("id", Array(99L, null)))))
    // In with all-absent longs DOES prune
    assert(!BloomIndex.mayMatch(fb, Seq(In("id", Array(98L, 99L)))))
    // Or requires both branches excluded; one present side keeps it
    assert(BloomIndex.mayMatch(fb,
      Seq(Or(EqualTo("id", 1L), EqualTo("id", 99L)))))
    assert(!BloomIndex.mayMatch(fb,
      Seq(Or(EqualTo("id", 98L), EqualTo("id", 99L)))))
    // absent sidecar → None → no pruning path at all
    assert(BloomIndex.read(conf, s"$root/nope").isEmpty)
    // torn sidecar degrades to no pruning, never a crash
    val torn = new java.io.PrintWriter(s"$root/batch=0/_bloom.tsv")
    torn.write("garbage\twithout\tenough"); torn.close()
    assert(BloomIndex.read(conf, s"$root/batch=0").isEmpty)
    assert(load(root, manPath).where($"id" === 1L).count() == 1)
  }

  test("unindexable column type fails loudly at build time") {
    val (root, _, _) = freshTable("bloom_type_")
    StatsSinks.appendBatchStats(Seq((1L, 2.5)).toDF("id", "v"), root, 0)
    val e = intercept[IllegalArgumentException] {
      BloomIndex.writeSidecar(spark, s"$root/batch=0", Seq("v"))
    }
    assert(e.getMessage.contains("unindexable"))
    val e2 = intercept[IllegalArgumentException] {
      BloomIndex.writeSidecar(spark, s"$root/batch=0", Seq("missing"))
    }
    assert(e2.getMessage.contains("not in"))
  }
}
