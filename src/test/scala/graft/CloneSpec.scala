package graft

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, StatsSinks, TxnManifest}

/** Shallow-clone specs: zero-copy snapshot isolation, cross-root
  * copy-on-write merge, and the source-vacuum shared-fate hazard. */
class CloneSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("clone is a zero-copy snapshot isolated from later writes on both sides") {
    val base = fresh("clone_iso_")
    val (srcRoot, cloneRoot) = (s"$base/src", s"$base/clone")
    val srcMan = new TxnManifest(s"$base/src.manifest")
    StatsSinks.appendBatchStats(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), srcRoot, 0)
    srcMan.commit(0, Seq(s"$srcRoot/batch=0"))
    StatsSinks.appendBatchStats(Seq((3L, "c")).toDF("id", "v"), srcRoot, 1)
    srcMan.commit(1, Seq(s"$srcRoot/batch=1"))

    val cloneMan = new TxnManifest(s"$base/clone.manifest")
    cloneMan.cloneFrom(srcMan, srcRoot)
    // nothing was copied: the clone root does not even exist yet
    assert(!new java.io.File(cloneRoot).exists())
    assert(Sinks.readCommittedUnion(spark, cloneMan)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))

    // source append AFTER the clone: invisible to the clone
    StatsSinks.appendBatchStats(Seq((4L, "d")).toDF("id", "v"), srcRoot, 2)
    srcMan.commit(2, Seq(s"$srcRoot/batch=2"))
    assert(Sinks.readCommittedUnion(spark, cloneMan).count() == 3)

    // clone append under ITS OWN root: invisible to the source
    StatsSinks.appendBatchStats(Seq((10L, "x")).toDF("id", "v"), cloneRoot, 100)
    cloneMan.commit(100, Seq(s"$cloneRoot/batch=100"))
    assert(Sinks.readCommittedUnion(spark, cloneMan).count() == 4)
    assert(Sinks.readCommitted(spark, srcRoot, srcMan).count() == 4) // 1,2,3,4
    assert(Sinks.readCommitted(spark, srcRoot, srcMan)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("cross-root copy-on-write merge diverges the clone, source untouched") {
    val base = fresh("clone_cow_")
    val (srcRoot, cloneRoot) = (s"$base/src", s"$base/clone")
    val srcMan = new TxnManifest(s"$base/src.manifest")
    StatsSinks.appendBatchStats(
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), srcRoot, 0)
    srcMan.commit(0, Seq(s"$srcRoot/batch=0"))
    val cloneMan = new TxnManifest(s"$base/clone.manifest")
    cloneMan.cloneFrom(srcMan, srcRoot)

    // update id=3 and delete id=7 ON THE CLONE; rewrite lands under
    // the clone's root, the inherited source dir is un-named from the
    // clone manifest only
    Sinks.merge(spark, Some(Seq((3L, "CHANGED")).toDF("id", "v")),
      Some(Seq(Tuple1(7L)).toDF("id")), cloneRoot, cloneMan, Seq("id"),
      mergeId = 101, unionRoots = true)

    val clone = Sinks.readCommittedUnion(spark, cloneMan)
    assert(clone.count() == 9)
    assert(clone.where($"id" === 3L).select("v").as[String].head() == "CHANGED")
    assert(clone.where($"id" === 7L).count() == 0)
    // every surviving clone dir lives under the clone root now
    assert(cloneMan.committedDirsAll().forall(_.startsWith(cloneRoot + "/")))

    // the SOURCE never moved: same 10 rows, original values
    val src = Sinks.readCommitted(spark, srcRoot, srcMan)
    assert(src.count() == 10)
    assert(src.where($"id" === 3L).select("v").as[String].head() == "v3")
    assert(src.where($"id" === 7L).count() == 1)
  }

  test("clone destination must be fresh; empty source refuses; dual-root filter") {
    val base = fresh("clone_guard_")
    val srcRoot = s"$base/src"
    val srcMan = new TxnManifest(s"$base/src.manifest")
    StatsSinks.appendBatchStats(Seq((1L, "a")).toDF("id", "v"), srcRoot, 0)
    srcMan.commit(0, Seq(s"$srcRoot/batch=0"))

    // cloning over a live manifest is refused
    val liveMan = new TxnManifest(s"$base/live.manifest")
    liveMan.commit(0, Seq(s"$base/other/batch=0"))
    val e = intercept[IllegalArgumentException] {
      liveMan.cloneFrom(srcMan, srcRoot)
    }
    assert(e.getMessage.contains("not a fresh manifest"))

    // nothing committed under the named root is loud
    val e2 = intercept[IllegalArgumentException] {
      new TxnManifest(s"$base/c2.manifest").cloneFrom(srcMan, s"$base/nope")
    }
    assert(e2.getMessage.contains("nothing committed"))

    // a dual-write source clones ONE logical table: only srcRoot dirs
    val otherRoot = s"$base/map"
    StatsSinks.appendBatchStats(Seq((9L, "m")).toDF("id", "v"), otherRoot, 1)
    srcMan.commit(1, Seq(s"$otherRoot/batch=1"))
    val c3 = new TxnManifest(s"$base/c3.manifest")
    c3.cloneFrom(srcMan, srcRoot)
    assert(c3.committedDirsAll() == Seq(s"$srcRoot/batch=0"))
  }

  test("source vacuum past the clone's snapshot fails clone reads loudly") {
    val base = fresh("clone_vac_")
    val srcRoot = s"$base/src"
    val srcMan = new TxnManifest(s"$base/src.manifest")
    StatsSinks.appendBatchStats(Seq((1L, "a")).toDF("id", "v"), srcRoot, 0)
    srcMan.commit(0, Seq(s"$srcRoot/batch=0"))
    val cloneMan = new TxnManifest(s"$base/clone.manifest")
    cloneMan.cloneFrom(srcMan, srcRoot)

    // source compacts (un-names batch=0 from ITS manifest) then
    // vacuums with zero grace: the dir the clone references dies —
    // the documented Delta shallow-clone hazard
    Sinks.compact(spark, srcRoot, srcMan, compactId = 50, numFiles = 1)
    val deleted = Sinks.vacuum(srcRoot, srcMan, graceMillis = 0L)
    assert(deleted.contains("batch=0"))
    // the source is fine; the clone fails LOUDLY, never silently short
    assert(Sinks.readCommitted(spark, srcRoot, srcMan).count() == 1)
    intercept[Exception] {
      Sinks.readCommittedUnion(spark, cloneMan).collect()
    }
  }
}
