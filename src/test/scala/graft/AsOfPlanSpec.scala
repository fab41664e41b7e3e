package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, Dedup}
import graft.plans.{AsOfJoinExec, AsOfJoinPhysical}

class AsOfPlanSpec extends SparkSuite {
  import spark.implicits._

  private def clicksAndPurchases() = {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type".isin("click", "view"))
      .select($"event_id", $"user_id", $"ts")
    val purchases = Dedup.topPerGroup(
      ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value"),
      Seq("user_id", "ts"), Seq($"value".desc))
      .withColumnRenamed("value", "last_purchase_value")
    (clicks, purchases)
  }

  test("physical as-of equals the composed union+window form on testdata") {
    val (clicks, purchases) = clicksAndPurchases()
    val physical = AsOfJoinPhysical.asOf(clicks, purchases,
      Seq("user_id"), "ts", "ts")
    val composed = AsOfJoin.asOf(clicks, purchases,
      Seq("user_id"), "ts", "ts")
    assert(physical.columns.toSeq == composed.columns.toSeq)
    assert(physical.exceptAll(composed).isEmpty &&
      composed.exceptAll(physical).isEmpty)
  }

  test("plan shape: AsOfJoinExec with one co-partitioning exchange per side") {
    val (clicks, purchases) = clicksAndPurchases()
    // AQE wraps the tree in AdaptiveSparkPlanExec, so assert on the
    // formatted plan rather than collect()ing exec nodes
    val plan = AsOfJoinPhysical.asOf(clicks, purchases,
      Seq("user_id"), "ts", "ts").queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan.take(400))
    // exactly one single-key exchange per side feeds the operator (the
    // purchases-dedup window adds its own (user_id, ts) exchange — that
    // is input prep, not as-of cost)
    val single = """Exchange hashpartitioning\((user_id|__asof_r_user_id)#\d+L, \d+\)""".r
    val exchanges = single.findAllIn(plan).size
    assert(exchanges == 2, s"expected exactly 2 single-key exchanges, got $exchanges\n$plan")
  }

  test("merge semantics: inclusive ts, null before first match, carry resets per key") {
    val left = Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 7L), (5L, "c", 1L))
      .toDF("id", "k", "t")
    val right = Seq(
      ("a", 10L, 100.0), ("a", 15L, 150.0), // t=10 matches id=2 inclusively
      ("b", 8L, 800.0),                     // after id=4 → null
      ("c", 1L, 10.0))
      .toDF("k", "t", "v")
    val got = AsOfJoinPhysical.asOf(left, right, Seq("k"), "t", "t")
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> None,        // before any right row for key a
      2L -> Some(100.0), // equal ts is a match (>= semantics)
      3L -> Some(150.0), // later right row supersedes
      4L -> None,        // right exists but only later
      5L -> Some(10.0))) // exact hit on a fresh key
  }

  test("as-of over an already-partitioned side reuses the child ordering work") {
    // same-key runs across many partitions is the danger zone: repartition
    // by an unrelated column first and confirm the operator still
    // co-partitions on the key (correct results, not silent locality)
    val left = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), ($"id" * 3 % 97).as("t"), $"id")
      .repartition(13, $"id")
    val right = spark.range(0, 200)
      .select(($"id" % 7).as("k"), ($"id" * 11 % 97).as("t2"), ($"id" * 1.5).as("v"))
      .repartition(5, $"t2")
    val physical = AsOfJoinPhysical.asOf(left, right, Seq("k"), "t", "t2")
    val composed = AsOfJoin.asOf(left, right, Seq("k"), "t", "t2")
    assert(physical.exceptAll(composed).isEmpty &&
      composed.exceptAll(physical).isEmpty)
  }
}
