package graft

import org.apache.spark.sql.functions._
import graft.text.DedupClusters

class ClustersSpec extends SparkSuite {
  import spark.implicits._

  test("star contraction equals min-label propagation on a shallow pair graph") {
    // near-dup-shaped graph: small clusters + singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 20L)).toDF("a", "b")
    val nodes = (1L to 3L) ++ Seq(10L, 11L) ++ (20L to 22L) ++ Seq(99L)
    val nodesDf = nodes.toDF("id")
    val prop = DedupClusters.connectedComponents(nodesDf, pairs)
      .as[(Long, Long)].collect().toMap
    val star = DedupClusters.connectedComponentsStar(nodesDf, pairs)
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
    assert(star(3L) == 1L && star(22L) == 20L && star(99L) == 99L)
  }

  test("star contraction converges on a 1000-node path in O(log n) rounds") {
    // diameter 999: per-hop propagation needs ~999 rounds (its default
    // budget of 20 cannot converge — the warn path); star contraction
    // reaches the fixpoint within its default 40-round budget, in
    // practice ~O(log n) alternations.
    val n = 1000L
    val pairs = spark.range(0, n - 1).select($"id".as("a"), ($"id" + 1).as("b"))
    val nodes = spark.range(0, n).select($"id")
    val star = DedupClusters.connectedComponentsStar(nodes, pairs)
    assert(star.filter($"canonical_id" =!= 0L).count() == 0,
      "every path node must contract to the component min")
    assert(star.count() == n)
  }
}
