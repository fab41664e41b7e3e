package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._

/** Core relational operator queries (SURVEY.md §2.1-2.5) over the
  * testdata star schema, each paired with an ANSI-SQL oracle in
  * [[CoreQueries.oracle]].
  *
  * Determinism rules (driver hash-compares against DuckDB):
  *  - double *sums* go through DECIMAL(18,6) (order-independent);
  *    per-row double arithmetic is IEEE-identical across engines.
  *  - every `limit` is preceded by a total-order `orderBy` on a key;
  *  - window ranks always carry a unique tiebreaker.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S2/S3/D4 — CDC keyset-paginated batch: predicate pushdown gives
    // parquet row-group skipping; limit+orderBy plans as
    // TakeOrderedAndProject (no global sort materialization).
    "s3_keyset_scan" -> ((s, d) => {
      Cdc.keysetBatch(Tables.events(s, d), "event_id", watermark = 500L, batchSize = 200)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
    }),

    // A4 — scalar max watermark (`accounts.py:110`).
    "a4_scalar_max" -> ((s, d) =>
      Tables.events(s, d).agg(max(col("event_id")).as("max_id"))),

    // P1/P2/P3 — projection + bulk rename + drop (`accounts.py:54-69`).
    "p2_project_rename" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumnsRenamed(Map(
          "c_custkey" -> "old_custkey", "c_name" -> "full_name",
          "c_acctbal" -> "balance", "c_mktsegment" -> "segment"))
        .select("old_custkey", "full_name", "balance", "segment")
    }),

    // F1/F2/F3 — null / value / negative-key filters (`items.py:91`,
    // `categories.py:45`, `countries.py:310`).
    "f2_filters" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_size").isNotNull && col("p_size") =!= 30 &&
          length(col("p_type")) > 5 && col("p_partkey") =!= 2400)
        .select("p_partkey", "p_name", "p_size", "p_type")
    }),

    // F4 — dropna(subset, how='all') (`locations.py:138`): social-media
    // style sparse columns; a row survives if ANY subset column is set.
    "f4_dropna_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 3 =!= 0, col("c_name")).as("name"),
        when(col("c_custkey") % 2 =!= 0, col("c_mktsegment")).as("segment"))
      Cleanse.dropNaAll(c, Seq("name", "segment"))
    }),

    // J1 — FK-remap left join, broadcast dim (`orders.py:120-140`).
    "j1_fk_remap" -> ((s, d) => {
      val dim = Tables.part(s, d)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"), col("p_type"))
      FkRemap.remap(
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey"),
        dim, Seq("l_partkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "p_brand", "p_type")
    }),

    // J2 — composite-key join against a pre-aggregation (`items.py:121`).
    "j2_multikey_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val grp = li.groupBy("l_orderkey", "l_partkey")
        .agg(Repair.decSum(col("l_quantity")).as("grp_qty"))
      li.select("l_orderkey", "l_partkey", "l_linenumber")
        .join(grp, Seq("l_orderkey", "l_partkey"))
        .select("l_orderkey", "l_partkey", "l_linenumber", "grp_qty")
    }),

    // J9 — semi-join (IN-list pushdown, `fks_mapper.py:17-19`).
    "j9_semi_join" -> ((s, d) => {
      FkRemap.semi(Tables.part(s, d),
        Tables.lineitem(s, d).select(col("l_partkey").as("p_partkey")),
        Seq("p_partkey"))
        .select("p_partkey", "p_name")
    }),

    // J6 — anti-join "not already loaded" (`items.py:140-147`): parts
    // never referenced by a high-discount lineitem.
    "j6_anti_join" -> ((s, d) => {
      FkRemap.anti(Tables.part(s, d),
        Tables.lineitem(s, d).filter(col("l_discount") > 0.08)
          .select(col("l_partkey").as("p_partkey")),
        Seq("p_partkey"))
        .select("p_partkey", "p_name", "p_brand")
    }),

    // J4 — right outer join (`sync_units.py:64`, `locations.py:121`).
    "j4_right_join" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val nat = Tables.nation(s, d)
      sup.join(nat, col("s_nationkey") === col("n_nationkey"), "right")
        .select(col("n_nationkey"), col("n_name"), col("s_suppkey"), col("s_name"))
    }),

    // J5 — cross join (`account_payment.py:53`).
    "j5_cross_join" -> ((s, d) => {
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
    }),

    // Null-safe equality join (`<=>` ↔ IS NOT DISTINCT FROM): NULL
    // keys MATCH each other instead of dropping — the semantics a
    // pandas merge gives NaN keys and plain SQL equality silently
    // loses. Keys are nulled deterministically so every sf exercises
    // the NULL-matches-NULL arm. Still a plain equi-join to the
    // planner (broadcast/shuffle hash, never nested-loop).
    "j14_nullsafe_join" -> ((s, d) => {
      val cust = Tables.customer(s, d).select(col("c_custkey"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("seg"))
      val segs = Tables.customer(s, d)
        .select(when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("seg"))
        .distinct()
        .withColumn("seg_code",
          coalesce(length(col("seg")).cast("long"), lit(-1L)))
      cust.join(segs, cust("seg") <=> segs("seg"))
        .select(col("c_custkey"), cust("seg").as("seg"), col("seg_code"))
    }),

    // S7/J7 — multiway join with one dim joined twice under aliases
    // (`roles.py:49-65`; `stock_transfers.py:73-80`). Dims broadcast;
    // the only shuffles are fact⋈fact on their join keys.
    "j7_double_dim_join" -> ((s, d) => {
      val li   = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_suppkey",
        "l_extendedprice", "l_discount")
      val ord  = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val sup  = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val natC = Tables.nation(s, d).select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))
      val natS = Tables.nation(s, d).select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
        .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
        .select(col("l_orderkey"), col("l_linenumber"), col("cust_nation"),
          col("supp_nation"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }),

    // A1/A2 — group-by with per-column agg map: sum for measures, max
    // for DiscountPercent (`orders.py:56-59`).
    "a1_agg_map" -> ((s, d) => {
      Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(Repair.decSum(col("l_quantity")).as("sum_qty"),
          max(col("l_discount")).as("max_disc"),
          count(lit(1)).as("n_lines"))
    }),

    // A1/C14/A6 — flagship pricing-summary rollup (TPC-H Q1 shape):
    // partial aggregation map-side, one shuffle on the two group keys.
    "q1_pricing_summary" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          Repair.decSum(col("l_quantity")).as("sum_qty"),
          Repair.decSum(col("l_extendedprice")).as("sum_base_price"),
          Repair.decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          Repair.decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("sum_charge"),
          Repair.decAvg(col("l_quantity")).as("avg_qty"),
          Repair.decAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // The SQL-TEXT surface: the same engine behind `spark.sql(...)`
    // over the registered star schema — a user migrating SQL workloads
    // runs their text verbatim (the oracle runs the IDENTICAL
    // statement in DuckDB, so the gate covers parser-to-result parity,
    // not just the DataFrame API). 3-dim join chain: AQE broadcasts
    // the dims, one shuffle for the final group-by.
    "q2_sql_revenue" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT n.n_name,
          |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
          |       AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem l
          |JOIN orders o ON l.l_orderkey = o.o_orderkey
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY n.n_name""".stripMargin)
    }),

    // TPC-H Q3 shape — shipping priority: segment-filtered customer
    // dim (broadcast), date-windowed orders/lineitem (both predicates
    // reach their scans), revenue per open order, top 10 under a
    // total order. Plan: two broadcasts + one shuffle for the
    // group-by + TakeOrderedAndProject — no global sort.
    "q3_shipping_priority" -> ((s, d) => {
      val cut = lit("1998-01-01").cast("date")
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(Repair.decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q18 shape — large-volume customers: the HAVING subquery
    // becomes a semi-join against the per-order quantity aggregate
    // (shuffle on l_orderkey it shares with the outer aggregate),
    // then dims join in. Top 100 under a total order.
    "q18_volume_customer" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
      val big = li.groupBy("l_orderkey")
        .agg(Repair.decSum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = Tables.customer(s, d).select("c_custkey", "c_name")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // TPC-H Q14 shape — promo revenue share: a date-windowed fact
    // scan (predicate pushed), broadcast part dim, conditional
    // aggregation. Both sums surface as DOUBLE through the decimal
    // convention and the SHARE divides doubles — decimal division
    // scale rules differ between engines, double division does not.
    "q14_promo_share" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-07-01").cast("date"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val p = Tables.part(s, d).select("p_partkey", "p_type")
      val priced = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .withColumn("disc_price",
          col("l_extendedprice") * (lit(1) - col("l_discount")))
      priced.agg(
        Repair.decSum(when(col("p_type").like("PROMO%"), col("disc_price"))
          .otherwise(lit(0.0))).as("promo_rev"),
        Repair.decSum(col("disc_price")).as("total_rev"))
        .withColumn("promo_share",
          lit(100.0) * col("promo_rev") / col("total_rev"))
    }),

    // TPC-H Q4 shape — orders with ANY late line (shipped > 90 days
    // after order date), per priority: a left-SEMI join whose
    // condition mixes the equi key with a date-arithmetic residual —
    // the EXISTS subquery pattern, deduplicated by the semi join
    // itself, never a distinct.
    "q4_late_orders" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > date_add(col("o_orderdate"), 90), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late_orders"))
    }),

    // TPC-H Q19 shape — disjunctive predicate over a join: an OR of
    // (brand, quantity-range) conjunctions spanning BOTH tables.
    // Catalyst's CNF conversion extracts the per-side residuals
    // (p_brand IN (...) to the part scan, the quantity envelope to
    // lineitem), so each scan prunes before the join even though no
    // single disjunct is side-local.
    "q19_disjunctive" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      val cond =
        (col("p_brand") === "Brand#11" &&
          col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#23" &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_size") >= 1 && col("p_size") <= 5 &&
          col("l_quantity") >= 25)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(
          Repair.decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q22 shape — high-balance accounts gone quiet: a scalar
    // aggregate (the positive-balance mean) broadcast as a one-row
    // cross join, then an ANTI join against the RECENT orders subset
    // (the date predicate pushes to the orders scan, so the anti
    // build side is small). The scalar subquery costs one tiny extra
    // scan; the anti join shuffles on the customer key (or
    // broadcasts the filtered side under AQE).
    "q22_idle_accounts" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(Repair.decAvg(col("c_acctbal")).as("avg_bal"))
      val rich = cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("date"))
        .select(col("o_custkey"))
      rich.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_idle"),
          Repair.decSum(col("c_acctbal")).as("idle_balance"))
    }),

    // TPC-H Q21 shape — the hardest planner shape a SQL analytics
    // user brings: a DOUBLE-correlated EXISTS / NOT-EXISTS against
    // the same fact table. "Suppliers who alone failed an order":
    // supplier's line returned ('R') on a finished order, EXISTS
    // another supplier's line on the SAME order, NOT EXISTS another
    // supplier's line on it that also returned. Decorrelated the way
    // Spark's own subquery rewrite would: one LEFT SEMI and one LEFT
    // ANTI join, each an equi-join on l_orderkey with the supplier
    // inequality as a residual condition — never a cartesian
    // (ScaleSpec pins the plan). The dim joins broadcast.
    "q21_waiting_supplier" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val finished = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(finished, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("l3_orderkey"),
          col("l_suppkey").as("l3_suppkey"))
      val alone = l1
        .join(l2, col("l_orderkey") === col("l2_orderkey") &&
          col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
        .join(l3, col("l_orderkey") === col("l3_orderkey") &&
          col("l_suppkey") =!= col("l3_suppkey"), "left_anti")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_3").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
      alone.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
    }),

    // A5 — referential-integrity count (`orders.py:121-133`): unresolved
    // FKs after remap against a deliberately holed dimension.
    "a5_integrity_count" -> ((s, d) => {
      val dim = Tables.part(s, d).filter(col("p_partkey") % 7 =!= 0)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      val joined = FkRemap.remap(
        Tables.lineitem(s, d).select("l_orderkey", "l_partkey"), dim, Seq("l_partkey"))
      FkRemap.integrityReport(joined, col("p_brand"), "lineitem->part")
    }),

    // D1 — deterministic top-1-per-group dedup window (`items.py:149-155`).
    "d1_dedup_top1" -> ((s, d) => {
      Dedup.topPerGroup(Tables.part(s, d), Seq("p_brand"),
        Seq(col("p_retailprice").desc, col("p_partkey").asc))
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    }),

    // D3/D4 — global sort + top-N (`accounts.py:44` TOP n ORDER BY id).
    "d4_topn" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // D1 generalization — top-N-per-group (training-data samplers keep
    // the N best documents per source/domain). One shuffle on the
    // group key, rank inside the partition — no global sort.
    "d5_topn_per_group" -> ((s, d) => {
      Dedup.topNPerGroup(Tables.orders(s, d), Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), n = 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }),

    // D4-at-scale — same result as a row_number window, computed by
    // the bounded-heap aggregate graft.expressions.TopKStructs:
    // partial-aggregatable, so the shuffle carries ≤ k rows per group
    // per map task instead of every input row (see its Scaladoc).
    "d6_topk_agg" -> ((s, d) => {
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(graft.expressions.TopKStructs.topK(
          struct(col("p_retailprice"), col("p_partkey"), col("p_name")),
          k = 3, desc = Seq(true, false)).as("top"))
        .select(col("p_brand"), explode(col("top")).as("t"))
        .select(col("p_brand"), col("t.p_partkey").as("p_partkey"),
          col("t.p_name").as("p_name"),
          col("t.p_retailprice").as("p_retailprice"))
    })
  )

  val oracle: Map[String, String] = Map(
    "s3_keyset_scan" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE event_id > 500 ORDER BY event_id LIMIT 200""".stripMargin,
    "a4_scalar_max" ->
      "SELECT max(event_id) AS max_id FROM events",
    "p2_project_rename" ->
      """SELECT c_custkey AS old_custkey, c_name AS full_name,
        |c_acctbal AS balance, c_mktsegment AS segment FROM customer""".stripMargin,
    "f2_filters" ->
      """SELECT p_partkey, p_name, p_size, p_type FROM part
        |WHERE p_size IS NOT NULL AND p_size <> 30
        |AND length(p_type) > 5 AND p_partkey <> 2400""".stripMargin,
    "f4_dropna_all" ->
      """WITH t AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 <> 0 THEN c_name END AS name,
        |    CASE WHEN c_custkey % 2 <> 0 THEN c_mktsegment END AS segment
        |  FROM customer)
        |SELECT c_custkey, name, segment FROM t
        |WHERE coalesce(name, segment) IS NOT NULL""".stripMargin,
    "j1_fk_remap" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_brand, p.p_type
        |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin,
    "j2_multikey_join" ->
      """WITH grp AS (
        |  SELECT l_orderkey, l_partkey,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS grp_qty
        |  FROM lineitem GROUP BY l_orderkey, l_partkey)
        |SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, g.grp_qty
        |FROM lineitem l JOIN grp g
        |  ON l.l_orderkey = g.l_orderkey AND l.l_partkey = g.l_partkey""".stripMargin,
    "j9_semi_join" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)""".stripMargin,
    "j6_anti_join" ->
      """SELECT p_partkey, p_name, p_brand FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.08)""".stripMargin,
    "j4_right_join" ->
      """SELECT n.n_nationkey, n.n_name, s.s_suppkey, s.s_name
        |FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin,
    "j14_nullsafe_join" ->
      """WITH cust AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
        |  FROM customer),
        |segs AS (
        |  SELECT seg, coalesce(CAST(length(seg) AS BIGINT), -1) AS seg_code
        |  FROM (SELECT DISTINCT
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
        |    FROM customer))
        |SELECT c.c_custkey, c.seg, s.seg_code
        |FROM cust c JOIN segs s ON c.seg IS NOT DISTINCT FROM s.seg""".stripMargin,
    "j5_cross_join" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation""".stripMargin,
    "j7_double_dim_join" ->
      """SELECT l.l_orderkey, l.l_linenumber,
        |  nc.n_name AS cust_nation, ns.n_name AS supp_nation,
        |  l.l_extendedprice * (1 - l.l_discount) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier su ON l.l_suppkey = su.s_suppkey
        |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        |JOIN nation ns ON su.s_nationkey = ns.n_nationkey""".stripMargin,
    "a1_agg_map" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  max(l_discount) AS max_disc, count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // deliberately the VERBATIM statement the Spark side executes —
    // the gate proves SQL-text parity between the engines
    "q2_sql_revenue" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |       AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l.l_orderkey, o.o_orderdate,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |       AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < DATE '1998-01-01'
        |  AND l.l_shipdate > DATE '1998-01-01'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l.l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q18_volume_customer" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 250.0)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice, big.sum_qty
        |FROM big
        |JOIN orders o ON big.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q14_promo_share" ->
      """WITH priced AS (
        |  SELECT p.p_type,
        |    l.l_extendedprice * (1 - l.l_discount) AS disc_price
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= DATE '1997-01-01'
        |    AND l.l_shipdate < DATE '1997-07-01'),
        |sums AS (SELECT
        |  CAST(sum(CAST(CASE WHEN p_type LIKE 'PROMO%' THEN disc_price
        |    ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS promo_rev,
        |  CAST(sum(CAST(disc_price AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
        |  FROM priced)
        |SELECT promo_rev, total_rev,
        |  100.0 * promo_rev / total_rev AS promo_share
        |FROM sums""".stripMargin,
    "q4_late_orders" ->
      """SELECT o.o_orderpriority, count(*) AS n_late_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o.o_orderpriority""".stripMargin,
    "q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#11'
        |    AND l.l_quantity >= 1 AND l.l_quantity <= 11)
        |  OR (p.p_brand = 'Brand#23'
        |    AND l.l_quantity >= 10 AND l.l_quantity <= 20)
        |  OR (p.p_size >= 1 AND p.p_size <= 5 AND l.l_quantity >= 25)""".stripMargin,
    "q22_idle_accounts" ->
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(c_acctbal) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c.c_mktsegment, count(*) AS n_idle,
        |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |    AS idle_balance
        |FROM customer c, avg_bal
        |WHERE c.c_acctbal > avg_bal.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= DATE '2001-01-01')
        |GROUP BY c.c_mktsegment""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_3'
        |GROUP BY s_name""".stripMargin,
    "a5_integrity_count" ->
      """SELECT 'lineitem->part' AS check_name, count(CASE WHEN p.p_brand IS NULL THEN 1 END) AS missing,
        |  count(*) AS total
        |FROM lineitem l LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE p_partkey % 7 <> 0) p
        |  ON l.l_partkey = p.p_partkey""".stripMargin,
    "d1_dedup_top1" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |  FROM part) t WHERE rn = 1""".stripMargin,
    "d4_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,
    "d5_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin,
    "d6_topk_agg" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |  FROM part) t WHERE rn <= 3""".stripMargin
  )
}
