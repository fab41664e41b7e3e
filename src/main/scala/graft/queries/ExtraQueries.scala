package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.Tables
import graft.ops.Repair

/** Engine-surface breadth beyond the reference's own operator set
  * (the reference has no rollup/pivot/set-ops/percentiles — SURVEY
  * §2.4 — but a drop-in analytics engine needs them): multi-level
  * aggregation, pivot, set operations, distinct counts, exact
  * percentiles, and string/date scalar breadth. All oracle-paired.
  */
object ExtraQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ROLLUP with grouping() markers — multi-level agg in one pass
    // (partial-aggregatable Expand, one shuffle).
    "a7_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"),
          count(lit(1)).as("n"),
          Repair.decSum(col("l_quantity")).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "n", "sum_qty")
    }),

    // Exact distinct counts per group (expands to two-phase distinct
    // aggregation; the approximate HLL path is in Bench-only territory
    // since sketch estimates aren't engine-portable).
    "a8_distinct_counts" -> ((s, d) => {
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // Pivot (R3 — absent in the reference): linestatus columns from
    // rows; fixed pivot values keep the schema static and portable.
    "a9_pivot" -> ((s, d) => {
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("O", "F"))
        .agg(Repair.decSum(col("l_quantity")))
        .withColumnsRenamed(Map("O" -> "qty_o", "F" -> "qty_f"))
    }),

    // Set operations (set semantics: INTERSECT/EXCEPT dedup).
    "a10_setops" -> ((s, d) => {
      val custs  = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val big    = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("k"))
      custs.intersect(big).withColumn("tag", lit("big_buyer"))
        .unionAll(custs.except(big).withColumn("tag", lit("no_big_orders")))
    }),

    // Exact interpolated percentiles, decimal-quantized on output
    // (interpolation formula ulps differ across engines).
    "a11_percentiles" -> ((s, d) => {
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").cast("decimal(18,6)")
            .cast(DoubleType).as("p50"),
          expr("percentile(l_quantity, 0.25)").cast("decimal(18,6)")
            .cast(DoubleType).as("p25"),
          expr("percentile(l_quantity, 0.9)").cast("decimal(18,6)")
            .cast(DoubleType).as("p90"))
    }),

    // Ratio-to-report: each line's share of its order's revenue plus
    // its rank — one window family (partition by order), no second
    // aggregate pass. Shares divide DOUBLES built from the decimal
    // sums (decimal division scale rules differ across engines).
    "w10_share_of_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, d)
        .withColumn("line_rev",
          rev.cast("decimal(18,6)").cast(DoubleType))
        .withColumn("order_rev",
          sum(rev.cast("decimal(18,6)")).over(w).cast(DoubleType))
        .withColumn("rev_share", col("line_rev") / col("order_rev"))
        .withColumn("rev_rank",
          rank().over(w.orderBy(col("line_rev").desc, col("l_linenumber"))))
        .select(col("l_orderkey"), col("l_linenumber"), col("line_rev"),
          col("order_rev"), col("rev_share"), col("rev_rank"))
    }),

    // Blocked FUZZY matching (the ETL name-cleanup op): perturbed
    // customer names re-link to their originals via edit distance,
    // candidate pairs blocked to a (bucket) so the comparison is
    // never all-pairs — levenshtein is identical in both engines.
    // Deterministic perturbation (drop one character) guarantees
    // true matches at distance 1 at every sf; the <= 2 threshold and
    // the a < b canonicalization dedupe the pair set.
    "c23_fuzzy_match" -> ((s, d) => {
      val names = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
      val noisy = names.filter(col("c_custkey") % 5 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          concat(substring(col("c_name"), 1, 8),
            substring(col("c_name"), 10, 100)).as("c_name"))
      // block on (id residue, name suffix): the perturbation (one
      // char dropped mid-string) preserves both, so every true match
      // shares a block, while blocks stay small enough that the
      // quadratic comparison never sees the full cross product
      val all = names.unionAll(noisy)
        .withColumn("bucket", pmod(col("c_custkey"), lit(5)))
        .withColumn("sfx", expr("right(c_name, 4)"))
      val l = all.select(col("bucket"), col("sfx"),
        col("c_custkey").as("a"), col("c_name").as("name_a"))
      val r = all.select(col("bucket"), col("sfx"),
        col("c_custkey").as("b"), col("c_name").as("name_b"))
      l.join(r, Seq("bucket", "sfx"))
        .filter(col("a") < col("b") &&
          levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("a"), col("b"), col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).as("dist"))
    }),

    // Robust dispersion per group — median absolute deviation, the
    // outlier-resistant sibling of stddev: two EXACT percentile
    // aggregates over the same grouping (the median join is a
    // broadcast of one row per group; no window, no global sort).
    // Both engines interpolate exact percentiles identically under
    // the decimal convention.
    "a16_mad" -> ((s, d) => {
      val med = Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("med"))
      Tables.lineitem(s, d).join(broadcast(med), Seq("l_returnflag"))
        .withColumn("absdev", abs(col("l_quantity") - col("med")))
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(absdev, 0.5)").cast("decimal(18,6)")
            .cast(DoubleType).as("mad"),
          first(col("med")).cast("decimal(18,6)")
            .cast(DoubleType).as("median"))
    }),

    // Running DISTINCT-user count over time: COUNT(DISTINCT) OVER is
    // unsupported in both engines' windows, so the standard rewrite —
    // mark each user's FIRST event (row_number per user), then a
    // running SUM of first-occurrence flags over event order. One
    // shuffle on user_id for the marking, one global-ordered window
    // for the cumulative sum (bounded output: one row per event day).
    "w9_cume_uniques" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      val firsts = ev.withColumn("rn",
          row_number().over(Window.partitionBy(col("user_id"))
            .orderBy(col("us"), col("event_id"))))
        .withColumn("is_first", when(col("rn") === 1, 1L).otherwise(0L))
      val daily = firsts.groupBy("day")
        .agg(sum(col("is_first")).as("new_users"),
          count(lit(1)).as("n_events"))
      daily.withColumn("cume_users",
        sum(col("new_users")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("day"))
          .rowsBetween(Long.MinValue, 0)))
        .select(col("day"), col("n_events"), col("new_users"),
          col("cume_users"))
    }),

    // As-of join (no native Spark equivalent; composed union+window,
    // one shuffle): each click/view event picks up the user's latest
    // purchase value at-or-before its timestamp.
    "j11_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type").isin("click", "view"))
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = graft.ops.Dedup.topPerGroup(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value")),
        Seq("user_id", "ts"), Seq(col("value").desc))
        .withColumnRenamed("value", "last_purchase_value")
      graft.ops.AsOfJoin.asOf(clicks, purchases,
        Seq("user_id"), "ts", "ts")
        .select("event_id", "user_id", "ts", "last_purchase_value")
    }),

    // The SAME as-of join planned through the custom Catalyst operator
    // (graft.plans: LogicalPlan + Strategy + streaming-merge SparkPlan
    // registered via extraStrategies/SparkSessionExtensions) — the
    // tier-(c) extension path, oracle-gated like every other operator.
    "j12_asof_physical" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type").isin("click", "view"))
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = graft.ops.Dedup.topPerGroup(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value")),
        Seq("user_id", "ts"), Seq(col("value").desc))
        .withColumnRenamed("value", "last_purchase_value")
      graft.plans.AsOfJoinPhysical.asOf(clicks, purchases,
        Seq("user_id"), "ts", "ts")
        .select("event_id", "user_id", "ts", "last_purchase_value")
    }),

    // Sessionization: 30-min inactivity gap → per-user session ids
    // (two stacked windows, one shuffle on user_id).
    "w3_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      // exact integer microseconds: unix_timestamp() TRUNCATES to
      // seconds while DuckDB's epoch() keeps the fraction — boundary
      // rows would classify differently
      val gap = unix_micros(col("ts")) -
        unix_micros(lag(col("ts"), 1).over(w))
      Tables.events(s, d)
        .withColumn("new_session",
          when(gap.isNull || gap > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_session")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("event_id", "user_id", "new_session", "session_id")
    }),

    // String scalar breadth (C-family extension).
    "c19_strings" -> ((s, d) => {
      val n = Tables.nation(s, d)
      n.select(col("n_nationkey"),
        lpad(col("n_nationkey").cast(StringType), 4, "0").as("key_pad"),
        rpad(col("n_name"), 12, ".").as("name_pad"),
        instr(col("n_name"), "_").as("underscore_at"),
        expr("repeat('=', 3)").as("rule"),
        reverse(col("n_name")).as("name_rev"),
        substring(col("n_name"), -2, 2).as("name_last2"),
        concat_ws("|", col("n_name"), col("n_nationkey")).as("joined"))
    }),

    // Date scalar breadth (C-family extension; dow normalized to
    // DuckDB's Sunday=0 convention, truncs surfaced as date strings).
    "c20_dates" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val dt = col("o_orderdate")
      o.select(col("o_orderkey"),
        date_trunc("month", dt).cast("date").cast(StringType).as("month_start"),
        date_trunc("week", dt).cast("date").cast(StringType).as("week_start"),
        year(dt).as("y"), month(dt).as("m"), dayofmonth(dt).as("dom"),
        dayofyear(dt).as("doy"), quarter(dt).as("q"),
        (dayofweek(dt) - 1).as("dow_sun0"),
        datediff(dt.cast("date"), lit("2024-01-01").cast("date")).as("days_since_2024"),
        last_day(dt).cast(StringType).as("month_end"))
    }),

    // Full CUBE (completes the multi-level-agg family with a7's
    // ROLLUP): all four grouping combinations in one Expand pass,
    // one shuffle, partial-aggregatable.
    "a12_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"),
          count(lit(1)).as("n"),
          Repair.decSum(col("l_quantity")).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "n", "sum_qty")
    }),

    // Fixed-width histogram: bin = floor(x / width) — one partial-agg
    // shuffle of |bins| rows, the scalable form of a numeric profile
    // (exact percentiles are a11; this is the distribution shape).
    "a13_histogram" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_extendedprice") / 5000).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          Repair.decSum(col("l_extendedprice")).as("sum_price"))
        .select(col("bin"), (col("bin") * 5000).cast("double").as("bin_lo"),
          col("n"), col("sum_price"))
    }),

    // Range join (interval containment, no equi-key): every event
    // falling inside any 2-hour "incident window" (windows opened by a
    // deterministic sample of events, so both engines derive the same
    // interval set). Naive form is a nested-loop product; the binned
    // rewrite (graft.ops.RangeJoin) makes it a hash equi-join on the
    // bin key — plan-shape pinned in ScaleSpec.
    "j13_range_join" -> ((s, d) => {
      val winLen = 2L * 3600L * 1000000L // 2 h in µs
      val ev = Tables.events(s, d)
      val points = ev.select(col("event_id"), unix_micros(col("ts")).as("p_us"))
      val windows = ev.filter(col("event_id") % 499 === 0)
        .select(col("event_id").as("window_id"),
          unix_micros(col("ts")).as("start_us"),
          (unix_micros(col("ts")) + winLen).as("end_us"))
      graft.ops.RangeJoin.binned(points, col("p_us"),
          windows, col("start_us"), col("end_us"), binWidth = winLen)
        .select("event_id", "window_id")
    }),

    // Winsorization (robust clipping for training-data measures): clip
    // o_totalprice to its global [p01, p99]. The percentile pair is ONE
    // tiny aggregate broadcast to the scan — never a sort or window
    // over the fact table (same shape as t8's decile boundaries; the
    // decimal quantization makes the clip thresholds engine-exact).
    "c21_winsorize" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val bounds = o.agg(
        expr("percentile(o_totalprice, 0.01)").cast("decimal(18,6)")
          .cast(DoubleType).as("lo"),
        expr("percentile(o_totalprice, 0.99)").cast("decimal(18,6)")
          .cast(DoubleType).as("hi"))
      o.crossJoin(broadcast(bounds))
        .select(col("o_orderkey"), col("o_totalprice"),
          greatest(least(col("o_totalprice"), col("hi")), col("lo"))
            .as("price_w"),
          (col("o_totalprice") < col("lo") || col("o_totalprice") > col("hi"))
            .cast("int").as("clipped"))
    }),

    // Event-time RANGE window frame: per-user trailing-1-hour totals.
    // Unlike a ROWS frame, the frame edge is a VALUE bound (peers
    // enter together), so results are independent of intra-timestamp
    // order — the form that stays deterministic under shuffle.
    // Batch twin of the stream-stream LEFT-OUTER interval join
    // (EventStreams.intervalJoin, the attribution shape): every click
    // keeps its row; purchases by the same user in the preceding hour
    // attach, absent ones leave NULLs. Equi-join on user_id with a
    // range residual — shuffles once on the key, never a cross
    // product; the streaming twin (StreamingSpec) evicts both states
    // by watermark + lag bound.
    "w6_interval_join" -> ((s, d) => {
      // two independent reads, not one shared frame: a self-join from
      // one lineage makes left("user_id")/right("user_id") the SAME
      // attribute and the helper's drop(right(key)) would remove both
      val clicks = Tables.events(s, d).filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("ts_l"))
      val buys = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id"),
          col("ts").as("ts_r"), col("value").as("amount"))
      graft.streaming.EventStreams
        .intervalJoin(clicks, buys, "user_id", "1 hour", "left_outer")
        .select(col("click_id"), col("user_id"), col("ts_l").as("click_ts"),
          col("buy_id"), col("amount"))
    }),

    "w5_range_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourUs = 3600L * 1000000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us")).rangeBetween(-hourUs, 0)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,6)")).over(w)
            .cast(DoubleType).as("sum_1h"))
    }),

    // The full rank family over one total order (value + unique
    // tiebreaker, so every function is deterministic): rank ==
    // row_number under a total order, percent_rank/cume_dist are
    // exact rational-to-double, ntile splits evenly.
    "a14_rank_family" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).as("quartile"))
    }),

    // Time-series resample with gap fill: hourly buckets per
    // event_type over each series' own [min, max] span, missing hours
    // materialized as zero rows. The grid is generated per group with
    // `sequence` (rows ∝ span/width per group, never a global
    // explode), then left-joined back to the bucket aggregate — two
    // shuffles on the same (event_type) family, no driver loop.
    "w4_resample" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val agg = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), Repair.decSum(col("value")).as("sum_value"))
      val grid = agg.groupBy("event_type")
        .agg(min("bucket").as("b0"), max("bucket").as("b1"))
        .select(col("event_type"),
          explode(sequence(col("b0"), col("b1"), expr("interval 1 hour")))
            .as("bucket"))
      grid.join(agg, Seq("event_type", "bucket"), "left")
        .select(col("event_type"), col("bucket"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
    }),

    // Deliberate hot-key skew driven through graft.ops.Skew: ~90% of
    // lineitem collapses onto ONE join/group key, the dimension side is
    // merge-hinted so the demo exercises the shuffled path a broadcast
    // would sidestep, and both skew tools run in sequence — saltedJoin
    // spreads the hot key over (key, salt) reducers, then the
    // two-phase saltedSum partial-aggregates on (key, salt) before the
    // final per-key sum. Equivalence to the unsalted plan is the
    // oracle's plain join+group; the plan shape (salted SMJ, AQE
    // skew-split on the unsalted twin) is pinned in ScaleSpec.
    "sk1_skew_salted" -> ((s, d) => {
      import graft.ops.Skew
      val fact = Tables.lineitem(s, d).select(
        when(col("l_orderkey") % 10 =!= 0, lit(0L))
          .otherwise(col("l_orderkey")).as("hot_key"),
        col("l_orderkey"), col("l_quantity"))
      val dim = fact.select(col("hot_key")).distinct()
        .withColumn("bucket", pmod(col("hot_key"), lit(7)))
      val joined = Skew.saltedJoin(fact, dim.hint("merge"), "hot_key",
        discriminator = "l_orderkey", salts = 8)
      val agg = Skew.saltedSum(
        joined.withColumn("qty_dec", col("l_quantity").cast("decimal(18,6)")),
        key = "hot_key", discriminator = "l_orderkey",
        valueCol = "qty_dec", salts = 8)
      agg.join(broadcast(dim), Seq("hot_key"))
        .select(col("hot_key"), col("bucket"),
          col("sum_qty_dec").cast(DoubleType).as("sum_qty"))
    }),

    // Storage-partitioned join (round 8): two catalog tables bucketed
    // 16 ways on the order key — orders, and per-order lineitem
    // revenue — joined WITHOUT any shuffle: each side's scan reports
    // bucket(16, key) partitioning (resolved through the catalog's
    // bucket function), so Spark zips the bucket groups directly.
    // The 100 TB story: pay the ingest-time repartition once, never
    // re-shuffle the fact table on its key again. ScaleSpec pins the
    // zero-exchange join and aggregation plans; this query puts the
    // RESULT under the driver's hash gate.
    "sk2_bucketed_join" -> ((s, d) => {
      import graft.plans.GraftSql
      // stays set for the session: the returned frame plans lazily
      // (after this function returns), and the conf is inert for
      // every non-bucketed table (no reported partitioning to use)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_sk2_wh_").toString)
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .createOrReplaceTempView("sk2_orders")
      Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(Repair.decSum(col("l_extendedprice")).as("rev"))
        .createOrReplaceTempView("sk2_rev")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.bko")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.bkr")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.bko (o_orderkey BIGINT, o_totalprice DOUBLE)
           |USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'o_orderkey', 'bucketBy' = '16,o_orderkey')
           |""".stripMargin)
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.bkr (l_orderkey BIGINT, rev DOUBLE)
           |USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'l_orderkey', 'bucketBy' = '16,l_orderkey')
           |""".stripMargin)
      GraftSql.execute(s, s"INSERT INTO $cat.bko SELECT * FROM sk2_orders")
      GraftSql.execute(s, s"INSERT INTO $cat.bkr SELECT * FROM sk2_rev")
      GraftSql.execute(s,
        s"""SELECT o.o_orderkey, o.o_totalprice, r.rev
           |FROM $cat.bko o JOIN $cat.bkr r
           |ON o.o_orderkey = r.l_orderkey""".stripMargin)
    }),

    // Composite-key storage-partitioned join (round 9): tables
    // bucketed on the PRODUCT grid '4,l_orderkey,l_linenumber' — one
    // bucket(4, key) transform reported per key (Spark's SPJ planner
    // accepts only single-column transforms), files carrying the
    // flat grid index routed through DirectShufflePartitionID. The
    // two-key join then plans with zero exchanges (ScaleSpec pins
    // the plan); this query puts the RESULT under the hash gate.
    "sk3_bucketed_multikey" -> ((s, d) => {
      import graft.plans.GraftSql
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_sk3_wh_").toString)
      // the synthetic lineitem is NOT unique on (orderkey, lineno):
      // pre-aggregate each side so the composite-key join is 1:1
      Tables.lineitem(s, d).groupBy("l_orderkey", "l_linenumber")
        .agg(Repair.decSum(col("l_quantity")).as("l_quantity"))
        .createOrReplaceTempView("sk3_q")
      Tables.lineitem(s, d).groupBy("l_orderkey", "l_linenumber")
        .agg(Repair.decSum(col("l_extendedprice")).as("l_extendedprice"))
        .createOrReplaceTempView("sk3_p")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.mkq")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.mkp")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.mkq (l_orderkey BIGINT, l_linenumber INT,
           |  l_quantity DOUBLE) USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'l_orderkey,l_linenumber',
           |  'bucketBy' = '4,l_orderkey,l_linenumber')""".stripMargin)
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.mkp (l_orderkey BIGINT, l_linenumber INT,
           |  l_extendedprice DOUBLE) USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'l_orderkey,l_linenumber',
           |  'bucketBy' = '4,l_orderkey,l_linenumber')""".stripMargin)
      GraftSql.execute(s, s"INSERT INTO $cat.mkq SELECT * FROM sk3_q")
      GraftSql.execute(s, s"INSERT INTO $cat.mkp SELECT * FROM sk3_p")
      GraftSql.execute(s,
        s"""SELECT q.l_orderkey, q.l_linenumber, q.l_quantity,
           |  p.l_extendedprice
           |FROM $cat.mkq q JOIN $cat.mkp p
           |ON q.l_orderkey = p.l_orderkey
           |AND q.l_linenumber = p.l_linenumber""".stripMargin)
    }),

    // Bucket-pruned point lookup (round 9): the ScaleSpec pin proves
    // the 1-of-n file read; THIS query puts the pruned scan's
    // RESULTS under the driver's hash gate — the failure class
    // pruning can introduce is wrong rows, exactly what the gate
    // catches.
    "sk4_bucket_pruned_lookup" -> ((s, d) => {
      import graft.plans.GraftSql
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_sk4_wh_").toString)
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .createOrReplaceTempView("sk4_src")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.bkp")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.bkp (o_orderkey BIGINT, o_totalprice DOUBLE)
           |USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'o_orderkey',
           |  'bucketBy' = '16,o_orderkey')""".stripMargin)
      GraftSql.execute(s, s"INSERT INTO $cat.bkp SELECT * FROM sk4_src")
      GraftSql.execute(s,
        s"""SELECT o_orderkey, o_totalprice FROM $cat.bkp
           |WHERE o_orderkey IN (1, 7, 32, 33, 64, 12345, 999999)
           |""".stripMargin)
    }),

    // Bucketed × columnMapping × DV (round 9 flagship composition):
    // the long-lived 100 TB fact table's real life — created
    // bucketed WITH column mapping and deletion vectors, its bucket
    // key RENAMED mid-life (metadata-only: markers carry immutable
    // physical ids), a DV DELETE (no file rewritten — rows cannot
    // move, so the layout holds trivially) and a DV UPDATE (the
    // appended version batch bucket-routes like any write). ScaleSpec
    // pins the zero-exchange join; this query hash-gates the
    // surviving CONTENT under the post-rename logical names.
    "sk5_bucketed_mapped_dv" -> ((s, d) => {
      import graft.plans.GraftSql
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_sk5_wh_").toString)
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .createOrReplaceTempView("sk5_src")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.bmd")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.bmd (o_orderkey BIGINT, status STRING,
           |  price DOUBLE) USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'o_orderkey',
           |  'bucketBy' = '8,o_orderkey', 'columnMapping' = 'true',
           |  'deletionVectors' = 'true')""".stripMargin)
      GraftSql.execute(s, s"INSERT INTO $cat.bmd SELECT * FROM sk5_src")
      s.sql(s"ALTER TABLE $cat.bmd RENAME COLUMN status TO st")
      GraftSql.execute(s,
        s"DELETE FROM $cat.bmd WHERE o_orderkey % 7 = 0")
      GraftSql.execute(s,
        s"UPDATE $cat.bmd SET price = price * 2 WHERE o_orderkey % 10 = 0")
      GraftSql.execute(s,
        s"SELECT o_orderkey, st, price FROM $cat.bmd")
    }),

    // REBUCKET lifecycle under the hash gate — the grown-table op
    // ("10× the data, double the buckets") end to end: ingest at 4
    // buckets, ALTER bucketBy to 8 (metadata-only; stale markers
    // DEGRADE the SPJ report, never lie), ingest more under the new
    // width, OPTIMIZE heals every dir into the 8-wide grid, then a
    // bucket-preserving UPDATE proves DML composes post-rebucket.
    // ScaleSpec pins the degrade→heal plan shapes; this query puts
    // the RESULTS of the whole lifecycle under the DuckDB oracle
    // (the failure class a re-route can introduce is lost/duplicated
    // rows — exactly what the hash gate catches).
    "sk6_rebucket" -> ((s, d) => {
      import graft.plans.GraftSql
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_sk6_wh_").toString)
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .createOrReplaceTempView("sk6_src")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.rb")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.rb (o_orderkey BIGINT, price DOUBLE)
           |USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'o_orderkey',
           |  'bucketBy' = '4,o_orderkey')""".stripMargin)
      GraftSql.execute(s,
        s"INSERT INTO $cat.rb SELECT * FROM sk6_src WHERE o_orderkey % 2 = 0")
      s.sql(s"ALTER TABLE $cat.rb SET TBLPROPERTIES ('bucketBy' = '8,o_orderkey')")
      GraftSql.execute(s,
        s"INSERT INTO $cat.rb SELECT * FROM sk6_src WHERE o_orderkey % 2 = 1")
      GraftSql.execute(s, s"OPTIMIZE $cat.rb")
      GraftSql.execute(s,
        s"UPDATE $cat.rb SET price = price * 2 WHERE o_orderkey % 10 = 0")
      GraftSql.execute(s, s"SELECT o_orderkey, price FROM $cat.rb")
    }),

    // Widened-bucket-key lifecycle under the hash gate (round 10):
    // the ONE widen that used to refuse. murmur3 hashes int 5 and
    // bigint 5 differently, so ALTER COLUMN TYPE on the bucket key
    // bumps the layout GENERATION — stale markers degrade the SPJ
    // report (correct, shuffled), post-widen inserts route hashed as
    // BIGINT (values past 2³¹ prove it), OPTIMIZE heals every dir
    // under the widened type, and a bucket-preserving UPDATE runs on
    // the healed layout. The oracle certifies no row was lost,
    // duplicated, or mis-routed across the whole lifecycle.
    "sk7_widened_bucket_key" -> ((s, d) => {
      import graft.plans.GraftSql
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_sk7_wh_").toString)
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .createOrReplaceTempView("sk7_src")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.wb")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.wb (k INT, price DOUBLE)
           |USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'k', 'bucketBy' = '8,k',
           |  'columnMapping' = 'true')""".stripMargin)
      GraftSql.execute(s,
        s"""INSERT INTO $cat.wb SELECT CAST(o_orderkey AS INT), o_totalprice
           |FROM sk7_src WHERE o_orderkey % 2 = 0""".stripMargin)
      s.sql(s"ALTER TABLE $cat.wb ALTER COLUMN k TYPE BIGINT")
      GraftSql.execute(s,
        s"""INSERT INTO $cat.wb SELECT o_orderkey + 5000000000, o_totalprice
           |FROM sk7_src WHERE o_orderkey % 2 = 1""".stripMargin)
      GraftSql.execute(s, s"OPTIMIZE $cat.wb")
      GraftSql.execute(s,
        s"UPDATE $cat.wb SET price = price * 2 WHERE k % 10 = 0")
      GraftSql.execute(s, s"SELECT k, price FROM $cat.wb")
    }),

    // Z-ORDER layout (round 16) — MULTI-dimensional file skipping on
    // the manifest format. A one-column range layout prunes on that
    // column only; interleaving two dims' bits into one Morton sort
    // key ([[graft.ops.ZOrder]]) makes each file cover a square-ish
    // cell of the (n_chars, doc_id) plane, so the ordinary per-column
    // sidecar bounds (BatchStats — no new metadata) are tight in BOTH
    // dims and a 2-D box predicate skips most files at PLAN time.
    // The layout is Delta's OPTIMIZE ZORDER BY; ScaleSpec pins the
    // skipping itself (z-order reads strictly fewer files than the
    // linear layout under the same box, via manifestFilesRead). The
    // oracle replays the box over raw documents blind — layout can
    // never change ANSWERS, only files touched.
    "sk8_zorder_layout" -> ((s, d) => {
      import graft.ops.ZOrder
      import graft.sources.{StatsSinks, TxnManifest}
      val base = java.nio.file.Files
        .createTempDirectory("graft_sk8_").toString
      graft.util.CacheScope.onRelease { () =>
        val p = new org.apache.hadoop.fs.Path(base)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        ()
      }
      val root = s"$base/t"
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      // domain bounds: a two-number layout-time artifact (the
      // AnnIndex-geometry class of metadata), not a per-query pass
      val r = docs.agg(min("n_chars"), max("n_chars"), max("doc_id")).head
      val (cLo, cHi, idHi) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val z = ZOrder.key(col("n_chars"), cLo, cHi, col("doc_id"), 0L, idHi)
      StatsSinks.appendBatchStats(
        docs.withColumn("z", z).repartitionByRange(16, col("z")).drop("z"),
        root, 0)
      val man = new TxnManifest(s"$base/_commits")
      man.commit(0, Seq(s"$root/batch=0"))
      val cCut = cLo + (cHi - cLo) / 4
      val idCut = idHi / 4
      s.read.format("graft-manifest").option("manifest", s"$base/_commits")
        .load(root)
        .filter(col("n_chars") <= cCut && col("doc_id") <= idCut)
        .select(col("doc_id"), col("n_chars"))
    }),

    // Staged conversion funnel (signup → first later view → first
    // later purchase): each stage is a per-user min over the events
    // AFTER the previous stage's timestamp, left-joined so drop-off
    // shows as NULLs. Timestamps compare as exact integer
    // MICROSECONDS on both engines (unix_micros ↔ epoch_us — the
    // w3_sessionize convention; raw timestamp comparison would
    // diverge at ns-vs-µs precision). Scale shape: three aggregates
    // and two joins, all hash-partitioned on user_id — AQE coalesces
    // them onto one exchange family, and no stage materializes more
    // than one row per user.
    "w7_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("signup_us"))
      val s2 = ev.filter(col("event_type") === "view").join(s1, "user_id")
        .filter(col("us") > col("signup_us"))
        .groupBy("user_id").agg(min("us").as("view_us"))
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("us") > col("view_us"))
        .groupBy("user_id").agg(min("us").as("buy_us"))
      s1.join(s2.select("user_id", "view_us"), Seq("user_id"), "left")
        .join(s3.select("user_id", "buy_us"), Seq("user_id"), "left")
        .select(col("user_id"), col("signup_us"), col("view_us"),
          col("buy_us"))
    }),

    // Explicit GROUPING SETS — the irregular-lattice member of the
    // rollup (a7) / cube (a12) family: exactly the three groupings
    // named, nothing interpolated. One shuffle; Spark expands the
    // sets map-side (Expand node), so the input is read once.
    "a15_grouping_sets" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
          |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
          |  count(*) AS n,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag),
          |                        (l_linestatus),
          |                        (l_returnflag, l_linestatus))""".stripMargin)
    }),

    // Native session_window aggregation (the batch face of the
    // streaming session operator StreamingSpec pins): sessions close
    // after a 30-minute inactivity gap, start = first event, end =
    // last event + gap. Bounds surface as exact integer MICROSECONDS
    // (the w3/w7 convention). NOTE the boundary: session_window
    // starts a NEW session at gap >= 30 min (half-open [ts, ts+gap)
    // extents), while w3's lag rule breaks at gap > 30 min — the
    // oracle mirrors the >= rule. Scale shape: one shuffle on
    // user_id, sessions merge inside the aggregate, never a window
    // over the full event sequence.
    "w8_session_window" -> ((s, d) => {
      val sess = session_window(col("ts"), "30 minutes")
      Tables.events(s, d)
        .groupBy(col("user_id"), sess)
        .agg(count(lit(1)).as("n_events"),
          Repair.decSum(col("value")).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"), col("sum_value"))
    })
  )

  val oracle: Map[String, String] = Map(
    "a15_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag),
        |                        (l_linestatus),
        |                        (l_returnflag, l_linestatus))""".stripMargin,
    "w8_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |g AS (SELECT user_id, us, value,
        |  CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT user_id, us, value,
        |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM g)
        |SELECT user_id,
        |  min(us) AS session_start_us,
        |  max(us) + 1800000000 AS session_end_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "w7_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS signup_us FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS view_us FROM e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.us > s1.signup_us
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS buy_us FROM e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > s2.view_us
        |  GROUP BY e.user_id)
        |SELECT s1.user_id, s1.signup_us, s2.view_us, s3.buy_us
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,
    "a7_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "a8_distinct_counts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a9_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_o,
        |  CAST(sum(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_f
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a10_setops" ->
      """SELECT k, 'big_buyer' AS tag FROM (
        |  SELECT c_custkey AS k FROM customer
        |  INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |UNION ALL
        |SELECT k, 'no_big_orders' AS tag FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000)""".stripMargin,
    "w10_share_of_group" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
        |    AS DOUBLE) AS line_rev,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |    OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_rev,
        |  CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |      OVER (PARTITION BY l_orderkey) AS DOUBLE) AS rev_share,
        |  CAST(rank() OVER (PARTITION BY l_orderkey
        |    ORDER BY CAST(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6)) AS DOUBLE) DESC, l_linenumber) AS INTEGER)
        |    AS rev_rank
        |FROM lineitem""".stripMargin,
    "c23_fuzzy_match" ->
      """WITH names AS (
        |  SELECT c_custkey, c_name FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000 AS c_custkey,
        |    substr(c_name, 1, 8) || substr(c_name, 10) AS c_name
        |  FROM customer WHERE c_custkey % 5 = 0),
        |blocked AS (
        |  SELECT c_custkey, c_name, c_custkey % 5 AS bucket,
        |    right(c_name, 4) AS sfx
        |  FROM names)
        |SELECT l.c_custkey AS a, r.c_custkey AS b,
        |  l.c_name AS name_a, r.c_name AS name_b,
        |  CAST(levenshtein(l.c_name, r.c_name) AS INTEGER) AS dist
        |FROM blocked l JOIN blocked r
        |  ON l.bucket = r.bucket AND l.sfx = r.sfx
        |WHERE l.c_custkey < r.c_custkey
        |  AND levenshtein(l.c_name, r.c_name) <= 2""".stripMargin,
    "a16_mad" ->
      """WITH med AS (
        |  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  CAST(CAST(quantile_cont(abs(l.l_quantity - m.med), 0.5)
        |    AS DECIMAL(18,6)) AS DOUBLE) AS mad,
        |  CAST(CAST(any_value(m.med) AS DECIMAL(18,6)) AS DOUBLE) AS median
        |FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
        |GROUP BY l.l_returnflag""".stripMargin,
    "w9_cume_uniques" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |    epoch_us(ts) AS us, event_id
        |  FROM events),
        |firsts AS (SELECT day,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) = 1 THEN 1 ELSE 0 END AS is_first
        |  FROM ev),
        |daily AS (SELECT day,
        |    CAST(sum(is_first) AS BIGINT) AS new_users,
        |    count(*) AS n_events
        |  FROM firsts GROUP BY day)
        |SELECT day, n_events, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cume_users
        |FROM daily""".stripMargin,
    "a11_percentiles" ->
      """SELECT l_returnflag,
        |  CAST(CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS p50,
        |  CAST(CAST(quantile_cont(l_quantity, 0.25) AS DECIMAL(18,6)) AS DOUBLE) AS p25,
        |  CAST(CAST(quantile_cont(l_quantity, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "j11_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type IN ('click', 'view')),
        |p0 AS (SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id, ts ORDER BY value DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |purchases AS (SELECT user_id, ts, value AS last_purchase_value
        |  FROM p0 WHERE rn = 1)
        |SELECT c.event_id, c.user_id, c.ts, p.last_purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "j12_asof_physical" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type IN ('click', 'view')),
        |p0 AS (SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id, ts ORDER BY value DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |purchases AS (SELECT user_id, ts, value AS last_purchase_value
        |  FROM p0 WHERE rn = 1)
        |SELECT c.event_id, c.user_id, c.ts, p.last_purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "w3_sessionize" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
        |  FROM events)
        |SELECT event_id, user_id,
        |  CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS new_session,
        |  CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM g""".stripMargin,
    "c19_strings" ->
      """SELECT n_nationkey,
        |  lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS key_pad,
        |  rpad(n_name, 12, '.') AS name_pad,
        |  strpos(n_name, '_') AS underscore_at,
        |  repeat('=', 3) AS rule,
        |  reverse(n_name) AS name_rev,
        |  right(n_name, 2) AS name_last2,
        |  n_name || '|' || CAST(n_nationkey AS VARCHAR) AS joined
        |FROM nation""".stripMargin,
    "c20_dates" ->
      """SELECT o_orderkey,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
        |  CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS VARCHAR) AS week_start,
        |  CAST(extract(year FROM o_orderdate) AS INTEGER) AS y,
        |  CAST(extract(month FROM o_orderdate) AS INTEGER) AS m,
        |  CAST(extract(day FROM o_orderdate) AS INTEGER) AS dom,
        |  CAST(extract(doy FROM o_orderdate) AS INTEGER) AS doy,
        |  CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS q,
        |  CAST(extract(dow FROM o_orderdate) AS INTEGER) AS dow_sun0,
        |  CAST(date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_2024,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
        |FROM orders""".stripMargin,
    "a12_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "a13_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
        |  CAST(CAST(floor(l_extendedprice / 5000) AS BIGINT) * 5000 AS DOUBLE) AS bin_lo,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1""".stripMargin,
    "j13_range_join" ->
      """WITH win AS (
        |  SELECT event_id AS window_id, epoch_us(ts) AS start_us,
        |    epoch_us(ts) + 7200000000 AS end_us
        |  FROM events WHERE event_id % 499 = 0)
        |SELECT e.event_id, w.window_id
        |FROM events e JOIN win w
        |  ON epoch_us(e.ts) >= w.start_us AND epoch_us(e.ts) < w.end_us""".stripMargin,
    "c21_winsorize" ->
      """WITH b AS (SELECT
        |    CAST(CAST(quantile_cont(o_totalprice, 0.01) AS DECIMAL(18,6)) AS DOUBLE) AS lo,
        |    CAST(CAST(quantile_cont(o_totalprice, 0.99) AS DECIMAL(18,6)) AS DOUBLE) AS hi
        |  FROM orders)
        |SELECT o_orderkey, o_totalprice,
        |  greatest(least(o_totalprice, b.hi), b.lo) AS price_w,
        |  CAST(o_totalprice < b.lo OR o_totalprice > b.hi AS INTEGER) AS clipped
        |FROM orders, b""".stripMargin,
    "w6_interval_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id,
        |    CAST(ts AS TIMESTAMP) AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |b AS (SELECT event_id AS buy_id, user_id,
        |    CAST(ts AS TIMESTAMP) AS ts_r, value AS amount
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, c.user_id, c.click_ts, b.buy_id, b.amount
        |FROM c LEFT JOIN b ON c.user_id = b.user_id
        |  AND b.ts_r <= c.click_ts
        |  AND b.ts_r >= c.click_ts - INTERVAL 1 HOUR""".stripMargin,

    "w5_range_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "a14_rank_family" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,
    "w4_resample" ->
      """WITH agg AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |    count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
        |  FROM agg GROUP BY 1),
        |grid AS (SELECT event_type,
        |    unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        |  FROM span)
        |SELECT g.event_type, g.bucket, coalesce(a.n, 0) AS n,
        |  coalesce(a.sum_value, 0.0) AS sum_value
        |FROM grid g LEFT JOIN agg a USING (event_type, bucket)""".stripMargin,
    // The bucketed layout must be INVISIBLE in the result: the oracle
    // is the plain join over the same inputs.
    "sk2_bucketed_join" ->
      """SELECT o.o_orderkey, o.o_totalprice,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS rev
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderkey, o.o_totalprice""".stripMargin,
    "sk3_bucketed_multikey" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |    AS l_quantity,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS l_extendedprice
        |FROM lineitem GROUP BY l_orderkey, l_linenumber""".stripMargin,
    "sk4_bucket_pruned_lookup" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (1, 7, 32, 33, 64, 12345, 999999)""".stripMargin,
    "sk5_bucketed_mapped_dv" ->
      """SELECT o_orderkey, o_orderstatus AS st,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS price
        |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin,
    "sk7_widened_bucket_key" ->
      """WITH w AS (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey
        |              ELSE o_orderkey + 5000000000 END AS k,
        |    o_totalprice AS price
        |  FROM orders)
        |SELECT k, CASE WHEN k % 10 = 0 THEN price * 2 ELSE price END AS price
        |FROM w""".stripMargin,
    // layout never changes answers: the oracle is the bare box over
    // raw documents (integer-division cuts replay exactly)
    "sk8_zorder_layout" ->
      """WITH b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi,
        |    max(doc_id) AS idhi FROM documents)
        |SELECT d.doc_id, d.n_chars
        |FROM documents d, b
        |WHERE d.n_chars <= b.lo + (b.hi - b.lo) // 4
        |  AND d.doc_id <= b.idhi // 4""".stripMargin,
    "sk6_rebucket" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS price
        |FROM orders""".stripMargin,
    // The salted plan must be INVISIBLE in the result: the oracle is
    // the plain unsalted join + group-by.
    "sk1_skew_salted" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0
        |              ELSE l_orderkey END AS hot_key,
        |    l_quantity
        |  FROM lineitem),
        |dim AS (SELECT DISTINCT hot_key, hot_key % 7 AS bucket FROM fact)
        |SELECT f.hot_key, d.bucket,
        |  CAST(sum(CAST(f.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM fact f JOIN dim d USING (hot_key)
        |GROUP BY f.hot_key, d.bucket""".stripMargin
  )
}
