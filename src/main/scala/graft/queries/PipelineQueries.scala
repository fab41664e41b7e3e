package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.Tables
import graft.ops._

/** Composite end-to-end pipelines (SURVEY.md §3 E1-E3) re-expressed
  * Spark-first over the testdata star schema, plus the CDC batch-loop
  * equivalence query and the event-time bucket aggregation that the
  * streaming module mirrors.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // E2 — the orders pipeline (`orders.py:40-149`): lineitem
    // pre-aggregation (partial agg map-side) → left joins → fillna →
    // recode → derived measures → broadcast FK remap. One shuffle for
    // the preagg, one for the orders⋈preagg join (AQE may broadcast);
    // customer/nation dims broadcast explicitly.
    "e2_orders_pipeline" -> ((s, d) => {
      val o  = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val preagg = li.groupBy("l_orderkey").agg(
        Repair.decSum(col("l_extendedprice")).as("item_total0"),
        Repair.decSum(col("l_extendedprice") * col("l_discount"))
          .as("item_discount_total0"),
        max(col("l_discount")).as("max_discount0"))
      val cust = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
      val nat  = Tables.nation(s, d).select("n_nationkey", "n_name")
      val joined = o
        .join(preagg, col("o_orderkey") === col("l_orderkey"), "left")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
      val itemTotal = Repair.fillConst(col("item_total0"), 0.0)
      val itemDisc  = Repair.fillConst(col("item_discount_total0"), 0.0)
      joined.select(
        col("o_orderkey"),
        Recode.recodeStrictInt(col("o_orderstatus"),
          Map("O" -> 0, "F" -> 1, "P" -> 2)).as("status_code"),
        itemTotal.as("item_total"),
        itemDisc.as("item_discount_total"),
        Repair.fillConst(col("max_discount0"), 0.0).as("max_discount"),
        (col("o_totalprice") - (itemTotal - itemDisc)).as("amount_due"),
        col("o_totalprice").cast("decimal(18,2)").cast(StringType).as("total_dec"),
        col("c_name"), col("n_name"))
    }),

    // E3 — the locations nested-JSON build (`locations.py:57-182`):
    // parent cleanse + child-table aggregation to a JSON array column,
    // left-joined back (parents without children keep NULL, as pandas
    // leaves NA). Child arrays ordered by child key for determinism.
    "e3_customer_nested" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val o    = Tables.orders(s, d)
      val item = concat(lit("{\"id\":"), col("o_orderkey"),
        lit(",\"tp\":\""), col("o_totalprice").cast("decimal(18,2)").cast(StringType),
        lit("\",\"st\":\""), col("o_orderstatus"), lit("\"}"))
      val ordersJson = o
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), item.as("item"))
        .groupBy("o_custkey")
        .agg(
          concat(lit("["),
            array_join(transform(
              sort_array(collect_list(struct(col("o_orderkey"), col("item")))),
              x => x.getField("item")), ","),
            lit("]")).as("orders_json"),
          count(lit(1)).as("order_count"),
          min(col("o_orderdate")).cast("date").cast(StringType).as("first_order"))
      cust.join(ordersJson, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          Cleanse.stripToNull(col("c_name")).as("name_clean"),
          col("orders_json"),
          Repair.fillConst(col("order_count"), 0L).as("order_count"),
          col("first_order"))
    }),

    // E3 at full reference depth — the locations fan-in-5
    // (`locations.py:119-158`): FIVE child-table aggregations joined
    // back to one parent, two of them with their own dim joins + dedup
    // (amenities `locations.py:119-123`, services `locations.py:127-133`),
    // one with dropna(how='all') + dedup (social media,
    // `locations.py:136-141`), two plain group-to-JSON (working hours,
    // images, `locations.py:144-151`). Every child shuffles on the SAME
    // parent key, so at scale the five back-joins are co-partitioned
    // sort-merge joins; the dims broadcast. Child arrays are ordered by
    // a per-group-unique key so the JSON strings are byte-deterministic.
    "e3b_nested_fanin5" -> ((s, d) => {
      val o   = Tables.orders(s, d)
      val li  = Tables.lineitem(s, d)
      val ev  = Tables.events(s, d)

      // '[' ++ items-in-key-order ++ ']'; key must be unique per group
      // (string_agg ORDER BY ties are nondeterministic in the oracle).
      def arrAgg(item: org.apache.spark.sql.Column,
                 key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        concat(lit("["),
          array_join(transform(
            sort_array(collect_list(struct(key.as("k"), item.as("v")))),
            x => x.getField("v")), ","),
          lit("]"))
      def jstr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(c.isNull, lit("null")).otherwise(concat(lit("\""), c, lit("\"")))

      // child 1 (amenities shape): dedup'd junc, dim ⋈ sync whitelist
      // (inner), RIGHT join keeps junc rows whose dim is unsynced.
      val junc = o.select(col("o_custkey"), col("o_orderpriority")).distinct()
      val dim = o.select(col("o_orderpriority")).distinct()
        .withColumn("pr_code", substring(col("o_orderpriority"), 1, 1).cast("int"))
        .filter(col("pr_code") <= 3)
      val prio = dim.join(junc, Seq("o_orderpriority"), "right")
        .groupBy(col("o_custkey").as("k1"))
        .agg(arrAgg(
          concat(lit("{\"pr\":\""), col("o_orderpriority"), lit("\",\"code\":"),
            coalesce(col("pr_code").cast(StringType), lit("null")), lit("}")),
          col("o_orderpriority")).as("prio_json"))

      // child 2 (services shape): junc needs its own fact-fact join to
      // reach the parent key, dedup, then the dim join for names.
      val sjunc = li.select(col("l_orderkey"), col("l_suppkey"))
        .join(o.select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct()
      val supp = sjunc
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_custkey").as("k2"))
        .agg(arrAgg(
          concat(lit("{\"sk\":"), col("l_suppkey"), lit(",\"sn\":\""),
            col("s_name"), lit("\"}")),
          col("l_suppkey")).as("supp_json"))

      // child 3 (social-media shape): sparse per-channel columns,
      // dropna(how='all') on the channel subset, dedup, group to JSON
      // with explicit null fields.
      val kval = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
      val soc0 = ev.select(col("user_id"),
        when(col("event_type") === "click", kval).as("fb"),
        when(col("event_type") === "view", kval).as("tw"),
        when(col("event_type") === "signup", kval).as("ig"))
      val soc1 = Cleanse.dropNaAll(soc0, Seq("fb", "tw", "ig")).distinct()
      val socKey = concat_ws("|", coalesce(col("fb"), lit("")),
        coalesce(col("tw"), lit("")), coalesce(col("ig"), lit("")))
      val social = soc1.groupBy(col("user_id").as("k3"))
        .agg(arrAgg(
          concat(lit("{\"fb\":"), jstr(col("fb")), lit(",\"tw\":"), jstr(col("tw")),
            lit(",\"ig\":"), jstr(col("ig")), lit("}")),
          socKey).as("social_json"))

      // child 4 (working-hours shape): plain filtered group-to-JSON.
      val hours = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("k4"))
        .agg(arrAgg(
          concat(lit("{\"d\":\""), col("o_orderdate").cast("date").cast(StringType),
            lit("\",\"p\":\""),
            col("o_totalprice").cast("decimal(18,2)").cast(StringType), lit("\"}")),
          col("o_orderkey")).as("hours_json"))

      // child 5 (images shape): plain group-to-JSON over a second table.
      val act = ev.groupBy(col("user_id").as("k5"))
        .agg(arrAgg(
          concat(lit("{\"e\":\""), col("event_type"), lit("\",\"v\":\""),
            col("value").cast("decimal(18,6)").cast(StringType), lit("\"}")),
          col("event_id")).as("activity_json"))

      // parent cleanse (strip all strings, name trimmed but empty kept —
      // `locations.py:98-100`) + the five left joins back.
      val parent = Cleanse.stripToNullAll(
        Tables.customer(s, d).withColumn("c_name", trim(col("c_name"))),
        keep = Set("c_name"))
      parent
        .join(prio,   col("c_custkey") === col("k1"), "left")
        .join(supp,   col("c_custkey") === col("k2"), "left")
        .join(social, col("c_custkey") === col("k3"), "left")
        .join(hours,  col("c_custkey") === col("k4"), "left")
        .join(act,    col("c_custkey") === col("k5"), "left")
        .select(col("c_custkey"), col("c_name").as("name_clean"),
          col("c_mktsegment").as("segment"), col("prio_json"), col("supp_json"),
          col("social_json"), col("hours_json"), col("activity_json"))
    }),

    // Cars date-repair pipeline (`cars.py:95-122`): 2-format varchar
    // date parse (C3) → junction-table fallback (C6, the
    // CarsLocation_Junc min-date repair) → constant default. Tracks
    // which repair path each row took.
    "e4_cars_dates" -> ((s, d) => {
      val k = col("c_custkey")
      val day = (k % 28 + 1).cast("string")
      val mon = (k % 12 + 1).cast("string")
      val raw = when(k % 4 === 0, concat(lit("May "), day, lit(" 2020 8:39AM")))
        .when(k % 4 === 1, concat(mon, lit("/"), day, lit("/2025 1:28:20 PM")))
        .when(k % 4 === 2, lit("garbage"))
        .otherwise(lit(null).cast("string"))
      val parsed = Cleanse.parseDate2(raw)
      val junc = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("fallback_ts"))
      Tables.customer(s, d)
        .join(junc, k === col("o_custkey"), "left")
        .select(k,
          coalesce(parsed, col("fallback_ts"),
            lit("2000-01-01 00:00:00").cast("timestamp")).as("created_at"),
          when(parsed.isNotNull, "parsed")
            .when(col("fallback_ts").isNotNull, "junction")
            .otherwise("default").as("repair_source"))
    }),

    // Items sync pipeline (`items.py:107-155`): lookup-key
    // normalization (C10) → deterministic dedup-top-per-group (D1) →
    // anti-join against already-loaded keys (J6) → surrogate-id
    // assignment for the Sync mapping output (S11 shape).
    // Ids via Ids.denseIds (range-partition + zipWithIndex), not a
    // global row_number window — same dense 1..N in p_partkey order,
    // no single-partition stage (round-1 scale-killer #3).
    "e5_items_sync" -> ((s, d) => {
      val part = Tables.part(s, d)
      val keyed = part.withColumn("name_key",
        lower(regexp_replace(col("p_name"), "\\s", "")))
      val deduped = Dedup.topPerGroup(keyed, Seq("p_brand", "name_key"),
        Seq(col("p_retailprice").desc, col("p_partkey").asc))
      val existing = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 49)
        .select(col("l_partkey").as("p_partkey")).distinct()
      val fresh = FkRemap.anti(deduped, existing, Seq("p_partkey"))
        .select(col("p_partkey").as("old_item_id"), col("p_brand"),
          col("name_key"))
      Ids.denseIds(fresh, Seq(col("old_item_id").asc), "new_item_id")
    }),

    // Roles pipeline (E1, `roles.py:49-108`): multiway join → flag
    // derivation → melt → claim-string recode → enabled filter, end to
    // end over supplier⋈nation standing in for Users⋈Role_Group.
    "e6_roles_claims" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
      val m = Map("can_create" -> "Permissions.Account.Create",
        "can_edit" -> "Permissions.Account.Edit",
        "can_access" -> "Permissions.Account.Access")
      val wide = sup
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("group_name"),
          Repair.flag(col("s_acctbal") > 0).as("can_create"),
          Repair.flag(col("s_suppkey") % 2 === 0).as("can_edit"),
          lit(1).as("can_access"))
      Reshape.melt(wide, Seq("s_suppkey", "group_name"),
        Seq("can_create", "can_edit", "can_access"), "perm", "enabled")
        .filter(col("enabled") === 1)
        .select(col("s_suppkey"), col("group_name"),
          Recode.recodeStrict(col("perm"), m).as("claim"))
    }),

    // Data-quality report — the reference's manual reconciliation
    // counts (`Readme.md:1-87`: "2133 records (~0.14%) have missing
    // OrderTakerID", …) operationalized as one dataflow: each check is
    // a conditional count, unioned into a (check, violations, total)
    // report. At scale: every check is a partial-aggregatable count
    // over one shared scan per table.
    "dq1_quality_report" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      def check(df: DataFrame, name: String, bad: org.apache.spark.sql.Column) =
        df.agg(lit(name).as("check_name"),
          count(when(bad, 1)).as("n_violations"),
          count(lit(1)).as("n_total"))
      check(li, "lineitem_null_partkey", col("l_partkey").isNull)
        .unionAll(check(li, "lineitem_high_discount",
          col("l_discount") < 0 || col("l_discount") > 0.08))
        .unionAll(check(li, "lineitem_nonpositive_price",
          col("l_extendedprice") <= 0))
        .unionAll(check(li, "lineitem_qty_over_45", col("l_quantity") > 45))
        .unionAll(check(o, "orders_null_custkey", col("o_custkey").isNull))
        .unionAll(check(o, "orders_unknown_status",
          !col("o_orderstatus").isin("O", "F", "P")))
        .unionAll(
          FkRemap.remap(li.select("l_orderkey"),
            o.select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus")),
            Seq("l_orderkey"))
            .agg(lit("lineitem_orphaned_orderkey").as("check_name"),
              count(when(col("o_orderstatus").isNull, 1)).as("n_violations"),
              count(lit(1)).as("n_total")))
    }),

    // S2/S3/S8/S9 loop — the `while True: extract→transform→load` CDC
    // loop (`accounts.py:147-161`) run to completion in keyset batches
    // with a persisted watermark store and per-batch append sink; the
    // oracle is the loop-invariant single-shot transform of the whole
    // table (incremental == batch equivalence).
    "s8_cdc_loop" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft_cdc_").toString
      val store  = new Cdc.WatermarkStore(s, s"$base/wm", initial = -1L)
      val outDir = s"$base/out"
      val transform = (df: DataFrame) => df.select(
        col("event_id"), col("user_id"),
        upper(col("event_type")).as("event_type_u"),
        (col("value") * 2).as("value2"))
      Cdc.runLoop(ev, "event_id", "events", store, batchSize = 9973,
        transform,
        (batch, wm) => batch.write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/batch=$wm"))
      s.read.parquet(outDir)
        .select("event_id", "user_id", "event_type_u", "value2")
    }),

    // Row-level MERGE/upsert on the manifest layer — the reference's
    // watermark MERGE (`accounts.py:131-140`) and Sync-table upsert
    // write shape. Two committed halves; the update batch touches only
    // even keys, so the merge copy-on-writes batch=0 and leaves
    // batch=1's entry untouched (the partial-rewrite commit the
    // SourcesSpec pins); insert-only rows ride the same new dir. The
    // oracle is the MERGE postcondition in plain SQL.
    "s9_merge_upsert" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s9_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      val updates = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice")))
      Sinks.mergeUpsert(s, updates, root, man, Seq("o_orderkey"), mergeId = 2)
      Sinks.readCommitted(s, root, man)
    }),

    // MERGE with BOTH matched arms — UPDATE and DELETE — in one atomic
    // commit (Delta `WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN
    // NOT MATCHED INSERT`): the opt-out/takedown purge a training
    // corpus needs, on the same copy-on-write + replaceDirs substrate
    // as s9. Updates touch keys %10=0, deletes purge keys %7=0 (made
    // disjoint from the update arm); the oracle is the MERGE
    // postcondition in plain SQL.
    "s11_merge_delete" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s11_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      val updates = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
      val deletes = o.filter(col("o_orderkey") % 7 === 0 &&
          col("o_orderkey") % 10 =!= 0)
        .select("o_orderkey")
      Sinks.merge(s, Some(updates), Some(deletes), root, man,
        Seq("o_orderkey"), mergeId = 2)
      Sinks.readCommitted(s, root, man)
    }),

    // The reference's watermark write is LITERAL SQL MERGE
    // (`accounts.py:131-140`) — this is that statement, verbatim
    // grammar, over the manifest layer: conditional DELETE arm,
    // UPDATE SET *, INSERT *, parsed by Spark's own AstBuilder and
    // routed to Sinks.merge (same COW, pruning, atomic commit as the
    // Scala API). The oracle predicts the post-MERGE table in plain
    // SQL; a mis-parsed arm or mis-derived key set shows up as rows
    // on the wrong side of the merge.
    "s12_sql_merge" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables}
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s12_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      GraftSqlTables.register("s12_wm",
        GraftSqlTables.Entry(root, s"$base/manifest.tsv", keys = Seq("o_orderkey")))
      o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"), lit("U").as("op"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice"),
            lit("U").as("op")))
        .unionAll(o.filter(col("o_orderkey") % 7 === 0 &&
            col("o_orderkey") % 10 =!= 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), lit("D").as("op")))
        .createOrReplaceTempView("s12_src")
      try {
        GraftSql.execute(s,
          """MERGE INTO s12_wm AS t USING s12_src AS src
            |ON t.o_orderkey = src.o_orderkey
            |WHEN MATCHED AND src.op = 'D' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        Sinks.readCommitted(s, root, man)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      } finally GraftSqlTables.unregister("s12_wm")
    }),

    // Merge-on-read DELETE via deletion vectors — the takedown shape
    // at 100 TB: a small delete records (file, row position) pairs in
    // a sidecar instead of copy-on-writing whole dirs, so the data
    // stays byte-untouched (ScaleSpec pins that) and one manifest
    // commit flips visibility. The oracle is the SAME postcondition a
    // COW delete must satisfy — merge-on-read vs copy-on-write is an
    // execution strategy, never a semantics change. The query also
    // round-trips a second overlapping DV delete (re-deletes are
    // no-ops) before reading.
    "s13_dv_delete" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s13_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      Sinks.mergeDeleteDV(s,
        o.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"),
        root, man, Seq("o_orderkey"), mergeId = 2)
      // overlapping second delete: %21 keys are already gone (no-op
      // for them), %3-only keys go now — two DV sidecars compose
      Sinks.mergeDeleteDV(s,
        o.filter(col("o_orderkey") % 3 === 0).select("o_orderkey"),
        root, man, Seq("o_orderkey"), mergeId = 3)
      Sinks.readCommitted(s, root, man)
    }),

    // Merge-on-read UPDATE via deletion vectors — the round-7
    // completion of the DV story: a small update marks the old row
    // versions in a `_dv` sidecar and appends the new versions in the
    // SAME commit, O(changed rows) instead of O(affected dirs)
    // (ScaleSpec pins the untouched bytes). The oracle is the COW
    // upsert postcondition — merge-on-read is an execution strategy,
    // never a semantics change. A second OVERLAPPING update proves
    // composition: it vectors the first update's appended version.
    "s19_dv_update" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s19_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      // update 1: %10 keys re-priced + brand-new keys inserted
      Sinks.mergeUpdateDV(s,
        o.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
            (col("o_totalprice") * 2).as("o_totalprice"))
          .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              lit("N").as("o_orderstatus"), col("o_totalprice"))),
        root, man, Seq("o_orderkey"), mergeId = 2)
      // update 2 overlaps update 1 (%20 ⊂ %10): the second vector
      // hides the version batch 2 appended
      Sinks.mergeUpdateDV(s,
        o.filter(col("o_orderkey") % 20 === 0)
          .select(col("o_orderkey"), lit("Y").as("o_orderstatus"),
            (col("o_totalprice") * 4).as("o_totalprice")),
        root, man, Seq("o_orderkey"), mergeId = 3)
      Sinks.readCommitted(s, root, man)
    }),

    // SQL INSERT — the load verb: the first INSERT INTO bootstraps
    // the table (defines its schema), the second appends a
    // stats-indexed batch; both through the injected-parser grammar
    // with classic positional column semantics. The oracle is the
    // union of the two source queries.
    "s16_sql_insert" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables}
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      o.createOrReplaceTempView("s16_orders")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s16_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      GraftSqlTables.register("s16_wm",
        GraftSqlTables.Entry(root, s"$base/manifest.tsv", keys = Seq("o_orderkey")))
      try {
        GraftSql.execute(s,
          """INSERT INTO s16_wm
            |SELECT o_orderkey, o_orderstatus, o_totalprice
            |FROM s16_orders WHERE o_orderkey % 2 = 0""".stripMargin)
        GraftSql.execute(s,
          """INSERT INTO s16_wm
            |SELECT o_orderkey, o_orderstatus, o_totalprice
            |FROM s16_orders WHERE o_orderkey % 2 = 1""".stripMargin)
        Sinks.readCommitted(s, root, man)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      } finally GraftSqlTables.unregister("s16_wm")
    }),

    // SQL UPDATE — the third DML verb: arbitrary SET expressions over
    // the matched rows (guarded price discount on low-priority open
    // orders), parsed by Spark's grammar, executed as the same
    // affected-dirs-only COW merge. The oracle is the UPDATE
    // postcondition in plain SQL.
    "s15_sql_update" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables}
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s15_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      GraftSqlTables.register("s15_wm",
        GraftSqlTables.Entry(root, s"$base/manifest.tsv", keys = Seq("o_orderkey")))
      try {
        GraftSql.execute(s,
          """UPDATE s15_wm
            |SET o_totalprice = o_totalprice * 0.9, o_orderstatus = 'P'
            |WHERE o_orderstatus = 'O' AND o_orderkey % 5 = 0""".stripMargin)
        Sinks.readCommitted(s, root, man)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      } finally GraftSqlTables.unregister("s15_wm")
    }),

    // MERGE with a COLUMN-LEVEL update — the first statement a Delta
    // upsert user writes that round 6 rejected: `WHEN MATCHED THEN
    // UPDATE SET t.c = t.c + s.d` recomputes LISTED columns from
    // expressions over both rows and keeps every unlisted column's
    // target value (the reference's own MERGE updates one column of
    // two, `accounts.py:131-140`). The source carries an extra
    // `delta` column that must NOT evolve the table schema (it is an
    // input to the expression, not a column) — the Delta projection
    // rule. The oracle is the column-level postcondition in SQL.
    "s18_merge_update_expr" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables}
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s18_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      GraftSqlTables.register("s18_wm",
        GraftSqlTables.Entry(root, s"$base/manifest.tsv", keys = Seq("o_orderkey")))
      o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          (col("o_totalprice") * 0.5).as("delta"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice"),
            lit(0.0).as("delta")))
        .createOrReplaceTempView("s18_src")
      try {
        GraftSql.execute(s,
          """MERGE INTO s18_wm AS t USING s18_src AS s
            |ON t.o_orderkey = s.o_orderkey
            |WHEN MATCHED THEN UPDATE SET
            |  t.o_totalprice = t.o_totalprice + s.delta,
            |  t.o_orderstatus = 'U'
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        Sinks.readCommitted(s, root, man)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      } finally GraftSqlTables.unregister("s18_wm")
    }),

    // The SQL-user round trip with ZERO Scala prelude — the round-7
    // catalog: CREATE TABLE ... USING graft-manifest persists the
    // table (schema, merge keys) in the `spark.sql.catalog.graft`
    // TableCatalog, INSERT bootstraps it, MERGE upserts through the
    // same engine, SELECT plans the DSv2 scan — every statement SQL
    // text, the DDL-owned-names workflow of the reference's setup
    // (`setup.sql:122-125`). The oracle is the post-MERGE table.
    "s17_sql_catalog" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      o.createOrReplaceTempView("s17_orders")
      o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice")))
        .createOrReplaceTempView("s17_src")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      // the catalog instance caches its warehouse at first load (as
      // Spark's CatalogManager does) — set it once per session; DROP
      // below makes repeat passes in one session idempotent
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s17_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.wm")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.wm (
           |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE
           |) USING `graft-manifest` TBLPROPERTIES ('keys' = 'o_orderkey')
           |""".stripMargin)
      GraftSql.execute(s,
        s"INSERT INTO $cat.wm SELECT * FROM s17_orders")
      GraftSql.execute(s,
        s"""MERGE INTO $cat.wm AS t USING s17_src AS src
           |ON t.o_orderkey = src.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      GraftSql.execute(s,
        s"SELECT o_orderkey, o_orderstatus, o_totalprice FROM $cat.wm")
    }),

    // SQL time travel through the catalog (round 7): `VERSION AS OF`
    // in plain SELECT text — versions are MANIFEST versions (the
    // DESCRIBE HISTORY / RESTORE numbers), served from the claim
    // tombstone via the catalog's time-travel loadTable, with the
    // HISTORICAL schema. One query reads the pre-merge and post-merge
    // snapshots of the same table; the oracle predicts both.
    "s23_sql_time_travel" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      o.createOrReplaceTempView("s23_orders")
      o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("T").as("o_orderstatus"),
          (col("o_totalprice") * 3).as("o_totalprice"))
        .createOrReplaceTempView("s23_src")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s23_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.ttw")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.ttw (
           |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE
           |) USING `graft-manifest` TBLPROPERTIES ('keys' = 'o_orderkey')
           |""".stripMargin)
      GraftSql.execute(s,
        s"INSERT INTO $cat.ttw SELECT * FROM s23_orders") // version 1
      GraftSql.execute(s,
        s"""MERGE INTO $cat.ttw AS t USING s23_src AS src
           |ON t.o_orderkey = src.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin) // version 2
      GraftSql.execute(s,
        s"""SELECT o_orderkey, o_orderstatus, o_totalprice, 'pre' AS snap
           |FROM $cat.ttw VERSION AS OF 1
           |UNION ALL
           |SELECT o_orderkey, o_orderstatus, o_totalprice, 'post' AS snap
           |FROM $cat.ttw VERSION AS OF 2""".stripMargin)
    }),

    // ALTER TABLE column DDL through the catalog (round 7
    // continuation): a columnMapping table renames/adds columns as
    // metadata-only SchemaLog edits — zero data files rewritten — and
    // every DML verb keeps working under the CURRENT names.
    // Lifecycle, all SQL text: CREATE mapped → INSERT → RENAME
    // o_totalprice→price → MERGE (column-level update under the NEW
    // name + inserts, evaluated in logical space) → ADD COLUMN note →
    // INSERT carrying it → SELECT under the evolved schema (pre-ADD
    // rows serve NULL note). The oracle predicts the final state.
    // IDENTITY columns (round 8): engine-allocated surrogate keys
    // from the CAS-fenced batch id (high bits) + a batch-dense row
    // index — unique and monotonic across commits with ZERO extra
    // coordination (graft.ops.Ids.fillIdentity). Raw values are
    // allocation-dependent (scan order within the batch), so the
    // query surfaces the CONTRACT as deterministic aggregates:
    // cardinalities (uniqueness), cross-batch range separation
    // (monotonicity), start/step conformance, and the exact first
    // id — each a value the oracle pins bit-for-bit.
    "s31_sql_identity" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      o.createOrReplaceTempView("s31_orders")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s31_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.idn")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.idn (
           |  id BIGINT GENERATED ALWAYS AS IDENTITY
           |    (START WITH 100 INCREMENT BY 3),
           |  k BIGINT, amt DOUBLE
           |) USING `graft-manifest` TBLPROPERTIES ('keys' = 'k')
           |""".stripMargin)
      GraftSql.execute(s,
        s"""INSERT INTO $cat.idn (k, amt)
           |SELECT o_orderkey, o_totalprice FROM s31_orders""".stripMargin)
      GraftSql.execute(s,
        s"""INSERT INTO $cat.idn (k, amt)
           |SELECT o_orderkey + 10000000, 0.0 FROM s31_orders
           |WHERE o_orderkey % 10 = 0""".stripMargin)
      GraftSql.execute(s,
        s"""SELECT
           |  count(*) AS n_rows,
           |  count(DISTINCT id) AS n_ids,
           |  CAST(max(CASE WHEN k < 10000000 THEN id END) <
           |       min(CASE WHEN k >= 10000000 THEN id END) AS INT)
           |    AS batches_monotone,
           |  CAST(max(CASE WHEN (id - 100) % 3 != 0 THEN 1 ELSE 0 END)
           |    AS INT) AS step_violations,
           |  min(id) AS first_id
           |FROM $cat.idn""".stripMargin)
    }),

    // Type widening (round 8 — Delta's type-widening table feature):
    // ALTER COLUMN ... TYPE is metadata-only for WIDENING changes on
    // columnMapping tables (int→bigint, float→double here) — the
    // SchemaLog records the new type and every reader (scan, UPDATE's
    // merge probe) requests it, letting Spark 4's parquet reader
    // promote the narrower old files in place. The statement sequence
    // deliberately leaves the table with MIXED physical file types
    // (pre-widen int/float files, post-widen bigint/double files and
    // a merge rewrite spanning both), so the final SELECT certifies
    // the whole read path. Narrowing rejection is pinned in
    // SqlSurfaceSpec.
    "s30_sql_widen" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      o.createOrReplaceTempView("s30_orders")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s30_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.wid")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.wid (k BIGINT, v INT, f FLOAT)
           |USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'k', 'columnMapping' = 'true')
           |""".stripMargin)
      GraftSql.execute(s,
        s"""INSERT INTO $cat.wid
           |SELECT o_orderkey, CAST(o_orderkey % 1000 AS INT),
           |  CAST(o_totalprice AS FLOAT) FROM s30_orders""".stripMargin)
      GraftSql.execute(s, s"ALTER TABLE $cat.wid ALTER COLUMN v TYPE BIGINT")
      GraftSql.execute(s, s"ALTER TABLE $cat.wid ALTER COLUMN f TYPE DOUBLE")
      // post-widen rows need the full 64-bit range — unrepresentable
      // before the retype
      GraftSql.execute(s,
        s"""INSERT INTO $cat.wid
           |SELECT o_orderkey + 30000000,
           |  CAST(o_orderkey AS BIGINT) * 10000000000,
           |  CAST(o_totalprice AS DOUBLE)
           |FROM s30_orders WHERE o_orderkey % 100 = 0""".stripMargin)
      // the merge probe + rewrite reads pre-widen files through the
      // widened schema (the mergeSchema int/long mix would refuse)
      GraftSql.execute(s, s"UPDATE $cat.wid SET v = v + 1 WHERE k % 10 = 0")
      GraftSql.execute(s, s"SELECT k, v, f FROM $cat.wid")
    }),

    "s24_sql_alter" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      o.createOrReplaceTempView("s24_orders")
      o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").as("price"),
          (col("o_totalprice") * 0.5).as("delta"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"),
            col("o_totalprice").as("price"), lit(0.0).as("delta")))
        .createOrReplaceTempView("s24_src")
      o.filter(col("o_orderkey") % 500 === 0)
        .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
          lit("Z").as("o_orderstatus"), col("o_totalprice").as("price"),
          lit("late").as("note"))
        .createOrReplaceTempView("s24_ins")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s24_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.alt")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.alt (
           |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE
           |) USING `graft-manifest`
           |TBLPROPERTIES ('keys' = 'o_orderkey', 'columnMapping' = 'true')
           |""".stripMargin)
      GraftSql.execute(s, s"INSERT INTO $cat.alt SELECT * FROM s24_orders")
      GraftSql.execute(s,
        s"ALTER TABLE $cat.alt RENAME COLUMN o_totalprice TO price")
      GraftSql.execute(s,
        s"""MERGE INTO $cat.alt AS t USING s24_src AS src
           |ON t.o_orderkey = src.o_orderkey
           |WHEN MATCHED THEN UPDATE SET t.price = t.price + src.delta
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      GraftSql.execute(s, s"ALTER TABLE $cat.alt ADD COLUMN note STRING")
      GraftSql.execute(s, s"INSERT INTO $cat.alt SELECT * FROM s24_ins")
      GraftSql.execute(s,
        s"SELECT o_orderkey, o_orderstatus, price, note FROM $cat.alt")
    }),

    // GENERATED ALWAYS AS columns (round-7 continuation): the
    // derived-column idiom the reference hand-maintains in every
    // transform (`orders.py:111` order-type recodes), declared ONCE
    // at CREATE and recomputed by the engine on every write — the
    // column-list INSERT computes it, UPDATE recomputes it from the
    // new values. The oracle derives the same expression over the
    // post-update state.
    "s27_sql_generated" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      o.createOrReplaceTempView("s27_orders")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s27_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.gen")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.gen (
           |  o_orderkey BIGINT, o_totalprice DOUBLE,
           |  price_band STRING GENERATED ALWAYS AS (
           |    CASE WHEN o_totalprice > 50000.0 THEN 'high'
           |         WHEN o_totalprice > 10000.0 THEN 'mid'
           |         ELSE 'low' END)
           |) USING `graft-manifest` TBLPROPERTIES ('keys' = 'o_orderkey')
           |""".stripMargin)
      GraftSql.execute(s,
        s"""INSERT INTO $cat.gen (o_orderkey, o_totalprice)
           |SELECT o_orderkey, o_totalprice FROM s27_orders""".stripMargin)
      GraftSql.execute(s,
        s"""UPDATE $cat.gen SET o_totalprice = o_totalprice * 3.0
           |WHERE o_orderkey % 10 = 0""".stripMargin)
      GraftSql.execute(s,
        s"SELECT o_orderkey, o_totalprice, price_band FROM $cat.gen")
    }),

    // SHALLOW CLONE (round-7 continuation) — the zero-copy fork as
    // SQL text: the clone's manifest snapshots the source's committed
    // dirs in one CAS (no data moved), then DIVERGES through its own
    // DML (the merge copy-on-writes affected source dirs into
    // clone-root rewrites). One result returns BOTH tables tagged, so
    // the oracle pins divergence AND source-untouched at once.
    "s29_sql_clone" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      o.createOrReplaceTempView("s29_orders")
      o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("C").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .createOrReplaceTempView("s29_upd")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s29_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.clsrc")
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.cldst")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.clsrc (
           |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE
           |) USING `graft-manifest` TBLPROPERTIES ('keys' = 'o_orderkey')
           |""".stripMargin)
      GraftSql.execute(s,
        s"INSERT INTO $cat.clsrc SELECT * FROM s29_orders")
      GraftSql.execute(s,
        s"CREATE TABLE $cat.cldst SHALLOW CLONE $cat.clsrc")
      GraftSql.execute(s,
        s"""MERGE INTO $cat.cldst AS t USING s29_upd AS src
           |ON t.o_orderkey = src.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      GraftSql.execute(s,
        s"DELETE FROM $cat.cldst WHERE o_orderkey % 7 = 0 " +
          "AND o_orderkey % 10 != 0")
      // round 8: clone-of-clone inherits the diverged view, then
      // diverges again (its UPDATE must leak into neither ancestor)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.clgrand")
      GraftSql.execute(s,
        s"CREATE TABLE $cat.clgrand SHALLOW CLONE $cat.cldst")
      GraftSql.execute(s,
        s"""UPDATE $cat.clgrand SET o_totalprice = o_totalprice + 1
           |WHERE o_orderkey % 3 = 0""".stripMargin)
      // round 8: a SNAPSHOT clone pins version 1 — the src append
      // right before it must not appear in it
      GraftSql.execute(s,
        s"""INSERT INTO $cat.clsrc
           |SELECT o_orderkey + 40000000, 'E', 0.0
           |FROM s29_orders WHERE o_orderkey % 100 = 0""".stripMargin)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.clsnap")
      GraftSql.execute(s,
        s"CREATE TABLE $cat.clsnap SHALLOW CLONE $cat.clsrc VERSION AS OF 1")
      GraftSql.execute(s,
        s"""SELECT 'clone' AS side, o_orderkey, o_orderstatus, o_totalprice
           |FROM $cat.cldst
           |UNION ALL
           |SELECT 'src' AS side, o_orderkey, o_orderstatus, o_totalprice
           |FROM $cat.clsrc
           |UNION ALL
           |SELECT 'snap' AS side, o_orderkey, o_orderstatus, o_totalprice
           |FROM $cat.clsnap
           |UNION ALL
           |SELECT 'grand' AS side, o_orderkey, o_orderstatus, o_totalprice
           |FROM $cat.clgrand""".stripMargin)
    }),

    // COPY INTO (round-7 continuation) — Delta's idempotent bulk
    // ingest: a landing directory grows a second wave of files
    // between statements; the first COPY loads wave 1, an immediate
    // re-COPY is a tracked no-op (if it re-loaded, the final hash
    // would double), and the third COPY picks up exactly wave 2.
    // Waves are disjoint key halves, so the oracle is plain `orders`.
    "s28_copy_into" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val landing = java.nio.file.Files
        .createTempDirectory("graft_s28_land_").toString
      o.filter(col("o_orderkey") % 2 === 0)
        .write.mode("overwrite").parquet(s"$landing/wave1")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s28_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.cp")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.cp (
           |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE
           |) USING `graft-manifest` TBLPROPERTIES ('keys' = 'o_orderkey')
           |""".stripMargin)
      val copy = s"COPY INTO $cat.cp FROM '$landing' " +
        "FILEFORMAT = PARQUET PATTERN = '*/*.parquet'"
      GraftSql.execute(s, copy)
      GraftSql.execute(s, copy) // tracked no-op
      o.filter(col("o_orderkey") % 2 === 1)
        .write.mode("overwrite").parquet(s"$landing/wave2")
      GraftSql.execute(s, copy) // wave 2 only
      GraftSql.execute(s,
        s"SELECT o_orderkey, o_orderstatus, o_totalprice FROM $cat.cp")
    }),

    // COPY INTO from TEXT landing formats (round 10): the same
    // idempotent file-tracked ingest over CSV (header, declared-
    // schema parse — never inference) and JSON lines. Doubles
    // round-trip exactly (shortest-repr serialization on write,
    // exact parse on read), so the oracle compares against the
    // ORIGINAL parquet values. The CSV COPY re-runs as a tracked
    // no-op before the JSON wave lands.
    "s33_copy_text" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val landing = java.nio.file.Files
        .createTempDirectory("graft_s33_land_").toString
      o.filter(col("o_orderkey") % 2 === 0)
        .write.mode("overwrite").option("header", "true")
        .csv(s"$landing/csv")
      o.filter(col("o_orderkey") % 2 === 1)
        .write.mode("overwrite").json(s"$landing/json")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s33_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.ct")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.ct (
           |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE
           |) USING `graft-manifest` TBLPROPERTIES ('keys' = 'o_orderkey')
           |""".stripMargin)
      val copyCsv = s"COPY INTO $cat.ct FROM '$landing/csv' " +
        "FILEFORMAT = CSV PATTERN = '*.csv' " +
        "FORMAT_OPTIONS ('header' = 'true')"
      GraftSql.execute(s, copyCsv)
      GraftSql.execute(s, copyCsv) // tracked no-op
      GraftSql.execute(s, s"COPY INTO $cat.ct FROM '$landing/json' " +
        "FILEFORMAT = JSON PATTERN = '*.json'")
      GraftSql.execute(s,
        s"SELECT o_orderkey, o_orderstatus, o_totalprice FROM $cat.ct")
    }),

    // Incremental materialized view, ADDITIVE mode (round 10): the
    // Delta "MV over a CDF table" recipe as an engine statement —
    // the reference's analogue is the per-account summary its
    // pipelines recompute whole each run. CREATE + bootstrap REFRESH
    // over the seed wave, then an append + a column-level UPDATE + a
    // DELETE, then one incremental REFRESH that reads ONLY the change
    // feed (MvSpec pins the no-base-scan bound) and merges signed
    // per-group deltas into the stored accumulators. The oracle
    // recomputes the final aggregate from the predicted final source.
    // Scale shape: refresh cost is O(delta)+O(touched groups) — the
    // 100 TB summary table never re-reads the fact table.
    "s34_mv_incremental" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      // scenario slice: the refresh arms are input-size independent,
      // so the fact rides a half-slice (bench stays scenario-IO sane)
      val o = Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0).select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        when(col("o_orderkey") % 17 === 0, lit(null))
          .otherwise(col("o_totalprice")).cast("decimal(18,6)").as("price"))
      val base = java.nio.file.Files
        .createTempDirectory("graft_s34_").toString
      val root = s"$base/src"
      val man = new TxnManifest(s"$base/manifest.tsv")
      StatsSinks.appendBatchStats(o.filter(col("id") % 3 === 0), root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      GraftSqlTables.register("s34_src", GraftSqlTables.Entry(root,
        s"$base/manifest.tsv", keys = Seq("id"), cdf = true))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s34_mv LOCATION '$base/mv' AS " +
          "SELECT status, count(*) AS n_orders, count(price) AS n_priced, " +
          "sum(price) AS sum_price FROM s34_src WHERE id % 7 != 2 " +
          "GROUP BY status")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s34_mv")
      StatsSinks.appendBatchStats(o.filter(col("id") % 3 === 1), root, 1)
      man.commit(1, Seq(s"$root/batch=1"))
      GraftSql.execute(s,
        "UPDATE s34_src SET price = price * 2 WHERE id % 11 = 3")
      GraftSql.execute(s, "DELETE FROM s34_src WHERE id % 13 = 5")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s34_mv")
      val out = GraftMvs.read(s, "s34_mv").select(col("status"),
        col("n_orders"), col("n_priced"),
        col("sum_price").cast("double").as("sum_price"))
      GraftMvs.drop("s34_mv")
      out
    }),

    // Incremental materialized view, RECOMPUTE mode (round 10):
    // min/max cannot decrement, so groups touched by the delta
    // recompute from the base restricted by a semi-join the
    // stats/bloom sidecars prune — O(affected groups' rows), never a
    // full rebuild. The DELETE waves remove per-group maxima (the
    // case a naive incremental max silently gets wrong) and kill one
    // whole group (death must reach the stored view as a row delete).
    "s35_mv_minmax" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val o = Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0).select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        col("o_custkey").as("cust"))
      val base = java.nio.file.Files
        .createTempDirectory("graft_s35_").toString
      val root = s"$base/src"
      val man = new TxnManifest(s"$base/manifest.tsv")
      StatsSinks.appendBatchStats(o, root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      GraftSqlTables.register("s35_src", GraftSqlTables.Entry(root,
        s"$base/manifest.tsv", keys = Seq("id"), cdf = true))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s35_mv LOCATION '$base/mv' AS " +
          "SELECT status, min(id) AS min_id, max(id) AS max_id, " +
          "max(cust) AS max_cust, count(*) AS n FROM s35_src " +
          "GROUP BY status")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s35_mv")
      // shave every group's top id band, then kill a whole group
      GraftSql.execute(s, "DELETE FROM s35_src WHERE id % 10 = 9")
      GraftSql.execute(s, "DELETE FROM s35_src WHERE status = 'P'")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s35_mv")
      // insert-only wave: extends two groups' extremes and births a
      // group — the refresh takes the FOLD arm (least/greatest against
      // the stored extremes; the base table is not read)
      GraftSql.execute(s, "INSERT INTO s35_src VALUES " +
        "(90000001, 'O', 9000001), (90000002, 'F', 9000002), " +
        "(99999999, 'Z', 424242)")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s35_mv")
      val out = GraftMvs.read(s, "s35_mv")
      GraftMvs.drop("s35_mv")
      out
    }),

    // count(DISTINCT) materialized view (round 10): distinct counts
    // have no per-group scalar accumulator under deletes (removing a
    // row may or may not remove the last occurrence of its value), so
    // the view maintains in RECOMPUTE mode — only delta-touched
    // groups re-count from the base, semi-join-pruned. The UPDATE
    // wave collapses values (shrinking the distinct set without
    // deleting rows) and the DELETE removes partial occurrences —
    // both cases a signed-delta fold would get wrong.
    "s36_mv_distinct" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val o = Tables.orders(s, d).filter(col("o_orderkey") % 4 === 0).select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        (col("o_custkey") % 97).as("cust"))
      val base = java.nio.file.Files
        .createTempDirectory("graft_s36_").toString
      val root = s"$base/src"
      val man = new TxnManifest(s"$base/manifest.tsv")
      StatsSinks.appendBatchStats(o, root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      GraftSqlTables.register("s36_src", GraftSqlTables.Entry(root,
        s"$base/manifest.tsv", keys = Seq("id"), cdf = true))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s36_mv LOCATION '$base/mv' AS " +
          "SELECT status, count(DISTINCT cust) AS n_cust, " +
          "count(*) AS n_rows FROM s36_src GROUP BY status")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s36_mv")
      GraftSql.execute(s, "DELETE FROM s36_src WHERE id % 5 = 4")
      GraftSql.execute(s, "UPDATE s36_src SET cust = cust % 13 " +
        "WHERE id % 7 = 1")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s36_mv")
      val out = GraftMvs.read(s, "s36_mv")
      GraftMvs.drop("s36_mv")
      out
    }),

    // Transparent MV rewrite (round 10): the user keeps writing the
    // aggregate over the BASE table; the engine serves it from a
    // FRESH materialized view when result-identical — direct grain as
    // a pure projection, a COARSER GROUP BY by re-aggregating the
    // stored exact accumulators (rollup), residual group-key
    // predicates re-applied above the serve. Acceleration is
    // asserted in-query: the served plans must not reference the
    // base table's directory; staleness is asserted the other way
    // (post-DML, pre-refresh, the same text reads the base). At
    // 100 TB this turns a dashboard's fact-table scan+shuffle into a
    // summary-store projection with the query text unchanged.
    "s37_mv_rewrite" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables, GraftMvs}
      import graft.sources.{StatsSinks, TxnManifest}
      val li = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 4 === 0).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_returnflag").as("flag"),
        col("l_linestatus").as("lstat"),
        col("l_quantity").cast("decimal(18,6)").as("qty"))
      val base = java.nio.file.Files
        .createTempDirectory("graft_s37_").toString
      val root = s"$base/src"
      val man = new TxnManifest(s"$base/manifest.tsv")
      StatsSinks.appendBatchStats(li, root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      GraftSqlTables.register("s37_src", GraftSqlTables.Entry(root,
        s"$base/manifest.tsv", keys = Seq("id"), cdf = true))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s37_mv LOCATION '$base/mv' AS " +
          "SELECT flag, lstat, count(*) AS n, sum(qty) AS sq " +
          "FROM s37_src GROUP BY flag, lstat")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s37_mv")
      val q2 = "SELECT flag, count(*) AS n_items, sum(qty) AS sum_qty " +
        "FROM s37_src WHERE flag != 'X' GROUP BY flag"
      val fresh = GraftSql.execute(s, q2)
      require(!fresh.queryExecution.executedPlan.toString.contains(root),
        "s37: fresh MV must serve the rollup without reading the base")
      // stale: DML moves the base; the same text must read the base
      GraftSql.execute(s, "DELETE FROM s37_src WHERE id % 9 = 7")
      val stale = GraftSql.execute(s, q2)
      require(stale.queryExecution.executedPlan.toString.contains(root),
        "s37: a stale MV must never serve")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s37_mv")
      val served = GraftSql.execute(s, q2)
      require(!served.queryExecution.executedPlan.toString.contains(root),
        "s37: refreshed MV must serve again")
      val out = served.select(col("flag"), col("n_items"),
        col("sum_qty").cast("double").as("sum_qty"))
      GraftMvs.drop("s37_mv") // store files outlive the registration
      out
    }),

    // Join-form materialized view (round 10): the star-schema summary
    // — fact ⋈ dim GROUP BY dim attribute. Maintenance exploits
    // Δ(F ⋈ D) = ΔF ⋈ D when the dim is unmoved: the fact delta
    // joins the broadcast-sized dim and folds additively (the fact
    // base is never re-read); a refresh that finds the DIM moved
    // falls back to one full recompute with group deaths. The
    // scenario drives both arms: fact DELETE+UPDATE → incremental,
    // then a dim relabel that collapses groups → recompute.
    "s38_mv_join" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val base = java.nio.file.Files
        .createTempDirectory("graft_s38_").toString
      def reg(tag: String, rows: org.apache.spark.sql.DataFrame,
              keys: Seq[String]): Unit = {
        val root = s"$base/$tag"
        val man = new TxnManifest(s"$base/$tag.manifest.tsv")
        StatsSinks.appendBatchStats(rows, root, 0)
        man.commit(0, Seq(s"$root/batch=0"))
        GraftSqlTables.register(s"s38_$tag", GraftSqlTables.Entry(root,
          s"$base/$tag.manifest.tsv", keys = keys, cdf = true))
      }
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // testdata — pre-aggregate to the id grain so the keyed UPDATE
      // below sees unique keys (min/sum are order-insensitive, so the
      // grain is deterministic and the oracle mirrors it exactly)
      reg("fact", Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 4 === 0).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_suppkey").as("sk"),
        col("l_quantity").cast("decimal(18,6)").as("qty"))
        .groupBy(col("id")).agg(
          min(col("sk")).as("sk"),
          sum(col("qty")).cast("decimal(18,6)").as("qty")), Seq("id"))
      reg("dim", Tables.supplier(s, d).select(
        col("s_suppkey").as("k"),
        col("s_nationkey").cast("int").as("nk")), Seq("k"))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s38_mv LOCATION '$base/mv' AS " +
          "SELECT d.nk, count(*) AS n, sum(f.qty) AS sq " +
          "FROM s38_fact f JOIN s38_dim d ON f.sk = d.k GROUP BY d.nk")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s38_mv")
      // fact wave → incremental arm (the UPDATE arm is MvSpec-covered;
      // one merge keeps the scenario-IO bill proportionate)
      GraftSql.execute(s, "DELETE FROM s38_fact WHERE id % 7 = 2")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s38_mv")
      // dim relabel → full-recompute arm, groups 7..24 collapse
      GraftSql.execute(s, "UPDATE s38_dim SET nk = nk % 7")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s38_mv")
      val out = GraftMvs.read(s, "s38_mv").select(col("nk"), col("n"),
        col("sq").cast("double").as("sq"))
      GraftMvs.drop("s38_mv")
      out
    }),

    // Expression group keys (round 10): the canonical time-bucketed
    // rollup — `date_trunc('day', ts) AS day ... GROUP BY day`. The
    // computed key materializes once per maintenance pass (bootstrap,
    // delta fold, recompute all group on the derived column); CREATE
    // gates the expression on determinism and evaluation-time
    // independence, since a key that moves between refreshes would
    // scatter one logical group across store rows. At 100 TB this IS
    // the daily-dashboard summary: the events fact keeps raw timestamps,
    // the view folds per-day counts/sums from the CDF delta alone.
    "s40_mv_timebucket" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val ev = Tables.events(s, d)
        .filter(col("event_id") % 2 === 0).select(
        col("event_id").as("id"), col("ts"),
        col("value").cast("decimal(18,6)").as("v"))
      val base = java.nio.file.Files
        .createTempDirectory("graft_s40_").toString
      val root = s"$base/src"
      val man = new TxnManifest(s"$base/manifest.tsv")
      StatsSinks.appendBatchStats(ev, root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      GraftSqlTables.register("s40_src", GraftSqlTables.Entry(root,
        s"$base/manifest.tsv", keys = Seq("id"), cdf = true))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s40_mv LOCATION '$base/mv' AS " +
          "SELECT date_trunc('day', ts) AS day, count(*) AS n, " +
          "sum(v) AS sv FROM s40_src GROUP BY day")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s40_mv")
      GraftSql.execute(s, "DELETE FROM s40_src WHERE id % 6 = 5")
      GraftSql.execute(s, "UPDATE s40_src SET v = v + 1 WHERE id % 11 = 3")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s40_mv")
      // the dashboard query — same expression, its own alias — must
      // serve from the summary store, not re-scan the fact table
      val dash = GraftSql.execute(s,
        "SELECT date_trunc('day', ts) AS d, count(*) AS n_ev " +
          "FROM s40_src GROUP BY d")
      require(!dash.queryExecution.executedPlan.toString.contains(root),
        "s40: the fresh time-bucket view must serve the dashboard query")
      val out = GraftMvs.read(s, "s40_mv").select(
        unix_micros(col("day")).as("day_us"), col("n"),
        col("sv").cast("double").as("sv"))
      GraftMvs.drop("s40_mv")
      out
    }),

    // Join-query MV acceleration (round 10): the star-schema query
    // KEEPS its join text — `SELECT d.x, aggs FROM fact f JOIN dim d
    // ON ... GROUP BY d.x` — and the engine serves it from a FRESH
    // join-form materialized view when the table pair, the ON pairs,
    // the WHERE and the grain all match. Freshness checks BOTH
    // manifests; the post-DML stale read computes the real join.
    // At 100 TB: the dashboard's fact⋈dim scan+shuffle+agg becomes a
    // summary-store projection without touching the query text.
    "s39_mv_join_accel" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val base = java.nio.file.Files
        .createTempDirectory("graft_s39_").toString
      def reg(tag: String, rows: org.apache.spark.sql.DataFrame,
              keys: Seq[String]): String = {
        val root = s"$base/$tag"
        val man = new TxnManifest(s"$base/$tag.manifest.tsv")
        StatsSinks.appendBatchStats(rows, root, 0)
        man.commit(0, Seq(s"$root/batch=0"))
        GraftSqlTables.register(s"s39_$tag", GraftSqlTables.Entry(root,
          s"$base/$tag.manifest.tsv", keys = keys, cdf = true))
        root
      }
      val factRoot = reg("fact", Tables.supplier(s, d).select(
        col("s_suppkey").as("id"),
        col("s_nationkey").as("nk"),
        col("s_acctbal").cast("decimal(18,6)").as("bal")), Seq("id"))
      reg("dim", Tables.nation(s, d).select(
        col("n_nationkey").as("k"),
        col("n_name").as("nname")), Seq("k"))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s39_mv LOCATION '$base/mv' AS " +
          "SELECT d.nname, count(*) AS n, sum(f.bal) AS sb " +
          "FROM s39_fact f JOIN s39_dim d ON f.nk = d.k GROUP BY d.nname")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s39_mv")
      val q = "SELECT d.nname AS nation, count(*) AS n_sup, " +
        "sum(f.bal) AS sum_bal FROM s39_fact f JOIN s39_dim d " +
        "ON f.nk = d.k GROUP BY d.nname"
      val fresh = GraftSql.execute(s, q)
      require(!fresh.queryExecution.executedPlan.toString.contains(factRoot),
        "s39: a fresh join MV must serve the join query from its store")
      GraftSql.execute(s, "DELETE FROM s39_fact WHERE id % 4 = 0")
      val stale = GraftSql.execute(s, q)
      require(stale.queryExecution.executedPlan.toString.contains(factRoot),
        "s39: a stale join MV must never serve — the query joins live")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s39_mv")
      val served = GraftSql.execute(s, q)
      require(!served.queryExecution.executedPlan.toString.contains(factRoot),
        "s39: the refreshed join MV must serve again")
      val out = served.select(col("nation"), col("n_sup"),
        col("sum_bal").cast("double").as("sum_bal"))
      GraftMvs.drop("s39_mv")
      out
    }),

    // Snowflake MV chain (round 11): fact → supplier → nation, the
    // dim-of-dim shape — dim2 keys off dim1's retained attribute,
    // not the fact. The same fold identity applies left-to-right
    // (ΔF ⋈ D1 ⋈ D2 when both dims unmoved); the MID dim moving
    // (supplier renationalized) breaks it → one full recompute with
    // group deaths. Serve/stale/serve plan asserts ride the gate.
    "s43_mv_snowflake" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val base = java.nio.file.Files
        .createTempDirectory("graft_s43_").toString
      def reg(tag: String, rows: org.apache.spark.sql.DataFrame,
              keys: Seq[String]): String = {
        val root = s"$base/$tag"
        val man = new TxnManifest(s"$base/$tag.manifest.tsv")
        StatsSinks.appendBatchStats(rows, root, 0)
        man.commit(0, Seq(s"$root/batch=0"))
        GraftSqlTables.register(s"s43_$tag", GraftSqlTables.Entry(root,
          s"$base/$tag.manifest.tsv", keys = keys, cdf = true))
        root
      }
      val factRoot = reg("fact", Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 8 === 4).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_suppkey").as("sk"),
        col("l_quantity").cast("decimal(18,6)").as("qty"))
        .groupBy(col("id")).agg(
          min(col("sk")).as("sk"),
          sum(col("qty")).cast("decimal(18,6)").as("qty")), Seq("id"))
      reg("dim1", Tables.supplier(s, d).select(
        col("s_suppkey").as("k"),
        col("s_nationkey").cast("int").as("nk")), Seq("k"))
      reg("dim2", Tables.nation(s, d).select(
        col("n_nationkey").cast("int").as("nkk"),
        col("n_name").as("nname")), Seq("nkk"))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s43_mv LOCATION '$base/mv' AS " +
          "SELECT d2.nname, count(*) AS n, sum(f.qty) AS sq " +
          "FROM s43_fact f JOIN s43_dim1 d1 ON f.sk = d1.k " +
          "JOIN s43_dim2 d2 ON d1.nk = d2.nkk GROUP BY d2.nname")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s43_mv")
      val q = "SELECT d2.nname, count(*) AS n, sum(f.qty) AS sq " +
        "FROM s43_fact f JOIN s43_dim1 d1 ON f.sk = d1.k " +
        "JOIN s43_dim2 d2 ON d1.nk = d2.nkk GROUP BY d2.nname"
      require(!GraftSql.execute(s, q).queryExecution.executedPlan
        .toString.contains(factRoot),
        "s43: a fresh snowflake MV must serve the chain query")
      GraftSql.execute(s, "DELETE FROM s43_fact WHERE id % 5 = 2")
      require(GraftSql.execute(s, q).queryExecution.executedPlan
        .toString.contains(factRoot),
        "s43: a stale snowflake MV must never serve")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s43_mv") // fold arm
      // mid-dim relabel → recompute arm, group deaths included
      GraftSql.execute(s, "UPDATE s43_dim1 SET nk = nk % 13")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s43_mv")
      require(!GraftSql.execute(s, q).queryExecution.executedPlan
        .toString.contains(factRoot),
        "s43: the refreshed snowflake MV must serve again")
      val out = GraftMvs.read(s, "s43_mv").select(col("nname"), col("n"),
        col("sq").cast("double").as("sq"))
      GraftMvs.drop("s43_mv")
      out
    }),

    // Compound-aggregate MV acceleration (round 11): the dashboard
    // text that COMPUTES with its aggregates — integer-exact
    // percentage via DIV, a scaled sum — served from the view's
    // store at a ROLLUP grain (query groups by flag, the view by
    // flag+lstat): each aggregate call binds to a stored accumulator,
    // the arithmetic re-evaluates over the served values, and the
    // serve/stale/serve plan asserts ride the same hash gate as s37.
    "s42_mv_compound" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val li = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 4 === 1).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_returnflag").as("flag"),
        col("l_linestatus").as("lstat"),
        when(col("l_orderkey") % 17 === 0, lit(null))
          .otherwise(col("l_extendedprice").cast("decimal(18,6)")).as("px"))
      val base = java.nio.file.Files
        .createTempDirectory("graft_s42_").toString
      val root = s"$base/src"
      val man = new TxnManifest(s"$base/manifest.tsv")
      StatsSinks.appendBatchStats(li, root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      GraftSqlTables.register("s42_src", GraftSqlTables.Entry(root,
        s"$base/manifest.tsv", keys = Seq("id"), cdf = true))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s42_mv LOCATION '$base/mv' AS " +
          "SELECT flag, lstat, count(*) AS n, count(px) AS np, " +
          "sum(px) AS sp FROM s42_src GROUP BY flag, lstat")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s42_mv")
      val q = "SELECT flag, (100 * count(px)) DIV count(*) AS pct_priced, " +
        "100 * sum(px) AS cents FROM s42_src GROUP BY flag"
      val fresh = GraftSql.execute(s, q)
      require(!fresh.queryExecution.executedPlan.toString.contains(root),
        "s42: compound aggregates must serve the rollup from the store")
      GraftSql.execute(s, "DELETE FROM s42_src WHERE id % 9 = 5")
      val stale = GraftSql.execute(s, q)
      require(stale.queryExecution.executedPlan.toString.contains(root),
        "s42: a stale view must never serve")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s42_mv")
      val served = GraftSql.execute(s, q)
      require(!served.queryExecution.executedPlan.toString.contains(root),
        "s42: the refreshed view must serve again")
      val out = served.select(col("flag"), col("pct_priced"),
        col("cents").cast("double").as("cents"))
      GraftMvs.drop("s42_mv")
      out
    }),

    // Streaming-maintained materialized view (round 11): the round-10
    // StreamingSpec fold twin promoted to an engine surface —
    // GraftMvs.maintainer runs a change-feed stream over the view's
    // source and triggers one refresh per delivered micro-batch
    // (Trigger.AvailableNow = the scheduled-maintenance shape).
    // Exactly-once stays in the refresh layer (state-file-before-
    // commit), so the restarted second run on the SAME checkpoint
    // below can only fold the new deltas — never re-fold the old.
    // The hash gate certifies the maintained store equals a batch
    // aggregate over the final source state.
    "st14_mv_maintainer" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val base = java.nio.file.Files
        .createTempDirectory("graft_st14_").toString
      val root = s"$base/src"
      val man = new TxnManifest(s"$base/manifest.tsv")
      StatsSinks.appendBatchStats(Tables.orders(s, d)
        .filter(col("o_orderkey") % 2 === 1).select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("decimal(18,6)").as("price")), root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      GraftSqlTables.register("st14_src", GraftSqlTables.Entry(root,
        s"$base/manifest.tsv", keys = Seq("id"), cdf = true))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW st14_mv LOCATION '$base/mv' AS " +
          "SELECT status, count(*) AS n, sum(price) AS sp " +
          "FROM st14_src GROUP BY status")
      // DML wave 1, then one AvailableNow maintenance pass
      GraftSql.execute(s, "DELETE FROM st14_src WHERE id % 13 = 5")
      GraftSql.execute(s,
        "UPDATE st14_src SET price = price * 2 WHERE id % 11 = 3")
      val q1 = GraftMvs.maintainer(s, "st14_mv", s"$base/ckpt",
        availableNow = true)
      try q1.awaitTermination() finally q1.stop()
      val desc1 = GraftSql.execute(s, "DESCRIBE MATERIALIZED VIEW st14_mv")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      require(desc1("is_fresh") == "true",
        "st14: the drained maintainer must leave the view fresh")
      // DML wave 2, then a RESTART on the same checkpoint — the
      // refresh layer's exactly-once means only the new delta folds
      GraftSql.execute(s, "DELETE FROM st14_src WHERE id % 17 = 2")
      val q2 = GraftMvs.maintainer(s, "st14_mv", s"$base/ckpt",
        availableNow = true)
      try q2.awaitTermination() finally q2.stop()
      val desc2 = GraftSql.execute(s, "DESCRIBE MATERIALIZED VIEW st14_mv")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      require(desc2("is_fresh") == "true",
        "st14: the restarted maintainer must re-converge the view")
      val out = GraftMvs.read(s, "st14_mv").select(col("status"),
        col("n"), col("sp").cast("double").as("sp"))
      GraftSql.execute(s, "DROP MATERIALIZED VIEW st14_mv")
      out
    }),

    // Multi-dim star materialized view (round 11): the reference's
    // actual rollup shape — one fact joined to SEVERAL dims (the
    // per-account rollup remaps against five, orders.py:120-140).
    // Maintenance folds ΔF ⋈ D1 ⋈ D2 when ALL dims are unmoved (the
    // single-dim bag-semantics identity applies dim-by-dim: each join
    // is a fact-side enrich, no dim references another); ANY dim
    // moved → one full recompute with group deaths. In-query plan
    // asserts pin serve → stale → serve around both arms. At 100 TB
    // the star dashboard never re-joins the fact: refresh cost is
    // O(fact delta ⋈ broadcast dims) + O(touched groups).
    "s41_mv_star" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val base = java.nio.file.Files
        .createTempDirectory("graft_s41_").toString
      def reg(tag: String, rows: org.apache.spark.sql.DataFrame,
              keys: Seq[String]): String = {
        val root = s"$base/$tag"
        val man = new TxnManifest(s"$base/$tag.manifest.tsv")
        StatsSinks.appendBatchStats(rows, root, 0)
        man.commit(0, Seq(s"$root/batch=0"))
        GraftSqlTables.register(s"s41_$tag", GraftSqlTables.Entry(root,
          s"$base/$tag.manifest.tsv", keys = keys, cdf = true))
        root
      }
      // id-grain pre-agg: (l_orderkey, l_linenumber) is not unique in
      // the synthetic data (same rationale as s38)
      val factRoot = reg("fact", Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 8 === 0).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_suppkey").as("sk"), col("l_partkey").as("pk"),
        col("l_quantity").cast("decimal(18,6)").as("qty"))
        .groupBy(col("id")).agg(
          min(col("sk")).as("sk"), min(col("pk")).as("pk"),
          sum(col("qty")).cast("decimal(18,6)").as("qty")), Seq("id"))
      reg("dim1", Tables.supplier(s, d).select(
        col("s_suppkey").as("k"),
        (col("s_nationkey").cast("int") % 7).as("nk")), Seq("k"))
      reg("dim2", Tables.part(s, d).select(
        col("p_partkey").as("pkk"),
        (col("p_size").cast("int") % 10).as("bnum")), Seq("pkk"))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s41_mv LOCATION '$base/mv' AS " +
          "SELECT d1.nk, d2.bnum, count(*) AS n, sum(f.qty) AS sq " +
          "FROM s41_fact f JOIN s41_dim1 d1 ON f.sk = d1.k " +
          "JOIN s41_dim2 d2 ON f.pk = d2.pkk GROUP BY d1.nk, d2.bnum")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s41_mv")
      val q = "SELECT d1.nk, d2.bnum, count(*) AS n, sum(f.qty) AS sq " +
        "FROM s41_fact f JOIN s41_dim1 d1 ON f.sk = d1.k " +
        "JOIN s41_dim2 d2 ON f.pk = d2.pkk GROUP BY d1.nk, d2.bnum"
      require(!GraftSql.execute(s, q).queryExecution.executedPlan
        .toString.contains(factRoot),
        "s41: a fresh 2-dim star MV must serve the star query")
      // fact wave → the incremental arm: ΔF ⋈ D1 ⋈ D2 folds
      GraftSql.execute(s, "DELETE FROM s41_fact WHERE id % 7 = 2")
      require(GraftSql.execute(s, q).queryExecution.executedPlan
        .toString.contains(factRoot),
        "s41: a stale star MV must never serve")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s41_mv")
      // ONE dim relabel → the full-recompute arm, group deaths included
      GraftSql.execute(s, "UPDATE s41_dim2 SET bnum = bnum % 4")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s41_mv")
      require(!GraftSql.execute(s, q).queryExecution.executedPlan
        .toString.contains(factRoot),
        "s41: the refreshed star MV must serve again")
      val out = GraftMvs.read(s, "s41_mv").select(col("nk"), col("bnum"),
        col("n"), col("sq").cast("double").as("sq"))
      GraftMvs.drop("s41_mv")
      out
    }),

    // MV-on-MV chain (round 12): the summary pyramid — a parent view
    // whose FROM is another registered MATERIALIZED VIEW. The parent's
    // feed is the CHILD STORE's own manifest CDF (every MV store merge
    // commits cdf=true exactly for this), transformed per image
    // through the child's declared-output projection, so refresh cost
    // stays O(child delta) + O(touched parent groups) all the way up
    // the pyramid. Refresh order is bottom-up, like any downstream
    // incremental consumer; cycles refuse loudly at CREATE. In-query
    // asserts pin the freshness chain: base DML leaves the PARENT
    // fresh (its source — the child's store — hasn't moved) until the
    // child refreshes, then the parent folds the child's delta.
    "s45_mv_chain" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val base = java.nio.file.Files
        .createTempDirectory("graft_s45_").toString
      val root = s"$base/src"
      val man = new TxnManifest(s"$base/src.manifest.tsv")
      StatsSinks.appendBatchStats(Tables.orders(s, d)
        .filter(col("o_orderkey") % 2 === 1).select(
        col("o_orderkey").as("id"), col("o_orderstatus").as("status"),
        (col("o_custkey") % 23).as("cust_b"),
        col("o_totalprice").cast("decimal(18,6)").as("price")), root, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      GraftSqlTables.register("s45_src", GraftSqlTables.Entry(root,
        s"$base/src.manifest.tsv", keys = Seq("id"), cdf = true))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s45_daily LOCATION '$base/mv1' AS " +
          "SELECT status, cust_b, count(*) AS n, sum(price) AS sp " +
          "FROM s45_src GROUP BY status, cust_b")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s45_daily")
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s45_total LOCATION '$base/mv2' AS " +
          "SELECT status, sum(n) AS total_n, count(*) AS n_buckets, " +
          "sum(sp) AS total_sp FROM s45_daily GROUP BY status")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s45_total")
      def fresh(n: String): Boolean = GraftSql.execute(s,
        s"DESCRIBE MATERIALIZED VIEW $n").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
        .apply("is_fresh") == "true"
      require(fresh("s45_daily") && fresh("s45_total"),
        "s45: both levels fresh after the bottom-up bootstrap")
      // base DML: the CHILD goes stale; the PARENT stays fresh (its
      // source — the child's STORE — has not moved yet)
      GraftSql.execute(s, "DELETE FROM s45_src WHERE id % 19 = 3")
      GraftSql.execute(s,
        "UPDATE s45_src SET price = price * 2 WHERE id % 31 = 7")
      require(!fresh("s45_daily"),
        "s45: base DML must stale the child")
      require(fresh("s45_total"),
        "s45: the parent tracks the child's STORE, which hasn't moved")
      // bottom-up: child folds the base delta; the child's merge
      // commits CDF, so the parent folds the CHILD's delta next
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s45_daily")
      require(!fresh("s45_total"),
        "s45: the child's refresh commit stales the parent")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s45_total")
      require(fresh("s45_total"),
        "s45: the parent refresh re-converges the pyramid")
      val out = GraftMvs.read(s, "s45_total").select(col("status"),
        col("total_n"), col("n_buckets"),
        col("total_sp").cast("double").as("total_sp"))
      GraftSql.execute(s, "DROP MATERIALIZED VIEW s45_total")
      GraftSql.execute(s, "DROP MATERIALIZED VIEW s45_daily")
      out
    }),

    // LEFT OUTER star materialized view (round 12): the reference's
    // WORKHORSE remap is a left join (orders.py:120-140,
    // locations.py:154-158) — facts with unresolved FKs must be KEPT,
    // grouped under NULL dim attributes, where an INNER star would
    // silently drop them. Maintenance: Δ(F ⟕ D1 ⟕ D2) = ΔF ⟕ D1 ⟕ D2
    // while dims are unmoved (the bag-semantics identity holds for
    // fact-preserving left joins dim-by-dim); a dim INSERT that flips
    // a NULL-extension is a dim move → the full-recompute arm. The
    // store merges on the canonical __gkey encoding because the
    // NULL-extension groups' key columns are genuinely NULL (SQL `=`
    // never matches NULL). In-query plan asserts pin serve → stale →
    // serve around both arms, plus "the INNER twin never serves".
    "s44_mv_left_star" -> ((s, d) => {
      import graft.plans.{GraftMvs, GraftSql, GraftSqlTables}
      import graft.sources.{StatsSinks, TxnManifest}
      val base = java.nio.file.Files
        .createTempDirectory("graft_s44_").toString
      def reg(tag: String, rows: org.apache.spark.sql.DataFrame,
              keys: Seq[String]): (String, TxnManifest) = {
        val root = s"$base/$tag"
        val man = new TxnManifest(s"$base/$tag.manifest.tsv")
        StatsSinks.appendBatchStats(rows, root, 0)
        man.commit(0, Seq(s"$root/batch=0"))
        GraftSqlTables.register(s"s44_$tag", GraftSqlTables.Entry(root,
          s"$base/$tag.manifest.tsv", keys = keys, cdf = true))
        (root, man)
      }
      // id-grain pre-agg (same rationale as s41); dims are SUBSETS so
      // some fact FKs stay unresolved — the left join's whole point
      val (factRoot, _) = reg("fact", Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 8 === 0).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_suppkey").as("sk"), col("l_partkey").as("pk"),
        col("l_quantity").cast("decimal(18,6)").as("qty"))
        .groupBy(col("id")).agg(
          min(col("sk")).as("sk"), min(col("pk")).as("pk"),
          sum(col("qty")).cast("decimal(18,6)").as("qty")), Seq("id"))
      reg("dim1", Tables.supplier(s, d)
        .filter(col("s_suppkey") % 5 =!= 2).select(
        col("s_suppkey").as("k"),
        (col("s_nationkey").cast("int") % 7).as("nk")), Seq("k"))
      val (_, d2man) = reg("dim2", Tables.part(s, d)
        .filter(col("p_partkey") % 3 =!= 1).select(
        col("p_partkey").as("pkk"),
        (col("p_size").cast("int") % 10).as("bnum")), Seq("pkk"))
      GraftSql.execute(s,
        s"CREATE MATERIALIZED VIEW s44_mv LOCATION '$base/mv' AS " +
          "SELECT d1.nk, d2.bnum, count(*) AS n, sum(f.qty) AS sq " +
          "FROM s44_fact f LEFT JOIN s44_dim1 d1 ON f.sk = d1.k " +
          "LEFT JOIN s44_dim2 d2 ON f.pk = d2.pkk GROUP BY d1.nk, d2.bnum")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s44_mv")
      val q = "SELECT d1.nk, d2.bnum, count(*) AS n, sum(f.qty) AS sq " +
        "FROM s44_fact f LEFT JOIN s44_dim1 d1 ON f.sk = d1.k " +
        "LEFT JOIN s44_dim2 d2 ON f.pk = d2.pkk GROUP BY d1.nk, d2.bnum"
      require(!GraftSql.execute(s, q).queryExecution.executedPlan
        .toString.contains(factRoot),
        "s44: a fresh LEFT star MV must serve the LEFT star query")
      require(GraftSql.execute(s, q.replace("LEFT JOIN", "JOIN"))
        .queryExecution.executedPlan.toString.contains(factRoot),
        "s44: the INNER twin must never serve from a LEFT view")
      // fact wave (NULL-extension groups touched too) → the fold arm
      GraftSql.execute(s, "DELETE FROM s44_fact WHERE id % 7 = 2")
      require(GraftSql.execute(s, q).queryExecution.executedPlan
        .toString.contains(factRoot),
        "s44: a stale LEFT star MV must never serve")
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s44_mv")
      // dim INSERT flipping NULL-extensions (missing parts arrive) →
      // a dim move → the full-recompute arm regroups those facts
      val d2root = GraftSqlTables.lookup(Seq("s44_dim2")).get.root
      StatsSinks.appendBatchStats(Tables.part(s, d)
        .filter(col("p_partkey") % 6 === 1).select(
        col("p_partkey").as("pkk"), lit(77).as("bnum")), d2root, 1)
      d2man.commit(1, Seq(s"$d2root/batch=1"))
      GraftSql.execute(s, "REFRESH MATERIALIZED VIEW s44_mv")
      require(!GraftSql.execute(s, q).queryExecution.executedPlan
        .toString.contains(factRoot),
        "s44: the refreshed LEFT star MV must serve again")
      val out = GraftMvs.read(s, "s44_mv").select(col("nk"), col("bnum"),
        col("n"), col("sq").cast("double").as("sq"))
      require(out.filter(col("nk").isNull).limit(1).count() > 0,
        "s44: unresolved-FK facts must survive under NULL dim attrs")
      GraftMvs.drop("s44_mv")
      out
    }),

    // CHECK constraints (round-7 continuation) — the reference's
    // integrity-assert-and-abort (`custom_err.py:1-6`) as Delta's
    // declarative `ADD CONSTRAINT ... CHECK`: a violating INSERT
    // aborts WHOLE (its valid rows must not land either — the
    // transactional contract the reference gets from engine.begin()),
    // a valid MERGE passes, and the final state is exactly
    // base+merge. The abort is asserted in-query: reaching the final
    // SELECT with the oracle-predicted rows proves both arms.
    "s25_sql_constraints" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      o.createOrReplaceTempView("s25_orders")
      o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 1.1).as("o_totalprice"))
        .createOrReplaceTempView("s25_upd")
      o.filter(col("o_orderkey") % 100 === 0)
        .select((col("o_orderkey") + 30000000L).as("o_orderkey"),
          col("o_orderstatus"), (col("o_totalprice") * -1).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") % 200 === 0)
          .select((col("o_orderkey") + 40000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice")))
        .createOrReplaceTempView("s25_bad")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s25_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.chk")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.chk (
           |  o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE
           |) USING `graft-manifest` TBLPROPERTIES ('keys' = 'o_orderkey')
           |""".stripMargin)
      GraftSql.execute(s, s"INSERT INTO $cat.chk SELECT * FROM s25_orders")
      GraftSql.execute(s,
        s"ALTER TABLE $cat.chk ADD CONSTRAINT price_pos " +
          "CHECK (o_totalprice > 0)")
      // the violating batch carries VALID rows too — the abort must
      // drop them with it, or the final row count betrays it
      val aborted =
        try {
          GraftSql.execute(s, s"INSERT INTO $cat.chk SELECT * FROM s25_bad")
          false
        } catch {
          case e: IllegalArgumentException => e.getMessage.contains("price_pos")
        }
      require(aborted, "violating INSERT must abort naming the constraint")
      GraftSql.execute(s,
        s"""MERGE INTO $cat.chk AS t USING s25_upd AS src
           |ON t.o_orderkey = src.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      GraftSql.execute(s,
        s"SELECT o_orderkey, o_orderstatus, o_totalprice FROM $cat.chk")
    }),

    // Column DEFAULT values (round-7 continuation): declared at
    // CREATE (`c STRING DEFAULT 'NEW'`), filled by the column-list
    // INSERT for unlisted columns and by MERGE's partial INSERT list
    // — the ANSI/Delta rule the round-6 NULL-fill approximated. The
    // oracle predicts the defaulted columns exactly.
    "s26_sql_defaults" -> ((s, d) => {
      import graft.plans.GraftSql
      val o = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      o.createOrReplaceTempView("s26_orders")
      o.filter(col("o_orderkey") % 100 === 0)
        .select((col("o_orderkey") + 50000000L).as("o_orderkey"))
        .createOrReplaceTempView("s26_new")
      val cat = "graft"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.plans.GraftCatalog].getName)
      if (s.conf.getOption(s"spark.sql.catalog.$cat.warehouse").isEmpty)
        s.conf.set(s"spark.sql.catalog.$cat.warehouse",
          java.nio.file.Files.createTempDirectory("graft_s26_wh_").toString)
      GraftSql.execute(s, s"DROP TABLE IF EXISTS $cat.defs")
      GraftSql.execute(s,
        s"""CREATE TABLE $cat.defs (
           |  o_orderkey BIGINT,
           |  o_orderstatus STRING DEFAULT 'NEW',
           |  o_totalprice DOUBLE DEFAULT 0.0
           |) USING `graft-manifest` TBLPROPERTIES ('keys' = 'o_orderkey')
           |""".stripMargin)
      GraftSql.execute(s,
        s"""INSERT INTO $cat.defs (o_orderkey, o_totalprice)
           |SELECT o_orderkey, o_totalprice FROM s26_orders""".stripMargin)
      GraftSql.execute(s,
        s"""MERGE INTO $cat.defs AS t USING s26_new AS s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN NOT MATCHED THEN INSERT (o_orderkey)
           |  VALUES (s.o_orderkey)""".stripMargin)
      GraftSql.execute(s,
        s"SELECT o_orderkey, o_orderstatus, o_totalprice FROM $cat.defs")
    }),

    // Conditional WHEN MATCHED clauses — the CDC op-routing idiom
    // (round 7): `WHEN MATCHED AND s.op = 'D' THEN DELETE / WHEN
    // MATCHED AND s.op = 'U' THEN UPDATE SET *` routes each matched
    // row by its flag, and a matched row claimed by NEITHER clause
    // (op 'K' here, carrying decoy values that must NOT land) stays
    // byte-untouched — the semantics round 6's all-or-nothing update
    // arm could not express. The oracle routes the same flags in SQL.
    "s21_merge_conditional" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables}
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s21_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      GraftSqlTables.register("s21_t",
        GraftSqlTables.Entry(root, s"$base/manifest.tsv", keys = Seq("o_orderkey")))
      o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"), lit("U").as("op"))
        .unionAll(o.filter(col("o_orderkey") % 7 === 0 &&
            col("o_orderkey") % 10 =!= 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), lit("D").as("op")))
        .unionAll(o.filter(col("o_orderkey") % 13 === 0 &&
            col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey"), lit("DECOY").as("o_orderstatus"),
            lit(-1.0).as("o_totalprice"), lit("K").as("op")))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice"),
            lit("U").as("op")))
        .createOrReplaceTempView("s21_src")
      try {
        GraftSql.execute(s,
          """MERGE INTO s21_t AS t USING s21_src AS s
            |ON t.o_orderkey = s.o_orderkey
            |WHEN MATCHED AND s.op = 'D' THEN DELETE
            |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        Sinks.readCommitted(s, root, man)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      } finally GraftSqlTables.unregister("s21_t")
    }),

    // Conditional INSERT with expression VALUES (round 7): the
    // second half of Delta's clause surface — `WHEN NOT MATCHED AND
    // pred THEN INSERT (cols) VALUES (exprs over s)` gates which new
    // rows enter and computes their columns (unlisted columns land
    // NULL — here the list is total, so none do). Matched rows take
    // a column-level update in the same statement. The oracle routes
    // and computes identically in SQL.
    "s22_merge_insert_expr" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables}
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s22_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      GraftSqlTables.register("s22_t",
        GraftSqlTables.Entry(root, s"$base/manifest.tsv", keys = Seq("o_orderkey")))
      o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), (col("o_totalprice") * 0.25).as("bump"))
        .unionAll(o.filter(col("o_orderkey") % 500 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"),
            (col("o_totalprice") * 0.5).as("bump")))
        .createOrReplaceTempView("s22_src")
      try {
        GraftSql.execute(s,
          """MERGE INTO s22_t AS t USING s22_src AS s
            |ON t.o_orderkey = s.o_orderkey
            |WHEN MATCHED THEN UPDATE SET
            |  t.o_totalprice = t.o_totalprice + s.bump
            |WHEN NOT MATCHED AND s.o_orderkey % 1000 = 0 THEN INSERT
            |  (o_orderkey, o_orderstatus, o_totalprice)
            |  VALUES (s.o_orderkey, concat('Z', s.o_orderstatus),
            |          s.o_totalprice + s.bump)""".stripMargin)
        Sinks.readCommitted(s, root, man)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      } finally GraftSqlTables.unregister("s22_t")
    }),

    // The full-sync triple — one atomic MERGE expressing "make the
    // target mirror the source, and FLAG what the source no longer
    // has": UPDATE SET * for matched, INSERT * for new, and the
    // round-7 arm `WHEN NOT MATCHED BY SOURCE AND pred THEN UPDATE`
    // marking unmatched target rows in place (`active = false` shape)
    // instead of deleting them. One commit, one feed entry. The
    // oracle predicts all three arms in plain SQL.
    "s20_full_sync" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables}
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s20_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      GraftSqlTables.register("s20_t",
        GraftSqlTables.Entry(root, s"$base/manifest.tsv", keys = Seq("o_orderkey")))
      o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("S").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") % 500 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice")))
        .createOrReplaceTempView("s20_src")
      try {
        GraftSql.execute(s,
          """MERGE INTO s20_t AS t USING s20_src AS s
            |ON t.o_orderkey = s.o_orderkey
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *
            |WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'O'
            |  THEN UPDATE SET t.o_orderstatus = 'I'""".stripMargin)
        Sinks.readCommitted(s, root, man)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      } finally GraftSqlTables.unregister("s20_t")
    }),

    // TIMESTAMP AS OF time travel — Delta's "the table as of
    // yesterday 09:00" idiom over the manifest layer. The claim
    // tombstones carry commit times as file mtimes (pinned here so
    // the query is deterministic); one DSv2 read resolves a
    // between-commits timestamp to the PRE-merge state, another a
    // post-merge timestamp to the current state, and the oracle
    // predicts both snapshots in plain SQL. A wrong version
    // resolution surfaces as rows from the wrong side of the merge.
    "s14_ts_travel" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s14_").toString
      val root = s"$base/t"
      val manPath = s"$base/manifest.tsv"
      val man = new TxnManifest(manPath)
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      val updates = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("T").as("o_orderstatus"),
          (col("o_totalprice") * 3).as("o_totalprice"))
      Sinks.mergeUpsert(s, updates, root, man, Seq("o_orderkey"), mergeId = 2)
      for ((v, t) <- Seq(1 -> 1000L, 2 -> 2000L, 3 -> 3000L))
        java.nio.file.Files.setLastModifiedTime(
          java.nio.file.Paths.get(s"$manPath.v$v"),
          java.nio.file.attribute.FileTime.fromMillis(t))
      def at(ts: Long) = s.read.format("graft-manifest")
        .option("manifest", manPath).option("timestampAsOf", ts.toString)
        .load(root)
      at(2500L).withColumn("snap", lit("pre"))
        .unionByName(at(3500L).withColumn("snap", lit("post")))
    }),

    // Change data feed: the row-level deltas a MERGE emits while it
    // already holds the matched pre-images — downstream incremental
    // consumers read (from, to] and get update pre/post images,
    // inserts, and deletes instead of re-reading batches (the
    // reference's whole CDC idiom, `accounts.py:36-41`, upgraded to
    // row granularity). readChanges serves merge batches from their
    // `_cdf` sidecar; the oracle predicts every change row in SQL.
    // Delta's `table_changes` TVF — the SQL-text change-feed read
    // (round-7 continuation): the st5 scenario consumed as
    // `SELECT ... FROM table_changes('<t>', 2, 2)` (inclusive batch
    // ids, Delta's startingVersion shape), resolving to the same
    // DSv2 changeFeed scan. The TVF composes inside a normal query
    // (projection ordering here); the oracle is st5's.
    "st8_sql_table_changes" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables}
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_st8_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      val updates = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice")))
      val deletes = o.filter(col("o_orderkey") % 7 === 0 &&
          col("o_orderkey") % 10 =!= 0)
        .select("o_orderkey")
      Sinks.merge(s, Some(updates), Some(deletes), root, man,
        Seq("o_orderkey"), mergeId = 2, cdf = true)
      GraftSqlTables.register("st8_t",
        GraftSqlTables.Entry(root, s"$base/manifest.tsv",
          keys = Seq("o_orderkey")))
      try GraftSql.execute(s,
        """SELECT o_orderkey, o_orderstatus, o_totalprice,
          |  _change_type, _commit_batch
          |FROM table_changes('st8_t', 2, 2)""".stripMargin)
      finally GraftSqlTables.unregister("st8_t")
    }),

    "st5_cdf_read" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_st5_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      val updates = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice")))
      val deletes = o.filter(col("o_orderkey") % 7 === 0 &&
          col("o_orderkey") % 10 =!= 0)
        .select("o_orderkey")
      Sinks.merge(s, Some(updates), Some(deletes), root, man,
        Seq("o_orderkey"), mergeId = 2, cdf = true)
      Sinks.readChanges(s, root, man, fromBatch = 1, toBatch = 2)
    }),

    // STREAMING change data feed — st5's row-level deltas consumed
    // continuously (Delta readChangeFeed as a micro-batch stream):
    // `.option("changeFeed", "true")` on the graft-manifest source.
    // Two stream runs against one checkpoint, the real consumer
    // lifecycle: the first serves committed history as inserts
    // (_change_type rides as a partition value — zero bytes per
    // row), then a MERGE lands while the consumer is down, and the
    // restart serves ONLY the merge's recorded deltas from its _cdf
    // sidecar, exactly once, never a replay of the rewrite's kept
    // rows. The oracle predicts the full sunk feed in plain SQL.
    "st6_cdf_stream" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_st6_").toString
      val root = s"$base/t"
      val manPath = s"$base/manifest.tsv"
      val man = new TxnManifest(manPath)
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      val outDir = s"$base/out"
      def run(): Unit = {
        val q = s.readStream.format("graft-manifest")
          .option("manifest", manPath).option("changeFeed", "true").load(root)
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", s"$base/ckpt")
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      run() // phase 1: history as inserts
      val updates = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice")))
      val deletes = o.filter(col("o_orderkey") % 7 === 0 &&
          col("o_orderkey") % 10 =!= 0)
        .select("o_orderkey")
      Sinks.merge(s, Some(updates), Some(deletes), root, man,
        Seq("o_orderkey"), mergeId = 2, cdf = true)
      run() // phase 2: only the merge's deltas
      s.read.parquet(outDir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
          "_change_type", "_commit_batch")
    }),

    // changeFeed ∘ schemaLog — the round-7 composition: a table under
    // column-mapping evolution serves its change feed under the
    // CURRENT logical names. Files and `_cdf` sidecars carry physical
    // ids (p0, p1, ...); a metadata-only RENAME between commits costs
    // zero data movement AND zero feed migration — the CDF reader
    // routes through the same mapping as the base reader, so history
    // written before the rename serves under the name a consumer uses
    // TODAY (Delta's columnMapping + CDF contract). The oracle
    // predicts the whole feed with the renamed column.
    "st7_cdf_mapped" -> ((s, d) => {
      import graft.sources.{SchemaLog, Sinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_st7_").toString
      val root = s"$base/t"
      val manPath = s"$base/manifest.tsv"
      val logPath = s"$base/schema.log"
      val man = new TxnManifest(manPath)
      val log = new SchemaLog(logPath)
      log.init(o.schema)
      for (i <- 0 to 1) {
        SchemaLog.appendBatchMapped(
          o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, log, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      // metadata-only rename mid-history: batches 0/1 predate it, yet
      // the feed serves them under the NEW name below
      log.rename("o_orderstatus", "status")
      // a real CDF consumer drains INCREMENTALLY (each range lands in
      // its sink before the next commit); draining the pre-merge
      // history after the merge would correctly fail the
      // collapsed-history gate, because the merge rewrote batch 0
      val outDir = s"$base/out"
      def drain(fromExclusive: Option[Int], to: Int): Unit =
        fromExclusive.foldLeft(
          s.read.format("graft-manifest")
            .option("manifest", manPath).option("schemaLog", logPath)
            .option("changeFeed", "true")
            .option("endingBatchId", to.toString)) { (r, f) =>
          r.option("startingBatchId", f.toString)
        }.load(root).write.mode(SaveMode.Append).parquet(outDir)
      drain(None, 1) // history as inserts, under the renamed column
      val updates = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("status"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("status"), col("o_totalprice")))
      SchemaLog.mergeUpsertMapped(s, updates, root, man, log,
        Seq("o_orderkey"), mergeId = 2, cdf = true)
      drain(Some(1), 2) // only the merge's row-level deltas
      s.read.parquet(outDir)
        .select("o_orderkey", "status", "o_totalprice",
          "_change_type", "_commit_batch")
    }),

    // The full-suite orchestrator — the reference's `main.py:41-54`
    // shape: dim/sync builders run BEFORE the facts that join against
    // them, every pipeline keeping its own watermark in ONE shared
    // store. Three chained CDC pipelines (region sync → nation dim
    // enriched from it → customer fact enriched from that), each a
    // keyset-batched Cdc.runLoop with an idempotent batch-keyed sink;
    // the oracle is the end-to-end join the chain must equal.
    "e8_full_migration" -> ((s, d) => {
      import graft.ops.Orchestrator
      import graft.ops.Orchestrator.Pipeline
      val base = java.nio.file.Files
        .createTempDirectory("graft_e8_").toString
      val store = new Cdc.WatermarkStore(s, s"$base/wm", initial = -1L)
      val syncRegion = Pipeline("sync_region", Nil, (sp, st) => {
        Cdc.runLoop(Tables.region(sp, d), "r_regionkey", "sync_region", st,
          batchSize = 3,
          df => df.select(col("r_regionkey"), upper(col("r_name")).as("region_u")),
          (b, wm) => b.write.mode(SaveMode.Overwrite)
            .parquet(s"$base/dim_region/batch=$wm"))
      })
      val dimNation = Pipeline("dim_nation", Seq("sync_region"), (sp, st) => {
        val dim = sp.read.parquet(s"$base/dim_region")
          .select("r_regionkey", "region_u")
        Cdc.runLoop(Tables.nation(sp, d), "n_nationkey", "dim_nation", st,
          batchSize = 10,
          df => df.join(broadcast(dim),
              df("n_regionkey") === dim("r_regionkey"))
            .select(df("n_nationkey"), df("n_name"), col("region_u")),
          (b, wm) => b.write.mode(SaveMode.Overwrite)
            .parquet(s"$base/dim_nation/batch=$wm"))
      })
      val factCustomer = Pipeline("fact_customer", Seq("dim_nation"), (sp, st) => {
        val dim = sp.read.parquet(s"$base/dim_nation")
        // big enough that the fact loop is 3-4 batches at sf0.1, not
        // 16 — the incremental==batch property is already exercised
        // by the region (3-row) and nation (10-row) loops upstream
        Cdc.runLoop(Tables.customer(sp, d), "c_custkey", "fact_customer", st,
          batchSize = 4999,
          df => df.join(broadcast(dim),
              df("c_nationkey") === dim("n_nationkey"))
            .select(df("c_custkey"), df("c_name"), df("c_acctbal"),
              dim("n_name"), dim("region_u")),
          (b, wm) => b.write.mode(SaveMode.Overwrite)
            .parquet(s"$base/fact_customer/batch=$wm"))
      })
      // declaration order scrambled on purpose: the ORDER comes from
      // the dependency graph, not the list
      val ran = Orchestrator.run(s, store,
        Seq(factCustomer, syncRegion, dimNation))
      require(ran.map(_._1) ==
        Seq("sync_region", "dim_nation", "fact_customer"), s"order: $ran")
      s.read.parquet(s"$base/fact_customer")
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "region_u")
    }),

    // e8's suite under the CONCURRENT runner, against the SAME oracle:
    // wave parallelism must be invisible in the results. Two
    // independent syncs (region, nation) run together on driver
    // threads in wave 1; the dim that joins them waits for BOTH; the
    // fact waits for the dim. Same end-to-end join as e8 — if the
    // wave barrier or the synchronized watermark store ever let a
    // fact start before its dims, the oracle catches it as missing or
    // stale rows, not just a spec assertion.
    "e8b_concurrent_migration" -> ((s, d) => {
      import graft.ops.Orchestrator
      import graft.ops.Orchestrator.Pipeline
      val base = java.nio.file.Files
        .createTempDirectory("graft_e8b_").toString
      val store = new Cdc.WatermarkStore(s, s"$base/wm", initial = -1L)
      val syncRegion = Pipeline("sync_region", Nil, (sp, st) => {
        Cdc.runLoop(Tables.region(sp, d), "r_regionkey", "sync_region", st,
          batchSize = 3,
          df => df.select(col("r_regionkey"), upper(col("r_name")).as("region_u")),
          (b, wm) => b.write.mode(SaveMode.Overwrite)
            .parquet(s"$base/dim_region/batch=$wm"))
      })
      val syncNation = Pipeline("sync_nation", Nil, (sp, st) => {
        Cdc.runLoop(Tables.nation(sp, d), "n_nationkey", "sync_nation", st,
          batchSize = 10,
          df => df.select("n_nationkey", "n_name", "n_regionkey"),
          (b, wm) => b.write.mode(SaveMode.Overwrite)
            .parquet(s"$base/sync_nation/batch=$wm"))
      })
      val dimNation = Pipeline("dim_nation",
        Seq("sync_region", "sync_nation"), (sp, st) => {
        val dim = sp.read.parquet(s"$base/dim_region")
          .select("r_regionkey", "region_u")
        Cdc.runLoop(sp.read.parquet(s"$base/sync_nation"),
          "n_nationkey", "dim_nation", st, batchSize = 10,
          df => df.join(broadcast(dim),
              df("n_regionkey") === dim("r_regionkey"))
            .select(df("n_nationkey"), df("n_name"), col("region_u")),
          (b, wm) => b.write.mode(SaveMode.Overwrite)
            .parquet(s"$base/dim_nation/batch=$wm"))
      })
      val factCustomer = Pipeline("fact_customer", Seq("dim_nation"), (sp, st) => {
        val dim = sp.read.parquet(s"$base/dim_nation")
        Cdc.runLoop(Tables.customer(sp, d), "c_custkey", "fact_customer", st,
          batchSize = 4999,
          df => df.join(broadcast(dim),
              df("c_nationkey") === dim("n_nationkey"))
            .select(df("c_custkey"), df("c_name"), df("c_acctbal"),
              dim("n_name"), dim("region_u")),
          (b, wm) => b.write.mode(SaveMode.Overwrite)
            .parquet(s"$base/fact_customer/batch=$wm"))
      })
      val ran = Orchestrator.runConcurrent(s, store,
        Seq(factCustomer, dimNation, syncNation, syncRegion),
        parallelism = 2)
      // wave-by-wave, names sorted: the two syncs REALLY shared wave 1
      require(ran.map(_._1) == Seq("sync_nation", "sync_region",
        "dim_nation", "fact_customer"), s"waves: $ran")
      s.read.parquet(s"$base/fact_customer")
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "region_u")
    }),

    // Semi-structured ingestion: parse the JSON props column in the
    // scan projection (from_json is codegen'd — no shuffle, no UDF;
    // the read-side twin of the C16 to_json serialization). Malformed
    // documents yield NULL fields, pandas-coerce style.
    "e7_props_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          from_json(col("props"), "k INT", Map.empty[String, String])
            .getField("k").as("k"))
        .withColumn("k_bucket", expr("k div 10"))
        .withColumn("k_even", (col("k") % 2 === 0).cast("int"))
    }),

    // Deep JSON read surface over e7's flat probe: nested
    // struct/array-of-struct extraction, higher-order traversal, and
    // the malformed-document policy real semi-structured feeds need.
    // Each event's flat props are re-shaped into a nested document
    // (meta struct + items array) with 1-in-13 docs deliberately
    // TRUNCATED mid-object; from_json runs PERMISSIVE with a
    // corrupt-record column, so broken docs surface as a flag + NULL
    // fields instead of failing the batch — the Spark-native form of
    // a DLQ split. All parsing is per-row expression work inside
    // whole-stage codegen: no shuffle, scales linearly at 100 TB.
    // (schema_of_json inference is spec-pinned in CleanseSpec — an
    // inferred-schema STRING has no DuckDB twin to hash against.)
    "e7b_nested_json" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val k = from_json(col("props"), "k INT", Map.empty[String, String])
        .getField("k")
      val doc = when(pmod(col("event_id"), lit(13)) === 0,
          lit("""{"meta": {"""))  // truncated mid-object: malformed
        .otherwise(concat(
          lit("""{"meta":{"k":"""), k.cast(StringType),
          lit(""","type":""""), col("event_type"),
          lit(""""},"items":[{"q":"""), (k * 2).cast(StringType),
          lit("""},{"q":"""), (k + 1).cast(StringType), lit("}]}")))
      val schema =
        "meta STRUCT<k: INT, type: STRING>, items ARRAY<STRUCT<q: INT>>, _corrupt STRING"
      ev.select(col("event_id"),
          from_json(doc, schema, Map(
            "mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
        .select(col("event_id"),
          col("j.meta.k").as("k_rt"),
          col("j.meta.type").as("type_rt"),
          element_at(col("j.items"), 1).getField("q").as("q0"),
          element_at(col("j.items"), 2).getField("q").as("q1"),
          aggregate(transform(col("j.items"), x => x.getField("q")),
            lit(0), (a, b) => a + b).as("q_sum"),
          col("j._corrupt").isNotNull.cast("int").as("is_corrupt"))
    }),

    // Streaming consume of the transactional manifest — the DOWNSTREAM
    // half of the CDC story (s8 is the upstream). Batches commit
    // through TxnManifest (one atomic visibility point each); the
    // consumer tails the manifest Kafka-style with a persisted
    // per-consumer offset, so a late-committed batch is picked up by
    // an incremental poll and an UNCOMMITTED orphan directory is never
    // seen at all (the orphan written below would duplicate a quarter
    // of the table if visibility leaked past the manifest).
    "st2_manifest_consume" -> ((s, d) => {
      import graft.sources.{ManifestConsumer, Sinks, TxnManifest}
      val ev = Tables.events(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft_mc_").toString
      val root = s"$base/data"
      val man = new TxnManifest(s"$base/manifest.tsv")
      // batches carry only the columns the consumer's transform reads
      // (a CDC feed ships the sink schema, not the whole source row)
      val slice = (i: Int) => ev.filter(pmod(col("event_id"), lit(4)) === i)
        .select("event_id", "user_id", "event_type", "value")
      for (i <- 0 to 2) {
        Sinks.appendBatch(slice(i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      Sinks.appendBatch(slice(1), root, 7) // crash orphan: data landed,
      // commit never happened — must stay invisible
      val store = new Cdc.WatermarkStore(s, s"$base/offsets", initial = -1L)
      val outDir = s"$base/out"
      val sink = (df: DataFrame, id: Int) => Sinks.appendBatch(
        df.select(col("event_id"), col("user_id"),
          lower(col("event_type")).as("event_type_l"),
          (col("value") * 3).as("value3")), outDir, id)
      ManifestConsumer.pollOnce(s, man, root, store, "c1")(sink)
      // a batch commits AFTER the first drain; the incremental poll
      // resumes from the persisted offset and consumes only it
      Sinks.appendBatch(slice(3), root, 3)
      man.commit(3, Seq(s"$root/batch=3"))
      ManifestConsumer.pollOnce(s, man, root, store, "c1")(sink)
      s.read.parquet(outDir)
        .select("event_id", "user_id", "event_type_l", "value3")
    }),

    // The DSv2 twin of st2: the SAME manifest-gated visibility, but
    // consumed through the planner — `readStream.format("graft-manifest")`
    // (graft.sources.GraftManifestProvider, the engine's sixth Catalyst
    // extension surface). Offsets are manifest batch ids held in
    // Spark's checkpoint WAL, so the late-committed batch arrives as
    // its own micro-batch and the uncommitted orphan (a duplicate of
    // slice 3 — it would break the hash match if visibility leaked)
    // is never read. The parquet streaming sink's _spark_metadata log
    // makes the read-back exactly-once.
    "st3_manifest_stream" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val ev = Tables.events(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft_ms_").toString
      val root = s"$base/data"
      val manPath = s"$base/manifest.tsv"
      val man = new TxnManifest(manPath)
      val slice = (i: Int) => ev.filter(pmod(col("event_id"), lit(4)) === i)
        .select("event_id", "user_id", "event_type", "value")
      for (i <- 0 to 2) {
        Sinks.appendBatch(slice(i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      Sinks.appendBatch(slice(3), root, 7) // crash orphan — stays invisible
      val outDir = s"$base/out"
      val q = s.readStream.format("graft-manifest")
        .option("manifest", manPath).load(root)
        .select(col("event_id"), col("user_id"),
          lower(col("event_type")).as("event_type_l"),
          (col("value") * 3).as("value3"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      try {
        q.processAllAvailable()
        // a batch commits while the stream is LIVE: the next trigger
        // plans ids in (prevOffset, latest] — only the new batch
        Sinks.appendBatch(slice(3), root, 9)
        man.commit(9, Seq(s"$root/batch=9"))
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(outDir)
        .select("event_id", "user_id", "event_type_l", "value3")
    }),

    // S10 at engine strength (graft.sources.SchemaLog): column-mapping
    // schema evolution on plain parquet. Batch 0 writes logical v;
    // v RENAMES to val3 touching zero data files (batch 0's values
    // surface under the new name because files carry immutable
    // PHYSICAL ids, not names); batch 1 writes through the new name;
    // flag is ADDED and earlier batches serve NULL for it. The oracle
    // reproduces the per-slice arithmetic — a hash match proves the
    // mapping resolved every batch's physical columns correctly.
    "s10_column_mapping" -> ((s, d) => {
      import graft.sources.{SchemaLog, TxnManifest}
      import org.apache.spark.sql.types._
      val ev = Tables.events(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft_cm_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/_commits")
      val log = new SchemaLog(s"$base/_schema")
      val slice = (i: Int) => ev.filter(pmod(col("event_id"), lit(4)) === i)
      log.init(StructType(Seq(StructField("id", LongType),
        StructField("v", DoubleType))))
      SchemaLog.appendBatchMapped(
        slice(0).select(col("event_id").as("id"), col("value").as("v")),
        root, log, 0)
      man.commit(0, Seq(s"$root/batch=0"))
      log.rename("v", "val3") // metadata-only
      SchemaLog.appendBatchMapped(
        slice(1).select(col("event_id").as("id"),
          (col("value") * 3).as("val3")), root, log, 1)
      man.commit(1, Seq(s"$root/batch=1"))
      log.add("flag", LongType)
      SchemaLog.appendBatchMapped(
        slice(2).select(col("event_id").as("id"), col("value").as("val3"),
          pmod(col("event_id"), lit(7)).cast("long").as("flag")),
        root, log, 2)
      man.commit(2, Seq(s"$root/batch=2"))
      SchemaLog.readCommittedMapped(s, root, man, log)
    }),

    // The full manifest circle: DSv2 SOURCE → transform → DSv2 SINK.
    // One streaming query tails manifest A and terminates into
    // manifest B (graft.sources.GraftManifestStreamingWrite): each
    // epoch writes deterministic per-partition files then commits ONE
    // manifest line — a crash between the two leaves an invisible
    // orphan a replayed epoch overwrites. The read-back goes through
    // manifest B's committed view, so the hash match certifies the
    // sink's visibility protocol end to end.
    "st4_manifest_roundtrip" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val ev = Tables.events(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft_mr_").toString
      val rootA = s"$base/in"
      val manA = new TxnManifest(s"$base/man_a.tsv")
      val slice = (i: Int) => ev.filter(pmod(col("event_id"), lit(4)) === i)
        .select("event_id", "user_id", "event_type", "value")
      for (i <- 0 to 2) {
        Sinks.appendBatch(slice(i), rootA, i)
        manA.commit(i, Seq(s"$rootA/batch=$i"))
      }
      val rootB = s"$base/out"
      val manBPath = s"$base/man_b.tsv"
      val q = s.readStream.format("graft-manifest")
        .option("manifest", s"$base/man_a.tsv").load(rootA)
        .select(col("event_id"), col("user_id"),
          lower(col("event_type")).as("event_type_l"),
          (col("value") * 3).as("value3"))
        .writeStream.format("graft-manifest")
        .option("manifest", manBPath)
        .option("path", rootB)
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        Sinks.appendBatch(slice(3), rootA, 9)
        manA.commit(9, Seq(s"$rootA/batch=9"))
        q.processAllAvailable()
      } finally q.stop()
      Sinks.readCommitted(s, rootB, new TxnManifest(manBPath))
        .select("event_id", "user_id", "event_type_l", "value3")
    }),

    // Streaming write INTO a columnMapping table (round 8): the sink
    // binds logical→physical once per query (keyed on PHYSICAL ids)
    // and pins one mapping snapshot per epoch, so the RENAME issued
    // between the two epochs below never disturbs the writer — files
    // carry physical names throughout, and the final mapped read
    // serves everything under the post-rename logical name. The
    // oracle aliases the same column, so the hash gate certifies the
    // whole mapped-sink path end to end.
    "st11_mapped_sink" -> ((s, d) => {
      import graft.sources.{SchemaLog, Sinks, TxnManifest}
      import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
      val ev = Tables.events(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft_ms_").toString
      val rootA = s"$base/in"
      val manA = new TxnManifest(s"$base/man_a.tsv")
      val slice = (i: Int) => ev.filter(pmod(col("event_id"), lit(3)) === i)
        .select("event_id", "user_id", "value")
      for (i <- 0 to 1) {
        Sinks.appendBatch(slice(i), rootA, i)
        manA.commit(i, Seq(s"$rootA/batch=$i"))
      }
      val rootB = s"$base/out"
      val manBPath = s"$base/man_b.tsv"
      val logPath = s"$base/_schema"
      val log = new SchemaLog(logPath)
      log.init(StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("value", DoubleType))))
      val q = s.readStream.format("graft-manifest")
        .option("manifest", s"$base/man_a.tsv").load(rootA)
        .writeStream.format("graft-manifest")
        .option("manifest", manBPath)
        .option("path", rootB)
        .option("schemaLog", logPath)
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // metadata-only rename BETWEEN epochs; the running stream
        // keeps writing (physical-id binding)
        log.rename("value", "amount")
        Sinks.appendBatch(slice(2), rootA, 9)
        manA.commit(9, Seq(s"$rootA/batch=9"))
        q.processAllAvailable()
      } finally q.stop()
      SchemaLog.readCommittedMapped(s, rootB, new TxnManifest(manBPath), log)
    }),

    // Streaming write INTO a BUCKETED table (round 9): the sink
    // declares clustered-on-key distribution with exactly n required
    // partitions, so Spark routes every epoch through the same
    // HashPartitioning repartition a statement INSERT applies —
    // partition id = bucket id, verified PER ROW task-side, recorded
    // as the explicit file → bucket map in the epoch's layout marker.
    // "Pay the fact-table shuffle once" therefore holds on the
    // STREAMING ingest path too (ScaleSpec pins the zero-exchange
    // join on a streamed-in table); the oracle certifies content.
    "st12_bucketed_sink" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val ev = Tables.events(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft_bs_").toString
      val rootA = s"$base/in"
      val manA = new TxnManifest(s"$base/man_a.tsv")
      val slice = (i: Int) => ev.filter(pmod(col("event_id"), lit(3)) === i)
        .select("event_id", "user_id", "value")
      for (i <- 0 to 1) {
        Sinks.appendBatch(slice(i), rootA, i)
        manA.commit(i, Seq(s"$rootA/batch=$i"))
      }
      val rootB = s"$base/out"
      val manBPath = s"$base/man_b.tsv"
      val q = s.readStream.format("graft-manifest")
        .option("manifest", s"$base/man_a.tsv").load(rootA)
        .writeStream.format("graft-manifest")
        .option("manifest", manBPath)
        .option("path", rootB)
        .option("bucketBy", "8,event_id")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        Sinks.appendBatch(slice(2), rootA, 9)
        manA.commit(9, Seq(s"$rootA/batch=9"))
        q.processAllAvailable()
      } finally q.stop()
      // the read goes through the bucketed DSv2 scan (bucket groups
      // reported from the epoch markers' file maps)
      s.read.format("graft-manifest").option("manifest", manBPath)
        .option("bucketBy", "8,event_id").load(rootB)
        .select("event_id", "user_id", "value")
    }),

    // Streaming write into a MULTI-key bucketed table (round 10): the
    // product-grid flat index is no HashPartitioning's partition id,
    // so these epochs route TASK-side — the rolling writer splits each
    // task's rows into per-bucket files (single-bucket by
    // construction) and the commit records the explicit file → bucket
    // map. ScaleSpec pins the zero-exchange join on a table ingested
    // this way; the oracle certifies content.
    "st13_multikey_sink" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      val ev = Tables.events(s, d)
      val base = java.nio.file.Files
        .createTempDirectory("graft_mks_").toString
      val rootA = s"$base/in"
      val manA = new TxnManifest(s"$base/man_a.tsv")
      val slice = (i: Int) => ev.filter(pmod(col("event_id"), lit(3)) === i)
        .select("event_id", "user_id", "value")
      for (i <- 0 to 1) {
        Sinks.appendBatch(slice(i), rootA, i)
        manA.commit(i, Seq(s"$rootA/batch=$i"))
      }
      val rootB = s"$base/out"
      val manBPath = s"$base/man_b.tsv"
      val q = s.readStream.format("graft-manifest")
        .option("manifest", s"$base/man_a.tsv").load(rootA)
        .writeStream.format("graft-manifest")
        .option("manifest", manBPath)
        .option("path", rootB)
        .option("bucketBy", "4,event_id,user_id")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        Sinks.appendBatch(slice(2), rootA, 9)
        manA.commit(9, Seq(s"$rootA/batch=9"))
        q.processAllAvailable()
      } finally q.stop()
      // the read goes through the bucketed DSv2 scan (16 bucket
      // groups reported from the epoch markers' file maps)
      s.read.format("graft-manifest").option("manifest", manBPath)
        .option("bucketBy", "4,event_id,user_id").load(rootB)
        .select("event_id", "user_id", "value")
    }),

    // RETENTION fast delete (round 9): date-sliced ingest (one batch
    // per year band — the daily-partition shape at test scale), then
    // `DELETE WHERE o_orderdate < cutoff`. The stats sidecars prove
    // every batch either fully covered or untouched, so the delete
    // commits as ONE metadata swap — zero data files read or written
    // (ScaleSpec pins the zero-read property; Sinks.retentionDelete).
    // This is the O(1) aged-slice drop `PARTITIONED BY` tables get
    // from directory naming, recovered from stats alone. The oracle
    // recomputes the surviving rows.
    "s32_retention_delete" -> ((s, d) => {
      import graft.plans.{GraftSql, GraftSqlTables}
      import graft.sources.{Sinks, StatsSinks, TxnManifest}
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_s32_").toString
      val root = s"$base/t"
      val man = new TxnManifest(s"$base/manifest.tsv")
      val cuts = Seq("1994-01-01", "1996-01-01")
      val bands = Seq(
        o.filter(col("o_orderdate") < lit(cuts(0)).cast("date")),
        o.filter(col("o_orderdate") >= lit(cuts(0)).cast("date") &&
          col("o_orderdate") < lit(cuts(1)).cast("date")),
        o.filter(col("o_orderdate") >= lit(cuts(1)).cast("date")))
      bands.zipWithIndex.foreach { case (b, i) =>
        StatsSinks.appendBatchStats(b, root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      GraftSqlTables.register("s32_t", GraftSqlTables.Entry(root,
        s"$base/manifest.tsv", keys = Seq("o_orderkey")))
      GraftSql.execute(s,
        "DELETE FROM s32_t WHERE o_orderdate < DATE '1996-01-01'")
      Sinks.readCommitted(s, root, man)
    }),

    // Event-time tumbling-window aggregation — batch form of the
    // Structured Streaming query in `graft.streaming` (SURVEY §2.9:
    // the reference's poll loop is hand-rolled micro-batching; this is
    // the Spark-native windowed equivalent).
    "st1_time_bucket" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("bucket_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          Repair.decSum(col("value")).as("sum_value"))
        .select("bucket_start", "event_type", "n", "sum_value")
    }),

    // Batch sessionization — the SAME native session_window the
    // streaming twin (EventStreams.sessionizeStream) groups on, here
    // over the full history: per-user sessions split by a 30-minute
    // inactivity gap, window end = last event + gap (Spark's
    // half-open merge rule; the oracle's gaps-and-islands uses
    // strictly-less-than to match). Session bounds travel as integer
    // microseconds — raw timestamp hashing across engines is the
    // documented ns/µs trap. Scale shape: ONE shuffle on user_id;
    // the session assembly is a per-key sort inside the aggregation,
    // never a global sort.
    "st9_sessionize" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          Repair.decSum(col("value")).as("value_sum"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          unix_micros(col("w.end")).as("session_end_us"),
          col("n_events"), col("value_sum"))
    }),

    // Streaming CDC APPLY (Delta's "apply change data with
    // foreachBatch" recipe as a library function): an upstream table's
    // change feed replicates into a DOWNSTREAM manifest table —
    // micro-batches collapse to net per-key changes and apply as one
    // atomic bootstrap-append or merge each, with the applied-epoch
    // log making restarts exactly-once. Phase 1 streams the append
    // history (downstream bootstraps), the upstream then merges
    // updates + deletes with cdf=true, phase 2 streams just those
    // deltas from the same checkpoint (st6's incremental-drain
    // discipline). The oracle predicts the REPLICA's final contents.
    "st10_cdc_apply" -> ((s, d) => {
      import graft.sources.{Sinks, TxnManifest}
      import graft.streaming.CdcApply
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Files
        .createTempDirectory("graft_st10_").toString
      val root = s"$base/src"
      val manPath = s"$base/manifest.tsv"
      val man = new TxnManifest(manPath)
      for (i <- 0 to 1) {
        Sinks.appendBatch(o.filter(pmod(col("o_orderkey"), lit(2)) === i), root, i)
        man.commit(i, Seq(s"$root/batch=$i"))
      }
      val dstRoot = s"$base/dst"
      val dstMan = s"$base/dst_manifest.tsv"
      def run(): Unit = {
        val changes = s.readStream.format("graft-manifest")
          .option("manifest", manPath).option("changeFeed", "true").load(root)
        val q = CdcApply.start(changes, dstRoot, dstMan,
          keys = Seq("o_orderkey"), checkpoint = s"$base/ckpt",
          appId = "st10")
        try q.processAllAvailable() finally q.stop()
      }
      run() // phase 1: history bootstraps the replica
      val updates = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice")))
      val deletes = o.filter(col("o_orderkey") % 7 === 0 &&
          col("o_orderkey") % 10 =!= 0)
        .select("o_orderkey")
      Sinks.merge(s, Some(updates), Some(deletes), root, man,
        Seq("o_orderkey"), mergeId = 2, cdf = true)
      run() // phase 2: just the merge's deltas
      Sinks.readCommitted(s, dstRoot, new TxnManifest(dstMan))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    })
  )

  val oracle: Map[String, String] = Map(
    "e2_orders_pipeline" ->
      """WITH preagg AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS item_total0,
        |    CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS item_discount_total0,
        |    max(l_discount) AS max_discount0
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o.o_orderkey,
        |  CASE o.o_orderstatus WHEN 'O' THEN 0 WHEN 'F' THEN 1 WHEN 'P' THEN 2 END AS status_code,
        |  coalesce(p.item_total0, 0.0) AS item_total,
        |  coalesce(p.item_discount_total0, 0.0) AS item_discount_total,
        |  coalesce(p.max_discount0, 0.0) AS max_discount,
        |  o.o_totalprice - (coalesce(p.item_total0, 0.0) - coalesce(p.item_discount_total0, 0.0)) AS amount_due,
        |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS total_dec,
        |  c.c_name, n.n_name
        |FROM orders o
        |LEFT JOIN preagg p ON o.o_orderkey = p.l_orderkey
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin,
    "e3_customer_nested" ->
      """WITH oj AS (
        |  SELECT o_custkey,
        |    '[' || string_agg('{"id":' || o_orderkey || ',"tp":"' ||
        |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '","st":"' ||
        |        o_orderstatus || '"}', ',' ORDER BY o_orderkey) || ']' AS orders_json,
        |    count(*) AS order_count,
        |    CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS first_order
        |  FROM orders GROUP BY o_custkey)
        |SELECT c.c_custkey,
        |  CASE WHEN trim(c.c_name) = '' THEN NULL ELSE trim(c.c_name) END AS name_clean,
        |  oj.orders_json, coalesce(oj.order_count, 0) AS order_count, oj.first_order
        |FROM customer c LEFT JOIN oj ON c.c_custkey = oj.o_custkey""".stripMargin,
    "e3b_nested_fanin5" ->
      """WITH junc AS (SELECT DISTINCT o_custkey, o_orderpriority FROM orders),
        |dim AS (
        |  SELECT DISTINCT o_orderpriority,
        |    CAST(substring(o_orderpriority, 1, 1) AS INT) AS pr_code
        |  FROM orders
        |  WHERE CAST(substring(o_orderpriority, 1, 1) AS INT) <= 3),
        |prio AS (
        |  SELECT j.o_custkey AS k,
        |    '[' || string_agg('{"pr":"' || j.o_orderpriority || '","code":' ||
        |      coalesce(CAST(d.pr_code AS VARCHAR), 'null') || '}',
        |      ',' ORDER BY j.o_orderpriority) || ']' AS prio_json
        |  FROM dim d RIGHT JOIN junc j USING (o_orderpriority) GROUP BY 1),
        |sjunc AS (
        |  SELECT DISTINCT o.o_custkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |supp AS (
        |  SELECT sj.o_custkey AS k,
        |    '[' || string_agg('{"sk":' || sj.l_suppkey || ',"sn":"' || s.s_name || '"}',
        |      ',' ORDER BY sj.l_suppkey) || ']' AS supp_json
        |  FROM sjunc sj JOIN supplier s ON sj.l_suppkey = s.s_suppkey GROUP BY 1),
        |soc0 AS (
        |  SELECT user_id,
        |    CASE WHEN event_type = 'click'  THEN regexp_extract(props, '"k": (\d+)', 1) END AS fb,
        |    CASE WHEN event_type = 'view'   THEN regexp_extract(props, '"k": (\d+)', 1) END AS tw,
        |    CASE WHEN event_type = 'signup' THEN regexp_extract(props, '"k": (\d+)', 1) END AS ig
        |  FROM events),
        |soc1 AS (SELECT DISTINCT * FROM soc0 WHERE coalesce(fb, tw, ig) IS NOT NULL),
        |social AS (
        |  SELECT user_id AS k,
        |    '[' || string_agg('{"fb":' ||
        |        CASE WHEN fb IS NULL THEN 'null' ELSE '"' || fb || '"' END ||
        |      ',"tw":' || CASE WHEN tw IS NULL THEN 'null' ELSE '"' || tw || '"' END ||
        |      ',"ig":' || CASE WHEN ig IS NULL THEN 'null' ELSE '"' || ig || '"' END || '}',
        |      ',' ORDER BY coalesce(fb,'') || '|' || coalesce(tw,'') || '|' || coalesce(ig,''))
        |      || ']' AS social_json
        |  FROM soc1 GROUP BY 1),
        |hours AS (
        |  SELECT o_custkey AS k,
        |    '[' || string_agg('{"d":"' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR) ||
        |      '","p":"' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '"}',
        |      ',' ORDER BY o_orderkey) || ']' AS hours_json
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
        |act AS (
        |  SELECT user_id AS k,
        |    '[' || string_agg('{"e":"' || event_type || '","v":"' ||
        |      CAST(CAST(value AS DECIMAL(18,6)) AS VARCHAR) || '"}',
        |      ',' ORDER BY event_id) || ']' AS activity_json
        |  FROM events GROUP BY 1)
        |SELECT c.c_custkey, trim(c.c_name) AS name_clean,
        |  CASE WHEN trim(c.c_mktsegment) = '' THEN NULL ELSE trim(c.c_mktsegment) END AS segment,
        |  prio.prio_json, supp.supp_json, social.social_json, hours.hours_json,
        |  act.activity_json
        |FROM customer c
        |LEFT JOIN prio   ON c.c_custkey = prio.k
        |LEFT JOIN supp   ON c.c_custkey = supp.k
        |LEFT JOIN social ON c.c_custkey = social.k
        |LEFT JOIN hours  ON c.c_custkey = hours.k
        |LEFT JOIN act    ON c.c_custkey = act.k""".stripMargin,
    "e4_cars_dates" ->
      """WITH raw AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'May ' || CAST(c_custkey % 28 + 1 AS VARCHAR) || ' 2020 8:39AM'
        |         WHEN c_custkey % 4 = 1 THEN CAST(c_custkey % 12 + 1 AS VARCHAR) || '/' || CAST(c_custkey % 28 + 1 AS VARCHAR) || '/2025 1:28:20 PM'
        |         WHEN c_custkey % 4 = 2 THEN 'garbage'
        |         ELSE NULL END AS s
        |  FROM customer),
        |parsed AS (
        |  SELECT c_custkey,
        |    coalesce(try_strptime(s, '%b %d %Y %I:%M%p'),
        |             try_strptime(s, '%m/%d/%Y %I:%M:%S %p')) AS p
        |  FROM raw),
        |junc AS (SELECT o_custkey, min(o_orderdate) AS fallback_ts
        |  FROM orders GROUP BY o_custkey)
        |SELECT r.c_custkey,
        |  coalesce(p.p, j.fallback_ts, TIMESTAMP '2000-01-01 00:00:00') AS created_at,
        |  CASE WHEN p.p IS NOT NULL THEN 'parsed'
        |       WHEN j.fallback_ts IS NOT NULL THEN 'junction'
        |       ELSE 'default' END AS repair_source
        |FROM raw r JOIN parsed p ON r.c_custkey = p.c_custkey
        |LEFT JOIN junc j ON r.c_custkey = j.o_custkey""".stripMargin,
    "e5_items_sync" ->
      """WITH keyed AS (
        |  SELECT *, lower(regexp_replace(p_name, '\s', '', 'g')) AS name_key FROM part),
        |deduped AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY p_brand, name_key
        |      ORDER BY p_retailprice DESC, p_partkey ASC) AS rn FROM keyed) t
        |  WHERE rn = 1),
        |fresh AS (
        |  SELECT * FROM deduped d WHERE NOT EXISTS (
        |    SELECT 1 FROM lineitem l WHERE l.l_partkey = d.p_partkey AND l.l_quantity > 49))
        |SELECT p_partkey AS old_item_id, p_brand, name_key,
        |  CAST(row_number() OVER (ORDER BY p_partkey) AS BIGINT) AS new_item_id
        |FROM fresh""".stripMargin,
    "e6_roles_claims" ->
      """WITH wide AS (
        |  SELECT s.s_suppkey, n.n_name AS group_name,
        |    CASE WHEN s.s_acctbal > 0 THEN 1 ELSE 0 END AS can_create,
        |    CASE WHEN s.s_suppkey % 2 = 0 THEN 1 ELSE 0 END AS can_edit,
        |    1 AS can_access
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |melted AS (
        |  SELECT s_suppkey, group_name, 'can_create' AS perm, can_create AS enabled FROM wide
        |  UNION ALL SELECT s_suppkey, group_name, 'can_edit', can_edit FROM wide
        |  UNION ALL SELECT s_suppkey, group_name, 'can_access', can_access FROM wide)
        |SELECT s_suppkey, group_name,
        |  CASE perm WHEN 'can_create' THEN 'Permissions.Account.Create'
        |            WHEN 'can_edit' THEN 'Permissions.Account.Edit'
        |            WHEN 'can_access' THEN 'Permissions.Account.Access' END AS claim
        |FROM melted WHERE enabled = 1""".stripMargin,
    "dq1_quality_report" ->
      """SELECT 'lineitem_null_partkey' AS check_name,
        |  count(CASE WHEN l_partkey IS NULL THEN 1 END) AS n_violations,
        |  count(*) AS n_total FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_high_discount',
        |  count(CASE WHEN l_discount < 0 OR l_discount > 0.08 THEN 1 END), count(*)
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_nonpositive_price',
        |  count(CASE WHEN l_extendedprice <= 0 THEN 1 END), count(*) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_qty_over_45',
        |  count(CASE WHEN l_quantity > 45 THEN 1 END), count(*) FROM lineitem
        |UNION ALL
        |SELECT 'orders_null_custkey',
        |  count(CASE WHEN o_custkey IS NULL THEN 1 END), count(*) FROM orders
        |UNION ALL
        |SELECT 'orders_unknown_status',
        |  count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END), count(*)
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem_orphaned_orderkey',
        |  count(CASE WHEN o.o_orderstatus IS NULL THEN 1 END), count(*)
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin,
    "s8_cdc_loop" ->
      """SELECT event_id, user_id, upper(event_type) AS event_type_u,
        |  value * 2 AS value2 FROM events""".stripMargin,
    "s9_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0)
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd""".stripMargin,
    "s11_merge_delete" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0),
        |del AS (
        |  SELECT o_orderkey FROM base
        |  WHERE o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  AND b.o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd""".stripMargin,
    "s12_sql_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0),
        |del AS (
        |  SELECT o_orderkey FROM base
        |  WHERE o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  AND b.o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd""".stripMargin,
    "s13_dv_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey % 7 <> 0 AND o_orderkey % 3 <> 0""".stripMargin,
    "s16_sql_insert" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders""",
    "s19_dv_update" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
        |SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 20 = 0 THEN 'Y'
        |       WHEN o_orderkey % 10 = 0 THEN 'X'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 20 = 0 THEN o_totalprice * 4
        |       WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        |FROM base
        |UNION ALL
        |SELECT o_orderkey + 10000000 AS o_orderkey,
        |  'N' AS o_orderstatus, o_totalprice
        |FROM base WHERE o_orderkey % 1000 = 0""".stripMargin,
    "s15_sql_update" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'O' AND o_orderkey % 5 = 0
        |    THEN 'P' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderstatus = 'O' AND o_orderkey % 5 = 0
        |    THEN o_totalprice * 0.9 ELSE o_totalprice END AS o_totalprice
        |FROM orders""".stripMargin,
    "s17_sql_catalog" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0)
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd""".stripMargin,
    "s18_merge_update_expr" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |src AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    o_totalprice * 0.5 AS delta
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice, 0.0 AS delta
        |  FROM base WHERE o_orderkey % 1000 = 0)
        |SELECT b.o_orderkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN 'U'
        |    ELSE b.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN b.o_totalprice + s.delta
        |    ELSE b.o_totalprice END AS o_totalprice
        |FROM base b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM base)""".stripMargin,
    "s27_sql_generated" ->
      """WITH post AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 3.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders)
        |SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_totalprice > 50000.0 THEN 'high'
        |       WHEN o_totalprice > 10000.0 THEN 'mid'
        |       ELSE 'low' END AS price_band
        |FROM post""".stripMargin,
    "s26_sql_defaults" ->
      """SELECT o_orderkey, 'NEW' AS o_orderstatus, o_totalprice
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 50000000, 'NEW', 0.0
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin,
    "s28_copy_into" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    "s33_copy_text" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    "s34_mv_incremental" ->
      """WITH src0 AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |    CASE WHEN o_orderkey % 17 = 0 THEN NULL
        |         ELSE CAST(o_totalprice AS DECIMAL(18,6)) END AS price
        |  FROM orders WHERE o_orderkey % 2 = 0
        |    AND o_orderkey % 3 IN (0, 1)),
        |final AS (
        |  SELECT id, status,
        |    CASE WHEN id % 11 = 3 THEN CAST(price * 2 AS DECIMAL(18,6))
        |         ELSE price END AS price
        |  FROM src0 WHERE NOT (id % 13 = 5))
        |SELECT status, count(*) AS n_orders, count(price) AS n_priced,
        |  CAST(sum(price) AS DOUBLE) AS sum_price
        |FROM final WHERE id % 7 != 2 GROUP BY status""".stripMargin,
    "s35_mv_minmax" ->
      """WITH kept AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |    o_custkey AS cust
        |  FROM orders
        |  WHERE o_orderkey % 2 = 0
        |    AND NOT (o_orderkey % 10 = 9) AND o_orderstatus <> 'P'),
        |final AS (
        |  SELECT * FROM kept
        |  UNION ALL
        |  SELECT * FROM (VALUES (90000001, 'O', 9000001),
        |    (90000002, 'F', 9000002),
        |    (99999999, 'Z', 424242)) v(id, status, cust))
        |SELECT status, min(id) AS min_id, max(id) AS max_id,
        |  max(cust) AS max_cust, count(*) AS n
        |FROM final GROUP BY status""".stripMargin,
    "s36_mv_distinct" ->
      """WITH src AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |    o_custkey % 97 AS cust
        |  FROM orders WHERE o_orderkey % 4 = 0),
        |final AS (
        |  SELECT id, status,
        |    CASE WHEN id % 7 = 1 THEN cust % 13 ELSE cust END AS cust
        |  FROM src WHERE NOT (id % 5 = 4))
        |SELECT status, count(DISTINCT cust) AS n_cust, count(*) AS n_rows
        |FROM final GROUP BY status""".stripMargin,
    "s37_mv_rewrite" ->
      """WITH src AS (
        |  SELECT l_orderkey * 8 + l_linenumber AS id,
        |    l_returnflag AS flag,
        |    CAST(l_quantity AS DECIMAL(18,6)) AS qty
        |  FROM lineitem WHERE l_orderkey % 4 = 0),
        |final AS (SELECT * FROM src WHERE NOT (id % 9 = 7))
        |SELECT flag, count(*) AS n_items,
        |  CAST(sum(qty) AS DOUBLE) AS sum_qty
        |FROM final WHERE flag != 'X' GROUP BY flag""".stripMargin,
    "s40_mv_timebucket" ->
      """WITH src AS (
        |  SELECT event_id AS id, ts, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE event_id % 2 = 0),
        |final AS (
        |  SELECT id, ts,
        |    CASE WHEN id % 11 = 3 THEN v + 1 ELSE v END AS v
        |  FROM src WHERE NOT (id % 6 = 5))
        |SELECT epoch_us(date_trunc('day', ts)) AS day_us,
        |  count(*) AS n, CAST(sum(v) AS DOUBLE) AS sv
        |FROM final GROUP BY 1""".stripMargin,
    "s39_mv_join_accel" ->
      """WITH fact AS (
        |  SELECT s_suppkey AS id, s_nationkey AS nk,
        |    CAST(s_acctbal AS DECIMAL(18,6)) AS bal
        |  FROM supplier WHERE NOT (s_suppkey % 4 = 0)),
        |dim AS (
        |  SELECT n_nationkey AS k, n_name AS nname FROM nation)
        |SELECT nname AS nation, count(*) AS n_sup,
        |  CAST(sum(bal) AS DOUBLE) AS sum_bal
        |FROM fact JOIN dim ON fact.nk = dim.k GROUP BY nname""".stripMargin,
    "s38_mv_join" ->
      """WITH fact0 AS (
        |  SELECT l_orderkey * 8 + l_linenumber AS id,
        |    min(l_suppkey) AS sk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
        |      AS DECIMAL(18,6)) AS qty
        |  FROM lineitem WHERE l_orderkey % 4 = 0 GROUP BY 1),
        |fact AS (
        |  SELECT id, sk, qty FROM fact0 WHERE NOT (id % 7 = 2)),
        |dim AS (
        |  SELECT s_suppkey AS k, CAST(s_nationkey AS INT) % 7 AS nk
        |  FROM supplier)
        |SELECT nk, count(*) AS n, CAST(sum(qty) AS DOUBLE) AS sq
        |FROM fact JOIN dim ON fact.sk = dim.k GROUP BY nk""".stripMargin,
    "s43_mv_snowflake" ->
      """WITH fact0 AS (
        |  SELECT l_orderkey * 8 + l_linenumber AS id,
        |    min(l_suppkey) AS sk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
        |      AS DECIMAL(18,6)) AS qty
        |  FROM lineitem WHERE l_orderkey % 8 = 4 GROUP BY 1),
        |fact AS (SELECT id, sk, qty FROM fact0 WHERE NOT (id % 5 = 2)),
        |d1 AS (
        |  SELECT s_suppkey AS k, CAST(s_nationkey AS INT) % 13 AS nk
        |  FROM supplier),
        |d2 AS (
        |  SELECT CAST(n_nationkey AS INT) AS nkk, n_name AS nname
        |  FROM nation)
        |SELECT nname, count(*) AS n, CAST(sum(qty) AS DOUBLE) AS sq
        |FROM fact JOIN d1 ON fact.sk = d1.k
        |JOIN d2 ON d1.nk = d2.nkk
        |GROUP BY nname""".stripMargin,
    "s42_mv_compound" ->
      """WITH src AS (
        |  SELECT l_orderkey * 8 + l_linenumber AS id,
        |    l_returnflag AS flag, l_linestatus AS lstat,
        |    CASE WHEN l_orderkey % 17 = 0 THEN NULL
        |         ELSE CAST(l_extendedprice AS DECIMAL(18,6)) END AS px
        |  FROM lineitem WHERE l_orderkey % 4 = 1),
        |final AS (SELECT * FROM src WHERE NOT (id % 9 = 5))
        |SELECT flag,
        |  CAST((100 * count(px)) // count(*) AS BIGINT) AS pct_priced,
        |  CAST(100 * sum(px) AS DOUBLE) AS cents
        |FROM final GROUP BY flag""".stripMargin,
    "st14_mv_maintainer" ->
      """WITH src0 AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |    CAST(o_totalprice AS DECIMAL(18,6)) AS price
        |  FROM orders WHERE o_orderkey % 2 = 1),
        |w1 AS (
        |  SELECT id, status,
        |    CASE WHEN id % 11 = 3 THEN CAST(price * 2 AS DECIMAL(18,6))
        |         ELSE price END AS price
        |  FROM src0 WHERE NOT (id % 13 = 5)),
        |final AS (SELECT * FROM w1 WHERE NOT (id % 17 = 2))
        |SELECT status, count(*) AS n, CAST(sum(price) AS DOUBLE) AS sp
        |FROM final GROUP BY status""".stripMargin,
    "s45_mv_chain" ->
      """WITH src0 AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |    o_custkey % 23 AS cust_b,
        |    CAST(o_totalprice AS DECIMAL(18,6)) AS price
        |  FROM orders WHERE o_orderkey % 2 = 1),
        |w1 AS (
        |  SELECT id, status, cust_b,
        |    CASE WHEN id % 31 = 7 THEN CAST(price * 2 AS DECIMAL(18,6))
        |         ELSE price END AS price
        |  FROM src0 WHERE NOT (id % 19 = 3)),
        |child AS (
        |  SELECT status, cust_b, count(*) AS n, sum(price) AS sp
        |  FROM w1 GROUP BY status, cust_b)
        |SELECT status, CAST(sum(n) AS BIGINT) AS total_n,
        |  count(*) AS n_buckets, CAST(sum(sp) AS DOUBLE) AS total_sp
        |FROM child GROUP BY status""".stripMargin,
    "s44_mv_left_star" ->
      """WITH fact0 AS (
        |  SELECT l_orderkey * 8 + l_linenumber AS id,
        |    min(l_suppkey) AS sk, min(l_partkey) AS pk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
        |      AS DECIMAL(18,6)) AS qty
        |  FROM lineitem WHERE l_orderkey % 8 = 0 GROUP BY 1),
        |fact AS (
        |  SELECT id, sk, pk, qty FROM fact0 WHERE NOT (id % 7 = 2)),
        |dim1 AS (
        |  SELECT s_suppkey AS k, CAST(s_nationkey AS INT) % 7 AS nk
        |  FROM supplier WHERE s_suppkey % 5 <> 2),
        |dim2 AS (
        |  SELECT p_partkey AS pkk, CAST(p_size AS INT) % 10 AS bnum
        |  FROM part WHERE p_partkey % 3 <> 1
        |  UNION ALL
        |  SELECT p_partkey AS pkk, 77 AS bnum
        |  FROM part WHERE p_partkey % 6 = 1)
        |SELECT nk, bnum, count(*) AS n, CAST(sum(qty) AS DOUBLE) AS sq
        |FROM fact LEFT JOIN dim1 ON fact.sk = dim1.k
        |LEFT JOIN dim2 ON fact.pk = dim2.pkk
        |GROUP BY nk, bnum""".stripMargin,
    "s41_mv_star" ->
      """WITH fact0 AS (
        |  SELECT l_orderkey * 8 + l_linenumber AS id,
        |    min(l_suppkey) AS sk, min(l_partkey) AS pk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
        |      AS DECIMAL(18,6)) AS qty
        |  FROM lineitem WHERE l_orderkey % 8 = 0 GROUP BY 1),
        |fact AS (
        |  SELECT id, sk, pk, qty FROM fact0 WHERE NOT (id % 7 = 2)),
        |dim1 AS (
        |  SELECT s_suppkey AS k, CAST(s_nationkey AS INT) % 7 AS nk
        |  FROM supplier),
        |dim2 AS (
        |  SELECT p_partkey AS pkk, (CAST(p_size AS INT) % 10) % 4 AS bnum
        |  FROM part)
        |SELECT nk, bnum, count(*) AS n, CAST(sum(qty) AS DOUBLE) AS sq
        |FROM fact JOIN dim1 ON fact.sk = dim1.k
        |JOIN dim2 ON fact.pk = dim2.pkk
        |GROUP BY nk, bnum""".stripMargin,
    "s29_sql_clone" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'C' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0),
        |cl AS (
        |  SELECT * FROM (
        |    SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |    WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |    UNION ALL
        |    SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd)
        |  WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)),
        |extra AS (
        |  SELECT o_orderkey + 40000000 AS o_orderkey, 'E' AS o_orderstatus,
        |    0.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 100 = 0)
        |SELECT 'clone' AS side, o_orderkey, o_orderstatus, o_totalprice
        |FROM cl
        |UNION ALL
        |SELECT 'src' AS side, o_orderkey, o_orderstatus, o_totalprice
        |FROM (SELECT * FROM base UNION ALL SELECT * FROM extra)
        |UNION ALL
        |SELECT 'snap' AS side, o_orderkey, o_orderstatus, o_totalprice
        |FROM base
        |UNION ALL
        |SELECT 'grand' AS side, o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
        |       ELSE o_totalprice END AS o_totalprice
        |FROM cl""".stripMargin,
    "s25_sql_constraints" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'U'
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders""".stripMargin,
    "s31_sql_identity" ->
      """SELECT
        |  CAST((SELECT count(*) FROM orders) +
        |       (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 0)
        |    AS BIGINT) AS n_rows,
        |  CAST((SELECT count(*) FROM orders) +
        |       (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 0)
        |    AS BIGINT) AS n_ids,
        |  CAST(1 AS INT) AS batches_monotone,
        |  CAST(0 AS INT) AS step_violations,
        |  CAST(100 AS BIGINT) AS first_id""".stripMargin,
    "s30_sql_widen" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(o_orderkey % 1000 AS BIGINT) AS v,
        |    CAST(CAST(o_totalprice AS FLOAT) AS DOUBLE) AS f FROM orders),
        |big AS (
        |  SELECT o_orderkey + 30000000 AS k,
        |    CAST(o_orderkey AS BIGINT) * 10000000000 AS v,
        |    CAST(o_totalprice AS DOUBLE) AS f
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |allr AS (SELECT * FROM base UNION ALL SELECT * FROM big)
        |SELECT k, CASE WHEN k % 10 = 0 THEN v + 1 ELSE v END AS v, f
        |FROM allr""".stripMargin,
    "s24_sql_alter" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice AS price
        |  FROM orders),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN price + price * 0.5
        |         ELSE price END AS price
        |  FROM base
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', price
        |  FROM base WHERE o_orderkey % 1000 = 0)
        |SELECT o_orderkey, o_orderstatus, price,
        |  CAST(NULL AS VARCHAR) AS note
        |FROM merged
        |UNION ALL
        |SELECT o_orderkey + 20000000, 'Z', price, 'late'
        |FROM base WHERE o_orderkey % 500 = 0""".stripMargin,
    "s23_sql_time_travel" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'T' AS o_orderstatus,
        |    o_totalprice * 3 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, 'pre' AS snap
        |FROM base
        |UNION ALL
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice,
        |  'post' AS snap
        |FROM base b
        |WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice, 'post' AS snap
        |FROM upd""".stripMargin,
    "s21_merge_conditional" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0),
        |del AS (
        |  SELECT o_orderkey FROM base
        |  WHERE o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  AND b.o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd""".stripMargin,
    "s22_merge_insert_expr" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
        |SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0
        |    THEN o_totalprice + o_totalprice * 0.25
        |    ELSE o_totalprice END AS o_totalprice
        |FROM base
        |UNION ALL
        |SELECT o_orderkey + 10000000 AS o_orderkey,
        |  'Z' || o_orderstatus AS o_orderstatus,
        |  o_totalprice + o_totalprice * 0.5 AS o_totalprice
        |FROM base WHERE o_orderkey % 1000 = 0""".stripMargin,
    "s20_full_sync" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |src AS (
        |  SELECT o_orderkey, 'S' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 500 = 0)
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
        |UNION ALL
        |SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'O' THEN 'I'
        |    ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice
        |FROM base WHERE o_orderkey % 3 <> 0""".stripMargin,
    "s14_ts_travel" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'T' AS o_orderstatus,
        |    o_totalprice * 3 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, 'pre' AS snap
        |FROM base
        |UNION ALL
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice,
        |  'post' AS snap
        |FROM base b
        |WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice, 'post' AS snap
        |FROM upd""".stripMargin,
    // identical scenario and deltas as st5 — the TVF is the same read
    "st8_sql_table_changes" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0),
        |del AS (
        |  SELECT o_orderkey FROM base
        |  WHERE o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0),
        |matched AS (
        |  SELECT o_orderkey FROM upd
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM base))
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice,
        |  'update_preimage' AS _change_type, 2 AS _commit_batch
        |FROM base b WHERE b.o_orderkey IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT u.o_orderkey, u.o_orderstatus, u.o_totalprice,
        |  'update_postimage', 2
        |FROM upd u WHERE u.o_orderkey IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT u.o_orderkey, u.o_orderstatus, u.o_totalprice, 'insert', 2
        |FROM upd u WHERE u.o_orderkey NOT IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice, 'delete', 2
        |FROM base b WHERE b.o_orderkey IN (SELECT o_orderkey FROM del)""".stripMargin,
    "st5_cdf_read" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0),
        |del AS (
        |  SELECT o_orderkey FROM base
        |  WHERE o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0),
        |matched AS (
        |  SELECT o_orderkey FROM upd
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM base))
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice,
        |  'update_preimage' AS _change_type, 2 AS _commit_batch
        |FROM base b WHERE b.o_orderkey IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT u.o_orderkey, u.o_orderstatus, u.o_totalprice,
        |  'update_postimage', 2
        |FROM upd u WHERE u.o_orderkey IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT u.o_orderkey, u.o_orderstatus, u.o_totalprice, 'insert', 2
        |FROM upd u WHERE u.o_orderkey NOT IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice, 'delete', 2
        |FROM base b WHERE b.o_orderkey IN (SELECT o_orderkey FROM del)""".stripMargin,
    "st7_cdf_mapped" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS status,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS status, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0),
        |matched AS (
        |  SELECT o_orderkey FROM upd
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM base))
        |SELECT o_orderkey, o_orderstatus AS status, o_totalprice,
        |  'insert' AS _change_type,
        |  CAST(o_orderkey % 2 AS INTEGER) AS _commit_batch
        |FROM base
        |UNION ALL
        |SELECT b.o_orderkey, b.o_orderstatus AS status, b.o_totalprice,
        |  'update_preimage' AS _change_type, 2 AS _commit_batch
        |FROM base b WHERE b.o_orderkey IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT u.o_orderkey, u.status, u.o_totalprice,
        |  'update_postimage', 2
        |FROM upd u WHERE u.o_orderkey IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT u.o_orderkey, u.status, u.o_totalprice, 'insert', 2
        |FROM upd u
        |WHERE u.o_orderkey NOT IN (SELECT o_orderkey FROM matched)""".stripMargin,
    "st6_cdf_stream" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0),
        |del AS (
        |  SELECT o_orderkey FROM base
        |  WHERE o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0),
        |matched AS (
        |  SELECT o_orderkey FROM upd
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM base))
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  'insert' AS _change_type,
        |  CAST(o_orderkey % 2 AS INTEGER) AS _commit_batch
        |FROM base
        |UNION ALL
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice,
        |  'update_preimage' AS _change_type, 2 AS _commit_batch
        |FROM base b WHERE b.o_orderkey IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT u.o_orderkey, u.o_orderstatus, u.o_totalprice,
        |  'update_postimage', 2
        |FROM upd u WHERE u.o_orderkey IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT u.o_orderkey, u.o_orderstatus, u.o_totalprice, 'insert', 2
        |FROM upd u WHERE u.o_orderkey NOT IN (SELECT o_orderkey FROM matched)
        |UNION ALL
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice, 'delete', 2
        |FROM base b WHERE b.o_orderkey IN (SELECT o_orderkey FROM del)""".stripMargin,
    "e8_full_migration" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  upper(r_name) AS region_u
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "e8b_concurrent_migration" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  upper(r_name) AS region_u
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "e7_props_json" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |  CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS k_bucket,
        |  CAST(CAST(json_extract(props, '$.k') AS INTEGER) % 2 = 0 AS INTEGER) AS k_even
        |FROM events""".stripMargin,
    "e7b_nested_json" ->
      """WITH base AS (
        |  SELECT event_id, event_type,
        |    CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |    event_id % 13 = 0 AS corrupt
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN corrupt THEN NULL ELSE k END AS k_rt,
        |  CASE WHEN corrupt THEN NULL ELSE event_type END AS type_rt,
        |  CASE WHEN corrupt THEN NULL ELSE k * 2 END AS q0,
        |  CASE WHEN corrupt THEN NULL ELSE k + 1 END AS q1,
        |  CASE WHEN corrupt THEN NULL ELSE 3 * k + 1 END AS q_sum,
        |  CAST(corrupt AS INTEGER) AS is_corrupt
        |FROM base""".stripMargin,
    "st2_manifest_consume" ->
      """SELECT event_id, user_id, lower(event_type) AS event_type_l,
        |  value * 3 AS value3
        |FROM events""".stripMargin,
    "s10_column_mapping" ->
      """SELECT event_id AS id,
        |  CASE WHEN event_id % 4 = 1 THEN value * 3 ELSE value END AS val3,
        |  CASE WHEN event_id % 4 = 2 THEN event_id % 7 ELSE NULL END AS flag
        |FROM events WHERE event_id % 4 < 3""".stripMargin,
    "st3_manifest_stream" ->
      """SELECT event_id, user_id, lower(event_type) AS event_type_l,
        |  value * 3 AS value3
        |FROM events""".stripMargin,
    "st4_manifest_roundtrip" ->
      """SELECT event_id, user_id, lower(event_type) AS event_type_l,
        |  value * 3 AS value3
        |FROM events""".stripMargin,
    "st11_mapped_sink" ->
      """SELECT event_id, user_id, value AS amount FROM events""".stripMargin,
    "st12_bucketed_sink" ->
      """SELECT event_id, user_id, value FROM events""".stripMargin,
    "st13_multikey_sink" ->
      """SELECT event_id, user_id, value FROM events""".stripMargin,
    "s32_retention_delete" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |WHERE o_orderdate >= DATE '1996-01-01'""".stripMargin,
    "st1_time_bucket" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "st9_sessionize" ->
      """WITH x AS (SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
        |  FROM events),
        |s AS (SELECT user_id, ts, value,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |                      ROWS UNBOUNDED PRECEDING) AS sess FROM x)
        |SELECT user_id,
        |  epoch_us(min(ts)) AS session_start_us,
        |  epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        |FROM s GROUP BY user_id, sess""".stripMargin,
    "st10_cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 1000 = 0),
        |del AS (SELECT o_orderkey FROM base
        |  WHERE o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  AND b.o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd""".stripMargin
  )
}
