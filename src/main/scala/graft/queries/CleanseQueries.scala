package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.Tables
import graft.ops._

/** Scalar-function operator queries (SURVEY.md §2.7 C1-C18, §2.6 R1-R2,
  * §2.4 A3/A6) — the cleanse / repair / recode / reshape surface of the
  * reference, exercised over deterministic synthesized inputs derived
  * from the testdata keys (the testdata itself is clean, so edge cases
  * — empty strings, 'NULL' literals, junk phones, bad dates, zero
  * denominators — are constructed identically in Spark and oracle SQL).
  */
object CleanseQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // C1 — strip→NULL cleanse incl. the literal-'NULL' pollution of
    // `cars.py:70-72`.
    "c1_strip_to_null" -> ((s, d) => {
      val raw = when(col("c_custkey") % 5 === 0, lit("  NULL "))
        .when(col("c_custkey") % 7 === 0, lit("   "))
        .otherwise(concat(lit("  "), col("c_name"), lit(" ")))
      Tables.customer(s, d)
        .select(col("c_custkey"),
          Cleanse.stripToNull(raw, Seq("", "NULL")).as("cleaned"))
    }),

    // C2 — `clean_contact` phone normalizer (`utils/tools.py:15-27`).
    "c2_phone_clean" -> ((s, d) => {
      val k = col("c_custkey").cast(StringType)
      val phone = when(col("c_custkey") % 11 === 0, lit("abc"))
        .when(col("c_custkey") % 4 === 0, concat(lit("050-"), k))
        .when(col("c_custkey") % 4 === 1, concat(lit("00966 5"), k))
        .when(col("c_custkey") % 4 === 2, concat(lit("(971)"), k))
        .otherwise(concat(lit("12 34"), k))
      Tables.customer(s, d)
        .select(col("c_custkey"), phone.as("phone_raw"),
          Cleanse.cleanContact(phone).as("phone"))
    }),

    // C3 — two-format varchar date parse with NULL fallthrough
    // (`utils/tools.py:30-40`, used `cars.py:115-116`).
    "c3_date_parse" -> ((s, d) => {
      val day = (col("doc_id") % 28 + 1).cast(StringType)
      val mon = (col("doc_id") % 12 + 1).cast(StringType)
      val raw = when(col("doc_id") % 4 === 0,
          concat(lit("May "), day, lit(" 2020 8:39AM")))
        .when(col("doc_id") % 4 === 1,
          concat(mon, lit("/"), day, lit("/2025 1:28:20 PM")))
        .when(col("doc_id") % 4 === 2, lit("not a date"))
        .otherwise(lit(null).cast(StringType))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"), Cleanse.parseDate2(raw).as("parsed"))
    }),

    // C5/C6 — fillna with constant and from a sibling column
    // (`orders.py:99-108`, `accounts.py:80-81`).
    "c5_fillna" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = when(col("event_id") % 5 === 0, lit(null).cast(DoubleType))
        .otherwise(col("value"))
      ev.select(col("event_id"),
        Repair.fillConst(v, 0.0).as("v_const"),
        Repair.fillFrom(v, col("value") * 2).as("v_sibling"))
    }),

    // C7/C8/C11 — to_numeric coerce, lat/long domain repair, whitelist
    // (`accounts.py:85`, `locations.py:75-89`).
    "c7_coerce_domain" -> ((s, d) => {
      val numstr = when(col("doc_id") % 3 === 0, lit("abc"))
        .when(col("doc_id") % 3 === 1,
          concat(col("doc_id").cast(StringType), lit(".25")))
        .otherwise(lit(""))
      val latraw = (col("doc_id") * 37 % 2500 - 1200).cast(DoubleType) + lit(0.015625)
      Tables.documents(s, d).select(col("doc_id"),
        Cleanse.toNumeric(numstr).as("num"),
        Cleanse.latLong(latraw).as("lat"),
        Cleanse.whitelist(col("lang"), Seq("en", "de", "fr")).as("lang_wl"))
    }),

    // C9/C10 — case/whitespace normalization (`customers.py:86`,
    // `items.py:107-109`).
    "c9_normalize" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_custkey"),
        Cleanse.normalizeUpper(col("c_mktsegment")).as("seg_upper"),
        Cleanse.normKey(concat(col("c_name"), lit(" X"))).as("norm_key"))
    }),

    // C12 — dict-literal recode, strict and keep-fallback
    // (`countries.py:60-308`, `sync_cities.py:74`).
    "c12_recode" -> ((s, d) => {
      val m = Map("NATION_1" -> "N01", "NATION_2" -> "N02", "NATION_13" -> "N13")
      Tables.nation(s, d).select(col("n_nationkey"), col("n_name"),
        Recode.recodeStrict(col("n_name"), m).as("code_strict"),
        Recode.recodeOrKeep(col("n_name"), m).as("code_keep"))
    }),

    // C13/C17/C18 — flag derivation, constant columns, conditional
    // keyed fill (`warehouses.py:79`, `accounts.py:83`, `locations.py:90`).
    "c13_flags_consts" -> ((s, d) => {
      val m = when(col("c_custkey") % 4 === 0, lit(null).cast(StringType))
        .otherwise(col("c_mktsegment"))
      Tables.customer(s, d).select(col("c_custkey"),
        Repair.flag(col("c_acctbal") < 0).as("is_negative"),
        lit(1).as("status_id"),
        Repair.fillWhere(m, col("c_nationkey") < 10, "DOMESTIC").as("segment_fixed"))
    }),

    // C14 — derived measures with division guards
    // (`order_line_items.py:99-107`, `orders.py:115-117`).
    "c14_derived_measures" -> ((s, d) => {
      val li  = Tables.lineitem(s, d)
      val qty = when(col("l_linenumber") % 4 === 0, lit(0.0)).otherwise(col("l_quantity"))
      val unitPrice   = Repair.ratioGuarded(col("l_extendedprice"), qty)
      val discountAmt = col("l_extendedprice") * col("l_discount")
      li.select(col("l_orderkey"), col("l_linenumber"),
        unitPrice.as("unit_price"),
        (unitPrice * qty).as("subtotal"),
        discountAmt.as("discount_amt"),
        Repair.ratioGuarded(discountAmt * 100, col("l_extendedprice")).as("discount_pct"),
        Repair.flag(col("l_discount") >= 0.08).as("is_high_discount"))
    }),

    // C4 — fix_order_checkout accounting-identity repair
    // (`utils/tools.py:43-55`, applied `orders.py:114`).
    "c4_checkout_repair" -> ((s, d) => {
      val o    = Tables.orders(s, d)
      val sub  = when(col("o_orderkey") % 3 === 0, lit(0.0)).otherwise(col("o_totalprice"))
      val gt   = when(col("o_orderkey") % 3 === 1, lit(0.0)).otherwise(col("o_totalprice") * 1.15)
      val tax  = when(col("o_orderkey") % 3 === 2, lit(0.0)).otherwise(col("o_totalprice") * 0.15)
      val disc = when(col("o_orderkey") % 5 === 0, lit(10.0)).otherwise(lit(0.0))
      val (subR, gtR, taxR) = Repair.fixCheckout(sub, gt, tax, disc)
      o.select(col("o_orderkey"), subR.as("subtotal"), gtR.as("grand_total"),
        taxR.as("tax_total"), disc.as("discount_total"))
    }),

    // C15 — "+1 year" renewal date (`subscriptions.py:65`); emitted as
    // ISO string for engine-neutral comparison.
    "c15_date_offset" -> ((s, d) => {
      Tables.orders(s, d).select(col("o_orderkey"),
        Repair.plusOneYear(col("o_orderdate")).cast(StringType).as("renewal_date"))
    }),

    // R1 — unpivot/melt wide→EAV (`location_settings.py:89-93`).
    "r1_unpivot" -> ((s, d) => {
      val wide = Tables.part(s, d).select(col("p_partkey"),
        col("p_size").cast(DoubleType).as("size"), col("p_retailprice").as("retail"))
      Reshape.melt(wide, Seq("p_partkey"), Seq("size", "retail"), "key", "value")
    }),

    // R2 — melt permission flags + claim-string mapping (`roles.py:96-108`).
    "r2_melt_claims" -> ((s, d) => {
      val m = Map("can_create" -> "Permissions.Supplier.Create",
        "can_edit" -> "Permissions.Supplier.Edit",
        "can_access" -> "Permissions.Supplier.Access")
      val wide = Tables.supplier(s, d).select(col("s_suppkey"),
        Repair.flag(col("s_acctbal") > 0).as("can_create"),
        Repair.flag(col("s_nationkey") % 2 === 0).as("can_edit"),
        lit(1).as("can_access"))
      Reshape.melt(wide, Seq("s_suppkey"), Seq("can_create", "can_edit", "can_access"),
        "perm", "enabled")
        .filter(col("enabled") === 1)
        .select(col("s_suppkey"), col("perm"),
          Recode.recodeStrict(col("perm"), m).as("claim"))
    }),

    // A3/C16 — group child rows → deterministic JSON array string
    // (`locations.py:123-166`). The array is ordered by child key on
    // both engines; JSON built with explicit formatting so the bytes
    // (not just the semantics) match the oracle.
    "a3_json_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val item = concat(lit("{\"id\":"), col("o_orderkey"),
        lit(",\"st\":\""), col("o_orderstatus"), lit("\"}"))
      o.select(col("o_custkey"), col("o_orderkey"), item.as("item"))
        .groupBy("o_custkey")
        .agg(concat(lit("["),
          array_join(transform(
            sort_array(collect_list(struct(col("o_orderkey"), col("item")))),
            x => x.getField("item")), ","),
          lit("]")).as("orders_json"))
    }),

    // A6 — group sizes / value_counts (`Roles/notebook.ipynb`).
    "a6_group_sizes" -> ((s, d) =>
      Tables.events(s, d).groupBy("event_type").agg(count(lit(1)).as("n"))),

    // Window running total — beyond the reference (SURVEY §2.4 notes no
    // windowed aggregates exist there); standard analytics surface,
    // decimal-quantized for cross-engine determinism.
    "w1_running_sum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(18,6)")).over(w)
          .cast(DoubleType).as("running_value"))
    }),

    // Window lag delta — beyond the reference; per-row double subtract.
    "w2_lag_delta" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"))
    })
  )

  private val cleanContactSql =
    """CASE WHEN regexp_replace(phone, '[^+0-9]', '', 'g') = '' THEN NULL
      |     WHEN regexp_replace(regexp_replace(phone, '[^+0-9]', '', 'g'), '^0+', '') LIKE '5%'
      |       THEN '+966' || substr(regexp_replace(regexp_replace(phone, '[^+0-9]', '', 'g'), '^0+', ''), 1, 12)
      |     WHEN regexp_replace(regexp_replace(phone, '[^+0-9]', '', 'g'), '^0+', '') LIKE '9%'
      |       THEN '+' || substr(regexp_replace(regexp_replace(phone, '[^+0-9]', '', 'g'), '^0+', ''), 1, 14)
      |     ELSE substr(regexp_replace(regexp_replace(phone, '[^+0-9]', '', 'g'), '^0+', ''), 1, 15)
      |END""".stripMargin

  val oracle: Map[String, String] = Map(
    "c1_strip_to_null" ->
      """WITH raw AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN '  NULL '
        |         WHEN c_custkey % 7 = 0 THEN '   '
        |         ELSE '  ' || c_name || ' ' END AS s
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN trim(s) IN ('', 'NULL') THEN NULL ELSE trim(s) END AS cleaned
        |FROM raw""".stripMargin,
    "c2_phone_clean" ->
      s"""WITH raw AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN 'abc'
        |         WHEN c_custkey % 4 = 0 THEN '050-' || CAST(c_custkey AS VARCHAR)
        |         WHEN c_custkey % 4 = 1 THEN '00966 5' || CAST(c_custkey AS VARCHAR)
        |         WHEN c_custkey % 4 = 2 THEN '(971)' || CAST(c_custkey AS VARCHAR)
        |         ELSE '12 34' || CAST(c_custkey AS VARCHAR) END AS phone
        |  FROM customer)
        |SELECT c_custkey, phone AS phone_raw, $cleanContactSql AS phone FROM raw""".stripMargin,
    "c3_date_parse" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN 'May ' || CAST(doc_id % 28 + 1 AS VARCHAR) || ' 2020 8:39AM'
        |         WHEN doc_id % 4 = 1 THEN CAST(doc_id % 12 + 1 AS VARCHAR) || '/' || CAST(doc_id % 28 + 1 AS VARCHAR) || '/2025 1:28:20 PM'
        |         WHEN doc_id % 4 = 2 THEN 'not a date'
        |         ELSE NULL END AS raw
        |  FROM documents)
        |SELECT doc_id, raw,
        |  coalesce(try_strptime(raw, '%b %d %Y %I:%M%p'),
        |           try_strptime(raw, '%m/%d/%Y %I:%M:%S %p')) AS parsed
        |FROM raw""".stripMargin,
    "c5_fillna" ->
      """WITH t AS (
        |  SELECT event_id, value,
        |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, coalesce(v, 0.0) AS v_const,
        |  coalesce(v, value * 2) AS v_sibling FROM t""".stripMargin,
    "c7_coerce_domain" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 3 = 0 THEN 'abc'
        |         WHEN doc_id % 3 = 1 THEN CAST(doc_id AS VARCHAR) || '.25'
        |         ELSE '' END AS numstr,
        |    CAST(doc_id * 37 % 2500 - 1200 AS DOUBLE) + 0.015625 AS latraw
        |  FROM documents)
        |SELECT doc_id, try_cast(numstr AS DOUBLE) AS num,
        |  CASE WHEN abs(latraw) > 999 THEN NULL
        |       ELSE CAST(CAST(latraw AS DECIMAL(18,6)) AS DOUBLE) END AS lat,
        |  CASE WHEN lang IN ('en','de','fr') THEN lang ELSE NULL END AS lang_wl
        |FROM t""".stripMargin,
    "c9_normalize" ->
      """SELECT c_custkey, upper(c_mktsegment) AS seg_upper,
        |  lower(regexp_replace(c_name || ' X', '\s', '', 'g')) AS norm_key
        |FROM customer""".stripMargin,
    "c12_recode" ->
      """SELECT n_nationkey, n_name,
        |  CASE n_name WHEN 'NATION_1' THEN 'N01' WHEN 'NATION_2' THEN 'N02'
        |              WHEN 'NATION_13' THEN 'N13' ELSE NULL END AS code_strict,
        |  coalesce(CASE n_name WHEN 'NATION_1' THEN 'N01' WHEN 'NATION_2' THEN 'N02'
        |              WHEN 'NATION_13' THEN 'N13' ELSE NULL END, n_name) AS code_keep
        |FROM nation""".stripMargin,
    "c13_flags_consts" ->
      """WITH t AS (
        |  SELECT c_custkey, c_acctbal, c_nationkey,
        |    CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_mktsegment END AS m
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS is_negative,
        |  1 AS status_id,
        |  CASE WHEN c_nationkey < 10 AND m IS NULL THEN 'DOMESTIC' ELSE m END AS segment_fixed
        |FROM t""".stripMargin,
    "c14_derived_measures" ->
      """WITH t AS (
        |  SELECT *, CASE WHEN l_linenumber % 4 = 0 THEN 0.0 ELSE l_quantity END AS qty
        |  FROM lineitem),
        |u AS (
        |  SELECT *, CASE WHEN qty IS NULL OR qty = 0 THEN 0.0
        |                 ELSE l_extendedprice / qty END AS unit_price
        |  FROM t)
        |SELECT l_orderkey, l_linenumber, unit_price,
        |  unit_price * qty AS subtotal,
        |  l_extendedprice * l_discount AS discount_amt,
        |  CASE WHEN l_extendedprice IS NULL OR l_extendedprice = 0 THEN 0.0
        |       ELSE (l_extendedprice * l_discount * 100) / l_extendedprice END AS discount_pct,
        |  CASE WHEN l_discount >= 0.08 THEN 1 ELSE 0 END AS is_high_discount
        |FROM u""".stripMargin,
    "c4_checkout_repair" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 0.0 ELSE o_totalprice END AS sub,
        |    CASE WHEN o_orderkey % 3 = 1 THEN 0.0 ELSE o_totalprice * 1.15 END AS gt,
        |    CASE WHEN o_orderkey % 3 = 2 THEN 0.0 ELSE o_totalprice * 0.15 END AS tax,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 10.0 ELSE 0.0 END AS disc
        |  FROM orders),
        |p AS (
        |  SELECT *,
        |    CASE WHEN sub IS NOT NULL AND sub <> 0 THEN 1 ELSE 0 END AS pa,
        |    CASE WHEN gt IS NOT NULL AND gt <> 0 THEN 1 ELSE 0 END AS pb,
        |    CASE WHEN tax IS NOT NULL AND tax <> 0 THEN 1 ELSE 0 END AS pc
        |  FROM t)
        |SELECT o_orderkey,
        |  CASE WHEN pa + pb + pc = 2 AND pa = 0 THEN gt - tax + disc ELSE sub END AS subtotal,
        |  CASE WHEN pa + pb + pc = 2 AND pa = 1 AND pb = 0 THEN sub - disc + tax ELSE gt END AS grand_total,
        |  CASE WHEN pa + pb + pc = 2 AND pa = 1 AND pb = 1 THEN gt - sub + disc ELSE tax END AS tax_total,
        |  disc AS discount_total
        |FROM p""".stripMargin,
    "c15_date_offset" ->
      """SELECT o_orderkey,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 12 MONTH AS DATE) AS VARCHAR) AS renewal_date
        |FROM orders""".stripMargin,
    "r1_unpivot" ->
      """SELECT p_partkey, 'size' AS key, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'retail' AS key, p_retailprice AS value FROM part""".stripMargin,
    "r2_melt_claims" ->
      """WITH wide AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_acctbal > 0 THEN 1 ELSE 0 END AS can_create,
        |    CASE WHEN s_nationkey % 2 = 0 THEN 1 ELSE 0 END AS can_edit,
        |    1 AS can_access
        |  FROM supplier),
        |melted AS (
        |  SELECT s_suppkey, 'can_create' AS perm, can_create AS enabled FROM wide
        |  UNION ALL SELECT s_suppkey, 'can_edit', can_edit FROM wide
        |  UNION ALL SELECT s_suppkey, 'can_access', can_access FROM wide)
        |SELECT s_suppkey, perm,
        |  CASE perm WHEN 'can_create' THEN 'Permissions.Supplier.Create'
        |            WHEN 'can_edit' THEN 'Permissions.Supplier.Edit'
        |            WHEN 'can_access' THEN 'Permissions.Supplier.Access' END AS claim
        |FROM melted WHERE enabled = 1""".stripMargin,
    "a3_json_agg" ->
      """SELECT o_custkey,
        |  '[' || string_agg('{"id":' || o_orderkey || ',"st":"' || o_orderstatus || '"}',
        |                    ',' ORDER BY o_orderkey) || ']' AS orders_json
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "a6_group_sizes" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "w1_running_sum" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,6)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,
    "w2_lag_delta" ->
      """SELECT event_id, user_id,
        |  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM events""".stripMargin
  )
}
