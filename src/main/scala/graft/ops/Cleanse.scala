package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** String / numeric cleansing operators (SURVEY.md §2.7 C1-C3, C7-C11).
  *
  * All of these are pure `Column` expressions: they stay inside
  * whole-stage codegen, vectorize over parquet batches, and carry no
  * per-row JVM closure cost — the property that makes them safe on a
  * 100 TB scan. The reference implements each as a pandas
  * `Series.apply` lambda (single-threaded, row-at-a-time).
  */
object Cleanse {

  /** C1 — trim; empty string (and optionally the literal 'NULL' text) → NULL.
    * Reference: `accounts.py:72-76`, `locations.py:98-100`, `cars.py:70-72`.
    */
  def stripToNull(c: Column, nullLiterals: Seq[String] = Seq("")): Column = {
    val t = trim(c)
    when(t.isin(nullLiterals.map(_.trim): _*), lit(null).cast(StringType)).otherwise(t)
  }

  /** C1 applied schema-driven to every string column except `keep`
    * (the reference exempts designated "name" columns, `locations.py:98-100`). */
  def stripToNullAll(df: DataFrame, keep: Set[String] = Set.empty): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType && !keep.contains(f.name) => f.name
    }
    stringCols.foldLeft(df)((d, n) => d.withColumn(n, stripToNull(col(n))))
  }

  /** F4 — `dropna(subset, how='all')` (`locations.py:138`): keep rows
    * where AT LEAST ONE of `cols` is non-null. A single `coalesce`
    * chain, pushed to the scan like any filter. `coalesce` needs a
    * common type, so heterogeneous subsets are cast to string first —
    * only null-ness matters. */
  def dropNaAll(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(coalesce(cols.map(c => col(c).cast(StringType)): _*).isNotNull)

  /** C2 — phone normalizer, exact port of the reference semantics
    * (`utils/tools.py:15-27`):
    *   1. keep only characters in `[+0-9]`; empty → NULL
    *   2. strip all leading '0's
    *   3. starts with '5' → "+966" + first 12 chars
    *      starts with '9' → "+"    + first 14 chars
    *      otherwise      →          first 15 chars
    * Pure expression (regexp + when chain) — no UDF.
    */
  def cleanContact(c: Column): Column = {
    val digits   = regexp_replace(c, "[^+0-9]", "")
    val stripped = regexp_replace(digits, "^0+", "")
    when(c.isNull || digits === "", lit(null).cast(StringType))
      .when(stripped.startsWith("5"), concat(lit("+966"), substring(stripped, 1, 12)))
      .when(stripped.startsWith("9"), concat(lit("+"), substring(stripped, 1, 14)))
      .otherwise(substring(stripped, 1, 15))
  }

  /** C3 — two-format date parse with NULL on failure
    * (`utils/tools.py:30-40`: `%b %d %Y %I:%M%p` then `%m/%d/%Y %I:%M:%S %p`).
    * Java patterns use non-padded fields to match Python's lenient parse.
    */
  def parseDate2(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("MMM d yyyy h:mma")),
      try_to_timestamp(c, lit("M/d/yyyy h:mm:ss a")))

  /** C7 — `pd.to_numeric(errors='coerce')`: bad input → NULL (`accounts.py:85`). */
  def toNumeric(c: Column): Column = try_cast_double(c)

  private def try_cast_double(c: Column): Column = c.try_cast(DoubleType)

  /** C8 — 6-dp rounding + out-of-domain (|x| > 999) → NULL
    * (`locations.py:75-80`). Implemented as a DECIMAL(18,6) round-trip:
    * bit-for-bit deterministic across engines, unlike double `round`. */
  def latLong(c: Column): Column = {
    val n = try_cast_double(c)
    when(abs(n) > 999, lit(null).cast(DoubleType))
      .otherwise(n.cast("decimal(18,6)").cast(DoubleType))
  }

  /** C9 — upper-case normalization (NormalizedEmail, `customers.py:86`). */
  def normalizeUpper(c: Column): Column = upper(c)

  /** C10 — lower + whitespace-strip lookup key (`items.py:107-109`). */
  def normKey(c: Column): Column = lower(regexp_replace(c, "\\s", ""))

  /** C11 — whitelist: value kept only if ∈ `allowed`, else NULL
    * (`locations.py:89`: LandmarkID ∈ {1,2,3}). */
  def whitelist(c: Column, allowed: Seq[Any]): Column =
    when(c.isin(allowed: _*), c).otherwise(lit(null))
}
