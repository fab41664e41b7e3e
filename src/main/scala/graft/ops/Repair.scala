package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Null-repair and derived-measure operators (SURVEY.md §2.7 C4-C6,
  * C13-C15, C18). All pure column expressions — codegen'd, no UDFs.
  */
object Repair {

  /** C5 — `fillna(constant)` (`orders.py:99-108` and dozens more). */
  def fillConst(c: Column, k: Any): Column = coalesce(c, lit(k))

  /** C6 — `fillna` from another column (CreatedAt ← UpdatedAt,
    * `accounts.py:80-81`). */
  def fillFrom(c: Column, other: Column): Column = coalesce(c, other)

  /** C4 — `fix_order_checkout` (`utils/tools.py:43-55`): if exactly two
    * of {subtotal, grandTotal, tax} are "present", derive the third via
    * the accounting identity
    *   grandTotal = subtotal - discountTotal + tax.
    *
    * "Present" in the reference is Python truthiness (`1 if row[x] else 0`),
    * i.e. non-zero — with the quirk that NaN is truthy in Python. Our
    * engine defines present := non-null AND non-zero, which matches the
    * reference on every row the reference's own `fillna(0)` upstream
    * (`orders.py:101-107`) has already normalized, and is well-defined
    * on nulls. Returns the repaired (subtotal, grandTotal, tax) triple.
    */
  def fixCheckout(subtotal: Column, grandTotal: Column, tax: Column,
                  discountTotal: Column): (Column, Column, Column) = {
    def present(c: Column): Column =
      when(c.isNotNull && c =!= 0.0, 1).otherwise(0)
    val nPresent = present(subtotal) + present(grandTotal) + present(tax)
    val two      = nPresent === 2
    val subR = when(two && present(subtotal) === 0,
      grandTotal - tax + discountTotal).otherwise(subtotal)
    val gtR = when(two && present(subtotal) === 1 && present(grandTotal) === 0,
      subtotal - discountTotal + tax).otherwise(grandTotal)
    val taxR = when(two && present(subtotal) === 1 && present(grandTotal) === 1,
      grandTotal - subtotal + discountTotal).otherwise(tax)
    (subR, gtR, taxR)
  }

  /** C14 — guarded ratio: pandas unguarded division yields inf on /0
    * (`order_line_items.py:107`); the reference guards the orders-level
    * variant to 0 (`orders.py:117`). Engine semantics: guarded → `ifZero`. */
  def ratioGuarded(num: Column, den: Column, ifZero: Double = 0.0): Column =
    when(den.isNull || den === 0.0, lit(ifZero)).otherwise(num / den)

  /** C14 — mutual backfill of discount total/percent (`orders.py:116-117`):
    * total==0 → percent*subtotal/100 ; percent==0 → total/subtotal (0-guard). */
  def discountBackfill(total: Column, percent: Column, subtotal: Column)
      : (Column, Column) = {
    val totalR   = when(total === 0.0, percent * subtotal / 100).otherwise(total)
    val percentR = when(percent === 0.0, ratioGuarded(totalR, subtotal)).otherwise(percent)
    (totalR, percentR)
  }

  /** C13 — boolean flag derivation (`warehouses.py:79`,
    * `order_line_items.py:112`). Emitted as 0/1 int like the reference. */
  def flag(cond: Column): Column = when(cond, 1).otherwise(0)

  /** C15 — "+1 year" date offset (`subscriptions.py:65`). */
  def plusOneYear(c: Column): Column = add_months(c.cast("date"), 12)

  /** C18 — conditional constant fill keyed on another column
    * (`locations.py:90`: CountryID=='SA' & CityID null → 4101). */
  def fillWhere(c: Column, cond: Column, k: Any): Column =
    when(cond && c.isNull, lit(k)).otherwise(c)

  /** Deterministic cross-engine aggregation of a double measure:
    * quantize to DECIMAL(18,6) (exact, order-independent sum) and
    * surface as double. Plain `sum(double)` is order-dependent at the
    * last ulp and can't be hash-compared across engines — and at 100 TB
    * the partial-aggregation order is nondeterministic anyway. */
  def decSum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast(DoubleType)

  /** Deterministic mean built from decSum / count (avoids Spark's
    * decimal-avg scale rules differing from DuckDB's).
    *
    * Divides by the NON-NULL count — pandas `Series.mean()` semantics
    * (NULLs excluded from both numerator and denominator), the
    * behavior every reference `.mean()` call has. SQL oracles must
    * divide by `count(column)`, not `count(*)`, or the two diverge as
    * soon as the measure has NULLs. */
  def decAvg(c: Column): Column =
    (sum(c.cast("decimal(18,6)")).cast(DoubleType) /
      count(when(c.isNotNull, 1)))
}
