package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raised when required FK targets are missing, mirroring the
  * reference's batch-aborting integrity check
  * (`utils/custom_err.py:1-6`, raised at ~25 sites, e.g.
  * `orders.py:121-133`, `locations.py:108-111`). */
class IncrementalDependencyException(msg: String) extends RuntimeException(msg)

/** Surrogate-key remapping joins — the workhorse of the reference
  * (~60 left-merges against `Sync*` / target tables, SURVEY.md §2.3
  * J1/J2/J9, §2.4 A5).
  *
  * Scale design: the mapping ("Sync") tables are dimension-sized —
  * always broadcast them so a 100 TB fact scan never shuffles for a
  * remap. Where a dim is too big to broadcast the same API degrades
  * gracefully: drop the `broadcast` hint and Spark plans a shuffled
  * hash/sort-merge join on the same code path. The reference instead
  * ships an IN-list of batch keys into SQL Server
  * (`utils/fks_mapper.py:16-70`) — the semi-join reduction Catalyst
  * performs automatically once this is written as a join.
  */
object FkRemap {

  /** J1 — left-join remap: `fact` gains `dim`'s columns matched on
    * `keys` (e.g. OldLocationID → LocationID, `orders.py:120`). */
  def remap(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "left")

  /** J9 — keep only fact rows whose key exists in `dim`
    * (the IN-list pushdown of `fks_mapper.py:17-19`). No broadcast
    * hint: the filter side is often itself fact-derived (a keyset from
    * the biggest table), which must not be forced through the driver —
    * AQE broadcasts it at runtime when it turns out small. */
  def semi(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(dim, keys, "left_semi")

  /** J6 — drop fact rows already present in `existing`
    * (the left-merge + isna() marker idiom of `items.py:140-147`).
    * Unhinted for the same reason as [[semi]]. */
  def anti(fact: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(existing, keys, "left_anti")

  /** A5 — count unresolved FKs (NULL in `resolved`) without a second
    * scan; returns the count for reporting. */
  def missingCount(df: DataFrame, resolved: String): Long =
    df.filter(col(resolved).isNull).count()

  /** A5 as a batch-aborting assertion, the reference's
    * `IncrementalDependencyError` semantics (`orders.py:121-124`). */
  def assertResolved(df: DataFrame, resolved: String, table: String): DataFrame = {
    val missing = missingCount(df, resolved)
    if (missing > 0)
      throw new IncrementalDependencyException(
        s"Missing $resolved: $missing. Update $table table.")
    df
  }

  /** A5 as a pure dataflow (no driver-side action): per-batch integrity
    * report usable inside a larger plan. */
  def integrityReport(df: DataFrame, resolved: Column, label: String): DataFrame =
    df.agg(
      lit(label).as("check_name"),
      count(when(resolved.isNull, 1)).as("missing"),
      count(lit(1)).as("total"))
}
