package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dict-literal recodes (SURVEY.md §2.7 C12).
  *
  * The reference hard-codes lookup dicts (alpha2→alpha3
  * `Template_Tables/countries.py:60-308`, order type `orders.py:111`,
  * city aliases `sync_cities.py:58-67`, …) and applies them with
  * `Series.map`. Spark-first: a `typedLit(Map)` + `element_at` folds
  * into a constant in the plan — broadcast implicitly with the task
  * binary, no join, no shuffle, codegen-friendly. For maps big enough
  * to matter (>~10k entries) use a broadcast-joined literal DataFrame
  * instead ([[FkRemap]]).
  */
object Recode {

  /** `Series.map(dict)` — non-matching keys become NULL (pandas semantics,
    * `orders.py:111`: `df['OrderType'].map({'New': 0})`).
    *
    * `try_element_at`, not `element_at`: under Spark 4's default ANSI
    * mode a missing map key throws MAP_KEY_DOES_NOT_EXIST — the
    * pandas missing→NULL contract must hold in any session. */
  def recodeStrict(c: Column, mapping: Map[String, String]): Column =
    try_element_at(typedLit(mapping), c)

  /** Recode with fall-through to the original value (the
    * `sync_cities.py:74` `map(...).fillna(original)` shape). */
  def recodeOrKeep(c: Column, mapping: Map[String, String]): Column =
    coalesce(try_element_at(typedLit(mapping), c), c)

  /** Integer-valued recode, strict (missing → NULL). */
  def recodeStrictInt(c: Column, mapping: Map[String, Int]): Column =
    try_element_at(typedLit(mapping), c)
}
