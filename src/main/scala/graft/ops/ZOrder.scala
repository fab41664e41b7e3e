package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — multi-dimensional data skipping
  * on a flat file layout.
  *
  * A table range-laid-out by ONE column prunes files on that column
  * only: a predicate on any other dimension still reads everything.
  * Interleaving the bits of two dimensions into one sort key makes
  * files cover square-ish cells of the (a, b) plane instead of full
  * stripes, so each file's sidecar min/max bounds are tight in BOTH
  * raw columns and a 2-D box predicate prunes on both (the layout
  * Delta's OPTIMIZE ZORDER BY produces; the stats consumed are the
  * ordinary per-column bounds [[graft.sources.BatchStats]] already
  * writes — no new metadata format). Pure Column bit arithmetic:
  * computing the key is scan-speed, and at 100 TB the ONLY cost of
  * z-ordering is the one range-shuffle at write time that any
  * clustered layout pays.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions
    * (b15..b0 → positions 30,28,…,0) — the classic mask-and-shift
    * ladder, as Column ops so codegen keeps it in the scan. */
  private def spread16(v: Column): Column = {
    val x0 = v.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit cell coordinates: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. */
  def interleave(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rank a raw value into a 16-bit grid cell given its domain
    * bounds: monotone (order-preserving — range predicates on the
    * raw column stay prunable) and domain-normalized so both
    * dimensions weigh equally in the interleave. Bounds are domain
    * METADATA (a two-number artifact computed once per table or
    * known a priori), never a per-query data pass. */
  def cell16(v: Column, lo: Long, hi: Long): Column = {
    require(hi >= lo, s"cell16: empty domain [$lo, $hi]")
    val span = (hi - lo + 1).toDouble
    floor((v.cast("double") - lit(lo.toDouble)) * lit(65536.0 / span))
      .cast("long")
  }

  /** The composite key for the common two-dimension case. */
  def key(a: Column, aLo: Long, aHi: Long,
          b: Column, bLo: Long, bHi: Long): Column =
    interleave(cell16(a, aLo, aHi), cell16(b, bLo, bHi))
}
