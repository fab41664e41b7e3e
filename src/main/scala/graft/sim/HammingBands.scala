package graft.sim

/** Corpus-derived band geometry for the Hamming-LSH near-dup family
  * (dd15 image dHash, dd16 audio fingerprint, dd17 video frame
  * sequences). Round 12 shipped code-time band constants (4×16-bit
  * images/video, 8×8-bit audio) with a comment saying "tunes to
  * log2(N/occupancy) at corpus scale"; this makes the tuning code:
  * the band width derives from the corpus count by the same occupancy
  * rule the MinHash/embedding LSHes (dd2/dd7) already use, so an
  * 8-bit band bucket never holds ~N/256 ids at web scale — expected
  * bucket occupancy stays ≈ `occ` until the width clamps.
  *
  * The 64 hash bits are split EVENLY into `ceil(64/bits)` bands
  * (widths differ by ≤1), so the rule degenerates to exactly the
  * round-12 shapes at their operating points: bits=8 → 8×8,
  * bits=16 → 4×16. The clamp [8,16] is the Hamming budget: fewer
  * than 4 bands can't keep a clean band under the verify threshold's
  * bit flips (recall collapses), and more than 8 bands buys no recall
  * the thresholds need while multiplying the exploded row count.
  *
  * Both sides replay the same rule: the Spark queries compute the
  * corpus count (already materialized for the recall guards) and the
  * DuckDB oracles derive bits/bands from `count(*)` in SQL — the
  * correctness gate certifies the parity at every sf.
  */
object HammingBands {

  /** Band width in bits: ceil(log2(max(n/occ, 2))) clamped to
    * [lo, hi]. Integer-exact (smallest b with 2^b · occ ≥ n) so it
    * can never disagree with the oracle's ceil(log2(·)) at a power
    * of two through floating rounding. */
  def bits(n: Long, occ: Int, lo: Int = 8, hi: Int = 16): Int = {
    require(occ > 0 && lo > 0 && hi >= lo)
    var b = 1
    while (b < 62 && (BigInt(1) << b) * occ < n) b += 1
    math.max(lo, math.min(hi, b))
  }

  /** Even split of 64 bits into ceil(64/bits) bands: (shift, width)
    * per band, widths differing by at most 1, covering all 64 bits. */
  def spec(bits: Int): Seq[(Int, Int)] = {
    require(bits >= 1 && bits <= 64)
    val nb = math.ceil(64.0 / bits).toInt
    (0 until nb).map { i =>
      val from = 64 * i / nb
      val until = 64 * (i + 1) / nb
      (from, until - from)
    }
  }
}
