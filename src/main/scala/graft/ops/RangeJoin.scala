package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range (interval-containment) join: points `p` against intervals
  * `[start, end)`, equi-accelerated by binning.
  *
  * The declarative form — `points JOIN intervals ON p >= start AND
  * p < end` — has no equi-key, so every engine (Spark included) falls
  * back to a nested-loop product: O(N·M) comparisons, and with a
  * non-broadcastable interval side, a single-partition
  * BroadcastNestedLoopJoin that dies at scale. The standard fix
  * (DuckDB's IEJoin and Trino/Photon range-bucketing do the same
  * thing) is to quantize the domain into fixed-width bins:
  *
  *   - each point belongs to exactly ONE bin: `floor(p / w)`;
  *   - each interval is exploded to EVERY bin it overlaps
  *     (`floor(start/w) .. floor((end-1)/w)` — `ceil(len/w)+1` rows);
  *   - bins equi-join (hash/sort-merge, shuffle-parallel, AQE-eligible)
  *     and the exact predicate filters inside the bin.
  *
  * Because a point has a unique bin, a (point, interval) pair can meet
  * in at most one bin — no post-join dedup is needed. Pick `binWidth`
  * near the typical interval length: the interval side then inflates
  * ~2× while the O(N·M) product collapses to bucket-local work. At
  * 100 TB the bin key shuffles both sides once and every comparison
  * after that is bucket-local; skewed bins fall out to AQE skew-join
  * like any other hot hash key.
  *
  * Reference scope: the reference joins only on equality keys
  * (`fks_mapper.py`); this operator is part of the engine-completeness
  * surface (SURVEY §2.3 extension), same family as the as-of join
  * (`graft.plans.AsOfJoinPlan`) — composition (a) of the custom-op
  * preference order, no physical operator needed.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `point ∈ [start, end)`.
    *
    * @param points    left side; `pointCol` must be a LongType column
    *                  of `points` (e.g. epoch microseconds)
    * @param intervals right side; `startCol`/`endCol` LongType columns
    *                  of `intervals`; empty/inverted intervals
    *                  (`end <= start`) match nothing
    * @param binWidth  bin size in the same units; choose ≈ the typical
    *                  interval length
    * @return one row per (point, interval) containment pair, carrying
    *         all columns of both inputs
    */
  def binned(points: DataFrame, pointCol: Column,
             intervals: DataFrame, startCol: Column, endCol: Column,
             binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // `(c - c % w) / w` keeps the long division exact: the numerator is
    // an exact multiple of w, so the double quotient is the integer bin
    // (plain `c / w` rounds at 2^53; `div` isn't in the Column API).
    def bin(c: Column): Column =
      ((c - pmod(c, lit(binWidth))) / binWidth).cast(LongType)

    val binnedPoints = points.withColumn("__bin", bin(pointCol))
    val binnedIntervals = intervals
      .where(endCol > startCol)
      .withColumn("__bin",
        explode(sequence(bin(startCol), bin(endCol - 1))))
    binnedPoints
      .join(binnedIntervals, Seq("__bin"))
      .where(pointCol >= startCol && pointCol < endCol)
      .drop("__bin")
  }
}
