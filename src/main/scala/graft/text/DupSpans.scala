package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SLIDING-WINDOW duplicate-span detection — the distributed
  * approximation of suffix-array substring dedup (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", §4.1:
  * any substring of length ≥ k appearing more than once in the corpus
  * is a duplicate span). [[PassageDedup]] sees only FIXED-boundary
  * passages, so an offset-shifted copy (the same text preceded by one
  * extra word) shares no passage with its original and slips through;
  * the sliding k-gram view catches duplicated text at ANY alignment,
  * which is exactly what a suffix array buys — at the cost of one
  * gram per character position instead of one per k tokens.
  *
  * A position `p` in a document is COVERED when the k-char window
  * starting at `p` occurs ≥ 2 times corpus-wide (cross-document or
  * within one — suffix-array semantics count both). Overlapping or
  * exactly-adjoining covered windows merge into maximal spans
  * (gaps-and-islands); the per-document output is the classic
  * curation filter signal: duplicated-character count, span count,
  * duplicated fraction.
  *
  * Scale shape (100 TB): two shuffles total —
  *   1. grams hash-partition on their 16-byte md5 (never the raw
  *      k-char window) for the occurrence count, computed as a
  *      partition-count window so the same shuffle that groups a
  *      gram's occurrences also annotates them — no second pass or
  *      self-join on the gram table;
  *   2. covered positions shuffle back on doc_id, where BOTH island
  *      windows and BOTH aggregations reuse that one partitioning.
  * The gram explode is narrow (fan-out ≈ chars/doc, no shuffle), and
  * filtering to covered positions happens before the doc_id shuffle,
  * so shuffle 2 carries only duplicated positions — on a mostly-clean
  * corpus that is a small fraction of the gram table.
  */
object DupSpans {

  /** `(doc_id, pos)` for every position whose k-char window occurs
    * `minOccurrences`+ times corpus-wide. Documents shorter than `k`
    * contribute no grams. */
  def coveredPositions(docs: DataFrame, textCol: Column, k: Int,
      minOccurrences: Int = 2): DataFrame = {
    require(k >= 2, s"window must be >= 2 chars, got $k")
    require(minOccurrences >= 2,
      s"minOccurrences must be >= 2, got $minOccurrences")
    // Short-text guard: sequence(0, n) DESCENDS when n < 0.
    val grams = docs
      .select(col("doc_id"),
        posexplode(when(length(textCol) >= k,
          transform(sequence(lit(0), length(textCol) - k),
            i => textCol.substr(i + 1, lit(k))))
          .otherwise(array())))
      .toDF("doc_id", "pos", "g")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(col("g").cast("binary")).as("h"))
    grams
      .withColumn("occ", count(lit(1)).over(Window.partitionBy("h")))
      .where(col("occ") >= minOccurrences)
      .select("doc_id", "pos")
  }

  /** Per-document duplicate-span profile:
    * `(doc_id, n_chars, dup_chars, n_spans, dup_frac)` — every input
    * document keeps its row (clean documents report zeros), so the
    * frame is directly a curation filter input. */
  def profile(docs: DataFrame, textCol: Column, k: Int,
      minOccurrences: Int = 2): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    // the window-hash explode runs at the scan's split count without
    // this; no-op on wide inputs (guide §2.5)
    val spreadDocs = graft.util.Spread.wide(docs, col("doc_id"))
    // windows at p' and p overlap-or-adjoin iff p - p' <= k, so a gap
    // > k starts a new maximal span (gaps-and-islands)
    val islands = coveredPositions(spreadDocs, textCol, k, minOccurrences)
      .withColumn("prev", lag("pos", 1).over(byDoc))
      .withColumn("island", sum(
        when(col("prev").isNull || col("pos") - col("prev") > k, 1L)
          .otherwise(0L)).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = islands.groupBy(col("doc_id"), col("island"))
      .agg((max(col("pos")) + k - min(col("pos"))).as("chars"))
    val perDoc = spans.groupBy("doc_id").agg(
      sum(col("chars")).as("dup_chars"),
      count(lit(1)).as("n_spans"))
    docs.select(col("doc_id"), length(textCol).cast("long").as("n_chars"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (coalesce(col("dup_chars"), lit(0L)).cast("double") /
          greatest(col("n_chars"), lit(1L))).as("dup_frac"))
  }
}
