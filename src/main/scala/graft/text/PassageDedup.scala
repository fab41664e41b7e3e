package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PASSAGE-LEVEL exact deduplication — the scalable Spark form of
  * span-level dedup (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better": repeated SPANS inside otherwise-distinct
  * documents are what doc-level dedup — this engine's dd1/dd2 family —
  * cannot see; the C4/RefinedWeb pipelines remove them at
  * paragraph/passage granularity).
  *
  * Documents split into fixed `k`-token passages (the last one may be
  * shorter); a passage KEEPS its first occurrence in global
  * `(doc_id, pidx)` order and every later exact copy — across
  * documents or within one — is dropped; surviving passages
  * reassemble in original order.
  *
  * Scale shape (100 TB): two shuffles total —
  *   1. passages hash-partition on their md5 for the first-occurrence
  *      window (each hash group is duplicate-count-sized, never
  *      corpus-sized, so no skewed giant partition: the window sorts
  *      only genuine duplicates);
  *   2. survivors shuffle back on doc_id for reassembly.
  * The explode itself is narrow, and the shuffle key is the 16-byte
  * digest, not the passage text.
  */
object PassageDedup {

  /** `(doc_id, pidx, passage)` — one row per k-token window, pidx
    * counted from 0 in token order. */
  def passages(docs: DataFrame, textCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"passage size must be >= 1 token, got $k")
    docs.select(col("doc_id"), split(textCol, " ").as("ts"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(ts) / $k.0) as int) - 1), " +
          s"i -> array_join(slice(ts, i * $k + 1, $k), ' '))")))
      .toDF("doc_id", "pidx", "passage")
  }

  /** Dedup + reassembly: `(doc_id, n_passages, n_kept, text_dedup)`.
    * A document whose every passage appeared earlier keeps its row
    * with `n_kept = 0` and empty text — the takedown signal, not a
    * silent disappearance. */
  def dedup(docs: DataFrame, textCol: Column, k: Int): DataFrame = {
    // passage explode + md5 runs at the scan's split count without
    // this; no-op on wide inputs (guide §2.5)
    val p = passages(graft.util.Spread.wide(docs, col("doc_id")), textCol, k)
    // first global occurrence wins; the digest is the shuffle key and
    // the tie-break (doc_id, pidx) makes the winner deterministic
    val w = Window.partitionBy("h").orderBy("doc_id", "pidx")
    val kept = p.withColumn("h", md5(col("passage").cast("binary")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
    val agg = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("pidx"), col("passage")))),
          x => x.getField("passage")),
        " ").as("text_dedup"))
    docs.select(col("doc_id"),
        ceil(size(split(textCol, " ")) / lit(k.toDouble)).cast("long")
          .as("n_passages"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_passages"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }
}
