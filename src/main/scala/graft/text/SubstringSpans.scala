package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring span dedup at TOKEN grain — the Lee et al. (2022)
  * "Deduplicating Training Data Makes Language Models Better" shape
  * (ref: GARAGE-POS/data-migration-etl-scripts has no equivalent;
  * this is part of the LLM-pipeline extension surface): anchor
  * k-grams at EVERY token position, candidate (doc, doc, offset)
  * triples from anchor-equality joins (never all-pairs), and the
  * in-pair exact extension as maximal runs of consecutive anchor
  * positions at a constant offset — a duplicated span of L tokens is
  * exactly L−k+1 consecutive anchors, so recovered boundaries are
  * token-exact at ANY alignment.
  *
  * ANCHOR DOCUMENT-FREQUENCY CAP (round 14): anchors whose distinct-
  * document count exceeds `maxDf` are dropped BEFORE the self-join.
  * A boilerplate k-gram shared by M documents would contribute M²
  * candidate rows inside ONE join key — a skewed-key shuffle AQE
  * cannot split, the classic web-scale killer; the cap bounds every
  * anchor's contribution at maxDf². Lee et al. apply the same cut.
  * Split semantics: a duplicated run crossing a dropped anchor
  * splits into two reported spans, each independently required to
  * clear `minTokens`.
  *
  * Scale shape: ONE logical partitioning on the anchor hash serves
  * the df aggregate, the hot-anchor anti-join, and the candidate
  * self-join (Catalyst reuses the exchange); the run-grouping window
  * partitions on (id1, id2, delta) — O(pair overlap), never O(n²).
  */
object SubstringSpans {

  /** `docs(idCol, tokensCol: array<string>)` → spans
    * `(id1, id2, start1, start2, span_tokens)` with `id1 < id2`,
    * token-exact boundaries, `span_tokens >= minTokens`. */
  def spans(docs: DataFrame, idCol: String, tokensCol: String,
            k: Int = 8, maxDf: Int = 16, minTokens: Int = 16): DataFrame = {
    val w = col(tokensCol)
    // the anchor-hash explode (k md5s per token) is the CPU wall and
    // runs at the scan's split count without this; no-op on wide
    // inputs (guide §2.5)
    val anchors = graft.util.Spread.wide(docs, col(idCol))
      .select(col(idCol), posexplode(
        when(size(w) >= k,
          transform(sequence(lit(0), size(w) - k),
            i => md5(concat_ws(" ", slice(w, i + 1, lit(k))))))
          .otherwise(array())))
      .toDF("doc_id", "pos", "h")
    val hot = anchors.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDf).select("h")
    val kept = anchors.join(hot, Seq("h"), "left_anti")
    val m = kept.select(col("doc_id").as("id1"), col("pos").as("pa"),
        col("h"))
      .join(kept.select(col("doc_id").as("id2"), col("pos").as("pb"),
        col("h")), Seq("h"))
      .filter(col("id1") < col("id2"))
      .withColumn("delta", (col("pb") - col("pa")).cast("long"))
    val win = Window.partitionBy("id1", "id2", "delta").orderBy("pa")
    m.withColumn("grpk", col("pa") - row_number().over(win))
      .groupBy(col("id1"), col("id2"), col("delta"), col("grpk"))
      .agg(min(col("pa")).cast("long").as("start1"),
        count(lit(1)).as("n_anchors"))
      .withColumn("span_tokens", col("n_anchors") + (k - 1))
      .filter(col("span_tokens") >= minTokens)
      .select(col("id1"), col("id2"), col("start1"),
        (col("start1") + col("delta")).as("start2"), col("span_tokens"))
  }
}
