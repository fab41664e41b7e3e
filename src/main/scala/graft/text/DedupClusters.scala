package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-components clustering of near-duplicate pairs.
  *
  * Pairwise near-dup detection ([[MinHash]], [[SimHash]]) is only half
  * of corpus dedup: similarity is not transitive, so keep-one-per-pair
  * decisions conflict (A~B, B~C ⇒ A,B,C must dedupe as ONE group even
  * if A~C was never emitted). The canonical form is the connected
  * component of the pair graph, with min-id as the kept representative.
  *
  * Implementation: iterative min-label propagation — each round every
  * node takes the minimum label among itself and its neighbors; the
  * driver loops until a fixpoint. Rounds needed = graph diameter;
  * near-dup components are shallow (pairs chain through shared
  * content), so this converges in a handful of rounds. Each round is
  * one join + one aggregation, both AQE-managed; labels persist
  * round-over-round to cut lineage. For adversarially deep graphs,
  * switch to the large-star/small-star formulation (logarithmic
  * rounds) — same API.
  */
object DedupClusters {

  /** @param nodes single column `id`
    * @param pairs  columns `a`, `b` (undirected edges)
    * @return (id, canonical_id) for every node; singletons map to self.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxRounds: Int = 20): DataFrame = {
    val sym = pairs.select(col("a"), col("b"))
      .unionAll(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()
    var labels = nodes.select(col("id"), col("id").as("label")).persist()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val neighborMin = sym
        .join(labels.select(col("id").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a").as("id")).agg(min(col("nl")).as("nmin"))
      val updated = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .persist()
      val changed = updated.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      round += 1
    }
    sym.unpersist()
    labels.withColumnRenamed("label", "canonical_id")
  }
}
