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

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** @param nodes single column `id`
    * @param pairs  columns `a`, `b` (undirected edges)
    * @return (id, canonical_id) for every node; singletons map to self.
    *
    * Per round: ONE join+agg (neighbor min) and ONE count action. The
    * previous label rides the update projection as an `old` column, so
    * convergence detection is a filter on the frame the round already
    * materializes — round 1's separate updated⋈old join+count doubled
    * every round's cost. Labels are localCheckpoint'ed every 5 rounds:
    * persist alone keeps the full lineage, and by round ~15 the
    * re-planned DAG (and any cache-eviction recompute) grows with
    * round count; checkpointing pins the iteration cost flat.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxRounds: Int = 20): DataFrame = {
    val sym = pairs.select(col("a"), col("b"))
      .unionAll(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()
    var mat    = nodes.select(col("id"), col("id").as("label")).persist()
    var labels = mat
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val neighborMin = sym
        .join(labels.select(col("id").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a").as("id")).agg(min(col("nl")).as("nmin"))
      val updated = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      val newMat =
        if ((round + 1) % 5 == 0) updated.localCheckpoint() else updated.persist()
      val changed = newMat.filter(col("label") =!= col("old")).count()
      mat.unpersist()
      mat = newMat
      labels = newMat.select("id", "label")
      converged = changed == 0
      round += 1
    }
    sym.unpersist()
    if (!converged)
      log.warn(s"connectedComponents: round budget ($maxRounds) exhausted " +
        "before fixpoint — canonical ids may span unconverged components; " +
        "raise maxRounds (graph diameter exceeds it)")
    labels.withColumnRenamed("label", "canonical_id")
  }
}
