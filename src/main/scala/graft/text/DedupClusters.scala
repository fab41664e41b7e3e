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

  /** Deterministically release a SUPERSEDED round's localCheckpoint
    * blocks (the LogicalRDD leaves under `df`). Without this the
    * blocks wait for the JVM to GC the old frame and the context
    * cleaner to notice — a long run holds many rounds' edge multisets
    * simultaneously. Only ever call on a frame whose successor is
    * already materialized and whose consumers have run: a checkpointed
    * RDD's blocks are its ONLY copy (lineage is truncated), so freeing
    * one still in use fails the job rather than recomputing. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** @param nodes single column `id`
    * @param pairs  columns `a`, `b` (undirected edges)
    * @return (id, canonical_id) for every node; singletons map to self.
    *
    * Per round: ONE join+agg (neighbor min) and ONE count action. The
    * previous label rides the update projection as an `old` column, so
    * convergence detection is a filter on the frame the round already
    * materializes — round 1's separate updated⋈old join+count doubled
    * every round's cost. Labels are localCheckpoint'ed EVERY round:
    * persist alone keeps the full lineage (the plan grows ~3× per
    * round) and a cache eviction late in the loop would recompute the
    * whole chain; eager checkpoints pin both plan size and iteration
    * cost flat, and each superseded round's blocks are freed
    * deterministically once its successor is materialized
    * ([[freeCheckpoint]]).
    */
  /** Edge count up to which components solve on the DRIVER — one
    * bounded collect + union-find instead of the distributed label
    * loop (which costs 2+ jobs PER ROUND; an incremental ingest's
    * contracted graph is typically a few thousand edges, so the loop
    * is pure fixed overhead for it). Identical output by
    * construction: both compute min-id per component. Bounded: the
    * collect is `limit(cap + 1)` — a graph past the cap (or with
    * non-integral ids, whose driver ordering could diverge from
    * Catalyst's) takes the distributed path unchanged. Tunable via
    * `graft.cc.localEdgeCap` (0 disables). */
  private def localEdgeCap(df: DataFrame): Int =
    df.sparkSession.conf.get("graft.cc.localEdgeCap", "200000").toInt

  /** Driver union-find over ≤cap edges: Some((id → min-of-component)
    * as a DataFrame) or None when the graph exceeds the cap / ids are
    * not integral. */
  private def localLabels(pairs: DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructField, StructType}
    val cap = localEdgeCap(pairs)
    if (cap <= 0) return None
    val e = pairs.select(col("a"), col("b"))
    val integral = e.schema.fields.forall(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    if (!integral) return None
    val sample = e.limit(cap + 1).collect()
    if (sample.length > cap) return None
    def asL(v: Any): Long = v match {
      case l: Long => l case i: Int => i.toLong
      case s: Short => s.toLong case b: Byte => b.toLong
    }
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    sample.foreach { row =>
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val (ra, rb) = (find(asL(row.get(0))), find(asL(row.get(1))))
        // link larger root under smaller: the root IS the component min
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
    }
    val ids = sample.flatMap(r => Seq(0, 1).collect {
      case i if !r.isNullAt(i) => asL(r.get(i)) }).distinct
    val spark = pairs.sparkSession
    val outT = e.schema.fields.head.dataType
    def back(l: Long): Any = outT match {
      case LongType => l case IntegerType => l.toInt
      case ShortType => l.toShort case ByteType => l.toByte
    }
    val rows = ids.map(id => org.apache.spark.sql.Row(back(id), back(find(id))))
    val schema = StructType(Seq(StructField("id", outT),
      StructField("canonical_id", outT)))
    Some(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema))
  }

  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxRounds: Int = 20): DataFrame = {
    localLabels(pairs) match {
      case Some(labels) =>
        return nodes.select(col("id"))
          .join(labels, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("canonical_id"), col("id")).as("canonical_id"))
      case None => ()
    }
    val sym = pairs.select(col("a"), col("b"))
      .unionAll(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    // Iterate ONLY over nodes with at least one edge: a singleton's
    // label never changes, so carrying it through every round's
    // join+agg is pure overhead — and in a real dedup corpus the edge
    // subgraph is a small fraction of N, while `nodes` is the whole
    // corpus. Singletons re-enter via the final left join.
    var labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val neighborMin = sym
        .join(labels.select(col("id").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a").as("id")).agg(min(col("nl")).as("nmin"))
      val newMat = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      val changed = newMat.filter(col("label") =!= col("old")).count()
      // newMat is materialized and the count has run: the previous
      // round's label blocks have no remaining consumer
      freeCheckpoint(labels)
      labels = newMat.select("id", "label")
      converged = changed == 0
      round += 1
    }
    freeCheckpoint(sym) // not part of the returned plan
    if (!converged)
      log.warn(s"connectedComponents: round budget ($maxRounds) exhausted " +
        "before fixpoint — canonical ids may span unconverged components; " +
        "raise maxRounds (graph diameter exceeds it)")
    nodes.select(col("id"))
      .join(labels.withColumnRenamed("label", "canonical_id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("canonical_id"), col("id")).as("canonical_id"))
  }

  /** Large-star/small-star edge contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): the
    * escape hatch for graphs whose diameter makes per-hop label
    * propagation too many rounds. Each round alternates
    *   large-star: every node points its STRICTLY LARGER neighbors at
    *     its minimum (of neighborhood ∪ self);
    *   small-star: every node points its ≤ neighbors and itself at
    *     that minimum;
    * contracting chains toward each component's minimum in
    * O(log n) rounds regardless of diameter (a 1000-node path
    * converges in ~8 rounds vs 1000 propagation hops). Same API and
    * output as [[connectedComponents]]; per round two shuffles
    * (groupBy min + re-join), edge multiset deduped to stop growth.
    */
  def connectedComponentsStar(nodes: DataFrame, pairs: DataFrame,
                              maxRounds: Int = 40): DataFrame = {
    // same bounded driver fast path as [[connectedComponents]] — both
    // formulations output min-id per component, so they share it
    localLabels(pairs) match {
      case Some(labels) =>
        return nodes.select(col("id"))
          .join(labels, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("canonical_id"), col("id")).as("canonical_id"))
      case None => ()
    }
    def sym(e: DataFrame): DataFrame =
      e.select(col("a"), col("b"))
        .unionAll(e.select(col("b").as("a"), col("a").as("b")))

    // one star pass: m(u) = min(Γ(u) ∪ {u}); keep (v, m) for the
    // selected neighbor side, dropping self-loops
    def star(edges: DataFrame, large: Boolean): DataFrame = {
      val s = sym(edges)
      val mins = s.groupBy(col("a"))
        .agg(least(col("a"), min(col("b"))).as("m"))
      val nbrs = s.join(mins, "a")
      val kept =
        if (large) nbrs.filter(col("b") > col("a"))
          .select(col("b").as("a"), col("m").as("b"))
        else nbrs.filter(col("b") <= col("a"))
          .select(col("b").as("a"), col("m").as("b"))
          .unionAll(mins.select(col("a"), col("m").as("b")))
      kept.filter(col("a") =!= col("b")).distinct()
    }

    var edges = pairs.select(col("a"), col("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // Both star passes are localCheckpoint'ed EAGERLY every round:
      // star() references its input ~6x (sym doubles it, then mins and
      // nbrs each consume sym), so an untruncated star(star(...))
      // multiplies the LOGICAL PLAN ~36x per round — persist() caches
      // data but keeps the plan, and a 5-round checkpoint cadence is
      // ~36^5 plan nodes: Catalyst churn then driver OOM on a 999-edge
      // path graph. Eager checkpoints pin the plan at constant size;
      // superseded rounds' blocks are freed deterministically below
      // once their successors are materialized (freeCheckpoint) — a
      // checkpointed RDD's blocks are its only copy, so the frees sit
      // strictly after the last consumer of each frame.
      val afterLarge = star(edges, large = true).localCheckpoint()
      val next = star(afterLarge, large = false).localCheckpoint()
      // `next` is materialized: the intermediate pass has no consumer
      freeCheckpoint(afterLarge)
      // exact fixpoint: same multiset both ways (edges are distinct,
      // so two anti-join counts suffice)
      val grew    = next.exceptAll(edges).limit(1).count() > 0
      val shrank  = edges.exceptAll(next).limit(1).count() > 0
      // convergence counts were this round's last read of the old edges
      freeCheckpoint(edges)
      edges = next
      converged = !grew && !shrank
      round += 1
    }
    if (!converged)
      log.warn(s"connectedComponentsStar: round budget ($maxRounds) " +
        "exhausted before the edge fixpoint")
    // final star: every node points at its component min
    val labels = sym(edges).groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("canonical_id"))
    nodes.select(col("id"))
      .join(labels.select(col("a").as("id"), col("canonical_id")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("canonical_id"), col("id")).as("canonical_id"))
  }
}
