package graft.ops

import org.apache.spark.sql.SparkSession

/** Multi-pipeline orchestration — the engine's `main.py`.
  *
  * The reference runs its 37 pipelines as one dependency-ordered suite
  * (`/root/reference/main.py:41-54`): `Template_Tables` sync/dim
  * builders first, then the `Main_Modules` facts that join against
  * them, each pipeline keeping its own watermark row in the shared
  * `app.EtlCDC` state table. This is that runner over [[Cdc.runLoop]]:
  * every pipeline declares its upstream names, the suite executes in
  * a deterministic topological order, and all watermarks live in ONE
  * [[Cdc.WatermarkStore]] — so a crash mid-suite resumes exactly where
  * it died (finished pipelines drain zero new rows, the interrupted
  * one continues from its committed watermark).
  *
  * Driver-side control flow only: each pipeline's work is whatever
  * Spark plan its `run` builds — the orchestrator adds no shuffle, no
  * collect, nothing data-scale. Pipelines at the same depth could run
  * concurrently (independent Spark jobs schedule fine); sequential
  * keeps the reference's semantics and makes resume deterministic.
  */
object Orchestrator {

  /** One pipeline: `name` is ALSO its watermark-table key in the
    * shared store; `run` does the pipeline's work (typically a
    * [[Cdc.runLoop]]) and returns its batch count. */
  final case class Pipeline(name: String, dependsOn: Seq[String],
                            run: (SparkSession, Cdc.WatermarkStore) => Int)

  /** Run the suite dependency-ordered. Returns name → batches
    * processed, in execution order. Fails loudly on an unknown
    * dependency or a cycle — a mis-declared DAG must never silently
    * run a fact before its dim. */
  def run(spark: SparkSession, store: Cdc.WatermarkStore,
          pipelines: Seq[Pipeline]): Seq[(String, Int)] = {
    val dup = pipelines.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate pipeline names: ${dup.mkString(", ")}")
    order(pipelines).map(p => p.name -> p.run(spark, store))
  }

  /** Deterministic topological order (Kahn, ties by name — the same
    * suite always runs in the same order, so resume is predictable). */
  private[graft] def order(pipelines: Seq[Pipeline]): Seq[Pipeline] = {
    val byName = pipelines.map(p => p.name -> p).toMap
    pipelines.foreach(p => p.dependsOn.foreach(d =>
      require(byName.contains(d),
        s"pipeline '${p.name}' depends on unknown pipeline '$d'")))
    val out = Seq.newBuilder[Pipeline]
    val done = scala.collection.mutable.Set.empty[String]
    var remaining = pipelines.sortBy(_.name)
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.dependsOn.forall(done))
      require(ready.nonEmpty,
        "dependency cycle among pipelines: " +
          blocked.map(_.name).mkString(", "))
      out ++= ready
      done ++= ready.map(_.name)
      remaining = blocked
    }
    out.result()
  }
}
