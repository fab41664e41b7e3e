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
  * collect, nothing data-scale. [[run]] is sequential (the
  * reference's semantics, simplest resume); [[runConcurrent]]
  * executes each dependency WAVE on driver threads — independent
  * dims build concurrently, which at suite scale is the wall-clock
  * lever (Spark schedules concurrent jobs from multiple driver
  * threads natively; the shared watermark store is synchronized for
  * exactly this caller).
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

  /** [[run]] with same-wave concurrency: pipelines whose dependencies
    * are all satisfied run together on a pool of `parallelism`
    * driver threads; the next wave starts only when the whole wave
    * finished. Watermark commits make this crash/fail-safe with the
    * SAME resume property as the sequential runner: every pipeline
    * that completed committed its watermark, so a re-run drains zero
    * rows from it and continues the rest. A wave with failures
    * completes its in-flight siblings, then fails loudly naming every
    * failed pipeline; later waves never start. Results are reported
    * wave by wave, names sorted — deterministic regardless of thread
    * timing. */
  def runConcurrent(spark: SparkSession, store: Cdc.WatermarkStore,
                    pipelines: Seq[Pipeline],
                    parallelism: Int = 4): Seq[(String, Int)] = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val dup = pipelines.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate pipeline names: ${dup.mkString(", ")}")
    waves(pipelines).flatMap { wave =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, wave.size))
      val results =
        try wave.map(p => p -> pool.submit(
            new java.util.concurrent.Callable[Int] {
              override def call(): Int = p.run(spark, store)
            }))
          .map { case (p, f) => p.name -> scala.util.Try(f.get()) }
        finally pool.shutdown()
      val failed = results.collect { case (n, scala.util.Failure(e)) =>
        s"$n (${e.getCause match { case null => e; case c => c }})" }
      if (failed.nonEmpty)
        throw new IllegalStateException(
          s"pipelines failed: ${failed.mkString("; ")} — completed " +
            "pipelines committed their watermarks; re-run to resume")
      results.map { case (n, t) => n -> t.get }
    }
  }

  /** Deterministic topological order (Kahn, ties by name — the same
    * suite always runs in the same order, so resume is predictable). */
  private[graft] def order(pipelines: Seq[Pipeline]): Seq[Pipeline] =
    waves(pipelines).flatten

  /** Kahn's algorithm emitting dependency WAVES (each sorted by
    * name): wave i depends only on waves < i. */
  private[graft] def waves(pipelines: Seq[Pipeline]): Seq[Seq[Pipeline]] = {
    val byName = pipelines.map(p => p.name -> p).toMap
    pipelines.foreach(p => p.dependsOn.foreach(d =>
      require(byName.contains(d),
        s"pipeline '${p.name}' depends on unknown pipeline '$d'")))
    val out = Seq.newBuilder[Seq[Pipeline]]
    val done = scala.collection.mutable.Set.empty[String]
    var remaining = pipelines.sortBy(_.name)
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.dependsOn.forall(done))
      require(ready.nonEmpty,
        "dependency cycle among pipelines: " +
          blocked.map(_.name).mkString(", "))
      out += ready
      done ++= ready.map(_.name)
      remaining = blocked
    }
    out.result()
  }
}
