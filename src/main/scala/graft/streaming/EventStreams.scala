package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The reference has no true streaming — its `while True` poll loop
  * (`accounts.py:147-161`) is hand-rolled micro-batching, which
  * [[graft.ops.Cdc.runLoop]] reproduces batch-side. This module is the
  * Spark-native streaming expression of the same workloads: the
  * windowed aggregation here is the `readStream` form of the
  * `st1_time_bucket` batch query (same plan shape, same results on a
  * bounded input), plus watermarked dedup and custom keyed state —
  * the three primitives a CDC feed at scale actually needs.
  */
object EventStreams {

  /** Event-time tumbling window aggregation with a late-data watermark.
    * Works identically over `readStream` and batch DataFrames. */
  def windowedAgg(events: DataFrame, window_ : String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      // group on the `window` column itself — grouping on a projection
      // of it (e.g. window(...).getField("start")) severs the
      // watermark↔window linkage and append mode is then rejected.
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window").getField("start").as("bucket_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming sessionization: event-time SESSION windows with an
    * inactivity gap — the `readStream` twin of the `w3_sessionize`
    * batch query (there: lag + cumulative-sum windows; here: Spark's
    * native `session_window`, which merges events closer than `gap`
    * into one growing window). State is bounded by the watermark — a
    * session emits (append mode) once the watermark passes its close,
    * so memory tracks ACTIVE sessions, not history. */
  def sessionizeStream(events: DataFrame, keyCol: String = "event_type",
                       gap: String = "30 minutes",
                       watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      // same linkage rule as windowedAgg: group on session_window itself
      .groupBy(session_window(col("ts"), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window").getField("start").as("session_start"),
        col("session_window").getField("end").as("session_end"),
        col("n_events"))

  /** Watermarked exactly-once dedup by event id — the streaming
    * analogue of the idempotent-append protocol in [[graft.ops.Cdc]]. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: the streaming CDC feed joined to a
    * broadcast dimension (the streaming form of [[graft.ops.FkRemap]]'s
    * batch remap — the dim is re-resolved per micro-batch, so slowly
    * changing dimensions pick up updates without restarting the query). */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Stream-STREAM interval join: each left event matched to right
    * events of the same key whose event time falls within
    * `[leftTs - lag, leftTs]` (e.g. a click attributed to the
    * purchases that preceded it by at most `lag`). Both sides carry a
    * watermark AND the join condition bounds the time skew — together
    * that is what lets Spark evict both join states as event time
    * advances; either alone leaves one side's buffer unbounded.
    * Inputs must share no column names apart from `key` (pre-alias
    * the frames as the `ts_l`/`ts_r` contract here requires). */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         lag: String = "1 hour",
                         watermark: String = "2 hours",
                         joinType: String = "inner"): DataFrame =
    intervalJoin(left.withWatermark("ts_l", watermark),
      right.withWatermark("ts_r", watermark), key, lag, joinType)

  /** The interval-join core, batch or pre-watermarked streaming: same
    * `ts_l`/`ts_r` contract as [[intervalJoinStream]]. `left_outer`
    * keeps unmatched left events with NULL right columns — in
    * streaming they emit once the watermark proves no match can still
    * arrive (Spark's outer-join eviction rule), in batch immediately;
    * the RESULT is identical, which is what lets one oracle gate both
    * engines. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   lag: String, joinType: String): DataFrame = {
    // a self-join built from ONE lineage makes left(key) and
    // right(key) the same attribute: the join condition still
    // resolves, but drop(right(key)) would silently remove the LEFT
    // column too (NULL key on every outer row). Fail loudly instead.
    def keyAttr(df: DataFrame) =
      df.queryExecution.analyzed.output.find(_.name == key)
    require((for (l <- keyAttr(left); r <- keyAttr(right))
        yield l.exprId != r.exprId).getOrElse(true),
      s"left and right share the '$key' attribute (both sides built " +
        "from one lineage) — derive them from separate reads, or alias " +
        "the right key before joining")
    left.join(right, left(key) === right(key) &&
      col("ts_r") <= col("ts_l") &&
      col("ts_r") >= col("ts_l") - expr(s"interval $lag"), joinType)
      .drop(right(key))
  }

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via `mapGroupsWithState`: per-user running
    * totals across micro-batches (the stateful generalization of the
    * reference's per-table watermark). Update-mode output. */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserRunning(user, n, v)
          state.update(next)
          next
      }
  }
}
