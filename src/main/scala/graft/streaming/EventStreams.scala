package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming ingest path for the events table — an extension
  * beyond the reference (which is 100% batch; SURVEY §2.9): the same
  * event-stream analytics the gold layer computes in batch, expressed as
  * unbounded transforms. Every transform here is a pure
  * `DataFrame => DataFrame` usable on BOTH `spark.readStream` input and
  * a batch DataFrame — one definition, two execution modes — so the
  * medallion pipeline can move to incremental ingest without rewriting
  * query logic.
  *
  * Scale: watermarks bound state (late events beyond 1h are dropped, so
  * state size tracks the window count, not the stream length); windowed
  * aggregations shuffle on (window, key) like any groupBy; the custom
  * per-user state in [[runningUserStats]] is keyed state in the state
  * store — partitioned by user, constant per-key size.
  */
object EventStreams {

  /** Raw event row as produced by the testdata adapter (ts is µs-precision). */
  final case class EventRow(
      event_id: Long, user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)

  /** Per-user running aggregate maintained by mapGroupsWithState. */
  final case class UserStats(
      user_id: Long, n_events: Long, n_purchases: Long,
      revenue: Double, last_ts: java.sql.Timestamp)

  /** Streaming schema of the events source (matches
    * /root/testdata events.parquet after the nanos→µs adaptation in
    * graft.util.Tables.load).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("ts", TimestampType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Open an unbounded read of an events directory (files appearing in
    * `dir` are ingested incrementally — the streaming analogue of the
    * bronze CSV ingest).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  // ---------------------------------------------------------------------
  /** Tumbling-daily event counts by type with a 1-hour watermark: the
    * streaming twin of the batch q03_events_daily rollup. Late events
    * (> 1h behind the max seen ts) are dropped and their window's state
    * evicted — state is bounded by (days in flight × event types).
    */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("day.start").as("day"), col("event_type"), col("n"), col("total_value"))

  /** Windowed value percentiles per event type — the streaming
    * latency/amount-distribution monitor, and the stream twin of qt13's
    * batch quantile sketch: `approx_percentile` is a bounded-size
    * MERGEABLE sketch, which is precisely what a watermarked streaming
    * aggregate needs (per-window state is one sketch per (window, type)
    * — constant-size regardless of event volume — merged across
    * micro-batches; an EXACT percentile would buffer every value in
    * state, unbounded within the window). Late events beyond the
    * watermark drop and their window's sketch state evicts, so total
    * state is (windows in flight × types) sketches.
    */
  def windowedValuePercentiles(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // ONE sketch queried at both percentiles — two separate
        // approx_percentile calls would maintain two independent
        // QuantileSummaries buffers per group (2× state, 2× update work)
        approx_percentile(col("value"), array(lit(0.5), lit(0.95)), lit(10000)).as("_p"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        element_at(col("_p"), 1).as("p50_value"),
        element_at(col("_p"), 2).as("p95_value"))

  /** Session windows per user (30-minute inactivity gap): computes the
    * sessionization the reference receives pre-materialized
    * (SURVEY §2.9) directly from the raw stream.
    */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0))
          .as("session_revenue"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_revenue"))

  /** Streaming exact dedup by event_id: the unbounded twin of the batch
    * dedup-keep-latest (SURVEY §2.5 W1). State holds only ids younger
    * than the watermark — `dropDuplicatesWithinWatermark` evicts ids
    * once no late duplicate can still arrive, so state is bounded by
    * (event rate × watermark delay), not stream length.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  // ---------------------------------------------------------------------
  /** Arbitrary stateful processing: a per-user running profile via
    * mapGroupsWithState — the pattern for state Spark's built-in
    * aggregations can't express (decaying counters, fraud rules,
    * cross-event sequences). Emits the updated profile on every trigger
    * in which the user appears.
    */
  def runningUserStats(events: Dataset[EventRow]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[EventRow], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(
            UserStats(userId, 0L, 0L, 0.0, new java.sql.Timestamp(0L)))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserStats(
              userId,
              acc.n_events + 1,
              acc.n_purchases + (if (e.event_type == "purchase") 1 else 0),
              acc.revenue + (if (e.event_type == "purchase") e.value else 0.0),
              if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
          }
          state.update(next)
          next
      }
  }

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension (broadcast per batch — the streaming twin of the silver
    * dim joins). No state, no watermark; the static side is re-resolved
    * per trigger so slowly-changing dims pick up new snapshots.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream attribution join: each purchase matched to every view
    * by the same user in the preceding `horizonSec` seconds (the
    * streaming twin of the batch funnel's view→purchase conversion).
    *
    * Both sides carry a watermark and the join condition bounds
    * purchase_ts to [view_ts, view_ts + horizon], so the state store
    * holds only the horizon's worth of views/purchases per partition —
    * without the time-range bound Spark would have to buffer both
    * streams forever. State is keyed by user_id; eviction follows
    * min(watermarks) − horizon. The same function runs in batch (the
    * range condition degrades to an ordinary theta-join predicate).
    */
  /** `joinType` "inner" emits only attributed pairs; "left_outer" also
    * emits each unmatched view (null purchase columns) — but only once
    * the watermark proves no in-horizon purchase can still arrive, so
    * outer results are late by design, never wrong. The watermark delay
    * is derived from `horizonSec` (min 1 hour): a fixed 1-hour delay
    * with a longer horizon would drop in-horizon purchases as late the
    * moment the watermark advanced past them, breaking that contract.
    */
  def viewToPurchase(events: DataFrame, horizonSec: Long = 3600L,
      joinType: String = "inner"): DataFrame = {
    require(horizonSec > 0, s"horizonSec must be positive, got $horizonSec")
    val wm = s"${math.max(horizonSec, 3600L)} seconds"
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", wm)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("amount"))
      .withWatermark("purchase_ts", wm)
    views.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizonSec SECONDS"),
        joinType)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("amount"))
  }

  /** Incremental bronze sink: land each micro-batch in a
    * date-partitioned parquet directory via the shared idempotent
    * foreachBatch sink (the streaming twin of Lakehouse.write).
    * foreachBatch alone is only at-least-once — a batch replayed from
    * the checkpoint after a partial write would double-append — so the
    * layout is keyed on the batch id (see [[Sinks.idempotentPartitioned]]
    * for the replay contract and the layout-v2 migration note).
    * `event_date` stays a partition column beneath `_batch_id`, so
    * downstream date predicates still prune.
    */
  def writeBronzeIncremental(events: DataFrame, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    Sinks.idempotentPartitioned(
      events.withColumn("event_date", to_date(col("ts"))),
      outDir, checkpointDir, Seq("event_date"))

  /** Streaming twin of the batch DQ gate (graft.ops.DqOps): run every
    * check against each micro-batch and hand (batchId, results) to
    * `onResult` — a metrics emitter, an alert hook, or a kill switch.
    * Unlike the batch gate this must NOT throw by default: killing the
    * stream on one bad batch turns a data problem into an availability
    * problem; the caller decides (quarantine the batch, alert, or stop
    * the query from inside `onResult`).
    *
    * Scale: the batch is persisted for the duration of the checks —
    * foreachBatch hands over a LAZY frame, so N unpersisted counts
    * would re-read the batch's source N times (real I/O for file
    * sources) — then released; per-trigger work is one source pass
    * plus N in-memory filter+counts.
    */
  def monitorQuality(events: DataFrame, checks: Seq[graft.ops.DqOps.DqCheck],
      onResult: (Long, Seq[graft.ops.DqOps.DqResult]) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.persist()
        try onResult(batchId, graft.ops.DqOps.run(batch, checks))
        finally batch.unpersist()
    }

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the collected result table (test/utility harness; production
    * callers use their own writeStream).
    *
    * CAVEAT for Append mode over a WATERMARKED aggregation: append only
    * emits windows the watermark has CLOSED, and processAllAvailable
    * advances the watermark to max(event time) − delay — so the final
    * open window(s) are never emitted and the returned table is the
    * stream's closed prefix, not the full input. That is correct
    * streaming semantics, not data loss; use Update/Complete (as the
    * specs here do) when the tail must be visible.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
