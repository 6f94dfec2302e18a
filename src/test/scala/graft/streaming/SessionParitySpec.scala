package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.EventStreams.EventRow

/** Pins the relationship between the two sessionizers the engine ships:
  * the batch lag-gap operator (graft.ops.TimeOps.sessionize, q27's core)
  * and the native `session_window` used by EventStreams.userSessions
  * (batch AND streaming — one definition, two modes).
  *
  * Both use a 30-minute gap and — pinned here, measured not assumed —
  * the SAME boundary convention: lag-gap starts a new session only when
  * the gap is STRICTLY greater than 1800 s (q27's `> 1800`), and
  * session_window merges an event arriving at exactly last_ts + gap into
  * the open session (its end bound is inclusive for merging). So the two
  * sessionizers agree event-for-event everywhere, boundary included, and
  * q27's batch semantics carry to the streaming path unchanged.
  */
class SessionParitySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1: gaps 1799 s (same session both), then 1801 s (split both)
  // user 2: one gap of exactly 1800 s (the boundary instant)
  private val events = Seq(
    EventRow(1L, 1L, ts("2024-01-01 10:00:00"), "view", 0.0),
    EventRow(2L, 1L, ts("2024-01-01 10:29:59"), "purchase", 10.0),
    EventRow(3L, 1L, ts("2024-01-01 11:00:00"), "view", 0.0),
    EventRow(4L, 2L, ts("2024-01-01 10:00:00"), "view", 0.0),
    EventRow(5L, 2L, ts("2024-01-01 10:30:00"), "purchase", 20.0))

  private def lagGapSessions = {
    graft.ops.TimeOps.sessionize(
        events.toDF(), keys = Seq("user_id"), tsCol = "ts",
        gapSec = 1800L, tieCols = Seq("event_id"))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_idx")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
  }

  private def windowSessions = {
    EventStreams.userSessions(events.toDF())
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
  }

  test("away from the exact boundary the two sessionizers agree event-for-event") {
    assert(lagGapSessions.filter(_._1 == 1L) === Seq((1L, 2L), (1L, 1L)))
    assert(windowSessions.filter(_._1 == 1L) === Seq((1L, 2L), (1L, 1L)))
  }

  test("Δ = exactly 1800 s: BOTH sessionizers merge — same strict-> boundary convention") {
    assert(lagGapSessions.filter(_._1 == 2L) === Seq((2L, 2L)))
    assert(windowSessions.filter(_._1 == 2L) === Seq((2L, 2L)))
  }

  test("userSessions agrees with itself across batch and streaming execution") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    in.addData(events: _*)
    // watermark pusher so every session closes and appends
    in.addData(EventRow(99L, 99L, ts("2024-01-02 12:00:00"), "view", 0.0))
    val streamed = EventStreams.runToMemory(
        EventStreams.userSessions(in.toDF()), "session_parity", OutputMode.Append())
      .filter(col("user_id") < 99L)
      .select("user_id", "session_start", "session_end", "n_events", "session_revenue")
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = EventStreams.userSessions(events.toDF())
      .select("user_id", "session_start", "session_end", "n_events", "session_revenue")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
