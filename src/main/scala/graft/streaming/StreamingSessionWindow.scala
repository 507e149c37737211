package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.streaming.ConsumerPipeline.RawEvent

/** Streaming twin of the batch `sessionize` query (round-15 verdict
  * item 6): native `session_window` over the raw event stream, keyed by
  * user, with a watermark so closed sessions emit in APPEND mode — the
  * production shape (the earlier `ConsumerPipeline.sessionCounts` runs
  * in complete mode over the enriched topic; this twin is the
  * batch-parity surface over the same `events` schema the oracle
  * tables use).
  *
  * Parity contract vs the batch lag+cumsum `sessionize`
  * (`RelationalOps.sessionize`): for every CLOSED session,
  * (user_id, session_start, n_events) match exactly and the streaming
  * `session_end` equals the batch `max(ts)` PLUS the gap (Spark's
  * session window is `[first_ts, last_ts + gap)` by definition;
  * StreamingSpec compares after subtracting the gap).
  *
  * Documented boundary divergence: Spark's session window MERGES two
  * events iff their distance is STRICTLY below the gap (the window is
  * half-open), while the batch query's `diff > gap → new session`
  * merges at exactly-gap distance. The two disagree ONLY for
  * consecutive same-user events exactly gap apart — microsecond
  * timestamps make that a measure-zero tie; the parity spec first
  * PROVES the dataset has no such pair, then pins equality. This is
  * also why the op is runtime-spec'd rather than oracle-bearing:
  * DuckDB has no session-window rendition, and the batch `sessionize`
  * already carries the oracle for the shared semantics (same reasoning
  * as the other streaming ops — no cross-engine surface for
  * watermark-driven emission).
  *
  * Scale: state is one (user, open-session) tuple per active user —
  * Spark's session-window state store merges sessions in place; the
  * watermark bounds retention. One shuffle on (user_id), exactly like
  * the batch query's window partitioning. */
object StreamingSessionWindow {

  val DefaultGap = "30 minutes"

  /** Closed-session counts per user in append mode. `watermark` is the
    * allowed lateness; 0 seconds gives the tightest emission for
    * in-order replays (the spec), larger values hold sessions open for
    * stragglers in production. */
  def sessions(events: Dataset[RawEvent], gap: String = DefaultGap,
      watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("first_ts"), col("last_ts"), col("n_events"))
}
