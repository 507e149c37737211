package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming rendition of the reference's consumer runtime
  * (SURVEY.md §3.2): topic subscription → per-event processing →
  * at-least-once with dead-letter quarantine (reference
  * `lib/hivent/consumer.ex:68-81,98-100`), upgraded to effectively-once
  * via uuid dedup within the watermark.
  *
  * Runtime mapping (SURVEY.md §1.3):
  * - consumer group (`@service`)  → one streaming query per service, its
  *   own checkpoint dir = the group's offset state;
  * - partitioned queues           → `repartition(n, key)` before stateful
  *   stages;
  * - quarantine                   → `foreachBatch` union-split to ok/dlq
  *   sinks (idempotent parquet appends keyed by batchId);
  * - reconnect/backoff            → Spark task retry + query restart from
  *   checkpoint (runtime concern, no data-plane logic needed).
  */
object ConsumerPipeline {

  case class RawEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Metadata enrichment, streaming form — same derivations as the batch
    * `EventOps.emitEnrich` (deterministic uuid/cid; created_at from event
    * time, never the wall clock). */
  def enrich(events: DataFrame, producer: String = "graft"): DataFrame =
    events.select(
      col("event_id"),
      col("event_type").as("name"),
      lit(producer).as("producer"),
      md5(col("event_id").cast("string")).as("uuid"),
      col("ts").as("created_at"),
      col("user_id").cast("string").as("key"),
      (abs(col("user_id")) % 4).as("part_id"),
      col("value"),
      col("props").as("payload"))

  /** Topic subscription = streaming filter (reference `consumer.ex:105`). */
  def subscribe(enriched: DataFrame, topic: String): DataFrame =
    enriched.filter(col("name") === topic)

  /** Outcome of the user processing callback (reference `consumer.ex:25`);
    * the deterministic rule stands in for user code. */
  def withOutcome(enriched: DataFrame): DataFrame =
    enriched.withColumn("outcome",
      when(col("name") === "error" || col("value") < 0, lit("error"))
        .otherwise(lit("ok")))

  /** Effectively-once upgrade: drop duplicate uuids within the watermark
    * (the reference is at-least-once and leaves idempotence to the user —
    * SURVEY.md §2.2 "Stateful ops"). */
  def dedupByUuid(enriched: DataFrame, watermark: String = "10 minutes"): DataFrame =
    enriched.withWatermark("created_at", watermark).dropDuplicates("uuid")

  /** At-least-once consume with DLQ: every micro-batch is union-split to
    * the ok sink and the quarantine sink. Parquet appends inside
    * foreachBatch are idempotent per (batchId) on restart via checkpoint
    * replay protection. */
  def start(events: DataFrame, okPath: String, dlqPath: String,
      checkpointDir: String, service: String = "graft-consumer"): StreamingQuery =
    withOutcome(enrich(events))
      .writeStream
      .queryName(service)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val routed = batch.cache()
        try {
          routed.filter(col("outcome") === "ok")
            .write.mode("append").parquet(okPath)
          routed.filter(col("outcome") =!= "ok")
            .withColumn("queue", concat(lit("event:"), col("name")))
            .write.mode("append").parquet(dlqPath)
        } finally routed.unpersist()
      }
      .start()

  /** Tumbling windowed aggregation with watermark — late rows beyond the
    * watermark are dropped (engine policy; the reference has no event-time
    * processing at all, SURVEY.md §2.2). */
  def tumblingCounts(enriched: DataFrame, watermark: String = "1 hour"): DataFrame =
    enriched
      .withWatermark("created_at", watermark)
      .groupBy(window(col("created_at"), "1 hour"), col("name"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("name"), col("n"))

  /** Native session windows (30-min gap) — streaming-only; the batch
    * oracle uses the portable lag+cumsum formulation instead
    * (SURVEY.md §7.3 risk 5). */
  def sessionCounts(enriched: DataFrame, gap: String = "30 minutes"): DataFrame =
    enriched
      .withWatermark("created_at", "1 hour")
      .groupBy(session_window(col("created_at"), gap), col("key"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("key"), col("n_events"))
}
