package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EventSource

/** Source/sink round-trips over the canonical events schema. */
class SourcesSpec extends AnyFunSuite with SparkTest {

  test("date-partitioned parquet sink prunes on time predicates") {
    val events = EventSource.parquet(spark, sf)
    val out = tempDir("part")
    EventSource.writePartitioned(events, out)
    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    // partition pruning: a date filter should scan a subset of partitions
    val pruned = back.filter(col("event_date") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    // non-empty PartitionFilters — 'PartitionFilters: []' must NOT pass
    assert("PartitionFilters: \\[[^\\]]+".r.findFirstIn(plan).isDefined, plan)
    assert(pruned.count() > 0)
  }

  test("JSON round-trip preserves rows and schema") {
    val events = EventSource.parquet(spark, sf)
    val out = tempDir("json")
    EventSource.writeJson(events, out)
    val back = EventSource.readJson(spark, out)
    assert(back.schema.fieldNames.sameElements(events.schema.fieldNames))
    assert(back.count() == events.count())
    assert(back.agg(sum("event_id")).head().getLong(0) ==
      events.agg(sum("event_id")).head().getLong(0))
    // microsecond-exact: the default .SSS format would truncate
    assert(back.agg(sum(unix_micros(col("ts")))).head().getLong(0) ==
      events.agg(sum(unix_micros(col("ts")))).head().getLong(0))
  }

  test("CSV round-trip preserves rows") {
    val events = EventSource.parquet(spark, sf)
    val out = tempDir("csv")
    EventSource.writeCsv(events, out)
    val back = EventSource.readCsv(spark, out)
    assert(back.count() == events.count())
  }

  test("ORC round-trip preserves rows and microsecond timestamps") {
    val events = EventSource.parquet(spark, sf)
    val out = tempDir("orc")
    EventSource.writeOrc(events, out)
    val back = EventSource.readOrc(spark, out)
    assert(back.schema.fieldNames.sameElements(events.schema.fieldNames))
    assert(back.count() == events.count())
    assert(back.agg(sum(unix_micros(col("ts")))).head().getLong(0) ==
      events.agg(sum(unix_micros(col("ts")))).head().getLong(0))
    // columnar pushdown works on ORC like parquet
    val plan = back.filter(col("event_id") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id,42)"), plan)
  }

  test("bucketed tables co-locate joins: no shuffle exchange on the join key") {
    val events = EventSource.parquet(spark, sf)
    // external table at a fresh path: the in-memory catalog dies with
    // the JVM but a warehouse-relative location would survive and block
    // the next CREATE — an explicit temp path sidesteps both
    spark.sql("DROP TABLE IF EXISTS events_bucketed")
    EventSource.writeBucketed(events, "events_bucketed", tempDir("bucketed"),
      buckets = 8, key = "user_id")
    val t = spark.table("events_bucketed")
    val joined = t.as("a").join(t.as("b"), "user_id")
      .groupBy("user_id").count()
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the key: the join itself needs no
    // hashpartitioning exchange (only the scan and agg machinery remain)
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 0, s"expected bucket-co-located join, got:\n$plan")
    assert(joined.count() > 0)
  }

  test("streaming file source replays at-rest data through the consumer") {
    val events = EventSource.parquet(spark, sf)
    val stage = tempDir("stage")
    events.write.mode("overwrite").parquet(stage)
    val stream = EventSource.streamParquet(spark, stage)
    assert(stream.isStreaming)
    val q = graft.streaming.ConsumerPipeline.start(
      stream, tempDir("ok"), tempDir("dlq"), tempDir("ckpt"))
    try q.processAllAvailable() finally q.stop()
  }
}
