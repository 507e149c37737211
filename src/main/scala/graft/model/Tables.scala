package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Canonical data model + loaders for the driver-generated tables
  * (`TESTDATA.md`, `FIXTURES.md`).
  *
  * The reference's single data abstraction is an event: a schemaless JSON
  * payload plus a fixed metadata envelope (reference
  * `lib/hivent/models/event.ex:27-33`). The driver's `events` table is the
  * concrete stand-in: `event_type` ↔ `meta.name`, `ts` ↔ `meta.created_at`,
  * `user_id` ↔ the partition `key`, `props` ↔ the schemaless payload.
  */
object Tables {

  /** All driver tables, one parquet file each under `sfDir`. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by
    * default. Read it as long nanos (legacy conf) and truncate to
    * microsecond timestamps — exactly what DuckDB does when it reads the
    * same file, so oracle parity holds.
    *
    * SIDE EFFECT (deliberate): this sets the session conf
    * `spark.sql.legacy.parquet.nanosAsLong` and leaves it set — the flag
    * must still be active when the lazily-planned scan executes, so a
    * set/restore around the read would break execution. Any later nanos
    * parquet read in the same session will therefore yield long columns
    * instead of an error; the schema match below handles both layouts.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    val tsCol = raw.schema("ts").dataType match {
      // driver data: TIMESTAMP(NANOS) read as long via the legacy conf
      case LongType => org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
      // DuckDB-written replicas: parquet µs with isAdjustedToUTC=false
      // reads as TIMESTAMP_NTZ, which unix_micros/window ops reject —
      // reinterpret the naive value as UTC (the session timezone every
      // engine session pins), same instant DuckDB reads back
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        org.apache.spark.sql.functions.col("ts").cast("timestamp")
      // engine-written data: already microsecond timestamps
      case _ => org.apache.spark.sql.functions.col("ts")
    }
    raw.withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")

  /** Typed event-envelope model (reference `lib/hivent/models/event.ex:27-33`).
    * `payload` stays a JSON string: a fixed StructType would betray the
    * reference's schemaless contract (SURVEY.md §1.3).
    */
  case class Meta(
      name: String,
      producer: String,
      version: Int,
      cid: String,
      uuid: String,
      created_at: java.sql.Timestamp,
      key: String)

  case class Event(meta: Meta, payload: String)

  /** Canonical envelope schema for `from_json` / streaming sources. */
  val metaSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("producer", StringType),
    StructField("version", IntegerType),
    StructField("cid", StringType),
    StructField("uuid", StringType),
    StructField("created_at", TimestampType),
    StructField("key", StringType)))

  val eventSchema: StructType = StructType(Seq(
    StructField("meta", metaSchema),
    StructField("payload", StringType)))

  /** Default server-side partition count (reference `config/config.exs:8`). */
  val DefaultPartitionCount = 4
}
