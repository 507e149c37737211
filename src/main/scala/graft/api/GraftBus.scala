package graft.api

import java.time.Instant
import java.util.UUID

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables.{Event, Meta}

/** Migration facade for reference users: the public surface of
  * hivent/ex-hivent (`Hivent.emit`, `Hivent.Consumer`, `Hivent.Memory` —
  * reference `lib/hivent.ex:27`, `lib/hivent/consumer.ex:25`,
  * `lib/support/memory.ex:101-142`), re-expressed over the engine's Spark
  * operators so every query a reference user runs today has a direct
  * equivalent here.
  *
  * This is the *test/interactive* backend (the analog of the reference's
  * in-memory store): events buffer on the driver and materialize as a
  * Dataset on demand. Production streams use
  * [[graft.streaming.ConsumerPipeline]] — same semantics, checkpointed.
  *
  * Fidelity notes:
  * - `version` must be an integer — enforced by the type system here,
  *   mirroring the reference's `is_integer` guard (`emitter.ex:64`).
  * - enrichment stamps producer/uuid/created_at/cid at ingest
  *   (`memory.ex:81-97`); cid falls back to a fresh uuid like
  *   `cid || UUID.uuid4`.
  * - `include` implements the DOCUMENTED partial-match semantics (payload
  *   AND meta submap), not the reference's vacuously-true payload
  *   `match?` bug (SURVEY.md §2.1 #15).
  */
class GraftBus(spark: SparkSession, clientId: String = "graft",
    partitionCount: Int = 4) {

  // one lock guards both collections so clear() is atomic w.r.t. consume()
  private val lock = new Object
  private val buffer = mutable.ArrayBuffer.empty[Event]
  private val quarantined = mutable.ArrayBuffer.empty[(Event, String)]

  /** Emit with enrichment + synchronous "ack" (returns the published
    * event, like `Emitter.emit` — reference `emitter.ex:63-68,96-100`). */
  def emit(name: String, payload: String, version: Int,
      cid: Option[String] = None, key: Option[String] = None): Event = {
    val uuid = UUID.randomUUID().toString.replace("-", "")
    val event = Event(
      Meta(name = name, producer = clientId, version = version,
        cid = cid.getOrElse(UUID.randomUUID().toString.replace("-", "")),
        uuid = uuid,
        created_at = java.sql.Timestamp.from(Instant.now()),
        key = key.orNull),
      payload)
    lock.synchronized { buffer += event }
    event
  }

  /** The store as a DataFrame (meta struct + payload string + derived
    * partition), in insertion order via a monotonic seq column. */
  def toDF: DataFrame = {
    import spark.implicits._
    val rows = lock.synchronized { buffer.toVector }
    val base = rows.zipWithIndex.map { case (e, i) => (i.toLong, e) }
      .toDF("seq", "event")
    base.select(col("seq"), col("event.meta").as("meta"),
      col("event.payload").as("payload"))
      .withColumn("partition",
        pmod(hash(coalesce(col("meta.key"), col("meta.uuid"))), lit(partitionCount)))
  }

  // ------------------------------------------------- Memory store queries
  /** `Memory.all` — full scan in insertion order (`memory.ex:62-64`). */
  def all(): Seq[Event] = lock.synchronized { buffer.toVector }

  /** `Memory.last` (`memory.ex:58-60`). */
  def last(): Option[Event] = lock.synchronized { buffer.lastOption }

  /** `Memory.empty?` (`memory.ex:133`). */
  def isEmpty: Boolean = lock.synchronized { buffer.isEmpty }

  /** `Memory.clear` (`memory.ex:54-56`). */
  def clear(): Unit = lock.synchronized {
    buffer.clear()
    quarantined.clear()
  }

  /** `Memory.include?` — partial match on payload and/or meta
    * (documented semantics). Predicates are Spark Columns over the store
    * schema (`meta.*`, `payload`), so the same JSON-path predicates used
    * in the oracle-checked `include_match` query apply here. */
  def include(pred: Column): Boolean =
    toDF.filter(pred).limit(1).count() > 0

  // ------------------------------------------------------------ consumer
  /** Batch consumer: the reference's per-event `process` contract
    * (`consumer.ex:25,68-81`) over everything currently in the store for
    * a topic. `Left(reason)` quarantines the event with its queue name;
    * `Right(())` acks. Returns (ok, quarantined) counts. */
  def consume(topic: String)(process: Event => Either[String, Unit]): (Long, Long) = {
    val events = lock.synchronized { buffer.toVector }
      .filter(_.meta.name == topic)
    var ok = 0L
    var bad = 0L
    events.foreach { e =>
      process(e) match {
        case Right(_) => ok += 1
        case Left(_) =>
          lock.synchronized { quarantined += ((e, s"event:$topic")) }
          bad += 1
      }
    }
    (ok, bad)
  }

  /** The dead-letter queue with source-queue tags (`consumer.ex:98-100`). */
  def deadLetters(): Seq[(Event, String)] =
    lock.synchronized { quarantined.toVector }
}
