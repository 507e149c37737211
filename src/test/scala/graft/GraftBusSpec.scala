package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{GraftBus, ReplyError, ReplyOk, ReplyTimeout}

/** Mirrors the reference's public-API tests: emitter enrichment
  * (`test/lib/emitter_test.exs:53-64`), memory store semantics
  * (`test/lib/support/memory_test.exs:12-92`), consumer happy-path +
  * quarantine (`test/lib/consumer_test.exs:47-111`).
  */
class GraftBusSpec extends AnyFunSuite with SparkTest {

  test("emit enriches: producer, uuid, created_at, cid fallback, returns event") {
    val bus = new GraftBus(spark, clientId = "hivent_test")
    val e = bus.emit("an:event", """{"foo": "bar"}""", version = 1,
      cid = Some("a_cid"), key = Some("a_key"))
    assert(e.meta.producer == "hivent_test")
    assert(e.meta.version == 1)
    assert(e.meta.cid == "a_cid")
    assert(e.meta.key == "a_key")
    assert(e.meta.uuid.nonEmpty && e.meta.created_at != null)
    val noCid = bus.emit("an:event", "{}", version = 2)
    assert(noCid.meta.cid.nonEmpty) // cid || uuid4 (memory.ex:93)
  }

  test("memory store: all / last / empty? / clear (memory_test.exs)") {
    val bus = new GraftBus(spark)
    assert(bus.isEmpty)
    bus.emit("some:event", """{"item": 55}""", 1)
    bus.emit("other:event", """{"item": 56}""", 1)
    assert(bus.all().map(_.meta.name) == Seq("some:event", "other:event"))
    assert(bus.last().get.payload.contains("56"))
    bus.clear()
    assert(bus.isEmpty && bus.last().isEmpty)
  }

  test("include?: partial matching on payload and meta (memory_test.exs:72-91)") {
    val bus = new GraftBus(spark)
    bus.emit("some:event", """{"item": 55}""", 1)
    assert(bus.include(col("meta.name") === "some:event"))
    assert(bus.include(col("meta.name") === "some:event" &&
      get_json_object(col("payload"), "$.item").cast("int") === 55))
    assert(!bus.include(col("meta.name") === "some:event" &&
      get_json_object(col("payload"), "$.item").cast("int") === 99))
    assert(!bus.include(col("meta.name") === "no:event"))
  }

  test("consumer: ok acks, error quarantines with queue tag (consumer_test.exs:90-111)") {
    val bus = new GraftBus(spark)
    bus.emit("some:event", """{"response": "ok"}""", 1)
    bus.emit("some:event", """{"response": "error"}""", 1)
    bus.emit("unrelated:event", """{"response": "error"}""", 1)
    val (ok, bad) = bus.consume("some:event") { e =>
      if (e.payload.contains("\"error\"")) Left("boom") else Right(())
    }
    assert(ok == 1 && bad == 1)
    val dlq = bus.deadLetters()
    assert(dlq.size == 1)
    assert(dlq.head._2 == "event:some:event") // source queue carried along
    assert(dlq.head._1.payload.contains("error"))
  }

  test("empty store: toDF and include behave, no crash on zero events") {
    val bus = new GraftBus(spark)
    assert(bus.toDF.count() == 0)
    assert(!bus.include(col("meta.name") === "anything"))
    bus.clear() // idempotent on empty
    assert(bus.isEmpty)
  }

  test("push_and_receive: ok reply correlated by ref; request is published (channel_client.ex:196-224)") {
    val bus = new GraftBus(spark)
    bus.onRequest("search") { e =>
      Right(s"""{"result": "found", "echo": ${e.payload}}""")
    }
    val r = bus.pushAndReceive("search", """{"query": "Elixir"}""", version = 1)
    r match {
      case ReplyOk(resp) =>
        assert(resp.contains("\"found\""))
        assert(resp.contains("\"Elixir\"")) // the reply saw the pushed payload
      case other => fail(s"expected ok reply, got $other")
    }
    // the request event was published to the store like any emit
    // (emitter_test.exs:66-72 — reply path returns the published event)
    assert(bus.all().map(_.meta.name) == Seq("search"))
    assert(bus.last().get.payload.contains("Elixir"))
  }

  test("push_and_receive: error replies and timeouts") {
    val bus = new GraftBus(spark)
    bus.onRequest("failing") { _ => Left("""{"reason": "nope"}""") }
    bus.pushAndReceive("failing", "{}", 1) match {
      case ReplyError(resp) => assert(resp.contains("nope"))
      case other => fail(s"expected error reply, got $other")
    }
    // no responder for this topic → no reply arrives → timeout
    assert(bus.pushAndReceive("unanswered", "{}", 1, timeoutMillis = 50L) == ReplyTimeout)
    // a reply after the waiter gave up is dropped (unsubscribe-in-after)
    assert(!bus.reply(999L, Right("late")))
  }

  test("store DF: partition derived from key within [0, partitionCount)") {
    val bus = new GraftBus(spark, partitionCount = 4)
    (1 to 20).foreach(i => bus.emit("e", "{}", 1, key = Some(s"k$i")))
    val parts = bus.toDF.select("partition").collect().map(_.getInt(0))
    assert(parts.forall(p => p >= 0 && p < 4))
    assert(bus.toDF.count() == 20)
  }
}
