package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MessagePackWire
import graft.sources.MessagePackWire._

/** Wire-format fidelity for the MessagePack+gzip transport (reference
  * `message_pack_serializer.ex:18-33`): frames round-trip through the
  * codec, large frames gzip at the reference threshold, and — the
  * documented divergence — gzipped frames still DECODE (the reference's
  * `decode!` never gunzips its own encoder's output).
  */
class MessagePackSpec extends AnyFunSuite with SparkTest {

  private def eventFrame(id: Long, pad: String = ""): WireValue =
    WMap(Seq(
      WStr("event_id") -> WInt(id),
      WStr("ts") -> WStr("2024-01-01T10:00:00.000000Z"),
      WStr("user_id") -> WInt(id % 7),
      WStr("event_type") -> WStr("purchase"),
      WStr("value") -> WDouble(12.5),
      WStr("props") -> WStr(s"""{"k": $id}$pad""")))

  test("pack/unpack round-trips the JSON-shape subset exactly") {
    val v = WMap(Seq(
      WStr("nil") -> WNull,
      WStr("t") -> WBool(true),
      WStr("f") -> WBool(false),
      WStr("small") -> WInt(7),
      WStr("neg") -> WInt(-31),
      WStr("i16") -> WInt(-4000),
      WStr("i64") -> WInt(1234567890123L),
      WStr("d") -> WDouble(3.25),
      WStr("s") -> WStr("héllo\tworld\n"),
      WStr("long_s") -> WStr("x" * 300),
      WStr("bin") -> WBin(Array[Byte](1, 2, -3)),
      WStr("arr") -> WArr(Seq(WInt(1), WStr("two"), WArr(Nil))),
      WStr("deep") -> WMap(Seq(WStr("k") -> WArr(Seq(WNull, WBool(true)))))))
    assert(unpack(pack(v)) == v)
    // every int width decodes back to the same value
    for (n <- Seq(0L, 127L, 128L, -32L, -33L, 255L, 65535L, -65536L,
        Int.MaxValue.toLong + 1, Long.MinValue, Long.MaxValue))
      assert(unpack(pack(WInt(n))) == WInt(n), s"int $n")
  }

  test("frames under 1 KiB stay raw; over gzip — and both decode (serializer.ex:31-33)") {
    val small = encodeFrame(eventFrame(1))
    assert(small.length < MessagePackWire.GzipThreshold)
    assert((small(0) & 0xff) != 0x1f) // not gzipped
    assert(unpack(small) == eventFrame(1))

    val big = eventFrame(2, pad = "y" * 2000)
    val frame = encodeFrame(big)
    assert((frame(0) & 0xff) == 0x1f && (frame(1) & 0xff) == 0x8b,
      "large frame must carry the gzip magic")
    // the reference's decode! would fail here (never gunzips) — ours must not
    assert(unpack(frame) == big)
  }

  test("ingest: a captured frame stream decodes to the canonical event schema") {
    import spark.implicits._
    val frames = (1L to 20L).map(i =>
      encodeFrame(eventFrame(i, pad = if (i % 4 == 0) "z" * 1500 else "")))
    assert(frames.exists(f => (f(0) & 0xff) == 0x1f)) // mixed gzipped + raw
    val df = frames.toDF("frame")
    val events = MessagePackWire.ingestEvents(spark, df)
    assert(events.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val rows = events.orderBy("event_id").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).sameElements(1L to 20L))
    assert(rows.forall(_.getString(3) == "purchase"))
    assert(rows.forall(r => !r.isNullAt(1))) // timestamps parsed, not nulled
    assert(rows.forall(r => r.getDouble(4) == 12.5))
    // props carried byte-for-byte (including the gzip-sized padding)
    assert(rows(3).getString(5).endsWith("z" * 1500))
  }
}
