package graft

import org.apache.spark.sql.functions.col
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

  test("msgpack_to_json is a NATIVE expression: UDF-free plan, codegen + interpreted agree") {
    import spark.implicits._
    val frames = (1L to 8L).map(i =>
      encodeFrame(eventFrame(i, pad = if (i % 2 == 0) "y" * 1400 else "")))
    val df = frames.toDF("frame")
    // decode equals the plain library composition the old UDF ran
    val viaExpr = df.select(
      graft.functions.WireFunctions.msgpack_to_json(col("frame")).as("j"))
      .collect().map(_.getString(0)).toSeq
    val viaLib = frames.map(f => MessagePackWire.toJson(unpack(f)))
    assert(viaExpr == viaLib)
    // null frame -> null out (UnaryExpression null contract)
    val withNull = (frames.map(Option(_)) :+ None).toDF("frame")
    val outs = withNull.select(
      graft.functions.WireFunctions.msgpack_to_json(col("frame")).as("j")).collect()
    assert(outs.count(_.isNullAt(0)) == 1)
    // the ingest plan carries NO UDF node (no catalyst<->Scala SerDe
    // boundary); repartition first or ConvertToLocalRelation folds the
    // whole tiny frame at plan time and there is no stage to inspect
    val plan = MessagePackWire.ingestEvents(spark, df.repartition(2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"ingest plan still carries a UDF:\n$plan")
    // standalone (without from_json, which is CodegenFallback by design)
    // the decode projection compiles into a WholeStageCodegen span
    val alone = df.repartition(2).select(
      graft.functions.WireFunctions.msgpack_to_json(col("frame")).as("j"))
    alone.collect() // force AQE to finalize the stages it reports
    val alonePlan = alone.queryExecution.executedPlan.toString
    // AQE's string rendering marks a codegen span with the "*(n)" stage
    // prefix rather than the literal WholeStageCodegen node name
    assert(alonePlan.contains("WholeStageCodegen") || alonePlan.contains("*(1)"),
      s"decode projection fell out of codegen:\n$alonePlan")
    // SQL registration path (the FunctionsSpec dot_product pattern: run
    // the injection wiring, then register the same builder on the shared
    // pre-extension test session)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "msgpack_to_json",
        children => graft.functions.MsgPackToJson(children.head),
        "scala_udf")
    frames.toDF("frame").createOrReplaceTempView("wire_frames")
    val viaSql = spark.sql(
      "SELECT msgpack_to_json(frame) AS j FROM wire_frames")
      .collect().map(_.getString(0)).toSeq
    assert(viaSql.sorted == viaLib.sorted)
  }
}
