package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's wire format, decodable by the engine: events travel
  * as MessagePack frames, gzip-compressed when they exceed 1 KiB
  * (reference `lib/hivent/phoenix/transports/message_pack_serializer.ex:
  * 8,18-33` — JSON-shape terms packed with `enable_string`, then
  * `:zlib.gzip` above `@gzip_threshold`).
  *
  * One DELIBERATE divergence: the reference's `decode!` never gunzips
  * (`message_pack_serializer.ex:26-28` unpacks the raw bytes), so its own
  * encoder's large frames cannot round-trip — a latent bug. This decoder
  * sniffs the gzip magic (0x1f 0x8b) and inflates first, so any frame
  * [[encodeFrame]] (or the reference encoder) produces is ingestible.
  *
  * The codec is dependency-free (format constants from the public
  * MessagePack spec) and covers the JSON-shape subset the wire carries:
  * nil/bool/int/float/str/bin/array/map.
  */
object MessagePackWire {

  /** `@gzip_threshold` (`message_pack_serializer.ex:8`). */
  val GzipThreshold = 1024

  // ---------------------------------------------------------------- AST
  sealed trait WireValue
  case object WNull extends WireValue
  case class WBool(b: Boolean) extends WireValue
  case class WInt(v: Long) extends WireValue
  case class WDouble(v: Double) extends WireValue
  case class WStr(s: String) extends WireValue
  case class WBin(bytes: Seq[Byte]) extends WireValue
  case class WArr(items: Seq[WireValue]) extends WireValue
  case class WMap(entries: Seq[(WireValue, WireValue)]) extends WireValue

  // ------------------------------------------------------------- encode
  def pack(v: WireValue): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    packInto(v, out)
    out.flush()
    bos.toByteArray
  }

  private def packInto(v: WireValue, out: DataOutputStream): Unit = v match {
    case WNull => out.writeByte(0xc0)
    case WBool(b) => out.writeByte(if (b) 0xc3 else 0xc2)
    case WInt(n) =>
      if (n >= 0 && n <= 127) out.writeByte(n.toInt)           // positive fixint
      else if (n >= -32 && n < 0) out.writeByte(0xe0 | (n + 32).toInt)
      else if (n >= Byte.MinValue && n <= Byte.MaxValue) { out.writeByte(0xd0); out.writeByte(n.toInt) }
      else if (n >= Short.MinValue && n <= Short.MaxValue) { out.writeByte(0xd1); out.writeShort(n.toInt) }
      else if (n >= Int.MinValue && n <= Int.MaxValue) { out.writeByte(0xd2); out.writeInt(n.toInt) }
      else { out.writeByte(0xd3); out.writeLong(n) }
    case WDouble(d) => out.writeByte(0xcb); out.writeDouble(d)
    case WStr(s) =>
      val b = s.getBytes(UTF_8)
      if (b.length <= 31) out.writeByte(0xa0 | b.length)        // fixstr — enable_string
      else if (b.length <= 0xff) { out.writeByte(0xd9); out.writeByte(b.length) }
      else if (b.length <= 0xffff) { out.writeByte(0xda); out.writeShort(b.length) }
      else { out.writeByte(0xdb); out.writeInt(b.length) }
      out.write(b)
    case WBin(bytes) =>
      val b = bytes.toArray
      if (b.length <= 0xff) { out.writeByte(0xc4); out.writeByte(b.length) }
      else if (b.length <= 0xffff) { out.writeByte(0xc5); out.writeShort(b.length) }
      else { out.writeByte(0xc6); out.writeInt(b.length) }
      out.write(b)
    case WArr(items) =>
      if (items.length <= 15) out.writeByte(0x90 | items.length)
      else if (items.length <= 0xffff) { out.writeByte(0xdc); out.writeShort(items.length) }
      else { out.writeByte(0xdd); out.writeInt(items.length) }
      items.foreach(packInto(_, out))
    case WMap(entries) =>
      if (entries.length <= 15) out.writeByte(0x80 | entries.length)
      else if (entries.length <= 0xffff) { out.writeByte(0xde); out.writeShort(entries.length) }
      else { out.writeByte(0xdf); out.writeInt(entries.length) }
      entries.foreach { case (k, vv) => packInto(k, out); packInto(vv, out) }
  }

  /** Wire frame: packed bytes, gzipped above the threshold
    * (`message_pack_serializer.ex:31-33`). */
  def encodeFrame(v: WireValue): Array[Byte] = {
    val packed = pack(v)
    if (packed.length < GzipThreshold) packed
    else {
      val bos = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(packed)
      gz.close()
      bos.toByteArray
    }
  }

  // ------------------------------------------------------------- decode
  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Unpack a wire frame, inflating first when gzipped (the divergence
    * from the reference's gunzip-less `decode!` — see class doc). */
  def unpack(bytes: Array[Byte]): WireValue = {
    val raw = if (!isGzip(bytes)) bytes else {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    }
    val buf = ByteBuffer.wrap(raw) // big-endian by default, per the spec
    val v = read(buf)
    require(!buf.hasRemaining, s"trailing ${buf.remaining()} bytes after one value")
    v
  }

  private def read(buf: ByteBuffer): WireValue = {
    val b = buf.get() & 0xff
    b match {
      case x if x <= 0x7f => WInt(x)                            // positive fixint
      case x if x >= 0xe0 => WInt((x - 0x100).toLong)           // negative fixint
      case x if (x & 0xf0) == 0x80 => readMap(buf, x & 0x0f)    // fixmap
      case x if (x & 0xf0) == 0x90 => readArr(buf, x & 0x0f)    // fixarray
      case x if (x & 0xe0) == 0xa0 => readStr(buf, x & 0x1f)    // fixstr
      case 0xc0 => WNull
      case 0xc2 => WBool(false)
      case 0xc3 => WBool(true)
      case 0xc4 => readBin(buf, buf.get() & 0xff)
      case 0xc5 => readBin(buf, buf.getShort() & 0xffff)
      case 0xc6 => readBin(buf, buf.getInt())
      case 0xca => WDouble(buf.getFloat().toDouble)
      case 0xcb => WDouble(buf.getDouble())
      case 0xcc => WInt(buf.get() & 0xffL)
      case 0xcd => WInt(buf.getShort() & 0xffffL)
      case 0xce => WInt(buf.getInt() & 0xffffffffL)
      case 0xcf => WInt(buf.getLong()) // uint64 > Long.Max unsupported (wire carries JSON-range ints)
      case 0xd0 => WInt(buf.get().toLong)
      case 0xd1 => WInt(buf.getShort().toLong)
      case 0xd2 => WInt(buf.getInt().toLong)
      case 0xd3 => WInt(buf.getLong())
      case 0xd9 => readStr(buf, buf.get() & 0xff)
      case 0xda => readStr(buf, buf.getShort() & 0xffff)
      case 0xdb => readStr(buf, buf.getInt())
      case 0xdc => readArr(buf, buf.getShort() & 0xffff)
      case 0xdd => readArr(buf, buf.getInt())
      case 0xde => readMap(buf, buf.getShort() & 0xffff)
      case 0xdf => readMap(buf, buf.getInt())
      case other => throw new IllegalArgumentException(
        f"unsupported MessagePack format byte 0x$other%02x")
    }
  }

  private def readStr(buf: ByteBuffer, len: Int): WStr = {
    val b = new Array[Byte](len); buf.get(b); WStr(new String(b, UTF_8))
  }
  private def readBin(buf: ByteBuffer, len: Int): WBin = {
    val b = new Array[Byte](len); buf.get(b); WBin(b.toSeq)
  }
  private def readArr(buf: ByteBuffer, n: Int): WArr =
    WArr((0 until n).map(_ => read(buf)))
  private def readMap(buf: ByteBuffer, n: Int): WMap =
    WMap((0 until n).map(_ => (read(buf), read(buf))))

  // ------------------------------------------------- JSON bridge + ingest
  /** Canonical JSON rendering of a decoded frame — the bridge into the
    * engine's line-JSON parsing, so MessagePack ingest reuses the same
    * schema-checked path as every other source. */
  def toJson(v: WireValue): String = v match {
    case WNull => "null"
    case WBool(b) => b.toString
    case WInt(n) => n.toString
    case WDouble(d) =>
      if (d.isNaN || d.isInfinite) "null" else d.toString
    case WStr(s) => jsonQuote(s)
    case WBin(bytes) => jsonQuote(java.util.Base64.getEncoder.encodeToString(bytes.toArray))
    case WArr(items) => items.map(toJson).mkString("[", ",", "]")
    case WMap(entries) => entries.map {
      case (WStr(k), vv) => jsonQuote(k) + ":" + toJson(vv)
      case (k, vv) => jsonQuote(toJson(k)) + ":" + toJson(vv) // non-string key: stringify
    }.mkString("{", ",", "}")
  }

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Static-forwarder-friendly decode entry (called from generated code
    * by [[graft.functions.MsgPackToJson]] and usable from Java). */
  def decodeToJson(b: Array[Byte]): String = toJson(unpack(b))

  /** Decode a DataFrame of binary wire frames into canonical events:
    * per-row frame → JSON via the NATIVE [[graft.functions.MsgPackToJson]]
    * expression (r14 — formerly the engine's one Scala UDF; the
    * expression keeps the decode inside whole-stage codegen), then the
    * SAME schema-checked from_json path the topic source uses.
    * Distributed: the codec runs where the frames live; nothing funnels
    * through the driver. */
  def ingestEvents(spark: SparkSession, frames: DataFrame,
      frameCol: String = "frame"): DataFrame =
    EventSource.parseWireJson(frames.select(
      graft.functions.WireFunctions.msgpack_to_json(col(frameCol)).as("value")))
}
