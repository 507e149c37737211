package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A live, Kafka-shaped streaming source — the engine's analog of the
  * reference's channel subscription runtime (`lib/hivent/consumer.ex:105`
  * joins `"event:#{topic}"` with a `partition_count`; the served queue is
  * the unit of consumer-group sharing, `consumer.ex:92-96`).
  *
  * The broker log is a directory of per-partition append-only files:
  *
  * {{{ <dir>/<topic>/p<partition>.log   // line = key \t tsMicros \t value }}}
  *
  * Offsets are BYTE positions, not record numbers:
  *  - `latestOffset` is `Files.size` per partition — O(1) metadata, no
  *    scan, exactly how a real broker serves end offsets;
  *  - a reader seeks straight to its start offset — resuming from a
  *    checkpoint never re-reads the log prefix;
  *  - the emitted `offset` column (the record's start byte) is strictly
  *    monotonic per partition, preserving Kafka's ordering contract.
  *
  * Consumer groups: each group member runs one streaming query over a
  * DISJOINT `partitions` subset (see [[GraftTopicLog.assignment]] — the
  * round-robin assignor). Members share nothing; the union of their
  * outputs is the topic, mirroring the reference's partition sharing
  * across same-`@service` consumers. Group offsets live in each member's
  * checkpoint — the Spark-native rendition of the server-held consumer
  * offsets.
  *
  * Single-writer-per-partition is the broker contract (the reference
  * serializes appends through the server); appends are whole flushed
  * lines, so a byte offset captured by `latestOffset` always falls on a
  * record boundary.
  */
object GraftTopicLog {

  val Schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true),
    StructField("timestamp", TimestampType, nullable = false)))

  /** Key-hash partition routing (reference `emitter.ex:53` — the key
    * "controls which partition the event is stored in"). Deterministic
    * across JVMs (String.hashCode is specified by the JLS). */
  def partitionFor(key: String, partitionCount: Int): Int = {
    val h = if (key == null) 0 else key.hashCode
    ((h % partitionCount) + partitionCount) % partitionCount
  }

  /** Round-robin partition assignor for a consumer group: member i of n
    * owns every partition p with p % n == i. Disjoint and complete, like
    * the reference server's sharing of a topic's queues across the
    * members of one `@service`. */
  def assignment(partitionCount: Int, memberIndex: Int, memberCount: Int): Seq[Int] =
    (0 until partitionCount).filter(_ % memberCount == memberIndex)

  def partitionFile(dir: String, topic: String, partition: Int): File =
    new File(new File(dir, topic), s"p$partition.log")

  /** Producer append (broker-side). Records are (key, tsMicros, value);
    * value must be single-line text (the engine's wire-debug JSON — tabs
    * and newlines are always escaped inside JSON strings). */
  def append(dir: String, topic: String, records: Seq[(String, Long, String)],
      partitionCount: Int = graft.model.Tables.DefaultPartitionCount): Unit =
    records.groupBy(r => partitionFor(r._1, partitionCount)).foreach {
      case (part, recs) =>
        val f = partitionFile(dir, topic, part)
        f.getParentFile.mkdirs()
        val out = new FileOutputStream(f, true)
        try {
          val payload = recs.map { case (k, ts, v) => s"$k\t$ts\t$v" }
            .mkString("", "\n", "\n")
          out.write(payload.getBytes(UTF_8))
          out.getChannel.force(false) // whole-line durability before ack
        } finally out.close()
    }

  /** End byte offset per assigned partition — O(1) file metadata. */
  private[sources] def endOffsets(dir: String, topic: String,
      partitions: Seq[Int]): Map[Int, Long] =
    partitions.map { p =>
      val f = partitionFile(dir, topic, p)
      p -> (if (f.exists()) f.length() else 0L)
    }.toMap

  /** Offset JSON codec — {"0":123,"7":456}; dependency-free so the
    * checkpoint format is stable. */
  private[sources] def offsetsToJson(m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")

  private[sources] def offsetsFromJson(json: String): Map[Int, Long] = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) Map.empty
    else body.split(",").map { kv =>
      val Array(k, v) = kv.split(":").map(_.trim)
      k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
    }.toMap
  }
}

private[sources] case class GraftTopicOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String = GraftTopicLog.offsetsToJson(offsets)
}

/** One micro-batch slice of one partition: bytes [start, end) of its log. */
private[sources] case class GraftTopicInputPartition(topic: String, partition: Int,
    file: String, startByte: Long, endByte: Long) extends InputPartition

private[sources] class GraftTopicMicroBatchStream(dir: String, topic: String,
    partitions: Seq[Int]) extends MicroBatchStream {

  override def initialOffset(): Offset =
    GraftTopicOffset(partitions.map(_ -> 0L).toMap)

  override def latestOffset(): Offset =
    GraftTopicOffset(GraftTopicLog.endOffsets(dir, topic, partitions))

  override def deserializeOffset(json: String): Offset =
    GraftTopicOffset(GraftTopicLog.offsetsFromJson(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftTopicOffset].offsets
    val e = end.asInstanceOf[GraftTopicOffset].offsets
    e.toSeq.sortBy(_._1).flatMap { case (p, endByte) =>
      val startByte = s.getOrElse(p, 0L)
      if (endByte > startByte)
        Some(GraftTopicInputPartition(topic, p,
          GraftTopicLog.partitionFile(dir, topic, p).getAbsolutePath,
          startByte, endByte))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTopicReaderFactory

  override def commit(end: Offset): Unit = () // retention is external
  override def stop(): Unit = ()
}

private[sources] class GraftTopicReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftTopicPartitionReader(partition.asInstanceOf[GraftTopicInputPartition])
}

/** Reads records in [startByte, endByte) of one partition log. The slice
  * is bounded by the micro-batch (admission happened at offset planning),
  * so a single ranged read is the right I/O shape — one seek, one
  * sequential scan, no per-record syscalls. */
private[sources] class GraftTopicPartitionReader(p: GraftTopicInputPartition)
    extends PartitionReader[InternalRow] {

  private val records: Iterator[(Long, String)] = {
    val ch = java.nio.channels.FileChannel.open(Paths.get(p.file))
    val bytes = try {
      val buf = java.nio.ByteBuffer.allocate((p.endByte - p.startByte).toInt)
      ch.position(p.startByte)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      buf.array()
    } finally ch.close()
    var pos = p.startByte
    new String(bytes, UTF_8).split("\n", -1).iterator.filter(_.nonEmpty).map { line =>
      val at = pos
      pos += line.getBytes(UTF_8).length + 1L
      (at, line)
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (!records.hasNext) false
    else {
      val (off, line) = records.next()
      val Array(key, ts, value) = line.split("\t", 3)
      current = new GenericInternalRow(Array[Any](
        UTF8String.fromString(p.topic), p.partition, off,
        UTF8String.fromString(key), UTF8String.fromString(value), ts.toLong))
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

private[sources] class GraftTopicScan(dir: String, topic: String,
    partitions: Seq[Int]) extends Scan {
  override def readSchema(): StructType = GraftTopicLog.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftTopicMicroBatchStream(dir, topic, partitions)
}

private[sources] class GraftTopicTable(dir: String, topic: String,
    partitions: Seq[Int]) extends Table with SupportsRead {
  override def name(): String = s"graft-topic($topic)"
  override def schema(): StructType = GraftTopicLog.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftTopicScan(dir, topic, partitions)
    }
}

/** DSv2 entry point: `spark.readStream.format(classOf[GraftTopicProvider]
  * .getName).option("path", dir).option("topic", t).load()`.
  *
  * Options:
  *  - `path`            topic-log root directory (required)
  *  - `topic`           topic name (required)
  *  - `partition.count` total partitions (default 4, the reference's
  *                      `config/config.exs:8` default)
  *  - `partitions`      comma-separated subset this member consumes
  *                      (default: all) — the consumer-group assignment
  */
class GraftTopicProvider extends TableProvider {

  private def required(options: CaseInsensitiveStringMap, key: String): String = {
    val v = options.get(key)
    require(v != null && v.nonEmpty, s"graft-topic: missing required option '$key'")
    v
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTopicLog.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val dir = required(options, "path")
    val topic = required(options, "topic")
    val count = options.getInt("partition.count", graft.model.Tables.DefaultPartitionCount)
    val partitions = Option(options.get("partitions")).filter(_.nonEmpty)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(0 until count)
    partitions.foreach(p => require(p >= 0 && p < count,
      s"graft-topic: partition $p outside [0, $count)"))
    new GraftTopicTable(dir, topic, partitions)
  }
}
