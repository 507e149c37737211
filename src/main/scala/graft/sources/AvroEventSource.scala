package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro container-file source/sink built on avro-core ALONE — the
  * `spark-avro` connector jar is not available in this environment
  * (only `avro`/`avro-ipc`/`avro-mapred` ship with Spark's own
  * classpath), so the format support every exchange pipeline expects is
  * implemented directly against the Avro object-container API
  * (`DataFileWriter`/`DataFileReader`), distributed the way any
  * hand-rolled source must be:
  *
  *  - WRITE: one container file per input partition, written where the
  *    partition lives (`mapPartitionsWithIndex` + a count action —
  *    records never funnel through the driver); deflate-compressed.
  *    Each task writes an attempt-unique `.tmp` file and atomically
  *    renames it into place on success, so a retried or speculative
  *    attempt can never interleave bytes into the final container and a
  *    failed attempt leaves only a `.tmp` the reader ignores (the
  *    task-commit protocol Spark's own FileFormatWriter applies).
  *  - READ: the file LIST is driver-side metadata; files parallelize
  *    one-per-task and each task STREAMS its container through a
  *    close-on-exhaustion iterator — per-task memory is one record plus
  *    the codec's block buffer, never the whole container, so a foreign
  *    directory with one multi-GiB file reads in bounded memory. The
  *    reader also closes via a task-completion listener, covering early
  *    termination (limit/take) where the iterator is never exhausted.
  *
  * The schema is derived from the DataFrame, so ANY of the engine's
  * canonical tables round-trips (events, documents, embeddings —
  * SourcesSpec), not just events. Timestamps travel as
  * `timestamp-micros` longs with the logical type nested on the TYPE
  * object (`{"type":"long","logicalType":"timestamp-micros"}` — a
  * field-level annotation is silently ignored by Avro), so external
  * readers see a real timestamp; the read side maps the annotation back
  * to a Spark timestamp and round-trips are microsecond-exact. */
object AvroEventSource {

  /** Spark → Avro field type as schema JSON. Timestamp carries the
    * nested logical-type annotation; arrays keep their element type. */
  private def avroType(dt: DataType): String = dt match {
    case LongType    => "\"long\""
    case IntegerType => "\"int\""
    case DoubleType  => "\"double\""
    case FloatType   => "\"float\""
    case StringType  => "\"string\""
    case TimestampType =>
      """{"type":"long","logicalType":"timestamp-micros"}"""
    case ArrayType(e, _) => s"""{"type":"array","items":${avroType(e)}}"""
    case other => throw new IllegalArgumentException(
      s"AvroEventSource: unsupported column type $other")
  }

  private def avroSchemaJson(schema: StructType): String =
    schema.fields.map(f =>
      s"""{"name":"${f.name}","type":${avroType(f.dataType)}}""")
      .mkString(
        """{"type":"record","name":"GraftRecord","namespace":"graft","fields":[""",
        ",", "]}")

  /** Avro type (from a container's writer schema) → Spark type. */
  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG =>
      if (s.getProp("logicalType") == "timestamp-micros") TimestampType
      else LongType
    case Schema.Type.INT    => IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT  => FloatType
    case Schema.Type.STRING => StringType
    case Schema.Type.ARRAY  => ArrayType(sparkType(s.getElementType))
    case other => throw new IllegalArgumentException(
      s"AvroEventSource: unsupported Avro type $other")
  }

  /** Write any supported DataFrame as one Avro container per partition. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    new File(path).mkdirs()
    // timestamps travel as micros longs; everything else passes through
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType => unix_micros(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    val schemaJson = avroSchemaJson(df.schema)
    val rows = df.select(cols.toIndexedSeq: _*)
    val fieldTypes = rows.schema.fields.map(_.dataType)
    rows.rdd.mapPartitionsWithIndex { (i, it) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val ctx = TaskContext.get()
      // attempt-unique temp name + atomic rename = task commit: retried
      // and speculative attempts never write the same file concurrently
      val finalFile = new File(path, f"part-$i%05d.avro")
      val tmpFile = new File(path,
        f".part-$i%05d.avro.attempt-${ctx.taskAttemptId()}%d.tmp")
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(schema, tmpFile)
      var ok = false
      try {
        it.foreach { r =>
          val rec = new GenericData.Record(schema)
          var j = 0
          while (j < fieldTypes.length) {
            val v = fieldTypes(j) match {
              case ArrayType(_, _) => r.getSeq[Any](j).asJava
              case _ => r.get(j)
            }
            rec.put(j, v)
            j += 1
          }
          w.append(rec)
        }
        w.close()
        ok = true
      } finally if (!ok) { // failed attempt: close + drop the temp file
        try w.close() catch { case _: Throwable => () }
        tmpFile.delete(); ()
      }
      Files.move(tmpFile.toPath, finalFile.toPath,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      Iterator(1)
    }.count()
    ()
  }

  /** Read an Avro directory back to the written Spark schema. The
    * writer schema comes from the first container's header (a footer-
    * free metadata read); each task streams its file record-at-a-time. */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val files = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted.toSeq
    require(files.nonEmpty, s"no .avro containers under $path")
    val header = new DataFileReader(new File(files.head),
      new GenericDatumReader[GenericRecord]())
    val writerSchema = try header.getSchema finally header.close()
    val sparkFields = writerSchema.getFields.asScala
      .map(f => StructField(f.name, sparkType(f.schema))).toSeq
    // timestamp columns arrive as micros longs and convert after load
    val carrier = StructType(sparkFields.map {
      case StructField(n, TimestampType, _, _) => StructField(n, LongType)
      case f => f
    })
    val carrierTypes = carrier.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val r = new DataFileReader(new File(f),
          new GenericDatumReader[GenericRecord]())
        // early termination (limit/take) may abandon the iterator mid-file
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ =>
            try r.close() catch { case _: Throwable => () }))
        new Iterator[Row] {
          private var closed = false
          def hasNext: Boolean =
            if (closed) false
            else if (r.hasNext) true
            else { // close-on-exhaustion keeps the stream lazy AND safe
              try r.close() finally closed = true
              false
            }
          def next(): Row = {
            val rec = r.next()
            Row.fromSeq((0 until carrierTypes.length).map { j =>
              (carrierTypes(j), rec.get(j)) match {
                case (_, null) => null
                case (StringType, v) => v.toString // avro Utf8 -> String
                case (ArrayType(FloatType, _), v) =>
                  v.asInstanceOf[java.util.Collection[java.lang.Float]]
                    .asScala.map(_.floatValue).toSeq
                case (ArrayType(DoubleType, _), v) =>
                  v.asInstanceOf[java.util.Collection[java.lang.Double]]
                    .asScala.map(_.doubleValue).toSeq
                case (ArrayType(LongType, _), v) =>
                  v.asInstanceOf[java.util.Collection[java.lang.Long]]
                    .asScala.map(_.longValue).toSeq
                case (ArrayType(IntegerType, _), v) =>
                  v.asInstanceOf[java.util.Collection[java.lang.Integer]]
                    .asScala.map(_.intValue).toSeq
                case (ArrayType(StringType, _), v) =>
                  v.asInstanceOf[java.util.Collection[AnyRef]]
                    .asScala.map(_.toString).toSeq
                case (_, v) => v
              }
            })
          }
        }
      }
    val raw = spark.createDataFrame(rdd, carrier)
    // restore timestamp columns from their micros carrier
    raw.select(sparkFields.map {
      case StructField(n, TimestampType, _, _) =>
        timestamp_micros(col(n)).as(n)
      case f => col(f.name)
    }.toIndexedSeq: _*)
  }
}
