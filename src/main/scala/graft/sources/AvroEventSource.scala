package graft.sources

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
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
  *  - READ: the file LIST is driver-side metadata; files parallelize
  *    one-per-task and each task streams its container sequentially
  *    (Avro files decode forward-only — the natural split unit is the
  *    file, like spark-avro's default for unsplittable codecs).
  *
  * Timestamps travel as explicit `timestamp-micros` longs (`ts_micros`)
  * — Avro's logical-type annotations are advisory in GenericData, so
  * the engine states the micros convention explicitly on both ends and
  * round-trips are microsecond-exact (SourcesSpec). The canonical
  * events schema comes back out, so every operator runs unchanged on
  * an Avro-resident copy of the data. */
object AvroEventSource {

  private val AvroSchemaJson =
    """{"type":"record","name":"GraftEvent","namespace":"graft","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"ts_micros","type":"long","logicalType":"timestamp-micros"},
      |{"name":"user_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"},
      |{"name":"props","type":"string"}]}""".stripMargin

  /** Write canonical events as one Avro container file per partition. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    new File(path).mkdirs()
    val rows = df.select(col("event_id"), unix_micros(col("ts")).as("ts_micros"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    val schemaJson = AvroSchemaJson
    rows.rdd.mapPartitionsWithIndex { (i, it) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      w.create(schema, new File(path, f"part-$i%05d.avro"))
      var n = 0L
      it.foreach { r =>
        val rec = new GenericData.Record(schema)
        rec.put("event_id", r.getLong(0))
        rec.put("ts_micros", r.getLong(1))
        rec.put("user_id", r.getLong(2))
        rec.put("event_type", r.getString(3))
        rec.put("value", r.getDouble(4))
        rec.put("props", r.getString(5))
        w.append(rec)
        n += 1
      }
      w.close()
      Iterator(n)
    }.count()
    ()
  }

  /** Read an Avro events directory back to the canonical schema. */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    val files = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted.toSeq
    val carrier = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_micros", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val r = new DataFileReader(new File(f),
          new GenericDatumReader[GenericRecord]())
        try r.iterator().asScala.map(rec => Row(
          rec.get("event_id").asInstanceOf[Long],
          rec.get("ts_micros").asInstanceOf[Long],
          rec.get("user_id").asInstanceOf[Long],
          rec.get("event_type").toString, // avro Utf8 -> String
          rec.get("value").asInstanceOf[Double],
          rec.get("props").toString)).toVector
        finally r.close()
      }
    spark.createDataFrame(rdd, carrier)
      .select(col("event_id"), timestamp_micros(col("ts_micros")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
  }
}
