package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multimodal column plumbing (north-star extension — SURVEY.md §2.3):
  * image/audio/video travel as opaque `binary` columns with typed
  * metadata alongside. The Spark-side mechanics — schema, batched
  * per-partition decode, partition sizing — are real and tested; the
  * actual codec call is STUBBED (no image/audio libraries in this
  * environment) behind [[MultimodalOps.decodeStub]], which any real
  * decoder with the same signature can replace.
  *
  * Why mapPartitions: a decoder has per-call setup (codec init, model
  * load). Batching it per partition amortizes that setup exactly like a
  * vectorized/Arrow-batched UDF would, while keeping the rest of the plan
  * in Tungsten.
  */
object MultimodalOps {

  /** One media row: opaque payload + the metadata a real pipeline carries. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoder output: deterministic metadata extracted from the payload. */
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int)

  /** STUB decoder — replace with a real codec (e.g. javax.imageio /
    * ffmpeg bindings) in production. Deterministic fake: metadata derived
    * arithmetically from payload size so tests and oracles can check the
    * plumbing end-to-end. */
  def decodeStub(row: MediaRow): MediaMeta = {
    val n = row.payload.length
    MediaMeta(row.doc_id, row.media_type, n,
      width = (n % 640) + 1, height = (n % 480) + 1, n_frames = (n % 30) + 1)
  }

  /** The media table, synthesized from `documents` (the driver data has
    * no binary column): text bytes stand in for an encoded payload. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Batched decode over partitions of binary payloads — the real
    * multimodal execution shape. Decoder setup happens once per
    * partition (iterator construction), then streams. */
  def decodeAll(spark: SparkSession, sfDir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would go here (codec/model handles)
      rows.map(decodeStub)
    }
  }

  /** Oracle-checkable rendition of the decode: the stub's arithmetic is
    * restated in SQL over the same bytes, proving schema, batch shape and
    * values line up. */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodeAll(spark, sfDir).toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio'
        |      ELSE 'video' END AS media_type,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
        | CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
        | CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)
}
