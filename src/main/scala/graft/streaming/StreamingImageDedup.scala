package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.MultimodalOps

/** Streaming MEDIA dedup: image payloads ARRIVE as a stream and each
  * micro-batch is deduplicated against a precomputed perceptual-hash
  * index of the existing corpus (MultimodalOps.phashIndex) — the
  * multimodal rendition of StreamingDedup's text path, with the same
  * economics turned further in streaming's favor: the static side is
  * one (hash, canonical) row per DISTINCT perceptual class, and the
  * arriving side ships 8 bytes per image into the join after a
  * per-partition-amortized decode. No pixel ever shuffles; no
  * cross-batch state exists (a batch's hashes are self-contained), so
  * batch boundaries cannot change any verdict.
  *
  * foreachBatch is at-least-once; writes are idempotent by keying each
  * batch's output directory on the batchId and OVERWRITING it (the
  * StreamingDedup/ConsumerPipeline sink contract).
  */
object StreamingImageDedup {

  /** Start the image-dedup stream: verdicts (doc_id, phash,
    * matched_old, kept) land under `outPath/batch=<id>/`. `index`
    * should be persisted by the caller — it is consumed once per
    * micro-batch. */
  def start(newImages: DataFrame, index: DataFrame,
      checkpointDir: String, outPath: String): StreamingQuery =
    newImages.writeStream
      .queryName("graft-streaming-image-dedup")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try MultimodalOps.phashVerdicts(b, index)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        finally graft.api.Caches.dropTransient(b)
      }
      .start()
}
