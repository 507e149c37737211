package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextOps

/** Streaming decontamination: training documents ARRIVE as a stream and
  * each micro-batch is probed against a PREBUILT index of the eval
  * split's rare shingles (TextOps.evalShingleIndex) — the production
  * shape of benchmark decontamination (the eval sets are fixed and
  * indexed offline; the firehose of candidate training data is what
  * streams).
  *
  * Incidents — (arriving train doc, eval doc, shared rare shingles ≥
  * the batch path's overlap floor) — are computed entirely within each
  * micro-batch: a doc's shingle set is self-contained, and a match
  * requires membership in the (already df-capped) eval index, so NO
  * cross-batch state and NO stream-side corpus statistics are needed,
  * and batch boundaries cannot change any verdict (StreamingSpec proves
  * the union of streamed incidents reproduces the batch `decontaminate`
  * query's per-eval contamination report exactly). foreachBatch is
  * at-least-once, so writes are idempotent by keying each batch's
  * output directory on the batchId and OVERWRITING it (the
  * StreamingDedup/ConsumerPipeline sink contract).
  */
object StreamingDecontaminate {

  /** Start the decontamination stream: incidents (train_id, eval_id,
    * overlap) land under `outPath/batch=<id>/`. `evalIdx` should be
    * persisted by the caller — it is consumed once per micro-batch. */
  def start(newDocs: DataFrame, evalIdx: DataFrame,
      checkpointDir: String, outPath: String): StreamingQuery =
    newDocs.writeStream
      .queryName("graft-streaming-decontaminate")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the shingle pipeline reads the batch once, but a non-trivial
        // source should still be decoded once, not per shuffle retry
        val b = batch.persist()
        try TextOps.decontamIncidents(b, evalIdx)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        finally graft.api.Caches.dropTransient(b)
      }
      .start()
}
