package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming bottom-k sampler: maintains an EXACT uniform k-subset of
  * everything that has ever arrived — the streaming rendition of the
  * batch `bottomk_sample` (PipelineOps.bottomkSample), and the textbook
  * use of bottom-k's merge property: the bottom-k of a union is the
  * bottom-k of the parts' bottom-ks, so per batch the state update is
  * `bottomK(state ∪ bottomK(batch))` — k rows of state, k candidate
  * rows per batch, NEVER the full history. At any instant the state is
  * exactly what the batch sampler would produce over all events so far
  * (StreamingSpec proves bit-parity), which no reservoir scheme run per
  * batch gives you.
  *
  * State layout mirrors [[StreamingCdc]]: versioned k-row snapshots
  * `statePath/v=<batchId>`; each batch reads the newest version below
  * its own id and overwrites its own, so an at-least-once replay
  * recomputes from the same predecessor instead of re-sampling —
  * idempotent by construction. Versions two behind are pruned.
  */
object StreamingBottomK {

  /** Sample size (matches the batch sampler's contract). */
  val K = 100

  /** Seeded hash over the event id — the same md5 idiom as the batch
    * sampler family, so the sample is a fixed uniform draw per event,
    * reproducible across replays and engines. */
  private def hashed(batch: DataFrame): DataFrame =
    batch.select(col("event_id"),
      expr("cast(conv(substring(md5(concat('btk:', cast(event_id as string))), " +
        "1, 7), 16, 10) as bigint)").as("hk"))

  private def bottomK(df: DataFrame): DataFrame =
    df.orderBy(col("hk"), col("event_id")).limit(K)

  private def versions(spark: SparkSession, statePath: String): Seq[Long] = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toLong }
  }

  /** The newest committed k-row sample (for readers). */
  def state(spark: SparkSession, statePath: String): DataFrame = {
    val vs = versions(spark, statePath)
    require(vs.nonEmpty, s"no sample snapshot under $statePath")
    spark.read.parquet(s"$statePath/v=${vs.max}")
  }

  def start(events: DataFrame, statePath: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .queryName("graft-streaming-bottomk")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val prevIds = versions(spark, statePath).filter(_ < batchId)
        val fresh = bottomK(hashed(batch))
        val merged = prevIds.sorted.lastOption match {
          case Some(v) => bottomK(
            spark.read.parquet(s"$statePath/v=$v").unionByName(fresh))
          case None => fresh
        }
        merged.write.mode("overwrite").parquet(s"$statePath/v=$batchId")
        val fs = new Path(statePath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        prevIds.filter(_ < batchId - 1)
          .foreach(v => fs.delete(new Path(s"$statePath/v=$v"), true))
      }
      .start()
}
