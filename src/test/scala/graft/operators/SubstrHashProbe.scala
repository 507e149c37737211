package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Ad-hoc measurement main (Test scope, not shipped): prices the
  * hashed-gram shuffle key (`spark.graft.substr.hashGrams`) against the
  * exact-text key for the substring-dedup kernels — wall and total
  * shuffle-write bytes per run, plus an output-equality check (the spec
  * already pins bit-parity at sf0.001; this run measures the byte
  * reduction at sf0.1 and the 10× replica for SCALING.md). */
object SubstrHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffleBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1")) {
      def run(hashed: Boolean): (Seq[String], Double, Long) = {
        if (hashed) spark.conf.set(TextOps.SubstrHashKey, "true")
        try {
          shuffleBytes.set(0L)
          val t0 = System.nanoTime()
          val rows = TextOps.substringSpans(spark, dir).collect()
            .map(_.toString).toSeq.sorted
          val wall = (System.nanoTime() - t0) / 1e9
          // listener events arrive async — give the bus a moment to drain
          Thread.sleep(2000)
          (rows, wall, shuffleBytes.get())
        } finally if (hashed) spark.conf.unset(TextOps.SubstrHashKey)
      }
      val (re, we, be) = run(hashed = false)
      val (rh, wh, bh) = run(hashed = true)
      require(re == rh, s"hashed output diverged at $dir")
      println(f"SUBSTR $dir rows=${re.size} exact: wall=$we%.2fs shuffleMB=${be / 1e6}%.1f " +
        f"| hashed: wall=$wh%.2fs shuffleMB=${bh / 1e6}%.1f | bytes x${be.toDouble / math.max(1, bh)}%.2f")
    }
    spark.stop()
  }
}
