package graft.operators

import org.apache.spark.sql.functions._

/** Diagnostic main pricing incremental group-label maintenance
  * (r17 verdict item 6) against the full recompute on a replica dir:
  * the standing corpus (doc_id % 10 != 9) is labeled and MATERIALIZED
  * (the production starting state — labels live in the lake, not in a
  * lineage), then the arriving batch's delta edges merge via
  * `GraphOps.incrementalComponents` vs re-running CC over the union.
  * Prints both wall times and asserts the labels agree bit-for-bit.
  * `sbt "Test/runMain graft.operators.IncrementalCcProbe [dir]"` */
object IncrementalCcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def isNew(c: org.apache.spark.sql.Column) = c % 10 === 9
    val cand = TextOps.candidatePairs(spark, dir)
      .persist().transform(graft.api.Caches.tracked)
    println(s"candidate pairs: ${cand.count()}")
    val oldPairs = cand.filter(!isNew(col("doc_a")) && !isNew(col("doc_b")))
    val deltaPairs = cand.filter(isNew(col("doc_a")) || isNew(col("doc_b")))
      .persist().transform(graft.api.Caches.tracked)
    println(s"delta pairs: ${deltaPairs.count()}")
    // standing state: labels materialized to parquet (production shape)
    val labelsPath = java.nio.file.Files
      .createTempDirectory("inc_cc_labels").toString + "/labels"
    GraphOps.connectedComponents(oldPairs, "doc_a", "doc_b")
      .write.mode("overwrite").parquet(labelsPath)
    val labels = spark.read.parquet(labelsPath)
    println(s"standing labels: ${labels.count()}")

    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // (a) full recompute over the union — what a non-incremental
    // pipeline pays on every arriving batch
    val full = time("full CC over union") {
      val l = GraphOps.connectedComponents(cand, "doc_a", "doc_b")
        .persist().transform(graft.api.Caches.tracked)
      l.count(); l
    }
    // (b) incremental merge of the delta into the standing labels
    val inc = time("incremental merge") {
      val l = GraphOps.incrementalComponents(labels, deltaPairs,
        "doc_a", "doc_b").persist().transform(graft.api.Caches.tracked)
      l.count(); l
    }
    val diff = full.withColumnRenamed("group_id", "g_full")
      .join(inc.withColumnRenamed("group_id", "g_inc"), Seq("node_id"), "full_outer")
      .filter(!(col("g_full") <=> col("g_inc"))).count()
    println(s"label disagreements: $diff")
    require(diff == 0, "incremental labels diverged from the full recompute")
    spark.stop()
  }
}
