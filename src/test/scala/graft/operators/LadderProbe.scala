package graft.operators

import org.apache.spark.sql.functions._

/** Diagnostic main for the r15 entry ladder: per-probe recall and total
  * visited, flat vs ladder, on a given dir (default the 10× replica).
  * `sbt "Test/runMain graft.operators.LadderProbe [dir] [efSearch]"` */
object LadderProbe {

  /** Deterministic clustered corpus: `n` unit vectors in 64-dim around
    * 100 hash-derived centers with small within-cluster spread — the
    * geometry real embedding corpora have (and the replica's clone
    * cliques don't): clear gradients, so beam walk-in cost is real. */
  def clustered(n: Int, dim: Int = 64, k: Int = 100): Array[(Long, Array[Double])] = {
    def h(seed: Long, j: Int): Double = {
      var x = seed * 6364136223846793005L + j * 1442695040888963407L
      x ^= (x >>> 33); x *= -7046029254386353131L; x ^= (x >>> 29)
      (x.toDouble / Long.MaxValue) // [-1, 1), deterministic
    }
    (0 until n).map { i =>
      val c = i % k
      val v = Array.tabulate(dim)(j => h(c + 1L, j) + 0.15 * h(1000003L * (i + 1), j))
      i.toLong -> v
    }.toArray
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val ef = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val shards = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val P = GraphAnn.Params(m = 8, efConstruction = 48, efSearch = ef, nShards = shards)
    val e =
      if (dir.startsWith("synthetic")) {
        val n = dir.split(":").last.toInt
        import spark.implicits._
        LadderProbe.clustered(n).toSeq.toDF("vec_id", "v")
      } else graft.model.Tables.embeddings(spark, dir)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val all = e.collect().map { r =>
      val v = r.getSeq[Double](1).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      r.getLong(0) -> v.map(_ / n)
    }.toMap
    val probes = (0L until 10L).map(id => id -> all(id))
    def exact(pid: Long, pv: Array[Double]) = all.toSeq.filter(_._1 != pid)
      .map { case (id, v) => (-v.zip(pv).map { case (a, b) => a * b }.sum, id) }
      .sorted.take(10).map(_._2).toSet
    val truth = probes.map { case (p, v) => p -> exact(p, v) }.toMap
    val hierEf = args.drop(3).headOption.map(_.toInt).getOrElse(ef)
    val Ph = P.copy(efSearch = hierEf)
    val flatIdx = GraphAnn.buildIndex(e, P).cache(); flatIdx.count()
    val hierIdx = GraphAnn.buildIndexHier(e, Ph).cache(); hierIdx.count()
    def rec(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (pid, rs) =>
          pid -> rs.map(_._2).filter(_ != pid).take(10).toSet }
    val fr = rec(GraphAnn.search(flatIdx, probes, 11, P).collect())
    val hr = rec(GraphAnn.searchHier(hierIdx, probes, 11, Ph).collect())
    probes.foreach { case (pid, _) =>
      println(s"probe $pid flat=${fr(pid).intersect(truth(pid)).size} " +
        s"hier=${hr(pid).intersect(truth(pid)).size} " +
        s"missFlat=${(truth(pid) -- fr(pid)).toSeq.sorted} " +
        s"missHier=${(truth(pid) -- hr(pid)).toSeq.sorted}")
    }
    val fv = GraphAnn.searchStats(flatIdx, probes, 10, P).collect()
      .map(_.getAs[Long]("visited")).sum
    val hv = GraphAnn.searchStatsHier(hierIdx, probes, 10, Ph).collect()
      .map(_.getAs[Long]("visited")).sum
    println(s"RESULT visited flat=$fv hier=$hv flatEf=$ef hierEf=$hierEf shards=$shards dir=$dir")
    spark.stop()
  }
}
