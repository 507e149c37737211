package graft.operators

/** Diagnostic main for the shard-size-adaptive parameter curve: recall
  * and visited at a given (n, m, efConstruction, efSearch) on the
  * clustered fixture. `sbt "Test/runMain graft.operators.AdaptiveProbe
  * n m efC efSearch"` — numbers land in SCALING.md r17. */
object AdaptiveProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val efC = args.drop(2).headOption.map(_.toInt).getOrElse(96)
    val ef = args.drop(3).headOption.map(_.toInt).getOrElse(64)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val all = LadderProbe.clustered(n).map { case (id, v) =>
      val nn = math.sqrt(v.map(x => x * x).sum); id -> v.map(_ / nn)
    }.toMap
    val vecsDf = LadderProbe.clustered(n).toSeq.toDF("vec_id", "v")
    val probes = (0L until 10L).map(id => id -> all(id))
    def exact(pid: Long, pv: Array[Double]) = all.toSeq.filter(_._1 != pid)
      .map { case (id, v) => (-v.zip(pv).map { case (a, b) => a * b }.sum, id) }
      .sorted.take(10).map(_._2).toSet
    val truth = probes.map { case (p, v) => p -> exact(p, v) }.toMap
    // the probe IS the envelope measurement, so it opts into
    // extrapolated parameters explicitly (the refusal's escape hatch)
    val p = GraphAnn.Params(m = m, efConstruction = efC, efSearch = ef,
      nShards = 1, allowExtrapolated = true)
    val t0 = System.nanoTime()
    val idx = GraphAnn.buildIndex(vecsDf, p).cache(); idx.count()
    val build = (System.nanoTime() - t0) / 1e9
    val got = GraphAnn.search(idx, probes, 11, p).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).map { case (pid, rs) =>
        pid -> rs.map(_._2).filter(_ != pid).take(10).toSet }
    val recall = probes.map { case (pid, _) => got(pid).intersect(truth(pid)).size }.sum
    val visited = GraphAnn.searchStats(idx, probes, 10, p).collect()
      .map(_.getAs[Long]("visited")).sum
    println(f"RESULT n=$n m=$m efC=$efC ef=$ef recall=$recall/100 visited=$visited build=$build%.1fs")
    spark.stop()
  }
}
