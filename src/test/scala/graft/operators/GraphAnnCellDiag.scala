package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (Test scope): for seeded vs trained routing
  * centroids at a dir, report per-probe how many of the true top-10
  * live in the probe's R nearest cells — the PARTITION-GEOMETRY ceiling
  * on routed recall, independent of the beam. */
object GraphAnnCellDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val P = GraphAnn.Params(m = 8, efConstruction = 48, efSearch = 64, nShards = 4)
    val e = graft.model.Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val all = e.collect().map { r =>
      val v = r.getSeq[Double](1).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      r.getLong(0) -> v.map(_ / n)
    }.toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val probes = (0L until 10L).map(id => id -> all(id))
    for ((tag, seeds) <- Seq(("seeded", GraphAnn.routingSeeds(e, P)),
        ("trained", GraphAnn.trainedSeeds(e, P)))) {
      def cellOf(v: Array[Double]) =
        seeds.map { case (i, s) => (1.0 - dot(v, s), i) }.min._2
      val cells = all.map { case (id, v) => id -> cellOf(v) }
      for (r <- Seq(1, 2)) {
        val fracs = probes.map { case (pid, pv) =>
          val myCells = seeds.map { case (i, s) => (1.0 - dot(pv, s), i) }
            .sorted.take(r).map(_._2).toSet
          val top10 = all.toSeq.filter(_._1 != pid)
            .map { case (id, v) => (-dot(v, pv), id) }.sorted.take(10).map(_._2)
          top10.count(id => myCells(cells(id))) / 10.0
        }
        println(f"CELLDIAG $tag R=$r meanTop10InCells=${fracs.sum / fracs.size}%.3f per-probe=${fracs.mkString(",")}")
      }
    }
    // ef ladder at probeShards=1 for the trained partition
    {
      val seeds = GraphAnn.trainedSeeds(e, P)
      val idx = GraphAnn.buildIndexRouted(e, P, seeds).cache(); idx.count()
      for (ef <- Seq(128, 256, 512)) {
        val P2 = P.copy(efSearch = ef)
        val got = GraphAnn.searchRouted(idx, seeds, probes, 11, P2, 1).collect()
          .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
          .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).filter(_ != p).take(10).toSet }
        val rec = probes.map { case (pid, pv) =>
          val exact = all.toSeq.filter(_._1 != pid)
            .map { case (id, v) => (-dot(v, pv), id) }.sorted.take(10).map(_._2).toSet
          got.getOrElse(pid, Set.empty).intersect(exact).size.toDouble / 10 }.sum / 10
        println(f"EFLADDER trained probeShards=1 ef=$ef recall@10=$rec%.3f")
      }
      idx.unpersist()
    }
    // connectivity: per shard, BFS from the min-id entry over UNDIRECTED
    // edges and over the DIRECTED adjacency the beam actually walks
    for ((tag, seeds) <- Seq(("seeded", GraphAnn.routingSeeds(e, P)),
        ("trained", GraphAnn.trainedSeeds(e, P)))) {
      val idx = GraphAnn.buildIndexRouted(e, P, seeds).collect()
        .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("vec_id"),
          r.getSeq[Long](r.fieldIndex("nbrs")).toArray))
      idx.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (shard, rows) =>
        val adj = rows.map(r => r._2 -> r._3).toMap
        def reach(undirected: Boolean): Int = {
          val und = scala.collection.mutable.Map[Long, List[Long]]()
            .withDefaultValue(Nil)
          rows.foreach { case (_, id, ns) => ns.foreach { n =>
            und(id) = n :: und(id); if (undirected) und(n) = id :: und(n) } }
          val seen = scala.collection.mutable.Set(rows.map(_._2).min)
          var frontier = seen.toList
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(und).filterNot(seen)
            seen ++= frontier
          }
          seen.size
        }
        println(s"CONN $tag shard=$shard n=${rows.length} " +
          s"reachDirected=${reach(false)} reachUndirected=${reach(true)}")
      }
    }
    spark.stop()
  }
}
