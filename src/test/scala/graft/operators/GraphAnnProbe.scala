package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc measurement main (Test scope, not shipped): prints GraphAnn
  * build/search wall, recall@10, and visited fraction per SF. */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1", "/tmp/sf1");
         ef <- if (dir == "/tmp/sf1") Seq(64, 128, 256) else Seq(64)) {
      val P = GraphAnn.Params(m = 8, efConstruction = 48, efSearch = ef, nShards = 4)
      val e = graft.model.Tables.embeddings(spark, dir).select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      val t0 = System.nanoTime
      val idx = GraphAnn.buildIndex(e, P).cache(); idx.count()
      val tBuild = (System.nanoTime - t0) / 1e9
      val all = e.collect().map { r =>
        val v = r.getSeq[Double](1).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> v.map(_ / n)
      }.toMap
      val probes = (0L until 10L).map(id => id -> all(id))
      val t1 = System.nanoTime
      val got = GraphAnn.search(idx, probes, 11, P).collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).filter(_ != p).take(10).toSet }
      val tSearch = (System.nanoTime - t1) / 1e9
      val recalls = probes.map { case (pid, pv) =>
        val exact = all.toSeq.filter(_._1 != pid)
          .map { case (id, v) => (-v.zip(pv).map { case (a, b) => a * b }.sum, id) }
          .sorted.take(10).map(_._2).toSet
        got(pid).intersect(exact).size.toDouble / 10 }
      val st = GraphAnn.searchStats(idx, probes, 10, P).collect()
        .map(r => (r.getAs[Long]("visited"), r.getAs[Long]("shard_size")))
      val frac = st.map(t => t._1.toDouble / t._2).sum / st.length
      val vis = st.map(_._1).sum / st.length
      println(f"GANN $dir ef=${P.efSearch} n=${all.size} build=$tBuild%.2fs search10=$tSearch%.2fs " +
        f"recall@10=${recalls.sum / 10}%.3f visitedFrac=$frac%.3f meanVisited=$vis")
      idx.unpersist()
    }
    // routed: Voronoi cells at the 10x replica — SEEDED (first-n) vs
    // TRAINED (spherical k-means) centroids, cell balance + recall
    {
      val P = GraphAnn.Params(m = 8, efConstruction = 48, efSearch = 64, nShards = 4)
      val dir = "/tmp/sf1"
      val e = graft.model.Tables.embeddings(spark, dir).select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      val all = e.collect().map { r =>
        val v = r.getSeq[Double](1).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> v.map(_ / n)
      }.toMap
      val probes = (0L until 10L).map(id => id -> all(id))
      for ((tag, seeds) <- Seq(
          ("seeded", GraphAnn.routingSeeds(e, P)),
          ("trained", {
            val t = System.nanoTime
            val s = GraphAnn.trainedSeeds(e, P)
            println(f"GANNT /tmp/sf1 train=${(System.nanoTime - t) / 1e9}%.2fs")
            s
          }))) {
        val idx = GraphAnn.buildIndexRouted(e, P, seeds).cache(); idx.count()
        val sizes = idx.groupBy("shard").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        val balance = sizes.map(_._2).max.toDouble /
          (all.size.toDouble / P.nShards)
        println(f"GANNC $tag cells=${sizes.mkString(",")} maxOverMean=$balance%.3f")
        for (rShards <- Seq(1, 2); ef2 <- Seq(64, 128)) {
          val P2 = P.copy(efSearch = ef2)
          val t = System.nanoTime
          val got = GraphAnn.searchRouted(idx, seeds, probes, 11, P2, rShards).collect()
            .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
            .groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).filter(_ != p).take(10).toSet }
          val dt = (System.nanoTime - t) / 1e9
          val rec = probes.map { case (pid, pv) =>
            val exact = all.toSeq.filter(_._1 != pid)
              .map { case (id, v) => (-v.zip(pv).map { case (a, b) => a * b }.sum, id) }
              .sorted.take(10).map(_._2).toSet
            got.getOrElse(pid, Set.empty).intersect(exact).size.toDouble / 10 }.sum / 10
          println(f"GANNR $tag probeShards=$rShards ef=$ef2 recall@10=$rec%.3f search10=$dt%.2fs")
        }
        idx.unpersist()
      }
    }
    spark.stop()
  }
}
