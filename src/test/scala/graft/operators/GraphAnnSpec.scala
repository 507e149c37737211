package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Graph ANN (per-shard NSW + beam search): recall against the exact
  * brute force, bit-exact determinism of build and search, structural
  * degree/shard invariants, and the visited-fraction bound that makes
  * it an INDEX rather than a scan.
  */
class GraphAnnSpec extends AnyFunSuite with SparkTest {

  private val P = GraphAnn.Params(m = 8, efConstruction = 48, efSearch = 64, nShards = 4)
  private val NProbes = 10
  private val K = 10

  private def embeds(dir: String) =
    graft.model.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))

  private def unitVecs(dir: String): Map[Long, Array[Double]] =
    embeds(dir).collect().map { r =>
      val v = r.getSeq[Double](1).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      r.getLong(0) -> v.map(_ / n)
    }.toMap

  test("beam-search recall@10 against the exact brute force is >= 0.9") {
    val idx = GraphAnn.buildIndex(embeds(sf), P).cache()
    val all = unitVecs(sf)
    val probes = (0L until NProbes).map(id => id -> all(id))
    val got = GraphAnn.search(idx, probes, K + 1, P).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).map { case (pid, rs) =>
        pid -> rs.map(_._2).filter(_ != pid).take(K).toSet
      }
    val recalls = probes.map { case (pid, pv) =>
      val exact = all.toSeq.filter(_._1 != pid)
        .map { case (id, v) => (-v.zip(pv).map { case (a, b) => a * b }.sum, id) }
        .sorted.take(K).map(_._2).toSet
      got(pid).intersect(exact).size.toDouble / K
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean below 0.9 (per-probe: $recalls)")
    idx.unpersist()
  }

  test("build and search are bit-exact deterministic") {
    def adjacency() = GraphAnn.buildIndex(embeds(sf), P).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("vec_id"),
        r.getSeq[Long](r.fieldIndex("nbrs")).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq
    val a1 = adjacency()
    assert(a1 == adjacency(), "two builds differ")
    val idx = GraphAnn.buildIndex(embeds(sf), P).cache()
    val all = unitVecs(sf)
    val probes = (0L until NProbes).map(id => id -> all(id))
    def res() = GraphAnn.search(idx, probes, K, P).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq
    assert(res() == res(), "two searches differ")
    idx.unpersist()
  }

  test("structural invariants: degree cap 2m, no self loops, edges stay in-shard") {
    val rows = GraphAnn.buildIndex(embeds(sf), P).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("vec_id"),
        r.getSeq[Long](r.fieldIndex("nbrs"))))
    assert(rows.length == embeds(sf).count())
    val shardOf = rows.map(r => r._2 -> r._1).toMap
    rows.foreach { case (shard, id, nbrs) =>
      assert(nbrs.length <= 2 * P.m, s"node $id degree ${nbrs.length} > ${2 * P.m}")
      assert(!nbrs.contains(id), s"self loop at $id")
      assert(nbrs.distinct.length == nbrs.length, s"duplicate edge at $id")
      nbrs.foreach(n => assert(shardOf(n) == shard, s"cross-shard edge $id -> $n"))
      assert(shardOf(id) == (id % P.nShards).toInt)
    }
    // non-entry nodes are never isolated (insertion connects them)
    rows.groupBy(_._1).values.foreach { ss =>
      val entry = ss.map(_._2).min
      ss.filter(_._2 != entry).foreach { case (_, id, nbrs) =>
        assert(nbrs.nonEmpty, s"isolated non-entry node $id")
      }
    }
  }

  test("routed search probes 2 of 4 Voronoi cells and keeps most of the recall") {
    val dir = "/root/testdata/sf0.1" // 2000 vectors
    val e = embeds(dir)
    val seeds = GraphAnn.routingSeeds(e, P)
    assert(seeds.length == P.nShards)
    val idx = GraphAnn.buildIndexRouted(e, P).cache()
    val all = unitVecs(dir)
    // shards are true Voronoi cells of the seeds
    idx.collect().foreach { r =>
      val v = r.getSeq[Double](r.fieldIndex("v_unit")).toArray
      val nearest = seeds.map { case (i, s) =>
        (1.0 - v.zip(s).map { case (a, b) => a * b }.sum, i) }.min._2
      assert(r.getAs[Int]("shard") == nearest,
        s"vec ${r.getAs[Long]("vec_id")} not in its nearest cell")
    }
    val probes = (0L until NProbes).map(id => id -> all(id))
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (pid, rs) =>
          pid -> rs.map(_._2).filter(_ != pid).take(K).toSet }
      probes.map { case (pid, pv) =>
        val exact = all.toSeq.filter(_._1 != pid)
          .map { case (id, v) => (-v.zip(pv).map { case (a, b) => a * b }.sum, id) }
          .sorted.take(K).map(_._2).toSet
        got(pid).intersect(exact).size.toDouble / K
      }.sum / NProbes
    }
    val routed2 = GraphAnn.searchRouted(idx, seeds, probes, K + 1, P, probeShards = 2)
    val r2 = recallOf(routed2.collect())
    val rAll = recallOf(GraphAnn.searchRouted(idx, seeds, probes, K + 1, P,
      probeShards = P.nShards).collect())
    // probing half the cells keeps most of the probe-all recall
    assert(r2 >= rAll - 0.25 && r2 >= 0.6,
      s"routed recall $r2 too far below probe-all $rAll")
    // determinism of the routed path
    val a = routed2.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val b = GraphAnn.searchRouted(idx, seeds, probes, K + 1, P, probeShards = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a == b)
    idx.unpersist()
  }

  test("the beam visits a shrinking FRACTION of each shard as the corpus grows") {
    def meanFrac(dir: String): (Double, Long) = {
      val idx = GraphAnn.buildIndex(embeds(dir), P).cache()
      val all = unitVecs(dir)
      val probes = (0L until NProbes).map(id => id -> all(id))
      val st = GraphAnn.searchStats(idx, probes, K, P).collect()
        .map(r => (r.getAs[Long]("visited"), r.getAs[Long]("shard_size")))
      idx.unpersist()
      (st.map(t => t._1.toDouble / t._2).sum / st.length, st.map(_._2).max)
    }
    val (fSmall, nSmall) = meanFrac(sf)                       // 500 vectors
    val (fBig, nBig) = meanFrac("/root/testdata/sf0.1")       // 2000 vectors
    assert(nBig > nSmall)
    assert(fBig < fSmall, s"visited fraction grew with corpus: $fSmall -> $fBig")
    assert(fBig < 0.8, s"beam scans most of the shard at 2000 vectors: $fBig")
  }
}
