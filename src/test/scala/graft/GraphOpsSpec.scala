package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Component-finder semantics on constructed graphs — shapes the
  * LSH-candidate data can't be relied on to produce (deep chains, many
  * disjoint components), exercising the pointer-doubling fixpoint beyond
  * what the oracle-checked dedup queries cover. */
class GraphOpsSpec extends AnyFunSuite with SparkTest {

  /** Runs BOTH physical paths — the driver-local union-find fast path
    * (default at these sizes) and the distributed fixpoint loop (forced
    * via the localMaxEdges override) — and asserts they agree before
    * returning the labels. */
  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val local = GraphOps.connectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.cc.localMaxEdges", "-1")
    try {
      val distributed = GraphOps.connectedComponents(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(distributed == local,
        "local union-find and distributed fixpoint disagree")
    } finally spark.conf.unset("spark.graft.cc.localMaxEdges")
    local
  }

  test("a 200-deep chain collapses to one min-labeled component") {
    // path 0-1-2-...-200: diameter 200 — linear propagation would need
    // 200 rounds; the doubling loop must still land every node on 0
    // within its 100-round cap
    val labels = cc((0L until 200L).map(i => (i, i + 1)))
    assert(labels.size == 201)
    assert(labels.values.forall(_ == 0L))
  }

  test("disjoint components each take their own min label") {
    val labels = cc(Seq((10L, 11L), (11L, 12L), (30L, 31L), (50L, 51L), (51L, 50L)))
    assert(labels == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      30L -> 30L, 31L -> 30L,
      50L -> 50L, 51L -> 50L))
  }

  test("star and cycle shapes: label = component min regardless of edge direction") {
    // star centered at 99 with lower-id leaves, plus a 4-cycle
    val star = Seq((99L, 5L), (99L, 7L), (99L, 3L))
    val cycle = Seq((20L, 21L), (21L, 22L), (22L, 23L), (23L, 20L))
    val labels = cc(star ++ cycle)
    assert(Seq(99L, 5L, 7L, 3L).forall(labels(_) == 3L))
    assert(Seq(20L, 21L, 22L, 23L).forall(labels(_) == 20L))
  }

  test("reliable-checkpoint path: identical labels when a checkpoint dir is set") {
    // with a checkpoint dir configured the loop truncates lineage via
    // reliable checkpoint() (the cluster deployment path) instead of
    // executor-local blocks — semantics must not change
    spark.sparkContext.setCheckpointDir(tempDir("cc_ckpt"))
    val labels = cc((0L until 40L).map(i => (i, i + 1)))
    assert(labels.size == 41)
    assert(labels.values.forall(_ == 0L))
  }

  test("empty pair list yields empty labels (degenerate input)") {
    import spark.implicits._
    val labels = GraphOps.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(labels.count() == 0)
  }

  test("both dedup-group queries label every group by its min member") {
    // min-canonical invariant on the real corpora: each group's id IS
    // the min member (full component equality is oracle-checked in the
    // DuckDB gate; on constructed graphs, by the union-find property
    // test)
    val e = graft.operators.SimilarityOps.embedDedupGroups(spark, sf)
    val eg = e.groupBy(col("group_id")).agg(min(col("vec_id")).as("mn"))
    assert(eg.filter(col("group_id") =!= col("mn")).count() == 0)
    val t = graft.operators.TextOps.dedupGroups(spark, sf)
    val tg = t.groupBy(col("group_id")).agg(min(col("doc_id")).as("mn"))
    assert(tg.filter(col("group_id") =!= col("mn")).count() == 0)
  }

  test("incremental components bit-equal a full recompute over multi-wave merges") {
    import spark.implicits._
    // wave 0 (the standing corpus): three components {0..3}, {10,11},
    // {20..22}, plus singletons implicit by absence
    val wave0 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
    // wave 1: a new doc 30 BRIDGES {0..3} and {10,11}; 31-32 is a brand
    // new pair; 22-23 extends an existing component with a new node
    val wave1 = Seq((3L, 30L), (30L, 10L), (31L, 32L), (22L, 23L))
    // wave 2: 5 bridges the wave-1-merged giant with {20..23}; a new
    // doc 4 with a SMALLER id than nothing it touches; 40 pairs into
    // the wave-1 pair (31,32) — merging a component born incrementally
    val wave2 = Seq((0L, 5L), (5L, 20L), (4L, 23L), (40L, 31L))

    def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val l0 = GraphOps.connectedComponents(wave0.toDF("a", "b"), "a", "b")
    val l1 = GraphOps.incrementalComponents(l0, wave1.toDF("a", "b"), "a", "b")
    assert(labelsOf(l1) == cc(wave0 ++ wave1),
      "wave-1 incremental labels diverge from the full recompute")
    val l2 = GraphOps.incrementalComponents(l1, wave2.toDF("a", "b"), "a", "b")
    assert(labelsOf(l2) == cc(wave0 ++ wave1 ++ wave2),
      "wave-2 incremental labels diverge from the full recompute")
    // an empty delta is the identity
    val l2b = GraphOps.incrementalComponents(l2,
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(labelsOf(l2b) == labelsOf(l2), "empty delta must be a no-op")
    graft.api.Caches.release(spark)
  }

  test("pagerank: ranks are a probability-like mass within damping bounds") {
    val rows = graft.operators.GraphOps.pagerank(spark, sf).collect()
    assert(rows.length == graft.operators.GraphOps.PagerankTopK)
    // descending by rank with id tiebreak
    val prs = rows.map(_.getLong(2)).toSeq
    assert(prs == prs.sorted.reverse)
    // every rank obeys the damping floor 0.15e12/N and, in an undirected
    // graph with no dangling mass, stays below the 1e12 total mass
    for (r <- rows) assert(r.getLong(2) > 0L && r.getLong(2) < 1000000000000L)
    // kind decodes the key-space parity
    for (r <- rows)
      assert(r.getString(1) == (if (r.getLong(0) % 2 == 0) "part" else "supp"))
  }

  /** Drives the degree-oriented counting core with graphs whose triangle
    * census is known in closed form — shapes the LSH pair data can't be
    * relied on to produce (cliques, triangle-free bipartite, hub stars). */
  private def triangles(pairs: Seq[(Long, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = GraphOps.triangleCountOf(pairs.toDF("doc_a", "doc_b")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("triangle count: cliques, triangle-free graphs, and shared-edge fans") {
    // K4 has C(4,3)=4 triangles; a dup group of size n is exactly a clique
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(triangles(k4) == ((4L, 6L, 4L)))
    // star K1,4: wedge-rich, triangle-free — the shape orientation must
    // not mis-close (hub 100 has degree 4, every wedge stays open)
    val star = (1L to 4L).map(i => (i, 100L))
    assert(triangles(star) == ((5L, 4L, 0L)))
    // two triangles sharing edge (1,2): each counted once, no double count
    val fan = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(triangles(fan) == ((4L, 5L, 2L)))
    // C4 (square): cyclic but triangle-free
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))._3 == 0L)
  }

  test("label propagation: cliques collapse to min label, isolates stay singleton") {
    import spark.implicits._
    def lpa(pairs: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, (Long, Long)] =
      GraphOps.labelPropagationOf(
        pairs.toDF("doc_a", "doc_b"), nodes.toDF("node"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("community"), r.getAs[Long]("community_size")))
        .toMap
    // a 4-clique plus an isolated node. Hand-trace: round 1 ties every
    // member to the min of its NEIGHBOR ids (node 1 → 2, others → 1);
    // round 2 the majority label 1 wins everywhere; round 3 is stable.
    // The isolate keeps itself as a singleton community.
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = lpa(clique, Seq(1L, 2L, 3L, 4L, 9L))
    assert(got(9L) == ((9L, 1L)), "isolated node not a singleton community")
    assert(Seq(2L, 3L, 4L).forall(got(_) == ((1L, 4L))),
      s"clique did not collapse to min label: $got")
    assert(got(1L)._2 == 4L)
    // two disjoint cliques: independent communities, sizes correct
    val two = clique ++ Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val g2 = lpa(two, Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L))
    assert(g2(11L)._1 == 10L && g2(12L)._1 == 10L && g2(10L)._2 == 3L)
    assert(g2(2L)._1 == 1L)
    // the corpus-level query partitions consistently: sizes sum to the
    // doc count and every member of a community reports the same size
    val full = GraphOps.labelPropagation(spark, sf).collect()
    val byComm = full.groupBy(_.getAs[Long]("community"))
    assert(byComm.values.map(_.length).sum == full.length)
    byComm.foreach { case (_, rows) =>
      assert(rows.forall(_.getAs[Long]("community_size") == rows.length))
    }
  }

  test("LPA plan size is constant in the round count (per-round lineage truncation)") {
    import spark.implicits._
    val clique = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    def planNodes(rounds: Int): Int =
      GraphOps.labelPropagationOf(clique, nodes, rounds)
        .queryExecution.analyzed.collect { case p => p }.size
    val n1 = planNodes(1)
    val n6 = planNodes(6)
    assert(n6 == n1,
      s"analyzed-plan node count grew with rounds: $n1 at 1 round, $n6 at 6 " +
        "— per-round truncation is not taking effect")
    // a caller raising rounds still converges to the same communities
    val deep = GraphOps.labelPropagationOf(clique, nodes, 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("community")).toMap
    assert(deep == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("k_core peels tails and isolates, keeps the dense backbone") {
    import spark.implicits._
    // triangle {1,2,3} (the 2-core) + tail chain 3-4-5 + isolated edge 6-7
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .toDF("doc_a", "doc_b")
    val core = GraphOps.kCoreOf(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"2-core should be exactly the triangle: $core")
    // k=3: the triangle has no 3-core — everything peels
    assert(GraphOps.kCoreOf(pairs, k = 3).count() == 0L)
    // a chain needs one peel per link: 4 rounds leave the center of a
    // 10-link path, fixpoint (extra rounds) empties it — the bounded-
    // round semantics is real, and the spec documents the difference
    val chain = (1L to 10L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    assert(GraphOps.kCoreOf(chain, rounds = 4).count() > 0L)
    assert(GraphOps.kCoreOf(chain, rounds = 8).count() == 0L)
  }

  test("k_core query surface reaches fixpoint at its round count on the corpus") {
    val atSurface = GraphOps.kCore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deeper = GraphOps.kCoreOf(
      graft.operators.TextOps.candidatePairs(spark, sf),
      rounds = GraphOps.KCoreRounds + 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atSurface == deeper,
      "4 peel rounds do not reach the 2-core fixpoint on the candidate graph")
    // every survivor meets the degree bar — true at fixpoint
    assert(atSurface.values.forall(_ >= GraphOps.KCoreK))
  }
}
