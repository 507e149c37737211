package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.2 item 3): invariants of the
  * deterministic derivations every oracle-checked query relies on.
  * Drives ScalaCheck generators directly (fixed seeds — reproducible)
  * rather than via the scalatestplus bridge, which isn't a declared dep.
  */
class PropertySpec extends AnyFunSuite with SparkTest {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("partition assignment is total and in-range for any key") {
    import spark.implicits._
    // Long.MinValue is always included: abs(Long.MinValue) stays negative,
    // which is exactly why the shipped rule is pmod, not abs-%
    for (tail <- samples(Gen.listOfN(50, Gen.choose(Long.MinValue, Long.MaxValue)), 10)) {
      val keys = Long.MinValue :: Long.MaxValue :: -1L :: tail
      val parts = keys.toDF("user_id")
        .select(pmod(col("user_id"), lit(4)).as("p"))
        .as[Long].collect()
      assert(parts.forall(p => p >= 0 && p < 4))
    }
  }

  test("union-split partitions any outcome-labelled input") {
    import spark.implicits._
    for (outcomes <- samples(Gen.listOfN(30, Gen.oneOf("ok", "error")), 5)
         if outcomes.nonEmpty) {
      val df = outcomes.zipWithIndex.map { case (o, i) => (i.toLong, o) }
        .toDF("id", "outcome").cache()
      val ok = df.filter(col("outcome") === "ok")
      val dlq = df.filter(col("outcome") =!= "ok")
      assert(ok.count() + dlq.count() == df.count())
      assert(ok.select("id").intersect(dlq.select("id")).count() == 0)
      df.unpersist()
    }
  }

  test("deterministic uuid derivation is injective on distinct ids") {
    import spark.implicits._
    for (ids <- samples(Gen.listOfN(40, Gen.choose(0L, 1000000L)), 5)) {
      val distinctIds = ids.distinct
      val uuids = distinctIds.toDF("event_id")
        .select(md5(col("event_id").cast("string")).as("uuid"))
        .as[String].collect()
      assert(uuids.distinct.length == distinctIds.length)
    }
  }

  test("connected components equal a reference union-find on random graphs") {
    import spark.implicits._
    // random pair lists over a small id space (to force collisions and
    // multi-edge components); the distributed fixpoint must agree with a
    // driver-side union-find exactly
    val pairGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    // force the DISTRIBUTED fixpoint: the local fast path is itself a
    // union-find, so leaving it on would make this test self-referential
    spark.conf.set("spark.graft.cc.localMaxEdges", "-1")
    try for (pairs <- samples(pairGen, 6) if pairs.nonEmpty) {
      val labels = graft.operators.GraphOps
        .connectedComponents(pairs.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      // reference union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
      // min-id canonical label per component
      val expected = nodes.groupBy(find).flatMap { case (_, members) =>
        val mn = members.min; members.map(_ -> mn)
      }
      assert(labels == expected, s"pairs=$pairs")
    } finally spark.conf.unset("spark.graft.cc.localMaxEdges")
  }

  test("Misra-Gries kernel holds its bounds on arbitrary streams and capacities") {
    val streamGen = for {
      n <- Gen.choose(1, 400)
      keys <- Gen.listOfN(n, Gen.choose(0L, 20L))
    } yield keys
    for (cap <- Seq(1, 2, 5, 25); keys <- samples(streamGen, 8)) {
      val fin = keys.foldLeft(Map.empty[Long, Long]) { (m, k) =>
        val next = graft.streaming.StreamingTopK.mgUpdate(m, cap, k)
        assert(next.size <= cap, s"capacity breached: ${next.size} > $cap")
        next
      }
      val exact = keys.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val bound = keys.length.toLong / (cap + 1)
      for ((k, est) <- fin) {
        assert(est <= exact(k), s"overcount $k: $est > ${exact(k)}")
        assert(exact(k) - est <= bound, s"undercount beyond n/(c+1) for $k")
      }
      // completeness: any key strictly heavier than the bound must survive
      for ((k, c) <- exact if c > bound)
        assert(fin.contains(k), s"guaranteed heavy key $k evicted (cap=$cap)")
      // exactness when capacity covers the key space
      if (cap >= exact.size) assert(fin == exact)
    }
  }

  test("BPE merges conserve every word's characters on random corpora") {
    import spark.implicits._
    // the sentinel+terminator representation's load-bearing invariant:
    // however many merges apply, stripping '^' markers and '  '
    // separators reconstructs each word EXACTLY — a merge can never
    // leak across a token boundary, drop a character, or duplicate one
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (ws <- samples(Gen.listOfN(12, word), 8) if ws.nonEmpty) {
      val vocab = ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
        .toSeq.toDF("word", "cnt")
      val (merges, frames) = graft.operators.CorpusOps.bpeChainOf(
        graft.operators.CorpusOps.bpeSymInit(vocab))
      val got = frames.last.select(col("sym"), col("cnt")).collect()
        .map(r => r.getString(0).replace(" ", "").replace("^", "") -> r.getLong(1))
        .sortBy(_._1).toSeq
      val expect = ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
        .toSeq.sortBy(_._1)
      assert(got == expect, s"merges $merges corrupted the corpus")
      // every applied merge's pair really was present: its merged token
      // appears in the final frame or was itself merged further
      assert(merges.map(_._1) == (1 to merges.length), "rounds not dense")
    }
  }

}
