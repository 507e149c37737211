package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** One-off A/B for batched BPE merges at a chosen SF — skipped unless
  * `SPARK_GRAFT_AB_DIR` names a testdata dir. Run with e.g.
  * `SPARK_GRAFT_AB_DIR=/tmp/sf1 sbt -batch
  * "testOnly graft.operators.BpeBatchAbSpec"`. Each trainer round is a
  * distributed pair count + a metadata-sized collect, so at scale the
  * trainer is ROUND-latency-bound (SCALING round 12) — batching top-k
  * non-conflicting merges per round buys the same merges in fewer
  * rounds; the numbers land in SCALING.md's round-13 table. */
class BpeBatchAbSpec extends AnyFunSuite with SparkTest {

  test("A/B: 4 merges sequentially (4 rounds) vs batched (1 round) on the real vocab") {
    assume(sys.env.contains("SPARK_GRAFT_AB_DIR"), "set SPARK_GRAFT_AB_DIR to run")
    val dir = sys.env("SPARK_GRAFT_AB_DIR")
    def vocab = CorpusOps.bpeSymInit(TextOps.normed(spark, dir)
      .select(explode(split(col("norm"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt")))

    val t0 = System.nanoTime()
    val seq = CorpusOps.bpeChainOf(vocab, rounds = 4)._1
    val wSeq = (System.nanoTime() - t0) / 1e9

    spark.conf.set(CorpusOps.BpeBatchKey, "4")
    val (bat, wBat) =
      try {
        val t1 = System.nanoTime()
        val m = CorpusOps.bpeChainOf(vocab, rounds = 1)._1
        (m, (System.nanoTime() - t1) / 1e9)
      } finally spark.conf.unset(CorpusOps.BpeBatchKey)

    info(f"sequential: ${seq.size} merges in 4 rounds, $wSeq%.2fs — ${seq.map(m => m._2 + "+" + m._3)}")
    info(f"batch=4:    ${bat.size} merges in 1 round,  $wBat%.2fs — ${bat.map(m => m._2 + "+" + m._3)}")
    assert(seq.size == 4 && bat.nonEmpty)
    // the round-1 argmax is identical in both modes
    assert(seq.head._2 == bat.head._2 && seq.head._3 == bat.head._3)
  }
}
