package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.KernelCache
import graft.operators.{CorpusOps, TextOps}

/** Parity + lifecycle for the session-scoped shared-kernel cache (r15,
  * `spark.graft.kernel.sessionCache`): with the flag on, the dedup
  * diagnostics must return BIT-identical results while building the
  * shingle/signature kernel once per session instead of once per query. */
class KernelCacheSpec extends AnyFunSuite with SparkTest {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("cached kernel is bit-identical across the diagnostic family and builds once") {
    // baseline: flag off (the oracle-gate default) — self-contained builds
    val offJaccard = rows(TextOps.ngramJaccard(spark, sf))
    val offContain = rows(TextOps.minhashContainment(spark, sf))
    val offAgree = rows(TextOps.dedupMethodAgreement(spark, sf))
    graft.api.Caches.release(spark)
    KernelCache.clear()
    spark.conf.set(KernelCache.EnabledKey, "true")
    try {
      val m0 = KernelCache.misses
      assert(rows(TextOps.ngramJaccard(spark, sf)) == offJaccard)
      val afterFirst = KernelCache.misses - m0
      assert(afterFirst == 2, // shingles3 + sig3 built exactly once
        s"first query should build both kernel tables, built $afterFirst")
      graft.api.Caches.release(spark) // the harness sweep between queries
      assert(rows(TextOps.minhashContainment(spark, sf)) == offContain)
      graft.api.Caches.release(spark)
      assert(rows(TextOps.dedupMethodAgreement(spark, sf)) == offAgree)
      // the sweep-surviving cache served every later request: no rebuilds
      assert(KernelCache.misses - m0 == 2,
        s"later queries must reuse, total builds ${KernelCache.misses - m0}")
    } finally {
      spark.conf.unset(KernelCache.EnabledKey)
      KernelCache.clear()
      graft.api.Caches.release(spark)
    }
  }

  test("source_overlap_jaccard rides the shared shingle kernel, bit-identical") {
    val off = rows(TextOps.sourceOverlapJaccard(spark, sf))
    graft.api.Caches.release(spark)
    KernelCache.clear()
    spark.conf.set(KernelCache.EnabledKey, "true")
    try {
      val m0 = KernelCache.misses
      // warm the family kernel the way a diagnostic suite would
      TextOps.ngramJaccard(spark, sf).collect()
      graft.api.Caches.release(spark)
      val built = KernelCache.misses - m0
      assert(rows(TextOps.sourceOverlapJaccard(spark, sf)) == off)
      // the overlap query reuses shingles3 — no kernel build of its own
      assert(KernelCache.misses - m0 == built,
        s"source_overlap_jaccard must reuse shingles3, built ${KernelCache.misses - m0 - built} extra")
    } finally {
      spark.conf.unset(KernelCache.EnabledKey)
      KernelCache.clear()
      graft.api.Caches.release(spark)
    }
  }

  test("substring gram kernels are shared, bit-identical across the substring family") {
    // baseline: flag off — each query rebuilds the gram table itself
    val offSpans = rows(TextOps.substringSpans(spark, sf))
    val offStats = rows(TextOps.substringDedupStats(spark, sf))
    val offApply = rows(TextOps.substringDedupApply(spark, sf))
    graft.api.Caches.release(spark)
    KernelCache.clear()
    spark.conf.set(KernelCache.EnabledKey, "true")
    try {
      val m0 = KernelCache.misses
      assert(rows(TextOps.substringSpans(spark, sf)) == offSpans)
      assert(KernelCache.misses - m0 == 2, // windows + rep, built exactly once
        s"first query should build both substring kernels, built ${KernelCache.misses - m0}")
      graft.api.Caches.release(spark) // the harness sweep between queries
      assert(rows(TextOps.substringDedupStats(spark, sf)) == offStats)
      graft.api.Caches.release(spark)
      assert(rows(TextOps.substringDedupApply(spark, sf)) == offApply)
      assert(KernelCache.misses - m0 == 2,
        s"later queries must reuse, total builds ${KernelCache.misses - m0}")
    } finally {
      spark.conf.unset(KernelCache.EnabledKey)
      KernelCache.clear()
      graft.api.Caches.release(spark)
    }
  }

  test("contamination pair shares the contaminated-docs kernel, bit-identical") {
    // baseline: flag off — each audit rebuilds windows + semi-join itself
    val offRate = rows(TextOps.ngramContaminationRate(spark, sf))
    val offBySrc = rows(TextOps.contaminationBySource(spark, sf))
    graft.api.Caches.release(spark)
    KernelCache.clear()
    spark.conf.set(KernelCache.EnabledKey, "true")
    try {
      val m0 = KernelCache.misses
      assert(rows(TextOps.ngramContaminationRate(spark, sf)) == offRate)
      // windows kernel + contaminated-docs kernel, built exactly once
      assert(KernelCache.misses - m0 == 2,
        s"first audit should build windows + contam kernels, built ${KernelCache.misses - m0}")
      graft.api.Caches.release(spark) // the harness sweep between queries
      assert(rows(TextOps.contaminationBySource(spark, sf)) == offBySrc)
      // the second audit reuses BOTH kernels: no builds of its own
      assert(KernelCache.misses - m0 == 2,
        s"contamination_by_source must reuse, total builds ${KernelCache.misses - m0}")
    } finally {
      spark.conf.unset(KernelCache.EnabledKey)
      KernelCache.clear()
      graft.api.Caches.release(spark)
    }
  }

  test("retrieval family shares ONE token-base kernel, bit-identical") {
    // r17 verdict item 1: bm25_topk / tfidf_cosine_topk / rrf_fusion /
    // retrieval_tau each rebuilt the full corpus token explode from
    // cold (~40 s apiece at 100x). With the session cache on, the four
    // queries must share exactly ONE materialized token base and return
    // bit-identical results to their self-contained forms.
    val offBm25 = rows(CorpusOps.bm25Topk(spark, sf))
    val offDense = rows(CorpusOps.tfidfCosineTopk(spark, sf))
    val offRrf = rows(CorpusOps.rrfFusion(spark, sf))
    val offTau = rows(CorpusOps.retrievalTau(spark, sf))
    graft.api.Caches.release(spark)
    KernelCache.clear()
    spark.conf.set(KernelCache.EnabledKey, "true")
    try {
      val m0 = KernelCache.misses
      assert(rows(CorpusOps.bm25Topk(spark, sf)) == offBm25)
      assert(KernelCache.misses - m0 == 1,
        s"first retrieval query should build the toks kernel once, built ${KernelCache.misses - m0}")
      graft.api.Caches.release(spark) // the harness sweep between queries
      assert(rows(CorpusOps.tfidfCosineTopk(spark, sf)) == offDense)
      graft.api.Caches.release(spark)
      assert(rows(CorpusOps.rrfFusion(spark, sf)) == offRrf)
      graft.api.Caches.release(spark)
      assert(rows(CorpusOps.retrievalTau(spark, sf)) == offTau)
      assert(KernelCache.misses - m0 == 1,
        s"later retrieval queries must reuse the token base, total builds ${KernelCache.misses - m0}")
    } finally {
      spark.conf.unset(KernelCache.EnabledKey)
      KernelCache.clear()
      graft.api.Caches.release(spark)
    }
  }

  test("per-key locking: a slow build never blocks a different key; same key builds once") {
    // ADVICE r17: the old global buildLock serialized UNRELATED kernel
    // builds end-to-end. The per-key slots must let key B build to
    // completion while key A's build is parked mid-flight, and a second
    // caller of A must wait for A's single build rather than rebuild.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    KernelCache.clear()
    spark.conf.set(KernelCache.EnabledKey, "true")
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val m0 = KernelCache.misses
      val inBuildA = new CountDownLatch(1)
      val releaseA = new CountDownLatch(1)
      val slowA = Future {
        KernelCache.getOrBuild(spark, "t_slow_a", {
          inBuildA.countDown()
          assert(releaseA.await(60, TimeUnit.SECONDS), "release latch timed out")
          spark.range(3).toDF("id")
        }).count()
      }
      assert(inBuildA.await(60, TimeUnit.SECONDS), "build A never started")
      // a DIFFERENT key builds to completion while A is in flight — this
      // deadlocks (or times out) under a global build lock
      assert(KernelCache.getOrBuild(spark, "t_b",
        spark.range(5).toDF("id")).count() == 5)
      // a second caller of A's key must WAIT for A's build, never rerun it
      val waitA = Future {
        KernelCache.getOrBuild(spark, "t_slow_a",
          sys.error("second caller must not rebuild")).count()
      }
      releaseA.countDown()
      assert(Await.result(slowA, Duration(120, "s")) == 3)
      assert(Await.result(waitA, Duration(120, "s")) == 3)
      assert(KernelCache.misses - m0 == 2,
        s"expected exactly one build per key, got ${KernelCache.misses - m0}")
    } finally {
      pool.shutdown()
      spark.conf.unset(KernelCache.EnabledKey)
      KernelCache.clear()
    }
  }

  test("a failed build rethrows, releases the key for retry; self-dependency fails loud") {
    KernelCache.clear()
    spark.conf.set(KernelCache.EnabledKey, "true")
    try {
      intercept[RuntimeException] {
        KernelCache.getOrBuild(spark, "t_fail", sys.error("boom"))
      }
      // the failed slot must not wedge the key: a retry builds cleanly
      assert(KernelCache.getOrBuild(spark, "t_fail",
        spark.range(2).toDF("id")).count() == 2)
      // a kernel whose build re-enters its OWN key on the same thread is
      // a definitional cycle — fail loud instead of self-deadlocking
      val e = intercept[IllegalStateException] {
        KernelCache.getOrBuild(spark, "t_self",
          KernelCache.getOrBuild(spark, "t_self", spark.range(1).toDF("id")))
      }
      assert(e.getMessage.contains("re-entrant"))
    } finally {
      spark.conf.unset(KernelCache.EnabledKey)
      KernelCache.clear()
    }
  }

  test("flag off is a pass-through: no entries, no files, plans unchanged") {
    KernelCache.clear()
    val m0 = KernelCache.misses
    TextOps.ngramJaccard(spark, sf).count()
    assert(KernelCache.misses == m0, "disabled cache must never build")
    graft.api.Caches.release(spark)
  }
}
