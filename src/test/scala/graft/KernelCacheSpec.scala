package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.KernelCache
import graft.operators.TextOps

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

  test("flag off is a pass-through: no entries, no files, plans unchanged") {
    KernelCache.clear()
    val m0 = KernelCache.misses
    TextOps.ngramJaccard(spark, sf).count()
    assert(KernelCache.misses == m0, "disabled cache must never build")
    graft.api.Caches.release(spark)
  }
}
