package graft

import org.scalatest.funsuite.AnyFunSuite

/** Library-mode cache hygiene (round-9 verdict item 3): every
  * `SparkEntry.queries` builder runs under `Caches.scoped`, so its
  * internal eager persists release as soon as the caller's action over
  * the result completes — WITHOUT the bench/verify harness's global
  * `Caches.release` sweep. A long-lived session invoking the query map
  * as a library must not accumulate cached blocks across invocations.
  */
class CacheScopeSpec extends AnyFunSuite with SparkTest {

  /** Scope release rides the async ExecutionListenerBus — spin briefly. */
  private def awaitEmpty(label: String): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(25)
    val leftover = spark.sparkContext.getPersistentRDDs
    assert(leftover.isEmpty,
      s"$label leaked ${leftover.size} persisted RDD(s): " +
        leftover.values.map(_.name).mkString(", "))
  }

  test("three heavy queries in one session leave no persisted blocks behind") {
    // other suites share this JVM session and manage caches via the
    // global sweep — start from a clean registry so leftovers are OURS
    graft.api.Caches.release(spark)
    // the three heaviest persist users: decontamination (window-df base),
    // the MinHash/Jaccard kernel (3 chained persists), and CC group
    // labeling (edge cache inside connectedComponents)
    for (name <- Seq("decontaminate", "ngram_jaccard", "dedup_canonical")) {
      val df = SparkEntry.queries(name)(spark, sf)
      // the builders materialize eagerly — blocks ARE cached before the action
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        s"$name registered no cache — the scope test would be vacuous")
      df.count() // the caller's terminal action — NO global sweep follows
      awaitEmpty(name)
    }
  }

  test("a direct operator call outside a scope keeps the old swept behavior") {
    graft.api.Caches.release(spark)
    val df = operators.TextOps.ngramJaccard(spark, sf)
    df.count()
    // untracked (no scope): blocks remain until the harness sweep —
    // exactly the pre-round-9 contract unit tests rely on
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    graft.api.Caches.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
