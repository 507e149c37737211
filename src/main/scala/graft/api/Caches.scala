package graft.api

import org.apache.spark.sql.SparkSession

/** Release hook for query-internal caches.
  *
  * Several multi-stage queries (the MinHash/Jaccard family, the LSH
  * near-dup paths) eagerly persist intermediates they consume more than
  * once within one job. The returned DataFrame is lazy, so the query
  * builder cannot know when its caller is done with those blocks — in a
  * long-lived SparkSession they would otherwise accumulate across
  * invocations (ADVICE round 3: MEMORY_AND_DISK leak over repeated bench
  * runs). Callers running many queries in one session call
  * [[Caches.release]] between them; the bench and verify harnesses do.
  */
object Caches {

  /** Blocking release of every cached plan and persisted RDD in the
    * session. `clearCache()` alone unpersists ASYNCHRONOUSLY — over 70+
    * queries in one JVM the departing blocks and GC debris land on
    * whichever queries run next (round-3 verdict: trivial queries
    * inflated 10-20×) — so sweep the RDD registry with blocking
    * unpersist as well. */
  def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }
}
