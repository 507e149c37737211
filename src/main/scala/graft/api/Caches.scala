package graft.api

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Lifecycle management for query-internal caches.
  *
  * Several multi-stage queries (the MinHash/Jaccard family, the LSH
  * near-dup paths) eagerly persist intermediates they consume more than
  * once within one job. The returned DataFrame is lazy, so the query
  * builder cannot know when its caller is done with those blocks — in a
  * long-lived SparkSession they would otherwise accumulate across
  * invocations (ADVICE round 3: MEMORY_AND_DISK leak over repeated bench
  * runs).
  *
  * Two mechanisms, layered:
  *
  *  1. **Scoped release (round 9, the library-correct path)**: every
  *     `SparkEntry.queries` entry builds inside [[scoped]], each internal
  *     `.persist()` registers with the enclosing scope via [[tracked]],
  *     and a [[QueryExecutionListener]] releases the scope's caches as
  *     soon as ANY action over the scope's result plan completes — so a
  *     long-lived session calling query functions as a library never
  *     accumulates blocks, with no harness cooperation required.
  *     Internal materializing actions (`cache.count()` during the build)
  *     cannot release anything because the scope's result plan is only
  *     recorded after the builder returns.
  *  2. **Global sweep ([[release]])**: the bench/verify harnesses still
  *     sweep between queries — a backstop for builders invoked directly
  *     (unit tests call operator functions without the SparkEntry
  *     wrapper) and for the timing-isolation GC discipline the bench
  *     needs anyway.
  */
object Caches {

  /** Blocking release of every cached plan and persisted RDD in the
    * session. `clearCache()` alone unpersists ASYNCHRONOUSLY — over 70+
    * queries in one JVM the departing blocks and GC debris land on
    * whichever queries run next (round-3 verdict: trivial queries
    * inflated 10-20×) — so sweep the RDD registry with blocking
    * unpersist as well.
    *
    * Every step is guarded with NonFatal: the listener [[sweep]] and the
    * builders' transient drops unpersist NON-blocking, so their block
    * removals complete asynchronously inside the BlockManager — an async
    * removal can land between this method's `getPersistentRDDs` snapshot
    * and the blocking unpersist of that entry, and Spark then throws
    * `Block rdd_N_M does not exist` from `BlockManager.removeRdd`
    * (round-9 driver bench died exactly this way, rc=1). A code-level
    * lock between release and sweep cannot close that window — the
    * non-blocking removals outlive the lock — so tolerating the
    * already-gone block is the correct fix, mirroring the listener's own
    * guard below. */
  def release(spark: SparkSession): Unit = {
    live.clear() // scope bookkeeping for anything the sweep is about to drop
    try spark.catalog.clearCache()
    catch { case NonFatal(_) => () }
    spark.sparkContext.getPersistentRDDs.values.foreach { rdd =>
      try rdd.unpersist(blocking = true)
      catch { case NonFatal(_) => () }
    }
  }

  /** Guarded unpersist for a TRANSIENT build-internal cache (one that
    * dies before the builder returns, so scope tracking would hold it
    * too long). The single audited drop path for operator builders — no
    * bare `.unpersist` calls in operator code. Non-blocking by default;
    * pass `blocking = true` where the builder needs the memory back
    * before its next heavy stage (e.g. the CC fixpoint loop). */
  def dropTransient(df: DataFrame, blocking: Boolean = false): Unit =
    try df.unpersist(blocking)
    catch { case NonFatal(_) => () }

  /** One query's registered caches + (once built) its result plan, owned
    * by the session that built it: a sweep triggered by ANOTHER
    * session's action must not release it, else two sessions running the
    * same query (sameResult plans) would sweep each other's scopes on
    * whichever action finishes first. Block STORAGE isolation is out of
    * scope — Spark's CacheManager is plan-keyed and context-global, so
    * identical plans share one cache entry regardless; the owner check
    * guarantees each scope's bookkeeping releases exactly on its own
    * session's terminal action (no premature removal, no scope leak),
    * and a scope whose shared blocks were already dropped simply
    * no-ops its guarded unpersist. */
  private final class Scope(val session: SparkSession) {
    val cached = mutable.ArrayBuffer.empty[DataFrame]
    @volatile var resultPlan: LogicalPlan = _
  }

  /** Innermost scope currently BUILDING on this thread (builders are
    * synchronous, so a thread-local stack is the whole story). */
  private val building = new ThreadLocal[List[Scope]] {
    override def initialValue(): List[Scope] = Nil
  }

  /** Built scopes awaiting their terminal action. */
  private val live = ConcurrentHashMap.newKeySet[Scope]()

  /** Sessions that already carry the release listener (weak keys — the
    * registry must not pin a stopped session in a JVM that recreates
    * sessions, e.g. long test runs). */
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Register a just-persisted intermediate with the enclosing [[scoped]]
    * build (no-op outside one — direct operator calls keep the old
    * harness-swept behavior). Shaped for `df.persist().transform(tracked)`. */
  def tracked(df: DataFrame): DataFrame = {
    building.get().headOption.foreach(_.cached += df)
    df
  }

  /** Run `build`, collecting every [[tracked]] persist into a scope that
    * auto-releases when an action over the returned plan completes.
    *
    * CONTRACT — one terminal action: the scope releases as soon as the
    * FIRST action whose plan contains the scope's result plan completes
    * (a `count()` wraps the result in an Aggregate, so the match must be
    * containment, not root-only). A caller running a second action on the
    * returned DataFrame still gets correct results — the plan is lazy and
    * simply recomputes without the internal caches. Callers that need
    * repeated actions at cached speed should `.persist()` the returned
    * DataFrame themselves (their persist, their lifecycle) — exactly what
    * the bench/verify harnesses' per-query single-action pattern avoids
    * needing. */
  def scoped(spark: SparkSession)(build: => DataFrame): DataFrame = {
    ensureListener(spark)
    val scope = new Scope(spark)
    building.set(scope :: building.get())
    val df =
      try build
      finally building.set(building.get().tail)
    if (scope.cached.nonEmpty) {
      // recorded AFTER the build: internal cache.count() materializations
      // during the build can never match (resultPlan is still null)
      scope.resultPlan = df.queryExecution.analyzed
      live.add(scope)
    }
    df
  }

  /** Listener delivery is async (ExecutionListenerBus) — callers that
    * assert on cache state right after an action should spin briefly. */
  private[graft] def pendingScopes: Int = live.size()

  private def ensureListener(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = sweep(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = sweep(qe)
      })
    }

  /** Release every live scope whose result plan is contained in the
    * completed action's plan. Identity check first (actions on the very
    * DataFrame the builder returned reuse its plan subtree by reference);
    * `sameResult` covers analyzer rewrites (e.g. self-join exprId
    * deduplication). Unpersist is non-blocking here — this runs on the
    * listener bus; the registry entry is removed synchronously either
    * way, and the harness's blocking sweep remains available where block
    * eviction must complete before timing starts. */
  private def sweep(qe: QueryExecution): Unit = {
    val it = live.iterator()
    while (it.hasNext) {
      val scope = it.next()
      val rp = scope.resultPlan
      // Same-session only: two sessions running the same query build
      // sameResult plans, and a cross-session match would release the
      // OTHER session's still-needed caches mid-flight. Then identity
      // first; the sameResult fallback is gated on the node CLASS so the
      // canonicalization cost is paid only for the handful of candidate
      // nodes, not every node of every completed action.
      if ((scope.session eq qe.sparkSession) && rp != null &&
          qe.analyzed.exists(n =>
            (n eq rp) || (n.getClass == rp.getClass && n.sameResult(rp)))) {
        it.remove()
        scope.cached.foreach { df =>
          try df.unpersist(blocking = false)
          catch { case NonFatal(_) => () }
        }
      }
    }
  }
}
