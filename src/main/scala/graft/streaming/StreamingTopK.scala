package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.ConsumerPipeline.RawEvent

/** Streaming analog of the batch `heavy_hitters` query
  * (AnalyticOps.heavyHitters): per-shard Misra–Gries summaries over the
  * stream's `user_id` key, the classic bounded-state heavy-hitter
  * sketch (Misra & Gries 1982; the "space-saving" family).
  *
  * Scale shape: keys hash into `shards` groups (at 100 TB, set shards ≈
  * cluster parallelism) and each group's state is AT MOST `capacity`
  * (key, count) entries — constant per shard, independent of both
  * stream length and key cardinality, where an exact streaming count
  * would grow state with distinct keys. Because a key lives in exactly
  * ONE shard (shard = user_id % shards), the global candidate set is
  * the plain union of per-shard summaries — no cross-shard merge
  * arithmetic — and the final top-k over ≤ shards·capacity candidate
  * rows is metadata-sized.
  *
  * Guarantee (per shard): every estimate undercounts its true count by
  * at most n_shard/(capacity+1) decrement rounds, so any key with true
  * count above that bound is GUARANTEED present in the summary — the
  * property StreamingSpec asserts, alongside exactness when capacity
  * covers the shard's key cardinality (decrements never fire → the
  * summary IS the exact count map, matching the batch query).
  *
  * Emission: Update-mode rows carry the shard's full current summary
  * plus `n_seen` (events processed by the shard so far) each
  * micro-batch; a reader keeps each shard's max-`n_seen` rows for the
  * latest view. Within a micro-batch the group iterator is sorted by
  * (ts, event_id) — the same cross-batch ordering contract as
  * StreamingAnomaly.
  */
object StreamingTopK {

  /** One summary row: the shard's current estimate for one candidate. */
  case class TopCand(shard: Long, user_id: Long, est: Long, n_seen: Long)

  /** Bounded per-shard state: candidate counts + events seen. */
  case class MgState(counts: Map[Long, Long], seen: Long)

  /** One Misra–Gries update — the pure kernel [[track]] folds per event,
    * exposed for property testing: increment a tracked key, admit a new
    * key while under capacity, otherwise run a decrement-all round
    * (every candidate pays one, zeros drop — the move that buys the
    * n/(capacity+1) undercount bound). */
  private[graft] def mgUpdate(counts: Map[Long, Long], capacity: Int,
      key: Long): Map[Long, Long] =
    counts.get(key) match {
      case Some(c) => counts.updated(key, c + 1)
      case None if counts.size < capacity => counts + (key -> 1L)
      case None => counts.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  def track(events: Dataset[RawEvent], shards: Int = 4,
      capacity: Int = 16): Dataset[TopCand] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => java.lang.Math.floorMod(e.user_id, shards.toLong))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Long, it: Iterator[RawEvent], state: GroupState[MgState]) =>
          val sorted = it.toVector
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
          var seen = state.getOption.map(_.seen).getOrElse(0L)
          for (e <- sorted) {
            seen += 1
            counts = mgUpdate(counts, capacity, e.user_id)
          }
          state.update(MgState(counts, seen))
          counts.iterator.map { case (u, c) => TopCand(shard, u, c, seen) }
      }
  }
}
