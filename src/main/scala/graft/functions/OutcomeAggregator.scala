package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator — the engine's UDAF surface (SURVEY.md §2.2
  * "UDF/UDAF/UDTF"). Counts processing outcomes and accumulates value in
  * one pass; merge is associative/commutative so Spark runs it as a
  * partial (map-side) + final aggregate, the same shape as built-in
  * aggregates.
  *
  * The reference's only aggregation-like surface is the per-event
  * `process/1` callback plus recorder assertions (reference
  * `lib/hivent/consumer.ex:25`, `test/support/channel_client.ex:53-75`);
  * this is its batch generalization: fold outcomes over a whole stream.
  */
object OutcomeAggregator {

  case class OutcomeStats(nOk: Long, nError: Long, totalValue: Double)

  /** Input: (outcome, value) pairs. */
  val outcomeStats: Aggregator[(String, Double), OutcomeStats, OutcomeStats] =
    new Aggregator[(String, Double), OutcomeStats, OutcomeStats] {
      def zero: OutcomeStats = OutcomeStats(0L, 0L, 0.0)
      def reduce(b: OutcomeStats, a: (String, Double)): OutcomeStats =
        if (a._1 == "ok") OutcomeStats(b.nOk + 1, b.nError, b.totalValue + a._2)
        else OutcomeStats(b.nOk, b.nError + 1, b.totalValue + a._2)
      def merge(x: OutcomeStats, y: OutcomeStats): OutcomeStats =
        OutcomeStats(x.nOk + y.nOk, x.nError + y.nError, x.totalValue + y.totalValue)
      def finish(r: OutcomeStats): OutcomeStats = r
      def bufferEncoder: Encoder[OutcomeStats] = Encoders.product[OutcomeStats]
      def outputEncoder: Encoder[OutcomeStats] = Encoders.product[OutcomeStats]
    }
}
