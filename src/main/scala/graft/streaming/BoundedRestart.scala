package graft.streaming

import scala.annotation.tailrec
import scala.util.control.NonFatal

/** Bounded linear reconnect policy — the engine analog of the reference
  * emitter's supervision loop (`lib/hivent/emitter.ex:113-158`):
  *
  *  - the retry delay starts at `reconnect_timer: 0` and GROWS by
  *    `reconnect_backoff` (default 1000 ms) on every consecutive failure,
  *    so the k-th retry waits k × backoff (emitter.ex:121);
  *  - the try counter starts at 0 and retries while
  *    `tries <= max_reconnect_tries` (default 3), i.e. one initial
  *    attempt plus `maxReconnectTries + 1` retries, then gives up with an
  *    error instead of looping forever (emitter.ex:124-137);
  *  - a successful (re)connect does NOT reset the counter or the timer —
  *    the reference keeps both in state untouched on `{:ok, socket}`
  *    (emitter.ex:116-119); we mirror that faithfully rather than
  *    "improving" it.
  *
  * In Spark terms the retried unit is not a socket but a streaming query
  * (or any restartable job): task-level faults are already retried by the
  * scheduler; this wrapper bounds QUERY-level restarts — the
  * crash/restart-from-checkpoint loop that a supervisor would otherwise
  * drive unbounded.
  */
final case class BackoffPolicy(reconnectBackoffMillis: Long = 1000L,
    maxReconnectTries: Int = 3)

object BackoffPolicy {
  /** Resolve the policy from session conf via [[graft.api.GraftConfig]] —
    * the analog of the reference reading `reconnect_backoff` /
    * `max_reconnect_tries` through `Config.get_integer/3`
    * (`lib/hivent/emitter.ex` + `lib/hivent/config.ex:40-56`), including
    * `env:VAR[:default]` indirection and leading-prefix integer coercion. */
  def fromConf(spark: org.apache.spark.sql.SparkSession): BackoffPolicy =
    BackoffPolicy(
      reconnectBackoffMillis = graft.api.GraftConfig.getLong(spark,
        "spark.graft.reconnect.backoffMillis", 1000L),
      maxReconnectTries = graft.api.GraftConfig.getInt(spark,
        "spark.graft.reconnect.maxTries", 3))
}

object BoundedRestart {

  /** Outcome when every allowed attempt failed. */
  final case class GiveUp(attempts: Int, lastError: Throwable)

  /** Run `attempt` (1-indexed) under `policy`. Returns `Right(result)` on
    * the first success, `Left(GiveUp)` once the bounded retries are
    * exhausted. `sleep` is injectable so specs can assert the exact delay
    * schedule without wall-clock waits.
    */
  def run[T](policy: BackoffPolicy, sleep: Long => Unit = Thread.sleep)(
      attempt: Int => T): Either[GiveUp, T] = {
    @tailrec
    def loop(tries: Int, timerMillis: Long): Either[GiveUp, T] = {
      val outcome =
        try Right(attempt(tries + 1))
        catch { case NonFatal(e) => Left(e) }
      outcome match {
        case Right(v) => Right(v)
        case Left(_) if tries <= policy.maxReconnectTries =>
          val nextTimer = timerMillis + policy.reconnectBackoffMillis
          sleep(nextTimer)
          loop(tries + 1, nextTimer)
        case Left(e) => Left(GiveUp(tries + 1, e))
      }
    }
    loop(0, 0L)
  }
}
