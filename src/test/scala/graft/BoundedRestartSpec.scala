package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BackoffPolicy, BoundedRestart}

/** Bounded reconnect/backoff semantics, mirrored from the reference
  * emitter's supervision loop (emitter.ex:113-158): linear delay growth,
  * give-up after the bounded try budget, success mid-way stops retrying.
  */
class BoundedRestartSpec extends AnyFunSuite with SparkTest {

  private val fast = BackoffPolicy(reconnectBackoffMillis = 7L, maxReconnectTries = 3)

  test("delay grows linearly and gives up after 1 initial + maxTries+1 retries") {
    val delays = ArrayBuffer.empty[Long]
    var attempts = 0
    val out = BoundedRestart.run[Unit](fast, delays += _) { _ =>
      attempts += 1
      sys.error("connection refused")
    }
    // tries 0..3 pass the `tries <= max` guard (emitter.ex:124), so the
    // initial attempt is followed by exactly 4 retries at 7,14,21,28 ms —
    // the accumulating `reconnect_timer + backoff` schedule of :121
    assert(attempts == 5)
    assert(delays.toSeq == Seq(7L, 14L, 21L, 28L))
    out match {
      case Left(g) =>
        assert(g.attempts == 5)
        assert(g.lastError.getMessage == "connection refused")
      case Right(_) => fail("expected give-up")
    }
  }

  test("success mid-way returns the result and stops the schedule") {
    val delays = ArrayBuffer.empty[Long]
    val out = BoundedRestart.run[String](fast, delays += _) { attempt =>
      if (attempt < 3) sys.error("flaky") else s"connected on $attempt"
    }
    assert(out == Right("connected on 3"))
    assert(delays.toSeq == Seq(7L, 14L)) // no sleep after success
  }

  test("first-try success performs zero sleeps") {
    val delays = ArrayBuffer.empty[Long]
    assert(BoundedRestart.run[Int](fast, delays += _)(_ => 42) == Right(42))
    assert(delays.isEmpty)
  }

  test("streaming restart-from-checkpoint under the policy loses no data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    stream.addData(1L to 100L: _*)
    val outPath = tempDir("restart-out")
    val ckpt = tempDir("restart-ckpt")
    var starts = 0
    val out = BoundedRestart.run[Unit](fast, _ => ()) { _ =>
      starts += 1
      val failThisRun = starts <= 2
      val q = stream.toDF().selectExpr("value AS v").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          // a consumer that dies mid-processing on the first two runs —
          // AFTER writing, so the restart also exercises the idempotent
          // overwrite-by-batchId discipline the sinks use
          batch.write.mode("overwrite")
            .parquet(s"$outPath/batch_id=$batchId")
          if (failThisRun) sys.error("consumer crash")
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val err = q.exception
      err.foreach(throw _)
    }
    assert(out.isRight)
    assert(starts == 3)
    val vs = spark.read.parquet(outPath).select("v").as[Long].collect().sorted
    assert(vs.toSeq == (1L to 100L))
  }
}
