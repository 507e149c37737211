package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench's driver contract: the LAST stdout line must fit
  * inside the driver's 2,000-char stdout tail capture. The per-query
  * map overflowed that bound once query count passed ~90, which made
  * the round artifact unparsable — the summary line is total-only so
  * query growth can never re-break it, and this spec enforces the
  * bound against worst-case inputs.
  */
class BenchSpec extends AnyFunSuite with SparkTest {

  test("summary line stays far under the driver's 2000-char tail capture") {
    val line = Bench.summaryLine(89.942, 105, "/root/testdata/sf0.1", "/root/repo/BENCH_LAST.json")
    assert(line.length < 1900, s"summary line is ${line.length} chars")
    assert(line.length < 300, s"expected a compact line, got ${line.length} chars")
  }

  test("a throwing query is named in the error list, not masked as fast") {
    // round-9 verdict item 3: the old `catch { _ => -1L }` let a broken
    // query contribute a near-zero time and nothing marked it failed
    val ok = (s: org.apache.spark.sql.SparkSession, _: String) => s.range(5).toDF("id")
    val boom = (_: org.apache.spark.sql.SparkSession, _: String) =>
      sys.error("boom"): org.apache.spark.sql.DataFrame
    val (results, failed) =
      Bench.runQueries(spark, sf, Seq("ok" -> ok, "boom" -> boom), reps = 1)
    assert(failed == Seq("boom"))
    assert(results.map(_._1) == Seq("ok", "boom"))
    // and the summary line carries the count without growing unboundedly
    val line = Bench.summaryLine(1.0, 2, sf, "/tmp/out.json", reps = 1, errors = failed.size)
    assert(line.contains("\"errors\":1"))
    assert(line.length < 1900)
  }

  test("disagreeing reps trigger a third and the median is reported") {
    // round-10 verdict item 2: a stalled rep printed bigram_counts at
    // 7.8× its same-code time into the official artifact. When the two
    // reps disagree >2×, a third must run and the median win, so one
    // stalled (or one anomalously fast) repetition cannot decide the
    // artifact alone.
    val stalled = Iterator(4.03, 0.52, 0.50) // rep1 stalled, rep2+3 honest
    assert(Bench.settle(() => stalled.next(), reps = 2) == 0.52)
    assert(stalled.isEmpty, "the disagreement must consume exactly three reps")
    val fastGlitch = Iterator(0.10, 0.52, 0.50) // rep1 anomalously fast
    assert(Bench.settle(() => fastGlitch.next(), reps = 2) == 0.50)
  }

  test("runQueries records each key's per-rep spread alongside the settled time") {
    // round-14 verdict item 4: without per-query min/max, a pagerank
    // +2.6s round-over-round delta is unfalsifiable against rep noise
    val ok = (s: org.apache.spark.sql.SparkSession, _: String) => s.range(5).toDF("id")
    val (results, failed) = Bench.runQueries(spark, sf, Seq("ok" -> ok), reps = 2)
    assert(failed.isEmpty)
    val (name, settled, lo, hi) = results.head
    assert(name == "ok")
    assert(lo <= settled && settled <= hi, s"settled $settled outside [$lo,$hi]")
    assert(lo > 0 && hi > 0)
  }

  test("settleFull returns every observed rep, including the disagreement third") {
    val stalled = Iterator(4.03, 0.52, 0.50)
    val (settled, all) = Bench.settleFull(() => stalled.next(), reps = 2)
    assert(settled == 0.52)
    assert(all.sorted == Vector(0.50, 0.52, 4.03)) // third rep recorded
    val (s2, all2) = Bench.settleFull(() => 0.5, reps = 2)
    assert(s2 == 0.5 && all2 == Vector(0.5, 0.5))
  }

  test("agreeing reps keep the min-of-2 contract and run no extra rep") {
    var calls = 0
    val agreeing = () => { calls += 1; if (calls == 1) 0.60 else 0.55 }
    assert(Bench.settle(agreeing, reps = 2) == 0.55)
    assert(calls == 2, s"agreeing reps must not pay a third repetition, ran $calls")
    // single-rep mode (SPARK_GRAFT_BENCH_REPS=1) can never disagree
    var single = 0
    assert(Bench.settle(() => { single += 1; 1.23 }, reps = 1) == 1.23)
    assert(single == 1)
  }

  test("summary line is valid minimal JSON with the driver's expected fields") {
    val line = Bench.summaryLine(12.5, 7, "/tmp/sfX", "/tmp/out.json", reps = 2)
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"value\":12.500"))
    assert(line.contains("\"unit\":\"sec\""))
    assert(line.contains("\"n\":7"))
    assert(line.contains("\"reps\":2"))
    assert(line.contains("\"sf\":\"/tmp/sfX\""))
    assert(line.contains("\"detail\":\"/tmp/out.json\""))
    // exactly one line — a trailing newline would split the tail capture
    assert(!line.contains("\n"))
  }

  test("bound holds even with pathologically long paths and totals") {
    val longPath = "/very/long/" + ("d" * 600) + "/sf0.1"
    val line = Bench.summaryLine(1.234567e9, 100000, longPath, longPath + "/out.json")
    assert(line.length < 1900, s"summary line is ${line.length} chars")
  }
}
