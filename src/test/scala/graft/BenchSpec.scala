package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench's driver contract: the LAST stdout line must fit
  * inside the driver's 2,000-char stdout tail capture. The per-query
  * map overflowed that bound once query count passed ~90, which made
  * the round artifact unparsable — the summary line is total-only so
  * query growth can never re-break it, and this spec enforces the
  * bound against worst-case inputs.
  */
class BenchSpec extends AnyFunSuite {

  test("summary line stays far under the driver's 2000-char tail capture") {
    val line = Bench.summaryLine(89.942, 105, "/root/testdata/sf0.1", "/root/repo/BENCH_LAST.json")
    assert(line.length < 1900, s"summary line is ${line.length} chars")
    assert(line.length < 300, s"expected a compact line, got ${line.length} chars")
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
