package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's failed-repeat semantics: a time-to-exception is not a
  * timing, so failed repeats never contribute to the median and an
  * all-failed query reports no number at all (only a `failed` entry).
  */
class BenchSpec extends AnyFunSuite {

  test("median of odd and even run counts") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }

  test("failed repeats are excluded from the median") {
    // the failure is fast (0.1s) — including it would report a speedup
    val runs = Seq((5.0, true), (0.1, false), (7.0, true))
    assert(Bench.successfulMedian(runs).contains(6.0))
  }

  test("a query whose repeats all fail reports no median") {
    assert(Bench.successfulMedian(Seq((0.1, false), (0.2, false))).isEmpty)
  }

  test("spread stats: (min, median, max) over successful repeats only") {
    val runs = Seq((5.0, true), (0.1, false), (7.0, true), (6.0, true))
    assert(Bench.successfulStats(runs).contains((5.0, 6.0, 7.0)))
    assert(Bench.successfulStats(Seq((0.1, false))).isEmpty)
  }

  test("env stamp carries cpus and the 1-minute load average") {
    val stamp = Bench.envStamp(32)
    // must splice into the JSON line as two numeric fields: the
    // round-12 verdict's load-window adjudication needs both on-line
    assert(stamp.startsWith("\"cpus\":32,\"load1\":"), stamp)
    val load1 = stamp.split(":").last.toDouble // parses as a number
    assert(load1 >= 0.0 || load1 == -1.0, s"load1 sentinel contract: $load1")
  }
}
