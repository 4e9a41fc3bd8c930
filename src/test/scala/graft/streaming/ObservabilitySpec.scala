package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** LatencyStats unit tests (no Spark session): bucket math, percentile
  * monotonicity, and the handler decorator's outcome keying. */
class ObservabilitySpec extends AnyFunSuite {

  test("LatencyStats: counts, totals and monotone percentiles") {
    val ls = new Observability.LatencyStats()
    // 90 fast (~1ms), 9 medium (~16ms), 1 slow (~1s)
    (1 to 90).foreach(_ => ls.record("user/ok", 1000000L))
    (1 to 9).foreach(_ => ls.record("user/ok", 16000000L))
    ls.record("user/ok", 1000000000L)
    val s = ls.snapshot("user/ok").get
    assert(s.count == 100)
    assert(s.totalMs > 90 && s.totalMs < 1500)
    assert(s.maxMs >= 1000.0)
    assert(s.p50Ms <= s.p95Ms && s.p95Ms <= s.p99Ms)
    assert(s.p50Ms < 16.0) // p50 lands in the fast bucket
    assert(s.p99Ms >= 16.0 && s.p99Ms < 1000.0) // 99th value is the medium bucket
    assert(s.maxMs >= 1000.0) // the outlier surfaces via max
    assert(ls.snapshot("nope").isEmpty)
  }

  test("LatencyStats.instrument keys by category and outcome, rethrows failures") {
    var tick = 0L
    val ls = new Observability.LatencyStats(clockNanos = () => { tick += 1000000L; tick })
    val wrapped = ls.instrument[String]((s, evs) =>
      if (evs.isEmpty) throw new IllegalStateException("empty") else s"${evs.size}")
    val ev = InputEvent("user-1", 0, "t", "", 1, isUnfold = false)
    assert(wrapped("user-1", Seq(ev)) == "1")
    intercept[IllegalStateException](wrapped("user-2", Nil))
    assert(ls.keys == Seq("user/failed", "user/ok"))
    assert(ls.snapshot("user/ok").get.count == 1)
    assert(ls.snapshot("user/failed").get.count == 1)
  }
}
