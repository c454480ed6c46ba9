package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Histogram bin math vectors from core/metrics/histogram.pony:21-66:
  * `get_idx(v) = 64 − clz(v)` (the doc comment there says "4→bin 4" but
  * the code gives idx 3; the code is what we match). */
class MetricsSpec extends AnyFunSuite {
  test("power-of-two binning matches the reference get_idx") {
    val h = new LatencyHistogram
    assert(h.binIdx(0) == 0)
    assert(h.binIdx(1) == 1)
    assert(h.binIdx(2) == 2)
    assert(h.binIdx(3) == 2)
    assert(h.binIdx(4) == 3)  // 64 − clz(4) = 3
    assert(h.binIdx(5) == 3)
    assert(h.binIdx(1024) == 11)
    assert(h.binIdx(Long.MaxValue) == 63)
  }

  test("record tracks counts, min, max, size") {
    val h = new LatencyHistogram
    Seq(3L, 4L, 5L, 1000L, 1L).foreach(h.record)
    assert(h.size == 5)
    assert(h.min == 1)
    assert(h.max == 1000)
    assert(h.count(2) == 1)  // 3
    assert(h.count(3) == 2)  // 4, 5
    assert(h.count(10) == 1) // 1000 ≤ 1024
    assert(h.report.map(_._2).sum == 5)
  }
}
