package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the count-derived ANN sizing ladders (VERDICT r8 #2): the exact
  * step values at the tested corpus sizes, the caps, monotonicity, and
  * the property the oracle mirror depends on — every ladder is CONSTANT
  * between consecutive powers of two, so a CASE table evaluated at
  * power-of-two breakpoints reproduces the full step function. A ladder
  * edit that breaks that property would silently diverge Spark from the
  * DuckDB oracle on corpus sizes between breakpoints. */
class SizingLaddersSpec extends AnyFunSuite {
  import Similarity._

  test("ladder values at the tested corpus sizes") {
    // sf0.001 / sf0.01: 480 non-query vectors
    assert(ivfProbesFor(480) === 32)
    assert(pqCandFor(480) === 128)
    // sf0.1: 1980 non-query vectors
    assert(ivfProbesFor(1980) === 64)
    assert(pqCandFor(1980) === 512)
    // training sample scales with centroid count, floored at the default
    assert(ivfSampleTargetFor(IvfCentroids) === IvfSampleTarget)
    assert(ivfSampleTargetFor(IvfProbeCentroids) === 16L * IvfProbeCentroids)
  }

  test("caps hold at any corpus size") {
    for (n <- Seq(1L << 20, 1L << 30, 1L << 40)) {
      assert(ivfProbesFor(n) === IvfProbeMax,
        "probe depth must cap at half the cells — growing C is the lever beyond")
      assert(pqCandFor(n) === PqCandMax,
        "the exact re-rank budget must stay bounded at scale")
    }
    assert(IvfProbeMax * 2 === IvfProbeCentroids)
  }

  test("ladders are monotone and constant between powers of two") {
    val probes = Seq(1L, 100L, 511L, 512L, 513L, 999L, 2048L, 5000L,
      12345L, 1L << 16, (1L << 16) + 7, 1L << 22)
    for (f <- Seq[Long => Int](ivfProbesFor, pqCandFor)) {
      // monotone non-decreasing
      val vals = probes.sorted.map(f)
      assert(vals === vals.sorted, "ladder must be monotone in n")
      // constant on (2^(i-1), 2^i] — the sqlLadder contract
      for (n <- probes if n > 1) {
        val ceilPow = java.lang.Long.highestOneBit(n - 1) * 2
        assert(f(n) === f(ceilPow),
          s"f($n) must equal f($ceilPow): the oracle CASE table evaluates " +
            "only at power-of-two breakpoints")
      }
    }
  }
}
