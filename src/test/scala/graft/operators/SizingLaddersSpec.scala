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
    // the C ladder (VERDICT r9 #1) keeps the base grid at both tested SFs
    // (same hashes as the pinned-C rounds) and steps at the probe corpora
    assert(ivfCellsFor(480) === IvfProbeCentroids)
    assert(ivfCellsFor(1980) === IvfProbeCentroids)
    assert(ivfCellsFor(19800) === 256)  // the x10 probe corpus
    assert(ivfCellsFor(198000) === 1024) // the x100 probe corpus
  }

  test("caps hold at any corpus size") {
    for (n <- Seq(1L << 20, 1L << 30, 1L << 40)) {
      assert(ivfProbesFor(n) === IvfProbeMax,
        "probe depth caps at the fixed scan budget — the C ladder routes growth")
      assert(pqCandFor(n) === PqCandMax,
        "the exact re-rank budget must stay bounded at scale")
    }
    // C rides the sqrt slope longer (8 doublings from the 8192-row base
    // put the cap at 2^29 corpus rows) but still caps
    for (n <- Seq(1L << 30, 1L << 40))
      assert(ivfCellsFor(n) === IvfCellMax,
        "C caps where the 16*C training collect hits the driver budget")
    assert(IvfProbeMax * 2 === IvfProbeCentroids)
    // C >= 2*probes everywhere: the probe depth never exceeds half the
    // cells, at the base (128/64) and up the whole ladder (C grows, P caps)
    for (n <- Seq(480L, 1980L, 19800L, 198000L, 1L << 24, 1L << 36))
      assert(ivfCellsFor(n) >= 2 * ivfProbesFor(n))
  }

  test("C ladder slope is sqrt(n): C doubles per 4x corpus") {
    var t = IvfCellBaseN
    var c = IvfProbeCentroids
    while (c < IvfCellMax) {
      assert(ivfCellsFor(t) === c)
      assert(ivfCellsFor(t + 1) === c * 2, s"C must double past n=$t")
      t *= 4; c *= 2
    }
  }

  test("ladders are monotone and constant between powers of two") {
    val probes = Seq(1L, 100L, 511L, 512L, 513L, 999L, 2048L, 5000L,
      8193L, 12345L, 1L << 16, (1L << 16) + 7, 1L << 22)
    // the composed sample-size ladder n -> mod(n, 16*C(n)) must ALSO be a
    // power-of-two step function: duckTrainedCents emits its CASE at
    // power-of-two boundaries only (VERDICT r9 #1's oracle mirror)
    val sampleMod: Long => Int =
      n => ivfSampleModFor(n, ivfSampleTargetFor(ivfCellsFor(n))).toInt
    // d_semantic_scale's composition: k from the cluster ladder, sample
    // floor 16·k, mod from both — still power-of-two stepped
    val semSampleMod: Long => Int =
      n => ivfSampleModFor(n, ivfSampleTargetFor(semScaleK(n))).toInt
    for (f <- Seq[Long => Int](ivfProbesFor, pqCandFor, ivfCellsFor,
        sampleMod, semSampleMod)) {
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

  test("t_substring_dedup's broadcast->shuffle switch steps exactly at its breakpoint") {
    // VERDICT r11 #5: the former "drop the two hints at the ceiling"
    // manual scale note, now a count-adaptive step on the same
    // power-of-two contract as every other ladder. The switch is
    // output-invariant (join strategy, not semantics) — this pins the
    // POINT, the CORRECTNESS row pins the output.
    val spark = graft.pipeline.TestSpark.spark
    import spark.implicits._
    def hinted(n: Long): Boolean = {
      val side = TextAnalysis.substrBroadcastSide(
        Seq((1L, 2L)).toDF("doc_id", "s"), n)
      side.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    }
    assert(java.lang.Long.bitCount(TextAnalysis.SubstrBroadcastMaxDocs) === 1,
      "breakpoint must be a power of two")
    assert(hinted(1L))
    assert(hinted(TextAnalysis.SubstrBroadcastMaxDocs))
    assert(!hinted(TextAnalysis.SubstrBroadcastMaxDocs + 1))
    assert(!hinted(1L << 40))
  }
}
