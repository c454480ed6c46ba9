package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mechanized committed-run selection (VERDICT r13 #1; metric and
  * tie-break re-pinned r15 per VERDICT r14 #1/#3): the rule the builder
  * previously applied by hand — and the severity grading and
  * normalization it consumes — as pure, pinned functions. A change here
  * changes WHICH run gets committed every round, so every clause has a
  * vector. */
class BenchSelectionSpec extends AnyFunSuite {
  import Bench.{RunCand, StreamWallBound, WireBarRefCalSec, WireBarRps,
    gradeRank, jsonField, parseCand, runsMarkdown, selectCommitted,
    splitNormalizedTotal, wireBarPasses, wireHostNormalizedRps}

  test("grade ranking: clean < turbulent < storm < failed/unknown") {
    assert(Seq("clean", "turbulent", "storm", "failed").map(gradeRank) === Seq(0, 1, 2, 3))
    assert(gradeRank("gibberish") === 3)
  }

  test("a clean run beats a faster stormy run — evidence outranks speed") {
    val storm = RunCand(1, "storm", 100.0, barPass = true, "a")
    val clean = RunCand(2, "clean", 180.0, barPass = false, "b")
    assert(selectCommitted(Seq(storm, clean)).map(_.seq) === Some(2))
  }

  test("within a grade, a wire-bar-passing run beats a faster bar-missing one") {
    // the exact r14 failure (VERDICT r14 what's-wrong #1): the committed
    // run missed the published ≥900 K bar while four peers passed it —
    // the bar is a tie-break AFTER grade, BEFORE total
    val miss = RunCand(3, "turbulent", 451.6, barPass = false, "r3")
    val pass = RunCand(4, "turbulent", 488.5, barPass = true, "r4")
    assert(selectCommitted(Seq(miss, pass)).map(_.seq) === Some(4))
    // but never across grades: a bar-passing storm loses to a bar-missing clean
    val cleanMiss = RunCand(5, "clean", 500.0, barPass = false, "r5")
    val stormPass = RunCand(6, "storm", 400.0, barPass = true, "r6")
    assert(selectCommitted(Seq(cleanMiss, stormPass)).map(_.seq) === Some(5))
  }

  test("within grade and bar, lowest split-normalized total wins") {
    val a = RunCand(1, "turbulent", 250.0, barPass = true, "a")
    val b = RunCand(2, "turbulent", 238.0, barPass = true, "b")
    val c = RunCand(3, "turbulent", 309.0, barPass = true, "c")
    assert(selectCommitted(Seq(a, b, c)).map(_.seq) === Some(2))
  }

  test("ties break to the earliest run (stable as candidates append)") {
    val a = RunCand(1, "clean", 100.0, barPass = true, "a")
    val b = RunCand(2, "clean", 100.0, barPass = true, "b")
    assert(selectCommitted(Seq(b, a)).map(_.seq) === Some(1))
  }

  test("slow host must not win: wall-bound seconds do not scale with the host") {
    // Two runs of identical code. Fast host at the reference calibration:
    // 30 s wall-bound + 100 s CPU-bound. Slow host (cal 2x ref): the
    // CPU-bound half doubles to 200 s, the wall-bound half is machinery-
    // paced and stays 30 s. The OLD whole-run metric scaled everything by
    // refCal/cal and ranked the slow host BETTER (115 < 130) — the exact
    // r14 failure (run 8, cal 0.487, lowest normalized total of the
    // round). The split metric reads both hosts equal, as identical code
    // should.
    val refCal = 0.93
    val fast = splitNormalizedTotal(30.0, 100.0, refCal, refCal)
    val slow = splitNormalizedTotal(30.0, 200.0, 2 * refCal, refCal)
    assert(math.abs(fast - slow) < 1e-9, s"split metric: fast=$fast slow=$slow")
    val oldFast = (30.0 + 100.0) * (refCal / refCal)
    val oldSlow = (30.0 + 200.0) * (refCal / (2 * refCal))
    assert(oldSlow < oldFast, "the vector must reproduce the old metric's bias")
    // degenerate calibration (no probes) falls back to raw seconds
    assert(splitNormalizedTotal(30.0, 100.0, 0.0, refCal) === 130.0)
  }

  test("the wire bar evaluation is pinned: either raw or host-normalized clears 900K") {
    // the anchor is the quiet-host stream-round calibration the bar and
    // the 1.03-1.16M band were measured at (SCALING.md r15: ref_cal_sec's
    // 0.93 idle-r4 anchor would normalize every modern reading to ~330K)
    assert(WireBarRefCalSec === 0.27)
    assert(WireBarRps === 900000.0)
    // r14 run 4's committed-shape vector: quiet host, raw passes alone
    assert(wireBarPasses(1045492, 0.256))
    // r14 run 8's vector: slow host (stream cal 0.396), raw 898K misses
    // but host-normalized 1.32M passes — the self-explaining stamp
    assert(!(898000.0 >= WireBarRps))
    assert(wireBarPasses(898000, 0.396))
    assert(wireHostNormalizedRps(898000, 0.396) > WireBarRps)
    // r14 run 3's vector (the round's committed miss): 783K at stream
    // cal 0.261 — quiet window, the miss was a trial eruption, so the
    // normalization must NOT rescue it
    assert(!wireBarPasses(783495, 0.261))
    // a quiet host slightly under the anchor is not punished into a miss
    assert(wireBarPasses(1030000, 0.251))
    // degenerate calibration: raw reading stands
    assert(wireHostNormalizedRps(950000, 0.0) === 950000.0)
    assert(wireBarPasses(950000, 0.0))
    // the slow-host credit is CAPPED at 1.5x: a uniformly slow host
    // (flat cal — invisible to the window-based storm clause) must not
    // rescue a genuinely bad reading with an unbounded extrapolation
    assert(wireHostNormalizedRps(700000, 0.81) === 700000.0 * 1.5)
    assert(!wireBarPasses(500000, 0.81))
    // a fast host reads DOWN uncapped (conservative direction)
    assert(wireHostNormalizedRps(1200000, 0.135) === 600000.0)
  }

  test("the stream wall-bound tag set is pinned — membership moves committed runs") {
    // structural rationale + r14 cross-host evidence (corr(wall, cal)
    // -0.09..0.14 across eight runs vs 0.61-0.94 for every CPU row) in
    // Bench.StreamWallBound's scaladoc and SCALING.md r15
    assert(StreamWallBound === Set("stream_market_spread_wire",
      "stream_recovery", "stream_two_stage", "stream_topk"))
  }

  test("the r14 closing table under the r15 rule: run 4 (bar-passing) is committed") {
    // The eight r14 candidates with split-normalized totals recomputed
    // from the preserved bench_out.json.run1-8 artifacts (SCALING.md r15
    // replay table). r14's shipped rule committed run 3 — a bar-missing
    // run (783 K standalone wire) over four bar-passing peers, because
    // the whole-run metric was blind to the bar. Under the r15 rule the
    // storm/failed runs stay excluded by grade, run 3 loses the bar
    // tie-break, and run 4 (1.045 M standalone, lowest bar-passing split
    // total among turbulent runs) is committed.
    val r14 = Seq(
      RunCand(1, "failed", 520.8, barPass = false, "r1"),
      RunCand(2, "storm", 517.7, barPass = true, "r2"),
      RunCand(3, "turbulent", 451.6, barPass = false, "r3"),
      RunCand(4, "turbulent", 488.5, barPass = true, "r4"),
      RunCand(5, "failed", 494.1, barPass = true, "r5"),
      RunCand(6, "failed", 495.8, barPass = true, "r6"),
      RunCand(7, "turbulent", 507.0, barPass = true, "r7"),
      RunCand(8, "storm", 413.2, barPass = true, "r8"))
    assert(selectCommitted(r14).map(_.seq) === Some(4))
  }

  test("a failed run is never preferred over any graded run") {
    val failedRun = RunCand(1, "failed", 50.0, barPass = true, "a")
    val storm = RunCand(2, "storm", 500.0, barPass = false, "b")
    assert(selectCommitted(Seq(failedRun, storm)).map(_.seq) === Some(2))
  }

  test("empty candidate list selects nothing") {
    assert(selectCommitted(Nil).isEmpty)
  }

  private val cand =
    """{"seq":3,"ts":"2026-08-16T05:00:00Z","grade":"turbulent",""" +
      """"total_raw_sec":125.4,"batch_total_sec":105.1,"stream_total_sec":20.3,""" +
      """"cal_median_sec":0.391,"normalized_total_sec":298.2,""" +
      """"normalized_split_sec":280.4,"stream_wall_bound_sec":24.7,""" +
      """"spiked_rows":0,""" +
      """"wall_outliers":0,"elevated_trials":2,"failed_rows":0,"repeats":3,""" +
      """"wire_rps":1157000,"wire_standalone_rps":1030000,""" +
      """"wire_bar_pass":true,"out":"bench_out.json.run3"}"""

  test("candidate records round-trip through the flat-field parser") {
    val p = parseCand(cand)
    assert(p === Some(RunCand(3, "turbulent", 280.4, barPass = true,
      "bench_out.json.run3")))
    // field extraction is exact-key (quoted), not substring: "out" must
    // not match inside "wall_outliers"
    assert(jsonField(cand, "out") === Some("bench_out.json.run3"))
    assert(jsonField(cand, "wire_standalone_rps") === Some("1030000"))
    assert(jsonField(cand, "wire_bar_pass") === Some("true"))
    assert(jsonField(cand, "no_such_key").isEmpty)
    assert(parseCand("{\"not\":\"a candidate\"}").isEmpty)
  }

  test("pre-r15 candidate records still parse: split falls back to whole-run") {
    // r14 logs carry normalized_total_sec only (or a transitional 0 in
    // normalized_split_sec) and no wire_bar_pass — they must parse with
    // the whole-run metric and bar-miss, not be dropped
    val old = cand.replace(""""normalized_split_sec":280.4,""", "")
      .replace(""""wire_bar_pass":true,""", "")
    assert(parseCand(old) === Some(RunCand(3, "turbulent", 298.2,
      barPass = false, "bench_out.json.run3")))
    val zeroSplit = cand.replace(""""normalized_split_sec":280.4""",
      """"normalized_split_sec":0""")
    assert(parseCand(zeroSplit).map(_.normalizedSplit) === Some(298.2))
  }

  test("the generated run table marks the chosen run and carries every candidate") {
    val c2 = cand.replace("\"seq\":3", "\"seq\":4")
      .replace("280.4", "240.1").replace("turbulent", "clean")
    val md = runsMarkdown(Seq(cand, c2), chosenSeq = 4)
    assert(md.contains("**4 (committed)**"))
    assert(md.contains("| 3 | turbulent |"))
    assert(md.contains("240.1"))
    assert(md.contains("| pass |"))
    assert(md.linesIterator.count(_.startsWith("|")) === 4) // header+sep+2 rows
  }
}
