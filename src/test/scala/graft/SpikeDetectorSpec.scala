package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the stream bench's mechanical eruption detector
  * ([[StreamBench.spikeFlags]], VERDICT r10 #1b): the hand-adjudication
  * evidence three rounds of judges applied — wall vs row min, commit_ms
  * vs sibling trials, round-boundary calibration vs its series — as a
  * pure, pinned predicate. The real r10 driver-run eruptions (stream_ann
  * 12.36/26.60/4.94 s walls with 13.2/9.8/15.9 s commits against 2.3 s
  * siblings) must flag; the committed clean run's ±12% spreads must not.
  */
class SpikeDetectorSpec extends AnyFunSuite {

  private val flatCal = Seq((0, 0.25), (1, 0.26), (2, 0.24), (3, 0.25))

  test("clean trials within normal spread flag nothing") {
    // the committed r10 stream_ann row: 4.89/5.17/5.37 s, commits ~2.4 s
    val trials = Seq((4.89, 2400L), (5.17, 2300L), (5.37, 2500L))
    assert(StreamBench.spikeFlags(trials, flatCal) === Set.empty[Int])
  }

  test("the r10 driver-run ann eruption flags exactly the spiked trials") {
    // walls 12.36/26.60/4.94 with commit stalls on the slow trials —
    // the shape VERDICT r10 adjudicated by hand. Both slow trials are
    // > 2x the 4.94 min AND their commits dwarf the sibling median.
    val trials = Seq((12.36, 13200L), (26.60, 9800L), (4.94, 2400L))
    assert(StreamBench.spikeFlags(trials, flatCal) === Set(0, 1))
  }

  test("a slow wall WITHOUT commit or calibration evidence is not flagged") {
    // honest spread (e.g. the wire row's pacing): wall > 2x min alone
    // must not trigger a re-run — the detector wants corroboration
    val trials = Seq((10.5, 2400L), (4.9, 2450L), (5.1, 2350L))
    assert(StreamBench.spikeFlags(trials, flatCal) === Set.empty[Int])
  }

  test("a commit stall WITHOUT a slow wall is not flagged") {
    // commit_ms evidence only corroborates; the trial must also be slow
    val trials = Seq((5.0, 9000L), (4.9, 2450L), (5.1, 2350L))
    assert(StreamBench.spikeFlags(trials, flatCal) === Set.empty[Int])
  }

  test("a bracketing calibration riser corroborates a slow wall") {
    // trial 1 (round 2) is slow with NORMAL commits, but the round-2
    // boundary sample spiked to 2x the series median — the whole-host
    // contention window the r10 driver run showed (0.47 s vs 0.23-0.27)
    val risingCal = Seq((0, 0.25), (1, 0.26), (2, 0.52), (3, 0.25))
    val trials = Seq((5.0, 2400L), (11.0, 2500L), (5.1, 2350L))
    assert(StreamBench.spikeFlags(trials, risingCal) === Set(1))
    // the same trials with the calibration clause disabled (the
    // post-replacement re-evaluation) flag nothing
    assert(StreamBench.spikeFlags(trials, Nil) === Set.empty[Int])
  }

  test("single-trial rows are never flagged") {
    assert(StreamBench.spikeFlags(Seq((40.0, 112000L)), flatCal)
      === Set.empty[Int])
  }

  test("zero sibling commits (stateless rows) disable the commit clause") {
    // stream_stateless carries no state operator: commit_ms is 0 on
    // every trial; a slow wall alone must not divide by the zero median
    val trials = Seq((3.0, 0L), (1.2, 0L), (1.3, 0L))
    assert(StreamBench.spikeFlags(trials, flatCal) === Set.empty[Int])
  }

  // --- the batch pack's shape (VERDICT r11 #1): Bench feeds the SAME
  // fixpoint through spikeFlagsWith with a UNIFORM calibration clause
  // (its probes bracket a query's whole trial block, not single trials).

  test("batch shape: commit-stall eruption flags under a clean bracket") {
    // the r11 driver-run p_late_fire shape — one trial's wall doubles
    // the row min with its evidence dwarfing the sibling median; the
    // bracketing probes were clean, so the commit clause must carry it
    val trials = Seq((7.97, 21000L), (3.9, 4800L), (4.1, 5100L))
    assert(StreamBench.spikeFlagsWith(trials, _ => false) === Set(0))
  }

  test("batch shape: a hot bracket corroborates a slow wall alone") {
    // evidence flat (trigger pacing hides the stall from commit_ms) but
    // the query's bracketing probe rose >1.5x the series median: the
    // uniform cal clause applies to every trial in the block, and only
    // the >2x-min wall flags
    val trials = Seq((9.6, 5000L), (4.1, 4900L), (4.3, 5050L))
    assert(StreamBench.spikeFlagsWith(trials, _ => true) === Set(0))
    // same trials under a clean bracket: no corroboration, no flag
    assert(StreamBench.spikeFlagsWith(trials, _ => false) === Set.empty[Int])
  }

  test("batch shape: honest trigger-paced spread never flags") {
    // wall-bound rows legitimately spread with host scheduling; below
    // 2x min nothing may flag even under a hot bracket
    val trials = Seq((5.9, 5200L), (4.1, 4900L), (4.6, 5050L))
    assert(StreamBench.spikeFlagsWith(trials, _ => true) === Set.empty[Int])
  }

  // --- the evidence-clean wall-outlier predicate (VERDICT r12 #1):
  // the exact class the evidence gate cannot flag — wall eruption,
  // clean commit, quiet calibration — must still get a machine marker.

  test("wall outlier: the driver-r12 stream_ann shape selects for re-run") {
    // walls 18.65/5.4/5.3 with CLEAN commits: spikeFlags stays empty
    // (by design — no corroboration), but the 3.5x-min trial crosses
    // the wall-only 3x bar and the health key's 2x bar
    val trials = Seq((18.65, 2400L), (5.4, 2300L), (5.3, 2500L))
    assert(StreamBench.spikeFlags(trials, flatCal) === Set.empty[Int])
    val walls = trials.map(_._1)
    assert(StreamBench.wallOutlierIdx(walls, Set.empty, 3.0) === Set(0))
    assert(StreamBench.wallOutlierIdx(walls, Set.empty, 2.0) === Set(0))
  }

  test("wall outlier: a (2x, 3x] straggler is counted but NOT re-run") {
    // 2.5x the row min: below the re-run bar (factor 3), inside the
    // health key's wall_outliers_unflagged band (factor 2)
    val walls = Seq(12.5, 5.0, 5.2)
    assert(StreamBench.wallOutlierIdx(walls, Set.empty, 3.0) === Set.empty[Int])
    assert(StreamBench.wallOutlierIdx(walls, Set.empty, 2.0) === Set(0))
  }

  test("wall outlier: evidence-flagged indices are excluded from the count") {
    // trial 0 went through the spike pipeline (marker already published)
    // — only the unmarked eruption may surface under the wall key
    val walls = Seq(26.6, 18.0, 4.9)
    assert(StreamBench.wallOutlierIdx(walls, Set(0), 3.0) === Set(1))
    assert(StreamBench.wallOutlierIdx(walls, Set(0, 1), 3.0) === Set.empty[Int])
  }

  test("wall outlier: boundary is strict and single-trial rows never flag") {
    // exactly 2x min must stay in the elevated (1.5x, 2x] band, not
    // double-count as a wall outlier
    assert(StreamBench.wallOutlierIdx(Seq(10.0, 5.0), Set.empty, 2.0)
      === Set.empty[Int])
    assert(StreamBench.wallOutlierIdx(Seq(10.1, 5.0), Set.empty, 2.0) === Set(0))
    assert(StreamBench.wallOutlierIdx(Seq(40.0), Set.empty, 2.0)
      === Set.empty[Int])
  }

  test("wall outlier: honest spread below the bars flags nothing") {
    val walls = Seq(5.9, 4.1, 4.6)
    assert(StreamBench.wallOutlierIdx(walls, Set.empty, 3.0) === Set.empty[Int])
    assert(StreamBench.wallOutlierIdx(walls, Set.empty, 2.0) === Set.empty[Int])
  }
}
