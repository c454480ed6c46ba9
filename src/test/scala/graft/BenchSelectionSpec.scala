package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mechanized committed-run selection (VERDICT r13 #1): the rule the
  * builder previously applied by hand — and the severity grading it
  * consumes — as pure, pinned functions. A change here changes WHICH run
  * gets committed every round, so every clause has a vector. */
class BenchSelectionSpec extends AnyFunSuite {
  import Bench.{RunCand, gradeRank, jsonField, parseCand, runsMarkdown, selectCommitted}

  test("grade ranking: clean < turbulent < storm < failed/unknown") {
    assert(Seq("clean", "turbulent", "storm", "failed").map(gradeRank) === Seq(0, 1, 2, 3))
    assert(gradeRank("gibberish") === 3)
  }

  test("a clean run beats a faster stormy run — evidence outranks speed") {
    val storm = RunCand(1, "storm", 100.0, "a")
    val clean = RunCand(2, "clean", 180.0, "b")
    assert(selectCommitted(Seq(storm, clean)).map(_.seq) === Some(2))
  }

  test("within a grade, lowest host-normalized total wins") {
    val a = RunCand(1, "turbulent", 250.0, "a")
    val b = RunCand(2, "turbulent", 238.0, "b")
    val c = RunCand(3, "turbulent", 309.0, "c")
    assert(selectCommitted(Seq(a, b, c)).map(_.seq) === Some(2))
  }

  test("ties break to the earliest run (stable as candidates append)") {
    val a = RunCand(1, "clean", 100.0, "a")
    val b = RunCand(2, "clean", 100.0, "b")
    assert(selectCommitted(Seq(b, a)).map(_.seq) === Some(1))
  }

  test("the r13 closing table under the rule: run 4 would have been committed") {
    // the five r13 runs re-graded under the severity split (runs 1-2 had
    // evidence-backed eruptions -> storm; 3-5 only elevated trials ->
    // turbulent), normalized totals from SCALING.md's table. The hand
    // choice was run 3 (wire reading); the encoded rule picks run 4 —
    // the wire consideration is obsolete now that the authoritative wire
    // number is the standalone reading, decoupled from run choice.
    val r13 = Seq(
      RunCand(1, "storm", 109.2 * 0.93 / 0.397, "r1"),
      RunCand(2, "storm", 104.0 * 0.93 / 0.301, "r2"),
      RunCand(3, "turbulent", 108.9 * 0.93 / 0.391, "r3"),
      RunCand(4, "turbulent", 98.4 * 0.93 / 0.384, "r4"),
      RunCand(5, "turbulent", 111.7 * 0.93 / 0.336, "r5"))
    assert(selectCommitted(r13).map(_.seq) === Some(4))
  }

  test("a failed run is never preferred over any graded run") {
    val failedRun = RunCand(1, "failed", 50.0, "a")
    val storm = RunCand(2, "storm", 500.0, "b")
    assert(selectCommitted(Seq(failedRun, storm)).map(_.seq) === Some(2))
  }

  test("empty candidate list selects nothing") {
    assert(selectCommitted(Nil).isEmpty)
  }

  private val cand =
    """{"seq":3,"ts":"2026-08-16T05:00:00Z","grade":"turbulent",""" +
      """"total_raw_sec":125.4,"batch_total_sec":105.1,"stream_total_sec":20.3,""" +
      """"cal_median_sec":0.391,"normalized_total_sec":298.2,""" +
      """"normalized_split_sec":280.4,"spiked_rows":0,""" +
      """"wall_outliers":0,"elevated_trials":2,"failed_rows":0,"repeats":3,""" +
      """"wire_rps":1157000,"wire_standalone_rps":1030000,"out":"bench_out.json.run3"}"""

  test("candidate records round-trip through the flat-field parser") {
    val p = parseCand(cand)
    assert(p === Some(RunCand(3, "turbulent", 298.2, "bench_out.json.run3")))
    // field extraction is exact-key (quoted), not substring: "out" must
    // not match inside "wall_outliers"
    assert(jsonField(cand, "out") === Some("bench_out.json.run3"))
    assert(jsonField(cand, "wire_standalone_rps") === Some("1030000"))
    assert(jsonField(cand, "no_such_key").isEmpty)
    assert(parseCand("{\"not\":\"a candidate\"}").isEmpty)
  }

  test("the generated run table marks the chosen run and carries every candidate") {
    val c2 = cand.replace("\"seq\":3", "\"seq\":4")
      .replace("298.2", "240.1").replace("turbulent", "clean")
    val md = runsMarkdown(Seq(cand, c2), chosenSeq = 4)
    assert(md.contains("**4 (committed)**"))
    assert(md.contains("| 3 | turbulent |"))
    assert(md.contains("240.1"))
    assert(md.linesIterator.count(_.startsWith("|")) === 4) // header+sep+2 rows
  }
}
