package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** r13 sweep guards on the ANN wire/matrix contracts — both convert a
  * silent ranking scramble into a loud failure at construction/pack
  * time (the packCodes discipline). */
class WireGuardsSpec extends AnyFunSuite {

  test("packProbe rejects non-finite cost-table entries") {
    // Pre-guard: a NaN skips the lo/hi scan (both comparisons false),
    // then Math.round((NaN - lo) / scale) = 0 stores q = 0 — the MINIMUM
    // cost — so the corrupted code word would score as the cell's
    // nearest candidate instead of surfacing the upstream corruption.
    val ok = Array.fill(AnnWire.Tables * AnnWire.Codes)(1.0)
    assert(AnnWire.packProbe(0.5, ok).nonEmpty)
    val nan = ok.clone(); nan(7) = Double.NaN
    val e = intercept[IllegalArgumentException](AnnWire.packProbe(0.5, nan))
    assert(e.getMessage.contains("non-finite"))
    val inf = ok.clone(); inf(3) = Double.PositiveInfinity
    intercept[IllegalArgumentException](AnnWire.packProbe(0.5, inf))
  }

  test("CentroidMatrix enforces ascending ids (the tie rule is by row index)") {
    // The documented "ties toward the smaller cent_id" is implemented as
    // "ties toward the smaller ROW index" — identical only when ids
    // ascend. Every current construction site sorts; this pins the
    // assumption so a future caller can't silently diverge from the
    // ORDER BY ccos DESC, cent_id ASC oracles.
    val flat = Array(1.0, 0.0, 0.0, 1.0)
    val cn = Array(1.0, 1.0)
    new CentroidMatrix(flat, cn, Array(3L, 9L)) // ascending: fine
    val e = intercept[IllegalArgumentException](
      new CentroidMatrix(flat, cn, Array(9L, 3L)))
    assert(e.getMessage.contains("ascending"))
    intercept[IllegalArgumentException](
      new CentroidMatrix(flat, cn, Array(3L, 3L))) // duplicates reject too
  }
}
