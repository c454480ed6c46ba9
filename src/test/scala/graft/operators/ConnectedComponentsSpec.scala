package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the large-star/small-star connected-components contract
  * (Dedup.connectedComponents): logarithmic-round convergence on
  * high-diameter graphs — the shape round-3's min-label propagation
  * silently miscut at diameter > ClusterMaxIters — and a LOUD failure
  * instead of partial labels when the iteration cap is genuinely hit. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark

  private def labelsOf(edges: Seq[(Long, Long)], maxIters: Int = Dedup.ClusterMaxIters) = {
    import spark.implicits._
    Dedup.connectedComponents(edges.toDF("a", "b"), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("diameter-25 chain collapses to one component within ClusterMaxIters") {
    // Min-label propagation needs D rounds for a diameter-D chain, so at
    // the r3 cap of 20 this exact input returned SPLIT clusters with no
    // error; star alternation needs ~log D rounds.
    val got = labelsOf((0 until 25).map(i => (100L + i, 101L + i)))
    assert(got.keySet == (100L to 125L).map(identity).toSet)
    assert(got.values.toSet == Set(100L))
  }

  test("components stay separate; reversed/duplicate/self edges normalize") {
    val got = labelsOf(Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (11L, 10L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("empty edge set converges immediately to no labels") {
    assert(labelsOf(Seq.empty).isEmpty)
  }

  test("star graph and clique converge (min id wins regardless of shape)") {
    val star = labelsOf((1L to 8L).map(i => (50L, 50L + i)))
    assert(star.values.toSet == Set(50L) && star.size == 9)
    val clique = labelsOf(for { i <- 0L to 5L; j <- (i + 1) to 5L } yield (i, j))
    assert(clique.values.toSet == Set(0L) && clique.size == 6)
  }

  test("non-convergence throws instead of returning split clusters") {
    val err = intercept[IllegalStateException] {
      labelsOf((0 until 200).map(i => (i.toLong, i + 1L)), maxIters = 1)
    }
    assert(err.getMessage.contains("did not converge"))
  }
}
