package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TestSpark

/** Pins the multi-probe IVF quality gate (VERDICT r4 #4): recall@5 vs the
  * exact brute-force top-k must be ≥ 0.8 at the same ~25% candidate
  * budget the 8-centroid/2-probe form spends (which sits at ~0.56). */
class IvfRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-probe IVF recall@5 >= 0.8 at the same candidate budget") {
    val truth = pairs(Similarity.sAnnBrute(spark, dir))
    val got = pairs(Similarity.sAnnIvfProbe(spark, dir))
    val recall = truth.count(got.contains).toDouble / truth.size
    info(f"s_ann_ivf_probe recall@5 = $recall%.3f over ${truth.size} truth pairs")
    assert(recall >= 0.8, f"recall@5 $recall%.3f < 0.8")
    // budget check: probes/centroids fraction unchanged vs the pinned form
    assert(Similarity.IvfProbeCount.toDouble / Similarity.IvfProbeCentroids ==
      Similarity.IvfProbes.toDouble / Similarity.IvfCentroids,
      "probe form must spend the same candidate-scan fraction as the pinned form")
  }

  test("PQ-ADC recall@5 >= 0.6 re-ranking PqCand candidates from 5-byte codes") {
    val truth = pairs(Similarity.sAnnBrute(spark, dir))
    val got = pairs(Similarity.sAnnPq(spark, dir))
    val recall = truth.count(got.contains).toDouble / truth.size
    info(f"s_ann_pq recall@5 = $recall%.3f over ${truth.size} truth pairs")
    assert(recall >= 0.6, f"recall@5 $recall%.3f < 0.6")
    // the operator's reason to exist: PqSub codes per vector vs Dim floats
    assert(Similarity.PqSub * 1.0 / (Similarity.Dim * 8) <= 1.0 / 64,
      "code bytes must stay >= 64x smaller than the float vector")
  }

  test("IVF-PQ composition recall@5 >= 0.7 (cells prune, codes score, 64 re-rank)") {
    val truth = pairs(Similarity.sAnnBrute(spark, dir))
    val got = pairs(Similarity.sAnnIvfPq(spark, dir))
    val recall = truth.count(got.contains).toDouble / truth.size
    info(f"s_ann_ivfpq recall@5 = $recall%.3f over ${truth.size} truth pairs")
    assert(recall >= 0.7, f"recall@5 $recall%.3f < 0.7")
  }
}
