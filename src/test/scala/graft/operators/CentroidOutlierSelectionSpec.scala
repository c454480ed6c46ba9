package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial coverage for s_centroid_outliers' multi-level bucketed
  * P90 selection (the VERDICT r8 #4 rewrite): the registry oracle runs
  * it on well-spread synthetic data, so this spec drives the paths a
  * hot/degenerate label exercises —
  *  - a label whose embeddings are ALL IDENTICAL (d2 ≡ 0: the lo == hi
  *    short-circuit must resolve without touching rows);
  *  - a label whose d2 values are nearly tied (tiny integer range: the
  *    recentered decimal-exact routing must still split lo from hi);
  *  - a normal spread label alongside, proving per-label isolation.
  * Expected values come from an independent exact BigInt re-derivation
  * of the fixed-point distance and the nearest-rank threshold. */
class CentroidOutlierSelectionSpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark

  test("multi-level P90 selection: all-equal, near-tied and spread labels") {
    import spark.implicits._
    val dim = Similarity.Dim
    // all-equal label: 40 identical vectors
    val dup = (0 until 40).map(i =>
      (100L + i, Array.tabulate(dim)(d => 0.25f + d * 0.001f), "dup"))
    // near-tied label: identical except dimension 0 varies by exactly
    // one fixed-point step (2^-20) per row — d2 range is a few integers
    val near = (0 until 50).map(i =>
      (200L + i, Array.tabulate(dim)(d =>
        if (d == 0) 0.5f + (i % 3) * (1.0f / 1048576.0f) else -0.125f), "neartie"))
    // spread label: deterministic varied vectors
    val spread = (0 until 100).map(i =>
      (300L + i, Array.tabulate(dim)(d =>
        math.sin(i * 31 + d * 7).toFloat), "spread"))
    val rows = dup ++ near ++ spread
    val dir = java.nio.file.Files.createTempDirectory("graft_outlier_spec").toString
    try {
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

      val got = Similarity.sCentroidOutliers(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3)))
        .toMap

      // independent exact re-derivation (BigInt everywhere)
      def q(x: Float): BigInt = BigInt(math.floor(x.toDouble * 1048576).toLong)
      val byLabel = rows.groupBy(_._3)
      val expected = byLabel.flatMap { case (_, members) =>
        val n = BigInt(members.size)
        val qs = members.map { case (id, emb, _) => id -> emb.map(q) }
        val sums = Array.tabulate(dim)(d => qs.map(_._2(d)).sum)
        val d2 = qs.map { case (id, qv) =>
          id -> Array.tabulate(dim)(d => (n * qv(d) - sums(d)).pow(2)).sum
        }
        val k = ((9 * n + 9) / 10).toInt
        val thr = d2.map(_._2).sorted.apply(k - 1)
        d2.map { case (id, v) => id -> (v, v > thr) }
      }
      assert(got.keySet === expected.keySet)
      for ((id, (v, out)) <- expected) {
        val (gotD, gotOut) = got(id)
        assert(gotOut === out, s"vec $id outlier flag diverged")
        assert(gotD === BigDecimal(v).toDouble, s"vec $id d2 diverged")
      }
      // the all-equal label must flag nothing (d2 ≡ 0, thr = 0)
      assert((100L until 140L).forall(id => !got(id)._2))
      // the spread label must flag ~10% (nearest-rank P90 on 100 rows)
      assert((300L until 400L).count(id => got(id)._2) === 10)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("empty embeddings degrade to an empty result (ADVICE r9)") {
    // zero labels → zero thresholds; the driver-side selection must
    // return an empty frame with the contract schema, not throw on
    // reducing an empty threshold set (the pre-r10 failure mode)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_outlier_empty").toString
    try {
      Seq.empty[(Long, Array[Float], String)]
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = Similarity.sCentroidOutliers(spark, dir)
      assert(out.columns.toSeq ===
        Seq("vec_id", "label", "d2_centroid", "is_outlier"))
      assert(out.count() === 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
