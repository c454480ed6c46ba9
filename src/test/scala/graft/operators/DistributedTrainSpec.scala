package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TestSpark

/** The distributed coarse trainer ([[Similarity.trainIvfDistributed]])
  * exists to lift the C ladder's driver-sample cap (IvfCellMax): it must
  * be exactly reproducible under any partitioning — the fixed-point
  * BIGINT accumulation claim — and land where the local float-fold
  * trainer lands (same sample, same seeds, same assignment rule; only
  * the mean arithmetic differs by ≤ 2⁻²⁰ per element per iteration). */
class DistributedTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def corpusN: Long = Similarity.corpusCount(spark, dir)

  test("partitioning-invariant: identical centroids under different shuffle widths") {
    val n = corpusN
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val a = try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      Similarity.trainIvfDistributed(spark, dir, n, k = 16)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val b = try {
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      Similarity.trainIvfDistributed(spark, dir, n, k = 16)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a.length == b.length)
    for (j <- a.indices)
      assert(java.util.Arrays.equals(a(j), b(j)),
        s"centroid $j diverged across shuffle widths — the BIGINT " +
          "accumulation is not partition-order-free")
  }

  test("lands on the local trainer's centroids (same sample/seeds/assignment)") {
    val n = corpusN
    val local = Similarity.trainIvf(spark, dir, k = 16, nCorpus = n,
      sampleTarget = Similarity.ivfSampleTargetFor(16))
    val dist = Similarity.trainIvfDistributed(spark, dir, n, k = 16)
    assert(local.length == dist.length)
    // the two paths share selection and assignment; means differ only by
    // the 2^-20 fixed-point step (plus any assignment flip it causes —
    // none on this corpus), so agreement is tight, not just approximate
    var maxDiff = 0.0
    for (j <- local.indices; d <- local(j).indices)
      maxDiff = math.max(maxDiff, math.abs(local(j)(d) - dist(j)(d)))
    info(f"max |local - distributed| centroid element diff = $maxDiff%.2e")
    assert(maxDiff < 1e-4,
      f"distributed trainer drifted $maxDiff%.2e from the local fold")
  }

  test("composes into a searchable index (the deployment path)") {
    val n = corpusN
    val coarse = Similarity.trainIvfDistributed(spark, dir, n, k = 16)
    val books = Similarity.trainPqResidual(spark, dir, coarse, n)
    val idx = Similarity.buildIvfPqIndexWith(spark, dir, books, coarse)
    assert(idx.count() == n, "index must hold one row per corpus vector")
    val cells = idx.select("cent_id").distinct().count()
    assert(cells > 1 && cells <= 16, s"expected a real partitioning, got $cells cells")
  }
}
