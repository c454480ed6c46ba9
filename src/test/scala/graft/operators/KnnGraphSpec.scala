package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural invariants of the approximate k-NN graph — properties the
  * hash-vs-oracle gate can't express. */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("s_knn_graph: ranks are contiguous per src, mutual flag is symmetric and correct") {
    val out = Similarity.sKnnGraph(spark, dir).cache()
    try {
      val n = out.count()
      assert(n > 0)
      // at most K edges per src, ranks exactly 1..count with no gaps
      val perSrc = out.groupBy("src").agg(
        count(lit(1)).as("deg"), min("rank").as("rmin"), max("rank").as("rmax"))
      val badRank = perSrc.filter(col("deg") > Similarity.KnnGraphK ||
        col("rmin") =!= 1L || col("rmax") =!= col("deg"))
      assert(badRank.count() === 0, "ranks must be 1..deg with deg <= K")
      // no self-loops, no duplicate edges
      assert(out.filter(col("src") === col("dst")).count() === 0)
      assert(out.groupBy("src", "dst").count().filter(col("count") > 1).count() === 0)
      // mutual flag must equal membership of the reversed edge, recomputed
      // independently from the edge set itself
      val ids = out.select("src", "dst")
      val recomputed = ids.as("e").join(
          ids.select(col("dst").as("src"), col("src").as("dst")).as("r"),
          Seq("src", "dst"), "left_semi")
        .withColumn("mutual2", lit(true))
      val joined = out.join(recomputed, Seq("src", "dst"), "left")
        .withColumn("mutual2", coalesce(col("mutual2"), lit(false)))
      assert(joined.filter(col("mutual") =!= col("mutual2")).count() === 0,
        "mutual flag must match reverse-edge membership")
      // symmetry: mutual edges come in pairs
      val mutualEdges = out.filter(col("mutual")).select("src", "dst")
      val unpaired = mutualEdges.as("a").join(
          mutualEdges.select(col("dst").as("src"), col("src").as("dst")).as("b"),
          Seq("src", "dst"), "left_anti")
      assert(unpaired.count() === 0, "every mutual edge needs its reverse")
    } finally out.unpersist()
  }

  test("s_quantize: codes bounded by ±127, error within the half-step bound") {
    val out = Similarity.sQuantize(spark, dir).cache()
    try {
      assert(out.count() > 0)
      val badCode = out.filter(expr(
        "exists(q, c -> c > 127 or c < -127)"))
      assert(badCode.count() === 0, "int8 code range")
      // round-half-up error is at most half a quantization step
      val badErr = out.filter(col("max_abs_err") > col("qscale") / 254.0 + 1e-12)
      assert(badErr.count() === 0, "reconstruction error must be <= step/2")
      // the max-magnitude dimension always quantizes to ±127 exactly
      val badScale = out.filter(expr("not exists(q, c -> abs(c) = 127)"))
      assert(badScale.count() === 0, "scale dim must hit full range")
    } finally out.unpersist()
  }
}
