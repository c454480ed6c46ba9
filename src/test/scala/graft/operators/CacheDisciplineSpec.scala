package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The library-level cache contract (VERDICT r3 #3): operators that reuse
  * an internal subtree must not leave anything registered in the
  * session-wide CacheManager after the result materializes — composing
  * them in a user's long-lived session must not accumulate pinned blocks
  * the user never asked for and cannot see. No clearCache() anywhere in
  * this spec: that caller convention is exactly what the contract
  * replaces. */
class CacheDisciplineSpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Every registered query whose implementation caches a shared subtree
    * (grep `Caching.reuse` — keep in sync). */
  private val cacheUsers = Seq(
    "d_ngram_jaccard", "d_minhash_lsh", "d_simhash_pairs", "d_cluster",
    "d_canonical", "d_semantic", "d_semantic_scale", "t_pack", "t_top_terms",
    "t_perplexity", "t_pipeline_e2e", "t_bpe_train", "t_bpe_encode",
    "m_phash_dedup")

  test("cache-using operators leave the CacheManager empty after materializing") {
    for (name <- cacheUsers) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left entries in the session CacheManager")
    }
  }
}
