package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guard over EVERY registered query: the 100 TB
  * discipline as assertions, so a rewrite that re-introduces a cartesian
  * (VERDICT r1: s_cosine_dups) fails CI rather than the next scale-up.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * the broadcast side is a BOUNDED set by construction (ANN query
    * vectors / IVF centroids / a 1-row corpus count), so the "nested
    * loop" is a per-row loop over a constant-size array. */
  private val allowedBnlj =
    Set("s_ann_brute",
      // ADC scan: the 20-query side (with its per-subspace lookup
      // tables) is the broadcast side; candidates stream past it
      "s_ann_pq",
      // NOTE (r8): the IVF family (s_ann_ivf*, s_ann_ivfpq, p_ann_search,
      // d_semantic*) left this list — centroid assignment is now the
      // NearestCells expression, so their plans contain no BNLJ at all.
      "d_ngram_jaccard",
      // corpus-total denominator: 1-row broadcast, like d_ngram_jaccard
      "t_perplexity",
      // snapshot/increment boundary: a 1-row max-id broadcast
      "d_incremental",
      // Σw mixture denominator: 1-row broadcast, like t_perplexity
      "t_mix_domains",
      // corpus-total denominator for the first-token surprise: 1-row
      // broadcast, like t_perplexity
      "t_ngram_lm",
      // n_docs denominator for the percentile ranks: 1-row broadcast
      "t_dataset_card",
      // composes the ANN variants (brute/pq broadcast query sides) plus
      // a 1-row denominator broadcast
      "s_ann_recall",
      // the registered join-path escape hatch: the EVAL side (bounded by
      // construction — it is the side too big only past 2²⁴ doubles as a
      // plan-time matrix, still broadcast-sized) loops per corpus row;
      // SemanticDecontamJoinSpec pins the exact shape
      "d_decontaminate_semantic_join")

  /** Build the plan string, then drop whatever the query persisted —
    * d_semantic registers a cached subtree at CONSTRUCTION time, and an
    * accumulated CacheManager would substitute InMemoryRelation into
    * later queries' plans, perturbing exactly these assertions. */
  private def planOf(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): String =
    try fn(spark, dir).queryExecution.sparkPlan.toString
    finally {
      spark.catalog.clearCache()
      // Caching.reuse blocks are RDD-layer (GC-scoped in a user session);
      // 54 back-to-back constructions shouldn't wait for GC
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

  test("no query plan contains a cartesian product") {
    for ((name, fn) <- graft.SparkEntry.queries) {
      val plan = planOf(fn)
      assert(!plan.contains("CartesianProduct"),
        s"$name has a cartesian product:\n$plan")
    }
  }

  test("nested-loop joins appear only where a bounded side is broadcast") {
    for ((name, fn) <- graft.SparkEntry.queries if !allowedBnlj(name)) {
      val plan = planOf(fn)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name has an unexpected nested-loop join:\n$plan")
    }
  }

  test("q6_filter pushes its predicates into the parquet scan") {
    val plan = graft.SparkEntry.queries("q6_filter")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    // the rendered filter list truncates, so match the prefix only
    assert(plan.contains("GreaterThanOrEqual(l_shipda"), plan)
  }

  test("t_token_count prunes the documents scan to the columns it reads") {
    val df = graft.SparkEntry.queries("t_token_count")(spark, dir)
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    // text + doc_id only — media/meta columns must not be read
    assert(!scans.contains("media"), scans)
  }

  test("q5_join broadcasts only the always-small dimensions") {
    val plan = graft.SparkEntry.queries("q5_join")(spark, dir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // lineitem/orders/customer must never be on a broadcast side
    val bhjBuilds = plan.linesIterator.filter(_.contains("BroadcastExchange")).mkString
    assert(!bhjBuilds.contains("lineitem"), plan)
  }
}
