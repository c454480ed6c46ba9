package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TestSpark

/** Plan-shape pins for the two registered scale-utility entries
  * (VERDICT r11 #4): their CORRECTNESS rows certify output-invariance
  * (oracle = the plain join); these specs certify the plans actually DO
  * the physical thing the utilities exist for — without them, a
  * regression that silently dropped the salt or lost the bucket spec
  * would still hash green every round.
  */
class QSkewBucketPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q_skew_join: the salted join keys carry (k, _salt) in the forced-SMJ regime") {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // AQE off so the join is visible to plan.collect (query stages are
    // leaves that hide their subtree); the salt shape is AQE-independent
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.qSkewJoin(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      val joinKeyCounts = plan.collect {
        case j: SortMergeJoinExec    => j.leftKeys.size
        case j: ShuffledHashJoinExec => j.leftKeys.size
      }
      assert(joinKeyCounts.nonEmpty, s"no shuffled join found:\n$plan")
      // the equi-join must run on BOTH the key and the salt — a rewrite
      // that lost the salt would still return correct rows (the salt is
      // redundant for matching) while re-concentrating the hot key
      assert(joinKeyCounts.exists(_ == 2),
        s"salted join should join on (k, _salt), got key counts $joinKeyCounts:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("q_bucket_join: the join subtree plans zero shuffle exchanges") {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // broadcast off: the claim is bucketing elides the shuffle, not that
    // sf0.001 orders fits a broadcast; AQE off so exchange counts are a
    // static plan property (AQE can only remove exchanges, never add).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.qBucketJoin(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      val smjs = plan.collect { case j: SortMergeJoinExec => j }
      assert(smjs.size == 1, s"expected one sort-merge join:\n$plan")
      val joinShuffles = smjs.head.collect { case e: ShuffleExchangeLike => e }
      assert(joinShuffles.isEmpty,
        s"bucketed join subtree must be exchange-free:\n${smjs.head}")
      // the only exchange in the whole query is the groupBy on
      // o_orderpriority — a different key no layout can pre-partition
      val allShuffles = plan.collect { case e: ShuffleExchangeLike => e }
      assert(allShuffles.size == 1,
        s"full query should shuffle only for the final groupBy:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
