package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.pipeline.TestSpark

/** Proves the zero-exchange co-located join: lineitem and orders written
  * bucketed on the orderkey join BOTH sides without any
  * ShuffleExchange in the physical plan, and produce the same result as
  * the plain (shuffling) join. At 100 TB this is the difference between
  * re-shuffling two fact tables on every query and reading them
  * pre-partitioned (see [[Bucketing]]).
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def shuffles(plan: SparkPlan): Int =
    plan.collect { case e: ShuffleExchangeExec => e }.size

  test("bucketed lineitem-orders join plans no shuffle exchange and matches the shuffled join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // Disable broadcast so the assertion is about bucketing, not about
    // the small sf0.001 orders side fitting in a broadcast (at 100 TB
    // neither fact side broadcasts — that regime is what's under test).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps exchanges in query stages, hiding them from plan.collect
    // until execution — disable it so the shuffle COUNT is a static plan
    // property (AQE can only remove exchanges this test already proves
    // absent, never add any).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Bucketing.writeBucketed(Tables.lineitem(spark, sfDir),
        "li_bucketed", s"$dir/li", "l_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice"),
        "ord_bucketed", s"$dir/ord", "o_orderkey", 8)

      def joined(li: org.apache.spark.sql.DataFrame, ord: org.apache.spark.sql.DataFrame) =
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)")).as("cents"),
            count(lit(1)).as("n"))

      val bucketed = joined(spark.table("li_bucketed"), spark.table("ord_bucketed"))
      val plain = joined(Tables.lineitem(spark, sfDir),
        Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice"))

      // The join itself is exchange-free on the bucketed tables; the only
      // shuffle left in the query is the groupBy on o_custkey (a
      // DIFFERENT key — no physical layout can elide it).
      val bucketedJoinOnly = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      assert(shuffles(bucketedJoinOnly.queryExecution.executedPlan) == 0,
        s"bucketed join should plan zero exchanges:\n${bucketedJoinOnly.queryExecution.executedPlan}")
      assert(shuffles(bucketed.queryExecution.executedPlan) == 1,
        "full query should shuffle only for the groupBy")

      val plainJoinOnly = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      assert(shuffles(plainJoinOnly.queryExecution.executedPlan) == 2,
        "unbucketed fact-fact join shuffles both sides (the cost bucketing removes)")

      val l = bucketed.collect().map(_.toString).sorted.toSeq
      val r = plain.collect().map(_.toString).sorted.toSeq
      assert(l == r && l.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
