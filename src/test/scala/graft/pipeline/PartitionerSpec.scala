package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Routing policies (core/partitioning/partitioning.pony:39-106) mapped
  * onto Spark physical partitioning: Passthrough keeps the plan unchanged,
  * Random rebalances to n partitions, Single serializes to one, Key routes
  * to the hash-partitioned stateful path.
  */
class PartitionerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pipe(n: Int): Pipeline[Long] = {
    import spark.implicits._
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    Graft.source("parts", DatasetSource(spark.range(100).as[Long].repartition(n), (_: Long) => 0L))
  }

  test("Passthrough keeps the upstream partitioning") {
    val p = pipe(6).partitionWith(PartitionerConfig.Passthrough)
    assert(p.dataset.rdd.getNumPartitions === 6)
    assert(p.values.collect().sorted === (0L until 100L).toArray)
  }

  test("Random(n) rebalances to n partitions, preserving the multiset") {
    val p = pipe(2).partitionWith(PartitionerConfig.Random(8))
    assert(p.dataset.rdd.getNumPartitions === 8)
    assert(p.values.collect().sorted === (0L until 100L).toArray)
  }

  test("Single serializes through one partition") {
    val p = pipe(8).partitionWith(PartitionerConfig.Single)
    assert(p.dataset.rdd.getNumPartitions === 1)
    assert(p.values.collect().sorted === (0L until 100L).toArray)
  }

  test("Key routes to per-key state like keyBy") {
    import LocalCollectFixtures.CountPerState
    import spark.implicits._
    val out = pipe(4)
      .partitionWith(PartitionerConfig.Key[Long](v => (v % 3).toString))
      .toGlobalWindow(CountPerState)
      .values.collect()
    val finalCounts = out.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(finalCounts.keySet === Set("0", "1", "2"))
    // 0..99 mod 3: 34 zeros, 33 ones, 33 twos
    assert(finalCounts("0") === 34L)
    assert(finalCounts("1") === 33L)
    assert(finalCounts("2") === 33L)
  }
}
