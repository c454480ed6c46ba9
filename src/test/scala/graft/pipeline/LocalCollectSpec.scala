package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import WindowTestKit.Total

object LocalCollectFixtures {
  /** Running per-state count with the key injected at output, so the test
    * can see which state instance produced each record. */
  object CountPerState extends Aggregation[Long, (String, Long), Total] {
    override val name = "countPerState"
    def initialAccumulator(): Total = new Total
    def update(input: Long, acc: Total): Unit = acc.v += 1
    def combine(a: Total, b: Total): Total = { val t = new Total; t.v = a.v + b.v; t }
    def output(key: String, windowEndTs: Long, acc: Total): Option[(String, Long)] =
      Some((key, acc.v))
  }
}

/** local_collect (application.pony:255-256): one state instance per
  * parallel unit, not one global. Our mapping scopes the next stateful
  * stage's key to the upstream partition id.
  */
class LocalCollectSpec extends AnyFunSuite {
  import LocalCollectFixtures._
  private lazy val spark = TestSpark.spark

  test("localCollect folds per source partition; collectAll folds globally") {
    import spark.implicits._
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    val ds = spark.range(100).as[Long].repartition(4)

    val local = Graft.source("lc", DatasetSource(ds, (_: Long) => 0L))
      .localCollect()
      .toGlobalWindow(CountPerState)
      .values.collect()

    // one running count per partition: 4 distinct state keys whose final
    // (= max) counts sum to the input size
    val perKey = local.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(perKey.size === 4)
    assert(perKey.values.sum === 100L)
    assert(perKey.keys.forall(_.startsWith("part-")))

    val global = Graft.source("gc", DatasetSource(ds, (_: Long) => 0L))
      .collectAll()
      .toGlobalWindow(CountPerState)
      .values.collect()
    val globalPerKey = global.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(globalPerKey.size === 1)
    assert(globalPerKey.values.sum === 100L)
  }
}
