package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineQueries

/** The oracle-checked FirePerMessage entry ([[PipelineQueries.pLateFire]])
  * at sf0.001: every straggler the arrival script holds back must surface
  * as a singleton window output stamped with its own event time
  * (panes_range_windows.pony:146-168 semantics under the REAL streaming
  * host), and p_collect's global serialization point must reproduce the
  * plain global aggregate. The DuckDB oracle re-proves the full output
  * multiset at sf0.01 (driver gate) — this spec keeps the late-singleton
  * guarantee pinned in CI with an independent classification replay. */
class LateFireOracleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("p_late_fire: each straggler fires exactly its singleton output") {
    val got = PipelineQueries.pLateFire(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // Independent replay of the arrival script's classification rule.
    val rows = graft.Tables.events(spark, dir)
      .filter(col("user_id") < PipelineQueries.LateUserMax)
      .select(col("user_id"), expr("cast(round(value * 100) as bigint)"),
        col("ts_ns"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val kmax = rows.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val stragglers = rows.filter(r =>
      r._4 % 10 == 0 && r._3 <= kmax(r._1) - PipelineQueries.RangeNs)

    assert(stragglers.nonEmpty, "testdata produced no stragglers; rule needs retuning")
    stragglers.foreach { r =>
      assert(got.contains((r._1, r._3 / 1000, r._2, 1L)),
        s"straggler $r has no singleton output")
    }
    // and the windows phase contributed real (multi-event) windows too
    assert(got.exists(_._4 > 1), "no aggregated window outputs present")
  }

  test("p_late_delay: with the delay open, no straggler fires a singleton") {
    val got = PipelineQueries.pLateDelay(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rows = graft.Tables.events(spark, dir)
      .filter(col("user_id") < PipelineQueries.LateUserMax)
      .select(col("user_id"), expr("cast(round(value * 100) as bigint)"),
        col("ts_ns"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val kmax = rows.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val stragglers = rows.filter(r =>
      r._4 % 10 == 0 && r._3 <= kmax(r._1) - PipelineQueries.RangeNs)
    // a window's output ts is end−1 ≡ 999 ns mod 1000, an event's is ≡ 0,
    // so a singleton stamp can never collide with a window stamp
    stragglers.foreach { r =>
      assert(!got.contains((r._1, r._3 / 1000, r._2, 1L)),
        s"straggler $r fired a singleton despite the open delay")
    }
    assert(got.nonEmpty)
  }

  test("p_collect: the global serialization point reproduces the global aggregate") {
    val got = PipelineQueries.pCollect(spark, dir).collect().head
    val exp = graft.Tables.events(spark, dir)
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("c"),
        count(lit(1)).as("n")).collect().head
    assert(got.getLong(0) === exp.getLong(0) && got.getLong(1) === exp.getLong(1))
  }
}
