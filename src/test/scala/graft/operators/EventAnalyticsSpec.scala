package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.pipeline.TestSpark

/** Differential tests for the round-5 analytics additions: each operator's
  * Spark plan is checked against an independent single-threaded Scala
  * re-implementation over the same sf0.001 rows (the strict DuckDB oracle
  * runs driver-side; this pins semantics inside `sbt test`).
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private case class Ev(userId: Long, eventId: Long, tsUs: Long, tpe: String)

  private lazy val events: Seq[Ev] =
    Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "ts_ns div 1000 as ts_us", "event_type")
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("q_events_funnel matches a sequential per-user walk") {
    val steps = Seq("signup", "view", "click", "purchase")
    // walk each user's history in (ts, event_id) order; completed(i) is set
    // once a step-i event is seen with step i-1 already completed STRICTLY
    // earlier — state is read before the row is applied, mirroring the
    // UNBOUNDED PRECEDING..1 PRECEDING frame.
    val reached = Array.fill(steps.size)(scala.collection.mutable.Set.empty[Long])
    for ((user, evs) <- events.groupBy(_.userId)) {
      val completed = Array.fill(steps.size)(false)
      for (e <- evs.sortBy(ev => (ev.tsUs, ev.eventId))) {
        val i = steps.indexOf(e.tpe)
        if (i >= 0 && (i == 0 || completed(i - 1))) {
          reached(i) += user
          completed(i) = true
        }
      }
    }
    val row = Queries.qEventsFunnel(spark, dir).collect().head
    val got = steps.indices.map(i => row.getLong(i))
    assert(got == reached.map(_.size.toLong).toSeq,
      s"funnel counts $got != expected ${reached.map(_.size).toSeq}")
    // sanity: the funnel must be monotone non-increasing
    assert(got == got.sortBy(-_), s"funnel not monotone: $got")
  }

  test("q_events_retention matches a per-user cohort walk") {
    val uw = events.map(e => (e.userId, e.tsUs / 86400000000L / 7)).distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val expected = uw.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, us) => (k._1, k._2, us.map(_._1).distinct.size.toLong) }
      .toSet
    val got = Queries.qEventsRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // every user lands in exactly one cohort at offset 0
    val offset0 = got.filter(_._2 == 0L).map(_._3).sum
    assert(offset0 == events.map(_.userId).distinct.size)
  }

  test("t_perplexity matches an exact integer-bits recomputation") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, text) <- docs; t <- text.split(" ", -1)) counts(t) += 1
    val nTotal = counts.values.sum
    def bits(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val total = toks.map(t => (bits(nTotal) - bits(counts(t))).toLong).sum
      (id, total, toks.length.toLong)
    }.toSet
    val got = TextAnalysis.tPerplexity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }
}
