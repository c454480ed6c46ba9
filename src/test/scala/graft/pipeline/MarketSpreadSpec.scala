package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineQueries

/** The market-spread demo (examples/python/market_spread/market_spread.py:
  * 58-100): two sources merged, keyed, one per-key state written by the
  * quote leg and read by the order leg. Pins
  *  1. the state machine's accept/reject semantics on a hand-built tape,
  *  2. merge interleaving: the batch replay orders the merged legs per
  *     key by event time, so a quote update applies to strictly-later
  *     orders only,
  *  3. streaming twin (two MemoryStreams merged) = batch replay when
  *     arrival order respects event time.
  */
class MarketSpreadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  // (kind 0=quote/1=order, event_id, key, cents, ts_ns)
  private type E = (Long, Long, Long, Long, Long)
  private val tape: Seq[E] = Seq(
    (1L, 100L, 1L, 500L, 10L), // order before any quote -> rejected, quote=-1
    (0L, 101L, 1L, 1000L, 20L), // quote 10.00
    (1L, 102L, 1L, 1100L, 30L), // within +20% -> accepted
    (1L, 103L, 1L, 1201L, 40L), // 12.01 > 12.00 -> rejected
    (1L, 104L, 1L, 799L, 50L), // 7.99 < 8.00 -> rejected
    (0L, 105L, 1L, 2000L, 60L), // re-quote 20.00
    (1L, 106L, 1L, 1600L, 70L), // exactly -20% boundary -> accepted
    (1L, 200L, 2L, 100L, 15L), // other key: no quote -> rejected
    (0L, 201L, 2L, 100L, 25L),
    (1L, 202L, 2L, 100L, 35L)) // exact match -> accepted

  private val expected = Set(
    (100L, 1L, 500L, -1L, true),
    (102L, 1L, 1100L, 1000L, false),
    (103L, 1L, 1201L, 1000L, true),
    (104L, 1L, 799L, 1000L, true),
    (106L, 1L, 1600L, 2000L, false),
    (200L, 2L, 100L, -1L, true),
    (202L, 2L, 100L, 100L, false))

  private implicit val in5 = org.apache.spark.sql.Encoders.tuple(
    org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
    org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
    org.apache.spark.sql.Encoders.scalaLong)
  private implicit val out5 = org.apache.spark.sql.Encoders.tuple(
    org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
    org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
    org.apache.spark.sql.Encoders.scalaBoolean)

  test("batch replay: reject semantics + per-key event-time interleaving of merged legs") {
    import spark.implicits._
    // Deliberately shuffled input: the batch stateful stage must re-derive
    // event-time order per key, and the two legs arrive as separate
    // pipelines through merge.
    val shuffled = scala.util.Random.shuffle(tape)
    val quotes = Graft.source("md",
      DatasetSource(spark.createDataset(shuffled.filter(_._1 == 0L)), (e: E) => e._5))
    val orders = Graft.source("ord",
      DatasetSource(spark.createDataset(shuffled.filter(_._1 == 1L)), (e: E) => e._5))
    val out = quotes.merge(orders)
      .keyBy(_._3.toString)
      .to(PipelineQueries.MarketCheck)
      .values.collect().toSet
    assert(out == expected)
  }

  test("streaming twin: two MemoryStreams merged = batch replay (in-order arrival)") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val md = MemoryStream[E]
    val ord = MemoryStream[E]
    val handle = Graft.source("md-stream", DatasetSource(md.toDS(), (e: E) => e._5))
      .merge(Graft.source("ord-stream", DatasetSource(ord.toDS(), (e: E) => e._5)))
      .keyBy(_._3.toString)
      .to(PipelineQueries.MarketCheck)
      .toSink(MemorySink("spread_out"))
    // Feed in global event-time order, two micro-batch rounds.
    val (first, second) = tape.sortBy(_._5).splitAt(5)
    def feed(rows: Seq[E]): Unit = {
      val (q, o) = rows.partition(_._1 == 0L)
      if (q.nonEmpty) md.addData(q)
      if (o.nonEmpty) ord.addData(o)
      handle.processAllAvailable()
    }
    feed(first); feed(second)
    handle.stop()
    val out = spark.sql("SELECT _1._1, _1._2, _1._3, _1._4, _1._5 FROM spread_out")
      .as[(Long, Long, Long, Long, Boolean)](out5).collect().toSet
    assert(out == expected)
  }

  test("registry entry runs at sf0.001 with only purchase rows emitted") {
    val df = PipelineQueries.pMarketSpread(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq ==
      Seq("event_id", "user_id", "order_cents", "quote_cents", "rejected"))
    // Every emitted row is an order; quote-leg rows are consumed into state.
    val nOrders = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(rows.length.toLong == nOrders)
  }
}
