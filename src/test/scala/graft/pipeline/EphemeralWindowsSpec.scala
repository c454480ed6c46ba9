package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import WindowTestKit._

/** Ports of /root/reference/lib/wallaroo/core/windows/
  * _test_ephemeral_windows.pony (373 LoC). trigger_range = post_trigger
  * range = 5 s throughout, matching the Pony suite. */
class EphemeralWindowsSpec extends AnyFunSuite {
  private def ew() = ephemeralWrapper(Collect, seconds(5), seconds(5))

  test("batch vs streaming end-to-end: agree except the documented timer-cadence difference") {
    val spark = TestSpark.spark
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val e3: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    // Bursty per-user traffic engineered to hit every phase: in-window
    // fills, a trigger event, drop-late arrivals, a remove-point
    // crossing, and a fresh window after removal — per user, shifted.
    val events: Seq[(Long, Long, Long)] = (0L until 4L).flatMap { u =>
      val off = u * 3
      Seq(
        (u, 1L, off + 0L), (u, 2L, off + 2L),          // window 1 fill
        (u, 4L, off + 6L),                             // triggers window 1
        (u, 8L, off + 8L),                             // late → dropped
        (u, 16L, off + 20L),                           // past remove → consumed by old
        (u, 32L, off + 21L), (u, 64L, off + 26L))      // window 2 fill + trigger
    }.map { case (u, c, t) => (u, c, seconds(t)) }
    val outEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
    object SumCents extends Aggregation[(Long, Long, Long), (String, Long, Long), Array[Long]] {
      override val name = "sum cents"
      def initialAccumulator(): Array[Long] = Array(0L, 0L)
      def update(in: (Long, Long, Long), acc: Array[Long]): Unit = {
        acc(0) += in._2; acc(1) += 1
      }
      def combine(a: Array[Long], b: Array[Long]): Array[Long] =
        Array(a(0) + b(0), a(1) + b(1))
      def output(key: String, end: Long, acc: Array[Long]): Option[(String, Long, Long)] =
        Some((key, acc(0), acc(1)))
    }
    def windows = Graft.ephemeralWindows(seconds(5), seconds(5)).over(SumCents)

    Graft.source("eph-batch", DatasetSource(spark.createDataset(events), (e: (Long, Long, Long)) => e._3))
      .keyBy(_._1.toString)
      .to(windows)(outEnc)
      .toSink(MemorySink("eph_eq_batch"))

    val mem = MemoryStream[(Long, Long, Long)]
    val h = Graft.source("eph-stream", DatasetSource(mem.toDS(), (e: (Long, Long, Long)) => e._3))
      .keyBy(_._1.toString)
      .to(windows)(outEnc)
      .toSink(MemorySink("eph_eq_stream"))
    // event-time-ordered chunks across several micro-batches
    events.sortBy(_._3).grouped(7).foreach { chunk =>
      mem.addData(chunk); h.processAllAvailable()
    }
    h.processAllAvailable()
    h.stop()

    def collect(view: String): Seq[(String, Long, Long)] = spark
      .sql(s"SELECT _1._1, _1._2, _1._3 FROM $view")
      .as[(String, Long, Long)].collect().toSeq.sorted
    val batch = collect("eph_eq_batch")
    val stream = collect("eph_eq_stream")
    // Window 1 (no batch-boundary straddle) is identical on both paths:
    // fill, trigger at the first event past triggerPoint, late drop.
    (0 until 4).foreach { u =>
      assert(batch.contains((u.toString, 7L, 3L)), s"batch: $batch")
      assert(stream.contains((u.toString, 7L, 3L)), s"stream: $stream")
    }
    // The 20s event straddles the removePoint and is where the two
    // watermark histories — the documented trigger-model difference,
    // SURVEY §7.4.1 (runner.pony:465-501 timers vs replay) — diverge:
    //  - STREAMING matches the reference's live timer cadence: the query
    //    watermark passed removePoint between micro-batches, the timer
    //    dropped the state, so the event OPENS window 2 → (16+32+64, 3);
    //  - BATCH REPLAY advances a key's watermark only with its own
    //    events, so the event is consumed by the dead window as late
    //    data and window 2 holds only the last two events → (96, 2).
    (0 until 4).foreach { u =>
      assert(stream.contains((u.toString, 112L, 3L)), s"stream: $stream")
      assert(batch.contains((u.toString, 96L, 2L)), s"batch: $batch")
    }
    assert(batch.size == 8 && stream.size == 8)
  }

  test("FirstMessageForOpenWindowIsPlacedInWindow") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w.onTimeout(seconds(111), seconds(100))
    assert(outs(res) == Vector(Vector(1L)))
  }

  test("MessageBeforeTriggerPointForOpenWindowIsPlacedInWindow") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w(2, seconds(104), seconds(111))
    assert(outs(res) == Vector(Vector(1L, 2L)))
  }

  test("FirstMessageAfterTriggerPointIsPlacedInWindowAndWindowIsTriggered") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w(2, seconds(106), seconds(106))
    assert(outs(res) == Vector(Vector(1L, 2L)))
  }

  test("MessageForExistingButTriggeredWindowIsTreatedAsDropLateData") {
    val w = ew(); w(1, seconds(100), seconds(100)); w(2, seconds(106), seconds(106))
    val res = w(3, seconds(107), seconds(107))
    assert(outs(res).isEmpty)
  }

  test("MessageForExistingButTriggeredWindowIsTreatedAsFirePerMessageLateData") {
    val w = ephemeralWrapper(Collect, seconds(5), seconds(5),
      policy = LateDataPolicy.FirePerMessage)
    w(1, seconds(100), seconds(100)); w(2, seconds(106), seconds(106))
    val res = w(3, seconds(107), seconds(107))
    assert(outs(res) == Vector(Vector(3L)))
  }

  test("KeyIsRetainedForFirstMessage") {
    val w = ew()
    assert(w(1, seconds(100), seconds(100))._3)
  }

  test("KeyIsRetainedForMessageBeforeTriggerPoint") {
    val w = ew(); w(1, seconds(100), seconds(100))
    assert(w(2, seconds(103), seconds(103))._3)
  }

  test("KeyIsRetainedForTriggeredWindowBeforeRemovePoint") {
    val w = ew(); w(1, seconds(100), seconds(100)); w(2, seconds(106), seconds(106))
    assert(w(2, seconds(107), seconds(107))._3)
  }

  test("KeyIsNotRetainedForTriggeredWindowAfterRemovePoint") {
    val w = ew(); w(1, seconds(100), seconds(100)); w(2, seconds(106), seconds(106))
    assert(!w(2, seconds(111), seconds(111))._3)
  }

  test("OnTimeoutBeforeTriggerPointDoesNothing") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w.onTimeout(seconds(104), seconds(100))
    assert(outs(res).isEmpty && res._3)
  }

  test("OnTimeoutNonTriggeredWindowAfterTriggerPointTriggersWindow") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w.onTimeout(seconds(106), seconds(100))
    assert(outs(res) == Vector(Vector(1L)) && res._3)
  }

  test("OnTimeoutTriggeredWindowAfterTriggerPointDoesNothing") {
    val w = ew(); w(1, seconds(100), seconds(100))
    w.onTimeout(seconds(106), seconds(100))
    val res = w.onTimeout(seconds(108), seconds(106))
    assert(outs(res).isEmpty && res._3)
  }

  test("OnTimeoutNonTriggeredWindowAfterRemovePointTriggersWindowAndRemoves") {
    val w = ew(); w(1, seconds(100), seconds(100))
    val res = w.onTimeout(seconds(111), seconds(100))
    assert(outs(res) == Vector(Vector(1L)) && !res._3)
  }

  test("OnTimeoutTriggeredWindowAfterRemovePointRemoves") {
    val w = ew(); w(1, seconds(100), seconds(100))
    w.onTimeout(seconds(106), seconds(100))
    val res = w.onTimeout(seconds(111), seconds(106))
    assert(outs(res).isEmpty && !res._3)
  }

  test("PlaceInOldestWindowIsRejected") {
    assertThrows[IllegalArgumentException] {
      ephemeralWrapper(Collect, seconds(5), seconds(5),
        policy = LateDataPolicy.PlaceInOldestWindow)(1, seconds(100), seconds(100))
    }
  }
}
