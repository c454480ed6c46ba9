package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import WindowTestKit._

/** Ports of the reference's window trigger/pane vectors —
  * /root/reference/lib/wallaroo/core/windows/_test_windows.pony (1102 LoC).
  * Each test drives the window state machine with explicit
  * (input, event_ts, watermark_ts) triples and asserts the emitted outputs
  * per call, exactly as the Pony suite does. */
class WindowVectorsSpec extends AnyFunSuite {

  test("TumblingWindowsTriggeredOnTimeoutWatermark") {
    val wm = seconds(111)
    val tw = totalTumblingWindow(seconds(1))
    tw(111, wm, wm)
    val res = tw.onTimeout(TimeoutWatermark.value, wm)
    assert(outs(res) == Vector(111L))
    assert(res._2 != TimeoutWatermark.value)
  }

  test("TumblingWindowsOutputEventTimes") {
    val tw = totalTumblingWindow(seconds(3))
    tw(1, seconds(111), seconds(111))
    tw(2, seconds(112), seconds(112))
    val res = tw(3, seconds(114), seconds(114))
    assert(res._1 == Vector((3L, seconds(114) - 1)))
    assert(res._2 == seconds(114) - 1)
  }

  test("SlidingWindowsOutputEventTimes") {
    val sw = rangeWindowsWrapper(Sum, seconds(10), seconds(5), seconds(10))
    sw(1, seconds(111), seconds(111))
    sw(2, seconds(121), seconds(121))
    val res = sw(3, seconds(141), seconds(141))
    assert(res._1.map(_._1) == Vector(1L, 1L, 2L, 2L))
    assert(res._1.map(_._2) == Vector(
      seconds(116) - 1, seconds(121) - 1, seconds(126) - 1, seconds(131) - 1))
  }

  test("OnTimeoutWatermarkTsIsJustBeforeNextWindowStart") {
    val tw = totalTumblingWindow(millis(50))
    tw(1, millis(5000), millis(5000))
    val res = tw.onTimeout(TimeoutWatermark.value, millis(5000) - 1)
    assert(outs(res) == Vector(1L))
    assert(res._2 == millis(5050) - 1)
  }

  test("EventInNewWindowCausesPreviousToFlush") {
    val tw = totalTumblingWindow(millis(50))
    tw(1, millis(5000), millis(5000))
    tw(2, millis(5025), millis(5025))
    val res = tw(10, millis(5055), millis(5055))
    assert(outs(res) == Vector(3L))
  }

  test("TimeoutAfterEndOfWindowCausesFlush") {
    val tw = totalTumblingWindow(millis(50))
    tw(1, millis(5000), millis(5000))
    tw(2, millis(5025), millis(5025))
    val res = tw.onTimeout(TimeoutWatermark.value, 0)
    assert(outs(res) == Vector(3L))
  }

  test("OutputWatermarkTsIsJustBeforeNextWindowStart") {
    val tw = rangeWindowsWrapper(NonZeroSum, millis(50), millis(50), 0)
    tw(1, millis(5000), millis(5000))
    val res = tw(3, millis(5100), millis(5100))
    assert(outs(res) == Vector(1L))
    assert(res._2 == millis(5050) - 1)
  }

  test("TestTumblingWindows") {
    val tw = rangeWindowsWrapper(Sum, seconds(10), seconds(10), seconds(10))
    assert(outs(tw(2, seconds(96), seconds(101))).isEmpty)
    assert(outs(tw(3, seconds(97), seconds(102))).isEmpty)
    assert(outs(tw(4, seconds(98), seconds(103))).isEmpty)
    assert(outs(tw(5, seconds(99), seconds(104))).isEmpty)
    assert(outs(tw(1, seconds(105), seconds(106))).isEmpty)
    assert(outs(tw(2, seconds(106), seconds(107))).isEmpty)
    assert(outs(tw(3, seconds(107), seconds(108))).isEmpty)
    assert(outs(tw(4, seconds(108), seconds(109))).isEmpty)
    assert(outs(tw(10, seconds(110), seconds(111))) == Vector(14L))
    assert(outs(tw(20, seconds(111), seconds(112))).isEmpty)
    tw(30, seconds(112), seconds(113))
    tw(40, seconds(113), seconds(114))
    assert(outs(tw(1, seconds(200), seconds(201))) == Vector(20L, 90L))
  }

  test("TestSlidingWindows0") {
    val sw = rangeWindowsWrapper(Sum, seconds(10), seconds(2), seconds(10))
    assert(outs(sw(2, seconds(92), seconds(100))).isEmpty)
    assert(outs(sw(3, seconds(93), seconds(102))).isEmpty)
    assert(outs(sw(4, seconds(94), seconds(103))).isEmpty)
    assert(outs(sw(5, seconds(95), seconds(104))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(1, seconds(102), seconds(106))).isEmpty)
    assert(outs(sw(2, seconds(103), seconds(107))).isEmpty)
    assert(outs(sw(3, seconds(104), seconds(108))).isEmpty)
    assert(outs(sw(4, seconds(105), seconds(109))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(10, seconds(108), seconds(112))) == Vector(14L, 14L))
    assert(outs(sw(20, seconds(109), seconds(113))).isEmpty)
    assert(outs(sw(30, seconds(110), seconds(114))) == Vector(12L))
    assert(outs(sw(40, seconds(111), seconds(115))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(2, seconds(192), seconds(200))) ==
      Vector(10L, 10L, 40L, 110L, 107L, 100L, 100L, 70L, 0L, 0L))
    assert(outs(sw(3, seconds(193), seconds(202))) == Vector(0L))
    assert(outs(sw(4, seconds(194), seconds(203))).isEmpty)
    assert(outs(sw(5, seconds(195), seconds(204))) == Vector(5L))
    assert(sw.panesIncreasing)
    assert(outs(sw(1, seconds(202), seconds(206))) == Vector(14L))
    assert(outs(sw(2, seconds(203), seconds(207))).isEmpty)
    assert(outs(sw(3, seconds(204), seconds(208))) == Vector(14L))
    assert(outs(sw(4, seconds(205), seconds(209))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(10, seconds(211), seconds(212))) == Vector(14L, 14L))
    assert(outs(sw(20, seconds(212), seconds(213))).isEmpty)
    assert(outs(sw(30, seconds(213), seconds(214))) == Vector(12L))
    assert(outs(sw(40, seconds(214), seconds(215))).isEmpty)
    assert(sw.panesIncreasing)
  }

  test("TestSlidingWindowsNoDelay") {
    val sw = rangeWindowsWrapper(Sum, seconds(10), seconds(2), 0)
    assert(outs(sw(2, seconds(92), seconds(100))).isEmpty)
    assert(outs(sw(3, seconds(93), seconds(102))).isEmpty)
    assert(outs(sw(4, seconds(94), seconds(103))).isEmpty)
    assert(outs(sw(5, seconds(95), seconds(104))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(1, seconds(102), seconds(106))).isEmpty)
    assert(outs(sw(2, seconds(103), seconds(107))).isEmpty)
    assert(outs(sw(3, seconds(104), seconds(108))).isEmpty)
    assert(outs(sw(4, seconds(105), seconds(109))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(10, seconds(108), seconds(112))) == Vector(20L, 20L))
    assert(outs(sw(20, seconds(109), seconds(113))).isEmpty)
    assert(outs(sw(30, seconds(110), seconds(114))) == Vector(67L))
    assert(outs(sw(40, seconds(111), seconds(115))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(2, seconds(192), seconds(200))) ==
      Vector(100L, 100L, 70L, 0L, 0L))
    assert(outs(sw(3, seconds(193), seconds(202))) == Vector(5L))
    assert(outs(sw(4, seconds(194), seconds(203))).isEmpty)
    assert(outs(sw(5, seconds(195), seconds(204))) == Vector(9L))
    assert(sw.panesIncreasing)
  }

  test("TestSlidingWindowsOutOfOrder") {
    val sw = rangeWindowsWrapper(Sum, seconds(10), seconds(2), seconds(10))
    assert(outs(sw(5, seconds(95), seconds(100))).isEmpty)
    assert(outs(sw(4, seconds(94), seconds(102))).isEmpty)
    assert(outs(sw(3, seconds(93), seconds(103))).isEmpty)
    assert(outs(sw(2, seconds(92), seconds(104))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(4, seconds(105), seconds(106))).isEmpty)
    assert(outs(sw(3, seconds(104), seconds(107))).isEmpty)
    assert(outs(sw(2, seconds(103), seconds(108))).isEmpty)
    assert(outs(sw(1, seconds(102), seconds(109))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(40, seconds(111), seconds(112))) == Vector(14L, 14L))
    assert(outs(sw(30, seconds(110), seconds(113))).isEmpty)
    assert(outs(sw(20, seconds(109), seconds(114))) == Vector(12L))
    assert(outs(sw(10, seconds(108), seconds(115))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(2, seconds(192), seconds(200))) ==
      Vector(10L, 10L, 40L, 110L, 107L, 100L, 100L, 70L, 0L, 0L))
    assert(sw.panesIncreasing)
  }

  test("TestSlidingWindowsGCD") {
    // Delay 10 normalizes up to 12 (not a multiple of slide 3).
    val sw = rangeWindowsWrapper(Sum, seconds(10), seconds(3), seconds(10))
    assert(outs(sw(2, seconds(92), seconds(100))).isEmpty)
    assert(outs(sw(3, seconds(93), seconds(102))).isEmpty)
    assert(outs(sw(4, seconds(94), seconds(103))).isEmpty)
    assert(outs(sw(5, seconds(95), seconds(104))).isEmpty)
    assert(outs(sw(1, seconds(102), seconds(106))).isEmpty)
    assert(outs(sw(2, seconds(103), seconds(107))).isEmpty)
    assert(outs(sw(3, seconds(104), seconds(108))).isEmpty)
    assert(outs(sw(4, seconds(105), seconds(109))).isEmpty)
    assert(outs(sw(10, seconds(111), seconds(112))) == Vector(14L))
    assert(outs(sw(20, seconds(112), seconds(113))) == Vector(14L))
    assert(outs(sw(30, seconds(113), seconds(114))).isEmpty)
    assert(outs(sw(40, seconds(114), seconds(115))).isEmpty)
    assert(outs(sw(2, seconds(192), seconds(200))) ==
      Vector(12L, 10L, 10L, 39L, 100L, 100L, 90L, 0L))
    assert(outs(sw(3, seconds(193), seconds(202))).isEmpty)
    assert(outs(sw(4, seconds(194), seconds(203))) == Vector(0L))
    assert(outs(sw(5, seconds(195), seconds(204))).isEmpty)
    assert(outs(sw(1, seconds(202), seconds(206))) == Vector(5L))
    assert(outs(sw(2, seconds(203), seconds(207))).isEmpty)
    assert(outs(sw(3, seconds(204), seconds(208))).isEmpty)
    assert(outs(sw(4, seconds(205), seconds(209))) == Vector(14L))
    assert(outs(sw(10, seconds(211), seconds(212))) == Vector(14L))
    assert(outs(sw(20, seconds(212), seconds(213))).isEmpty)
    assert(outs(sw(30, seconds(213), seconds(214))).isEmpty)
    assert(outs(sw(40, seconds(214), seconds(215))) == Vector(13L))
  }

  test("TestSlidingWindowsLateData") {
    val sw = rangeWindowsWrapper(Sum, seconds(10), seconds(2), seconds(10))
    assert(outs(sw(1, seconds(92), seconds(100))).isEmpty)
    assert(outs(sw(2, seconds(93), seconds(102))).isEmpty)
    assert(outs(sw(10, seconds(199), seconds(200))) ==
      Vector(3L, 3L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(outs(sw(100, seconds(100), seconds(201))).isEmpty)
    assert(outs(sw(1, seconds(101), seconds(220))) ==
      Vector(0L, 0L, 0L, 0L, 10L, 10L, 10L, 10L, 10L, 0L))
  }

  test("TestSlidingWindowsEarlyData") {
    val sw = rangeWindowsWrapper(Sum, seconds(10), seconds(2), seconds(10))
    assert(outs(sw(2, seconds(92), seconds(100))).isEmpty)
    // A bunch of early values (event ts ahead of the watermark)
    for ((v, ts) <- Seq((1L, 102L), (2L, 103L), (3L, 104L), (4L, 105L),
        (10L, 108L), (20L, 109L), (30L, 110L), (40L, 111L))) {
      assert(outs(sw(v, seconds(ts), seconds(100))).isEmpty)
      assert(sw.panesIncreasing)
    }
    assert(outs(sw(3, seconds(93), seconds(102))).isEmpty)
    assert(sw.panesIncreasing)
    assert(outs(sw(4, seconds(94), seconds(103))).isEmpty)
    assert(outs(sw(5, seconds(95), seconds(104))).isEmpty)
    // Late values just to advance the watermark
    assert(outs(sw(0, seconds(1), seconds(106))).isEmpty)
    assert(outs(sw(0, seconds(1), seconds(107))).isEmpty)
    assert(outs(sw(0, seconds(1), seconds(108))).isEmpty)
    assert(outs(sw(0, seconds(1), seconds(109))).isEmpty)
    assert(outs(sw(0, seconds(1), seconds(112))) == Vector(14L, 14L))
    assert(outs(sw(0, seconds(1), seconds(113))).isEmpty)
    assert(outs(sw(0, seconds(1), seconds(114))) == Vector(12L))
    assert(outs(sw(0, seconds(1), seconds(115))).isEmpty)
    assert(outs(sw(2, seconds(192), seconds(200))) ==
      Vector(10L, 10L, 40L, 110L, 107L, 100L, 100L, 70L, 0L, 0L, 0L))
  }

  test("TestSlidingWindowsStragglers") {
    val sw = rangeWindowsWrapper(Sum, seconds(10), seconds(2), seconds(1000))
    val watermarks = new StageWatermarks(seconds(100000))

    var wm = watermarks.receiveWatermark(1, seconds(10000), seconds(50000))
    var res = sw(1, wm, wm)
    watermarks.updateOutputWatermark(res._2)
    assert(outs(res).isEmpty)
    wm = watermarks.receiveWatermark(1, seconds(10001), seconds(50001))
    res = sw(3, wm, wm)
    watermarks.updateOutputWatermark(res._2)
    assert(outs(res).isEmpty)
    wm = watermarks.receiveWatermark(1, seconds(10002), seconds(50002))
    res = sw(5, wm, wm)
    watermarks.updateOutputWatermark(res._2)
    assert(outs(res).isEmpty)

    // It's been a while since we've heard from anyone: idle eviction.
    val inputW = watermarks.checkEffectiveInputWatermark(seconds(10000000))
    res = sw.onTimeout(inputW, watermarks.outputWatermark)
    watermarks.updateOutputWatermark(res._2)
    val vals = outs(res)
    assert(vals.size == 502)
    assert(vals.take(496).forall(_ == 0L))
    assert(vals(496) == 1 + 3)
    assert(vals(497) == 1 + 3 + 5)
    assert(vals(498) == 1 + 3 + 5)
    assert(vals(499) == 1 + 3 + 5)
    assert(vals(500) == 1 + 3 + 5)
    assert(vals(501) == 5)
    assert(sw.panesIncreasing)
  }

  test("TestSlidingWindowsStragglersSequence") {
    val sw = rangeWindowsWrapper(Collect, seconds(10), seconds(2), seconds(1000))
    val watermarks = new StageWatermarks(seconds(100000))
    for ((v, i) <- Seq(1L, 2L, 3L, 4L, 5L, 6L).zipWithIndex) {
      val wm = watermarks.receiveWatermark(1, seconds(10000 + i), seconds(50000 + i))
      val res = sw(v, wm, wm)
      watermarks.updateOutputWatermark(res._2)
      assert(outs(res).isEmpty)
    }
    val inputW = watermarks.checkEffectiveInputWatermark(seconds(100000000))
    val res = sw.onTimeout(inputW, watermarks.outputWatermark)
    val vals = outs(res)
    assert(vals.size == 503)
    assert(vals.take(496).forall(_.sum == 0L))
    assert(vals(496).sum == 1 + 2)
    assert(vals(497).sum == 1 + 2 + 3 + 4)
    assert(vals(498).sum == 1 + 2 + 3 + 4 + 5 + 6)
    assert(vals(499).sum == 1 + 2 + 3 + 4 + 5 + 6)
    assert(vals(500).sum == 1 + 2 + 3 + 4 + 5 + 6)
    assert(vals(501).sum == 3 + 4 + 5 + 6)
    assert(vals(502).sum == 5 + 6)
    vals.foreach(c => assert(noDecreaseOrJumpBeyondOne(c)))
    assert(sw.panesIncreasing)
  }

  test("TestSlidingWindowsSequence") {
    val sw = rangeWindowsWrapper(Collect, seconds(50), seconds(25), seconds(3000))
    var wm = 4863L
    sw(0, seconds(4864), seconds(wm))
    for (i <- 0 until 28) { wm += 25; sw(i.toLong, seconds(wm), seconds(wm)) }
    wm += 10; sw(28, seconds(wm), seconds(wm))
    wm += 10; sw(29, seconds(wm), seconds(wm))
    wm += 10; sw(30, seconds(wm), seconds(wm))
    val calls = Seq(
      (20L, 10901L), (21L, 10907L), (22L, 10912L), (23L, 10918L),
      (24L, 10924L), (25L, 10929L), (26L, 10935L), (27L, 10940L),
      (28L, 10945L), (29L, 10951L), (30L, 10957L), (31L, 10964L),
      (32L, 10968L), (33L, 10973L), (34L, 10979L))
    for ((v, t) <- calls) {
      val res = sw(v, seconds(t), seconds(t))
      outs(res).foreach(c => assert(noDecreaseOrJumpBeyondOne(c)))
      assert(sw.panesIncreasing)
    }
  }

  test("TestCountWindows") {
    val cw = new TumblingCountWindows[Long, Long, Total]("key", Sum, 4)
    assert(outs(cw(2, seconds(96), seconds(101))).isEmpty)
    assert(outs(cw(3, seconds(97), seconds(102))).isEmpty)
    assert(outs(cw(4, seconds(98), seconds(103))).isEmpty)
    assert(outs(cw(5, seconds(99), seconds(104))) == Vector(14L))
    assert(outs(cw(1, seconds(105), seconds(106))).isEmpty)
    assert(outs(cw(2, seconds(106), seconds(107))).isEmpty)
    assert(outs(cw(3, seconds(107), seconds(108))).isEmpty)
    assert(outs(cw(4, seconds(108), seconds(109))) == Vector(10L))
    assert(outs(cw(10, seconds(110), seconds(111))).isEmpty)
    assert(outs(cw(20, seconds(111), seconds(112))).isEmpty)
    assert(outs(cw(30, seconds(112), seconds(113))).isEmpty)
    assert(outs(cw(40, seconds(113), seconds(114))) == Vector(100L))
  }

  test("TestStaggerIsSane") {
    // For any stagger, the first event is never lost.
    val rand = new scala.util.Random(42)
    for (_ <- 0 until 1000) {
      val tw = rangeWindowsWrapper(Sum, seconds(1), seconds(1), seconds(2),
        stagger = rand.nextDouble())
      tw(1, seconds(10), seconds(10))
      val res = tw(99, seconds(14), seconds(14))
      assert(outs(res) == Vector(0L, 0L, 1L))
    }
  }

  test("TestStaggerDoesNotUnderflow") {
    val tw = rangeWindowsWrapper(Sum, seconds(1), seconds(1), seconds(1),
      stagger = 5.4e-20)
    tw(1, millis(999), millis(999))
    val res = tw(2, seconds(2) + 1, seconds(2) + 1)
    assert(outs(res) == Vector(1L))
  }

  test("TestZeroIsAValidEventTime") {
    val tw = rangeWindowsWrapper(Sum, 1, 1, 0)
    tw(1, 0, 0)
    val res = tw(2, 1, 1)
    assert(outs(res) == Vector(1L))
  }

  /** Events-time contract behind every window vector above: whatever the
    * parquet physical layout (TIMESTAMP(NANOS) read as raw ns Long, or
    * TIMESTAMP(MICROS) read as a timestamp — the testdata has shipped
    * both), Tables.events presents a consistent (ts, ts_ns) pair:
    * `unix_micros(ts) == ts_ns div 1000` on every row. With a µs source
    * ts_ns is µs-precision ns — window arithmetic must not rely on
    * sub-µs distinctness (sessionize breaks ties by event_id instead). */
  test("EventsTsNsAgreesWithTsAtMicrosecondPrecision") {
    val spark = TestSpark.spark
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val bad = ev.where(expr("unix_micros(ts) != ts_ns div 1000")).count()
    assert(bad == 0L, s"$bad rows where ts and ts_ns disagree at µs precision")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.schema("ts_ns").dataType == org.apache.spark.sql.types.LongType)
  }

  /** CheckAnyDecreaseOrIncreaseByOne (_test_windows.pony:1005-1019): within
    * a collected window, consecutive values may decrease arbitrarily but
    * may only increase by exactly one. */
  private def noDecreaseOrJumpBeyondOne(c: Vector[Long]): Boolean =
    c.isEmpty || c.sliding(2).forall {
      case Vector(a, b) => b == a + 1 || b <= a
      case _            => true
    }
}
