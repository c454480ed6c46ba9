package graft.pipeline

import java.io.{DataOutputStream, FileOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

import ConnectorProtocol._

/** Regression pins for the round-13 stateful-core review sweep (VERDICT
  * r12 #4) — each test was proven to bite by running it against the
  * pre-fix code (or is a construction-level behavior pin for a fix whose
  * old behavior is gone). One test per finding; SCALING.md carries the
  * sweep ledger. */
/** Top-level and public: the bridge test round-trips it through a Kryo
  * encoder, which rejects non-public classes. */
final class SumAcc extends Serializable { var s: Long = 0L }

class StatefulCoreSweepSpec extends AnyFunSuite {

  /** Tiny sum aggregation; records the window-end values `output` saw so
    * sentinel leaks are observable. */
  private final class SumAgg extends Aggregation[Long, (String, Long), SumAcc] {
    val seenWindowEnds = scala.collection.mutable.ArrayBuffer.empty[Long]
    def initialAccumulator(): SumAcc = new SumAcc
    def update(input: Long, acc: SumAcc): Unit = acc.s += input
    def combine(a: SumAcc, b: SumAcc): SumAcc = {
      val c = new SumAcc; c.s = a.s + b.s; c
    }
    def output(key: String, windowEndTs: Long, acc: SumAcc): Option[(String, Long)] = {
      seenWindowEnds += windowEndTs
      if (acc.s == 0L) None else Some((key, acc.s))
    }
  }

  // --- Finding 1: pane-expansion arithmetic narrowed to Int. With
  // range=1001/slide=1000 (paneSize=1, panesPerSlide=1000) an event gap
  // of 3,600,001 panes is coprime with 1000, so the reference's
  // lcm-based count is ~3.6e9 — the old `.toInt` wrapped NEGATIVE,
  // ArrayBuffer.fill returned an EMPTY ring, and the copy loop crashed
  // the query (proven: this test dies with IndexOutOfBoundsException on
  // the pre-fix code). The fix rounds up to the next multiple of
  // panesPerSlide in Long — both reference invariants hold at minimal
  // size.
  test("sliding-window expansion survives a gap whose lcm overflows Int") {
    val agg = new SumAgg
    val w = new PanesRangeWindows[Long, (String, Long), SumAcc](
      "k", agg, range = 1001L, slide = 1000L, delay = 0L,
      LateDataPolicy.Drop, initialWatermarkTs = 0L, staggerFraction = 0.0)
    w.apply(5L, 500L, 0L)
    val farTs = 3601001L // minNewPanes = 3,600,001, coprime with 1000
    val (outs0, _, _) = w.apply(7L, farTs, 0L)
    assert(outs0.isEmpty) // watermark still 0: nothing triggers yet
    assert(w.paneCount % 1000 == 1, // 1001 initial + k*1000 new
      s"ring must stay congruent with panesPerSlide, got ${w.paneCount}")
    assert(w.paneCount.toLong >= 3600001L + 1001L)
    assert(w.paneCount < 3700000, // minimal round-up, not an lcm blow-up
      s"round-up expansion must stay near minNewPanes, got ${w.paneCount}")
    assert(w.checkPanesIncreasing)
    val (outs, _, _) = w.attemptToTrigger(TimeoutWatermark.value)
    val sums = outs.map(_._1._2)
    assert(sums.contains(5L) && sums.contains(7L),
      s"both events must flush from the expanded ring, got $outs")
  }

  test("pathological expansion fails loudly at the pane-count cap") {
    val agg = new SumAgg
    val w = new PanesRangeWindows[Long, (String, Long), SumAcc](
      "k", agg, range = 2L, slide = 1L, delay = 0L,
      LateDataPolicy.Drop, initialWatermarkTs = 0L, staggerFraction = 0.0)
    val e = intercept[IllegalArgumentException](
      w.apply(1L, Long.MaxValue / 2, 0L))
    assert(e.getMessage.contains("sanity cap"))
  }

  // --- Finding 2: an end-of-stream flush reached EphemeralWindow as
  // watermark = Long.MaxValue and leaked the sentinel into the emitted
  // (out, ts) stamp, the output watermark, and agg.output's window end
  // (pre-fix: this test sees 9223372036854775807 in all three).
  test("ephemeral flush maps the TimeoutWatermark sentinel to the trigger point") {
    val agg = new SumAgg
    val w = new EphemeralWindow[Long, (String, Long), SumAcc](
      "k", agg, triggerRange = 100L, postTriggerRange = 10L, delay = 0L,
      LateDataPolicy.Drop, firstEventTs = 0L, startingWatermarkTs = 0L)
    w.apply(5L, 10L, 0L) // watermark below trigger point: held
    val (outs, outWm, retain) = w.attemptToTrigger(TimeoutWatermark.value)
    assert(outs == Vector((("k", 5L), 101L)),
      s"flush must stamp max(highestSeen, triggerPoint)+1, got $outs")
    assert(outWm == 101L, s"output watermark must not be the sentinel, got $outWm")
    assert(!retain)
    assert(agg.seenWindowEnds == Seq(101L),
      s"agg.output's window end must not be the sentinel, got ${agg.seenWindowEnds}")
  }

  // --- Finding 5 (conformance pin): the reference never folds an
  // ephemeral window's delay into its trigger point
  // (ephemeral_window.pony:95-102) — withDelay must not shift when the
  // window fires. Pinned so the builder's documented caveat stays true.
  test("ephemeral delay does not move the trigger point (reference conformance)") {
    def fireAt(delay: Long): Long = {
      val w = new EphemeralWindow[Long, (String, Long), SumAcc](
        "k", new SumAgg, triggerRange = 100L, postTriggerRange = 10L,
        delay = delay, LateDataPolicy.Drop, firstEventTs = 0L,
        startingWatermarkTs = 0L)
      w.apply(5L, 10L, 0L)
      // first watermark that triggers is triggerPoint+1 = 101, delay or not
      val held = w.attemptToTrigger(100L)
      assert(held._1.isEmpty)
      val (outs, _, _) = w.attemptToTrigger(101L)
      assert(outs.nonEmpty, s"must fire at 101 with delay=$delay")
      outs.head._2
    }
    assert(fireAt(0L) == fireAt(1000000L))
  }

  // --- Finding 3: AggregationAsAggregator.finish mapped output
  // suppression (None) to null.asInstanceOf[Out], which for a primitive
  // Out silently decays to 0 — a legitimate-looking row the caller
  // cannot filter (pre-fix: the first assert got 0L instead of a throw).
  test("bridge suppression with a primitive Out fails loudly, AnyRef stays null") {
    object NoneAgg extends Aggregation[Long, Long, SumAcc] {
      def initialAccumulator(): SumAcc = new SumAcc
      def update(input: Long, acc: SumAcc): Unit = ()
      def combine(a: SumAcc, b: SumAcc): SumAcc = a
      def output(key: String, windowEndTs: Long, acc: SumAcc): Option[Long] = None
    }
    val bridged = new AggregationAsAggregator[Long, Long, SumAcc](NoneAgg)(
      AggregationAsAggregator.bufferEnc(classOf[SumAcc]), Encoders.scalaLong)
    val e = intercept[IllegalStateException](bridged.finish(new SumAcc))
    assert(e.getMessage.contains("value type"))
    object NoneStrAgg extends Aggregation[Long, String, SumAcc] {
      def initialAccumulator(): SumAcc = new SumAcc
      def update(input: Long, acc: SumAcc): Unit = ()
      def combine(a: SumAcc, b: SumAcc): SumAcc = a
      def output(key: String, windowEndTs: Long, acc: SumAcc): Option[String] = None
    }
    val strBridged = new AggregationAsAggregator[Long, String, SumAcc](NoneStrAgg)(
      AggregationAsAggregator.bufferEnc(classOf[SumAcc]), Encoders.STRING)
    assert(strBridged.finish(new SumAcc) == null) // the documented contract
  }

  // --- Finding 8: CountWindowsBuilder accepted count <= 0 and silently
  // degraded to a one-message window per input.
  test("count windows reject a non-positive trigger count") {
    val e = intercept[IllegalArgumentException](Graft.countWindows(0))
    assert(e.getMessage.contains("greater than 0"))
    intercept[IllegalArgumentException](Graft.countWindows(-3))
  }

  // --- Finding 4 (behavior pin for the buffered rewrite): frame-aligned
  // walking must still exclude a partial trailing frame, respect the
  // byte budget at a frame boundary, and resume from a mid-log position.
  test("buffered frameAlignedEnd matches the framing contract") {
    val dir = Files.createTempDirectory("framedlog_sweep")
    val path = dir.resolve("log.bin").toString
    val out = new DataOutputStream(new FileOutputStream(path))
    def frame(n: Int): Unit = { out.writeInt(n); out.write(new Array[Byte](n)) }
    frame(10); frame(20); frame(30) // ends at 14, 38, 72
    out.writeInt(99); out.write(new Array[Byte](5)) // partial trailing frame
    out.flush(); out.close()
    assert(FramedLog.frameAlignedEnd(path, 0L, Long.MaxValue) == 72L)
    assert(FramedLog.frameAlignedEnd(path, 0L, 15L) == 38L) // budget crosses into frame 2
    assert(FramedLog.frameAlignedEnd(path, 14L, Long.MaxValue) == 72L) // mid-log resume
    assert(FramedLog.frameAlignedEnd(path, 72L, Long.MaxValue) == 72L) // only the partial left
  }

  // --- Second-pass sweep (Pipeline/Metrics/Tables): dedupByWithin
  // FLOOR-truncated withinNs to whole milliseconds where
  // streamingStateful rounds its slack UP — a 0.5 ms horizon collapsed
  // to a 0 ms watermark delay (no out-of-order suppression at all) and
  // any non-multiple lost up to 1 ms of the documented bound. The rule
  // now has one home (Pipeline.ceilToWholeMsNs); pre-fix the plan
  // assert below reads "0 milliseconds".
  test("dedupByWithin rounds the horizon UP to whole milliseconds") {
    assert(Pipeline.ceilToWholeMsNs(0L) == 0L)
    assert(Pipeline.ceilToWholeMsNs(1L) == 1000000L)
    assert(Pipeline.ceilToWholeMsNs(500000L) == 1000000L)
    assert(Pipeline.ceilToWholeMsNs(1000000L) == 1000000L)
    assert(Pipeline.ceilToWholeMsNs(1000001L) == 2000000L)
    val spark = TestSpark.spark
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val deduped = Graft.source("sweep-dedup",
        DatasetSource(src.toDS(), (v: Long) => v))
      .dedupByWithin(_.toString, withinNs = 500000L) // 0.5 ms
    val delays = deduped.dataset.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
        e.delay.microseconds
    }
    assert(delays == Seq(1000L),
      s"0.5 ms horizon must become a 1 ms watermark delay, got $delays µs")
  }

  // --- Finding 6: TwoPcReceiver kept ONE global committedOffset across
  // all streams, so NOTIFY_ACK could hand a sink a foreign stream's (or
  // a regressed) resume point — with two sinks on disjoint streams (the
  // documented deployment shape) stream a's restart would resume from
  // b's offset. Pre-fix: the first NOTIFY_ACK assert below reads 70
  // (b's total) instead of 30.
  test("NOTIFY_ACK resume points are per stream") {
    implicit val ss: org.apache.spark.sql.SparkSession = TestSpark.spark
    import ss.implicits._
    val receiver = new ProtocolPeers.TwoPcReceiver()
    def sink(stream: String) = ConnectorSocketSink[Long]("127.0.0.1",
      receiver.server.getLocalPort,
      (v: Long) => s"$stream-$v".getBytes(UTF_8), streamName = stream)
    // a: 10 rows x 3 bytes = 30; b: 10x3 + 10x4 = 70 committed bytes
    sink("a").writeBatch(ss.range(0, 10).map(v => (v, v)).as[(Long, Long)])
    sink("b").writeBatch(ss.range(0, 20).map(v => (v, v)).as[(Long, Long)])
    def ackFor(stream: String): Long = {
      val s = new Socket("127.0.0.1", receiver.server.getLocalPort)
      try {
        val in = new java.io.DataInputStream(s.getInputStream)
        val out = new java.io.DataOutputStream(s.getOutputStream)
        writeFrame(out, typed(Hello,
          shortBytes("") ++ shortBytes("sweep") ++ shortBytes(stream)))
        assert(readFrame(in)(0) == Ok)
        writeFrame(out, typed(Notify, u64(1L) ++ shortBytes(stream)))
        val na = readFrame(in)
        assert(na(0) == NotifyAck)
        readU64(na, 1)
      } finally s.close()
    }
    assert(ackFor("a") == 30L, "a's resume point must be a's bytes, not b's")
    assert(ackFor("b") == 70L)
    assert(ackFor("never-committed") == 0L)
    receiver.close()
  }
}
