package graft.pipeline

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The connector-protocol ingress: at-least-once framed TCP with
  * points-of-reference acknowledgment, the ack half of the reference's
  * credit-based connector protocol (docs/proposals/connector-protocol-v3
  * .md; core/source/connector_source/). [[FramedSocketSource]] speaks raw
  * framing and is at-most-once across restarts; this source adds the
  * protocol conversation that makes a socket RESUMABLE:
  *
  *  - handshake: sender → HELLO (cookie/program/instance), driver → OK,
  *    sender → NOTIFY (its available point of reference), driver →
  *    NOTIFY_ACK carrying the CHECKPOINT-COMMITTED frame count — "resume
  *    from here"; per the protocol, the sender must use the NOTIFY_ACK's
  *    point of reference, which is how a restarted query re-requests
  *    exactly the frames its checkpoint never committed.
  *  - MESSAGE frames carry an explicit u64 message id; duplicates below
  *    the expected id (replay overlap) are dropped, a GAP above it gets a
  *    RESTART frame (protocol: "worker requests that all streams be
  *    reprocessed") and a reconnect-with-resume.
  *  - on every micro-batch COMMIT the driver writes ACK(committed count,
  *    credits) back to the sender — the protocol's checkpoint-completed
  *    progress report (v3 §ACK: "all MESSAGEs with MessageIds less than
  *    the reported point of reference are included in the checkpoint") —
  *    so the sender can trim its replay buffer.
  *  - credit-based flow control (v3's ACK credits): the OK frame's u64 is
  *    the initial credit grant — the buffer space available at handshake
  *    (`maxBufferedFrames` minus anything already held across a
  *    reconnect) — and each commit-time ACK carries a second u64
  *    replenishing exactly the slots the commit freed. A sender that
  *    spends one credit per MESSAGE and pauses at zero can never overrun
  *    the buffer (grants = capacity + frames freed, so outstanding ≤
  *    capacity); the bounded buffer + `lock.wait` stays as the backstop
  *    for trivial senders that ignore credits, which v3 explicitly
  *    permits.
  *  - EOS_MESSAGE ends the stream (no reconnect).
  *
  * Wire format: every frame is 4-byte big-endian length + 1 type byte +
  * body, the v3 framing. Deliberately NOT implemented from the protocol:
  * stream multiplexing (one connection = one stream;
  * run N sources and `merge`, the reference's own parallelism model).
  *
  * Scale shape: the driver-side buffer is the only state (bounded by
  * `maxBufferedFrames`); offsets are frame counts, so checkpoints are a
  * single u64 per batch. One socket is one ordered stream — parallel
  * ingress is N sources, not one fat one, exactly like the reference's
  * per-connection connector sources. */
object ConnectorProtocol {
  val Hello: Byte = 0
  val Ok: Byte = 1
  val Error: Byte = 2
  val Notify: Byte = 3
  val NotifyAck: Byte = 4
  val Message: Byte = 5
  val Ack: Byte = 6
  val Restart: Byte = 7
  val EosMessage: Byte = 8

  val ShortName = "graft-connector-socket"

  def writeFrame(out: DataOutputStream, body: Array[Byte]): Unit = {
    out.writeInt(body.length)
    out.write(body)
    out.flush()
  }
  /** Frame write WITHOUT the flush — the sink's per-row data path: one
    * flush syscall per row through the buffered stream defeats the
    * buffer; the caller flushes once at its protocol barrier (phase 1,
    * phase 2). Control frames keep the flushing [[writeFrame]]. */
  def writeFrameBuffered(out: DataOutputStream, body: Array[Byte]): Unit = {
    out.writeInt(body.length)
    out.write(body)
  }
  def typed(tpe: Byte, rest: Array[Byte] = Array.empty): Array[Byte] = {
    val b = new Array[Byte](1 + rest.length)
    b(0) = tpe
    System.arraycopy(rest, 0, b, 1, rest.length)
    b
  }
  def u64(n: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(n).array()
  def readU64(body: Array[Byte], off: Int): Long =
    java.nio.ByteBuffer.wrap(body, off, 8).getLong
  /** v3 `short_bytes`: u16 length + bytes. */
  def shortBytes(s: String): Array[Byte] = {
    val d = s.getBytes(UTF_8)
    java.nio.ByteBuffer.allocate(2 + d.length).putShort(d.length.toShort).put(d).array()
  }
  def readShortBytes(body: Array[Byte], off: Int): (String, Int) = {
    val len = java.nio.ByteBuffer.wrap(body, off, 2).getShort & 0xffff
    (new String(body, off + 2, len, UTF_8), off + 2 + len)
  }
  def readFrame(in: DataInputStream): Array[Byte] = {
    val len = in.readInt()
    require(len >= 1, s"connector frame must carry a type byte, got length $len")
    val body = new Array[Byte](len)
    in.readFully(body)
    body
  }
}

final class ConnectorSocketTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FramedLog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ConnectorSocketTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

final class ConnectorSocketTable(options: Map[String, String]) extends Table with SupportsRead {
  private def req(k: String): String = options.getOrElse(k,
    throw new IllegalArgumentException(s"${ConnectorProtocol.ShortName} requires a '$k' option"))
  override def name(): String = s"${ConnectorProtocol.ShortName}:${req("host")}:${req("port")}"
  override def schema(): StructType = FramedLog.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FramedLog.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ConnectorSocketMicroBatchStream(req("host"), req("port").toInt,
            options.get("maxFramesPerTrigger").map(_.toLong).getOrElse(Long.MaxValue),
            options.get("maxBufferedFrames").map(_.toInt).getOrElse(1 << 20),
            options.get("cookie"),
            options.get("replayTimeoutMs").map(_.toLong).getOrElse(30000L))
      }
    }
}

final class ConnectorSocketMicroBatchStream(host: String, port: Int,
    maxFramesPerTrigger: Long, maxBufferedFrames: Int,
    cookie: Option[String], replayTimeoutMs: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  import ConnectorProtocol._

  // The half-window cap in latestOffset needs a window of at least 2:
  // at 1, max(1, 1/2) lets a single batch swallow the whole credit
  // window and the deferred-commit wedge it exists to prevent returns.
  require(maxBufferedFrames >= 2,
    s"maxBufferedFrames must be >= 2 (got $maxBufferedFrames): a 1-frame " +
      "credit window cannot keep the commit-to-ACK cascade live")

  // frames(i) holds absolute message id (base + i); base advances on
  // commit. `started` flips when the first offset-bearing callback tells
  // us where the checkpoint committed — the connection is LAZY because
  // the resume point is only known then.
  private val lock = new Object
  private val frames = ArrayBuffer.empty[Array[Byte]]
  private var base = 0L
  private var started = false
  private var eos = false
  @volatile private var stopped = false
  @volatile private var readerError: Throwable = _
  @volatile private var availableNowCap: Option[Long] = None
  @volatile private var availableNowPending = false
  @volatile private var currentSocket: Socket = _

  private val outLock = new Object
  @volatile private var outStream: DataOutputStream = _
  // Credit-epoch bookkeeping (see the handshake grant comment): freed
  // slots whose commit-time ACK found a null outStream, to be replenished
  // right after the handshake publishes the new stream; the epoch pins
  // which grant snapshot a commit's trim preceded. Guarded by `lock`
  // (grantEpoch) / `outLock` (droppedAckFreed).
  private var grantEpoch = 0L
  private var droppedAckFreed = 0L

  private def sendToPeer(body: Array[Byte]): Unit = outLock.synchronized {
    val o = outStream
    if (o != null) {
      try writeFrame(o, body)
      catch { case _: java.io.IOException => } // peer gone; reconnect loop handles it
    }
  }

  private def expectedNext: Long = base + frames.length

  /** Connect + handshake + drain, reconnecting (1 s backoff) until EOS,
    * stop(), or an unrecoverable protocol error. */
  private val manager = new Thread(s"${ShortName}:$host:$port") {
    override def run(): Unit = {
      while (!stopped && !eos && readerError == null) {
        var socket: Socket = null
        try {
          socket = new Socket()
          // bounded connect: an unreachable peer must hand control back
          // to the reconnect loop promptly, not stall each attempt for
          // the kernel's SYN timeout (the resolve/replay deadlines in
          // latestOffset/planInputPartitions assume timely attempts)
          socket.connect(new java.net.InetSocketAddress(host, port), 30000)
          currentSocket = socket
          // stop() may have read currentSocket as null just before the
          // connect completed — it can then never close THIS socket, and
          // interrupt() cannot unblock socket reads; bail out here so the
          // finally closes it instead of parking in readFrame forever
          if (stopped) throw new EOFException("stopped during connect")
          val in = new DataInputStream(socket.getInputStream)
          val out = new DataOutputStream(socket.getOutputStream)
          // ---- handshake (sender is the protocol's connector side)
          val hello = readFrame(in)
          require(hello(0) == Hello, s"expected HELLO, got type ${hello(0)}")
          cookie.foreach { c =>
            // a bodyless HELLO must read as a cookie mismatch, not an
            // IndexOutOfBounds that masks the protocol error
            val got = if (hello.length >= 3) readShortBytes(hello, 1)._1 else ""
            if (got != c) {
              writeFrame(out, typed(Error, shortBytes("bad cookie")))
              throw new IllegalArgumentException(
                s"connector HELLO cookie mismatch from $host:$port")
            }
          }
          // initial credit grant = buffer space available right now (a
          // reconnect may find frames still held from the last session).
          // The grant SNAPSHOT also opens a new credit epoch: a commit
          // whose trim lands before this point is reflected in the grant
          // (frames.length already reduced), one landing after must be
          // ACKed once outStream is live — droppedAckFreed accumulates
          // exactly the post-snapshot trims whose ACK found a null
          // stream, and the epoch counter keeps a pre-snapshot commit
          // from recording itself after the fact (the double-credit /
          // lost-credit ratchet either way would permanently shrink a
          // credit-honoring sender's window).
          val grant = outLock.synchronized(lock.synchronized {
            droppedAckFreed = 0L
            grantEpoch += 1
            maxBufferedFrames.toLong - frames.length
          })
          writeFrame(out, typed(Ok, u64(grant)))
          val notify = readFrame(in)
          require(notify(0) == Notify, s"expected NOTIFY, got type ${notify(0)}")
          val resume = lock.synchronized(expectedNext)
          writeFrame(out, typed(NotifyAck, u64(resume)))
          outLock.synchronized {
            outStream = out
            if (droppedAckFreed > 0) {
              // replenish the slots freed during the handshake window
              try writeFrame(out,
                typed(Ack, u64(lock.synchronized(base)) ++ u64(droppedAckFreed)))
              catch { case _: java.io.IOException => }
              droppedAckFreed = 0L
            }
          }
          // ---- message loop
          var open = true
          while (open) {
            val f = readFrame(in)
            f(0) match {
              case Message =>
                val id = readU64(f, 1)
                val payload = java.util.Arrays.copyOfRange(f, 9, f.length)
                val dropped = lock.synchronized {
                  if (id == expectedNext) {
                    while (frames.length >= maxBufferedFrames && !stopped) lock.wait()
                    if (!stopped) { frames += payload; lock.notifyAll() }
                    false
                  } else if (id > expectedNext) {
                    // gap: the sender skipped ids we never saw — demand a
                    // full re-handshake at our point of reference
                    sendToPeer(typed(Restart))
                    open = false
                    false
                  } else true // id < expectedNext: replay overlap, drop
                }
                // A dropped duplicate consumed a sender credit without
                // ever occupying a buffer slot; commit-time ACKs only
                // replenish freed SLOTS, so without this immediate
                // refund a credit-honoring sender with replay overlap
                // bleeds credits and can stall mid-replay before
                // reaching the frames we actually want. The ACK's point
                // of reference is the unchanged committed count.
                if (dropped) sendToPeer(typed(Ack, u64(lock.synchronized(base)) ++ u64(1L)))
              case EosMessage =>
                // end of stream, but NOT of the session: stay parked in
                // readFrame so the connection remains open for the
                // trailing commit-time ACKs (the sender drains its replay
                // buffer on them) until stop() closes the socket.
                lock.synchronized { eos = true; lock.notifyAll() }
              case Error =>
                // a truncated ERROR frame must still surface AS the
                // peer's error signal, not as an IndexOutOfBounds
                val msg = if (f.length >= 3) readShortBytes(f, 1)._1 else "<no body>"
                throw new IllegalStateException(
                  s"connector peer $host:$port sent ERROR: $msg")
              case _ => // future frame types: ignore
            }
          }
        } catch {
          // No `if !stopped` guards on these arms: stop() closes the
          // socket under a parked readFrame, so the GRACEFUL teardown
          // path throws SocketException here — an unmatched guard would
          // rethrow it out of run() into the uncaught-exception handler
          // on every stop. The loop condition decides reconnect-vs-exit.
          case _: EOFException | _: java.net.SocketException
               | _: java.net.SocketTimeoutException => // peer dropped / stop / bounded connect
          case _: InterruptedException => // stop()
          case t: Throwable =>
            if (!stopped) { readerError = t; lock.synchronized(lock.notifyAll()) }
        } finally {
          outLock.synchronized { outStream = null }
          currentSocket = null
          if (socket != null) { try socket.close() catch { case _: java.io.IOException => } }
        }
        if (!stopped && !eos && readerError == null)
          try Thread.sleep(1000L) catch { case _: InterruptedException => }
      }
    }
  }
  manager.setDaemon(true)

  private def ensureStarted(from: Long): Unit = {
    if (readerError != null)
      throw new IllegalStateException(
        s"connector-socket manager for $host:$port died", readerError)
    lock.synchronized {
      if (!started) {
        base = from // the checkpoint-committed point of reference
        started = true
        manager.start()
      }
    }
  }

  private def total: Long = lock.synchronized(expectedNext)

  override def initialOffset(): Offset = FrameCount(0L)
  override def deserializeOffset(json: String): Offset = FrameCount(json.toLong)
  // The connection is lazy (it starts on the first offset-bearing call,
  // which carries the resume point), so at prepare() time `total` is
  // always 0 — capturing it here would clamp every batch to empty and an
  // AvailableNow query would silently read nothing (ADVICE r4). Defer:
  // flag the capture and resolve it on the first latestOffset after the
  // handshake, once the sender has drained its backlog/replay to us.
  override def prepareForTriggerAvailableNow(): Unit = availableNowPending = true
  override def reportLatestOffset(): Offset = FrameCount(total)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(start, limit) is used")

  /** Resolve the deferred AvailableNow cap: wait for the handshake to
    * COMPLETE (outStream is set right after NOTIFY_ACK — without this
    * gate a connect slower than one idle tick resolved the cap to the
    * start offset and the query read zero frames), then let the sender's
    * backlog drain until the stream goes idle for one tick (no new frame
    * in 250 ms), EOS, or `replayTimeoutMs` elapses. "Available now" over
    * a socket = whatever the peer had queued at query start, which only
    * becomes observable after it is sent; a sender that pauses longer
    * than the idle tick mid-backlog truncates the capture — inherent to
    * any quiescence heuristic over a stream with no end marker short of
    * EOS. */
  private def resolveAvailableNowCap(): Unit = {
    val deadline = System.currentTimeMillis() + replayTimeoutMs
    while (outStream == null && !eos && readerError == null &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(20L)
    if (readerError != null)
      throw new IllegalStateException(
        s"connector-socket manager for $host:$port died", readerError)
    // an unreachable sender must FAIL the AvailableNow run, not resolve
    // the cap to the start offset and terminate 'successfully' with
    // zero rows (the caller could never distinguish 'nothing available'
    // from 'never connected') — same contract as planInputPartitions'
    // replay timeout
    if (outStream == null && !eos)
      throw new IllegalStateException(
        s"connector peer $host:$port did not complete a handshake within " +
          s"${replayTimeoutMs}ms — cannot resolve the AvailableNow capture point")
    lock.synchronized {
      var last = -1L
      while (expectedNext != last && !eos && readerError == null &&
          System.currentTimeMillis() < deadline) {
        last = expectedNext
        lock.wait(250L)
      }
      availableNowCap = Some(expectedNext)
    }
  }

  override def latestOffset(start: Offset, readLimit: ReadLimit): Offset = {
    val from = start.asInstanceOf[FrameCount].n
    ensureStarted(from)
    if (availableNowPending) { availableNowPending = false; resolveAvailableNowCap() }
    // Half-window cap: credits replenish on commit(), and Spark only
    // commits batch N while constructing batch N+2 — so a batch that
    // swallowed the ENTIRE credit window would leave the sender stalled
    // at zero credits with no further batch to ride the commit out on
    // (the same deferred-commit wedge the framed socket source hit at
    // its buffer cap). Capping one batch at half the buffer guarantees
    // the leftover half forms the next batch, whose construction commits
    // the previous one and ACKs its slots back to the sender — the
    // cascade that keeps credit flow live at any stream length.
    val perTrigger =
      math.min(maxFramesPerTrigger, math.max(1L, maxBufferedFrames.toLong / 2))
    val end = from + math.min(perTrigger, math.max(0L, total - from))
    FrameCount(math.max(from, availableNowCap.fold(end)(math.min(end, _))))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameCount].n
    val e = end.asInstanceOf[FrameCount].n
    ensureStarted(s)
    if (e <= s) return Array.empty
    // A restart replays the last planned batch from the checkpointed
    // offsets; the handshake asked the sender to resend from `s`, so WAIT
    // for the replayed range instead of delivering a short (lossy) batch.
    val deadline = System.currentTimeMillis() + replayTimeoutMs
    lock.synchronized {
      while (expectedNext < e && readerError == null && !eos &&
          System.currentTimeMillis() < deadline)
        lock.wait(100L)
      if (readerError != null)
        throw new IllegalStateException(
          s"connector-socket manager for $host:$port died", readerError)
      if (expectedNext < e)
        throw new IllegalStateException(
          s"connector peer $host:$port did not replay frames [$s,$e) within " +
            s"${replayTimeoutMs}ms of the NOTIFY_ACK resume request " +
            s"(have ${expectedNext}) — at-least-once needs the sender to " +
            "retain frames past the last ACK")
      val lo = (s - base).toInt
      val hi = (e - base).toInt
      Array(FramedArrayPartition(s, frames.slice(lo, hi).toArray))
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = new FramedArrayReaderFactory

  /** Batch durably committed: trim the local buffer and report progress
    * to the sender — the ACK that lets it trim ITS replay buffer. The
    * second u64 replenishes credits: exactly the buffer slots this
    * commit freed (v3 credit flow; a slow query therefore throttles the
    * sender at the protocol level, not just via TCP backpressure). */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[FrameCount].n
    val (freed, myEpoch) = lock.synchronized {
      val dropped =
        if (e > base) {
          val d = math.min(e - base, frames.length.toLong).toInt
          frames.dropInPlace(d)
          base = e
          d
        } else 0
      lock.notifyAll() // wake a parked reader
      (dropped, grantEpoch)
    }
    outLock.synchronized {
      val o = outStream
      if (o != null) {
        try writeFrame(o, typed(Ack, u64(e) ++ u64(freed.toLong)))
        catch { case _: java.io.IOException => } // reconnect loop handles it
      } else if (freed > 0 && myEpoch == lock.synchronized(grantEpoch)) {
        // the trim post-dates the in-progress grant snapshot (same
        // epoch), so the grant did NOT cover these slots and this ACK
        // just died on the null stream — record them for the
        // supplementary replenish after the handshake. A trim from
        // BEFORE the snapshot (older epoch) is already in the grant;
        // recording it too would double-credit.
        droppedAckFreed += freed
      }
    }
  }

  override def stop(): Unit = {
    stopped = true
    lock.synchronized(lock.notifyAll())
    outLock.synchronized {
      if (outStream != null) {
        // graceful: tell the sender we're going away and will re-handshake
        try writeFrame(outStream, typed(Restart))
        catch { case _: java.io.IOException => }
      }
    }
    manager.interrupt()
    // interrupt() does not unblock a socket read — a manager parked in
    // readFrame would leak the thread and fd if the peer ignores RESTART
    // (ADVICE r4). Closing the socket forces readFrame to throw; `stopped`
    // is already set so the loop exits instead of reconnecting.
    val s = currentSocket
    if (s != null) { try s.close() catch { case _: java.io.IOException => } }
  }
}

/** DSL SourceConfig over the connector protocol: at-least-once resumable
  * socket ingress (vs [[FramedSocketSource]]'s at-most-once raw framing).
  * Same [[FramedDecoder]] contract as the other framed sources. */
final case class ConnectorSocketSource[T](
    host: String,
    port: Int,
    decoder: FramedDecoder[T],
    cookie: Option[String] = None,
    maxFramesPerTrigger: Long = Long.MaxValue,
    maxBufferedFrames: Int = 1 << 20,
    replayTimeoutMs: Long = 30000L)(implicit enc: Encoder[T])
    extends SourceConfig[T] {
  def load(spark: SparkSession): Dataset[(T, Long)] = {
    var reader = spark.readStream
      .format(classOf[ConnectorSocketTableProvider].getName)
      .option("host", host).option("port", port.toString)
      .option("maxBufferedFrames", maxBufferedFrames.toString)
      .option("replayTimeoutMs", replayTimeoutMs.toString)
    cookie.foreach(c => reader = reader.option("cookie", c))
    if (maxFramesPerTrigger != Long.MaxValue)
      reader = reader.option("maxFramesPerTrigger", maxFramesPerTrigger.toString)
    val dec = decoder
    val tupEnc = Encoders.tuple(enc, Encoders.scalaLong)
    // decode-time drop is SAFE under ALO: the frame is still counted and
    // ACKed by the protocol layer below (offsets advance whether or not
    // the decoder keeps the frame), so the sender trims its replay buffer
    // and a dropped heartbeat is never replayed
    reader.load().select("payload").as[Array[Byte]](Encoders.BINARY)
      .flatMap { bytes => dec.decodeOpt(bytes).map(t => (t, dec.eventTimeNs(t))) }(tupEnc)
  }
}
