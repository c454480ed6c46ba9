package graft.pipeline

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import ConnectorProtocol._

/** External-peer rig for the connector protocol — the engine's shipped
  * stand-ins for the processes on the far side of the wire, the role the
  * reference ships as first-class tooling (`giles/sender`,
  * `testing/tools/external_sender`, and the Python connector scripts in
  * `machida/lib/wallaroo/experimental/connectors.py`): the protocol
  * SENDER (feeds [[ConnectorSocketSource]]; at-least-once with a replay
  * buffer, serving resume points from NOTIFY_ACK) and the 2PC RECEIVER
  * (consumes [[ConnectorSocketSink]]; stage → in-doubt → apply/discard).
  *
  * Lives in main (not test) scope because the oracle-checked wire
  * round-trip entries ([[graft.operators.WireQueries]]) drive the real
  * protocol conversation through these peers inside the driver's
  * correctness gate; the spec suites (ConnectorSourceSpec,
  * TwoPhaseCommitSocketSpec, ProtocolRelaySpec) use the same rig for
  * crash/replay coverage. */
object ProtocolPeers {

  /** Plays the protocol's connector (sender) side: HELLO → (OK) →
    * NOTIFY → (NOTIFY_ACK resume) → MESSAGE from `resume` → EOS. Tracks
    * the worker's ACKed points of reference (its replay-buffer trim
    * signal) and every resume point it was asked for. */
  final class ReplaySender(payloads: IndexedSeq[Array[Byte]], cookie: String) {
    val server = new ServerSocket(0)
    @volatile var lastAck = 0L
    val resumes = new java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]
    @volatile private var closed = false

    private val acceptor = new Thread("connector-test-acceptor") {
      override def run(): Unit =
        try while (!closed) {
          val conn = server.accept()
          val t = new Thread(() => handle(conn))
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => } // server closed
    }
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(conn: Socket): Unit = {
      @volatile var restart = false
      try {
        val in = new DataInputStream(conn.getInputStream)
        val out = new DataOutputStream(conn.getOutputStream)
        writeFrame(out, typed(Hello,
          shortBytes(cookie) ++ shortBytes("graft-test") ++ shortBytes("events")))
        val ok = readFrame(in)
        if (ok(0) == Error) return // worker rejected the handshake (cookie test)
        assert(ok(0) == Ok, s"expected OK, got ${ok(0)}")
        writeFrame(out, typed(Notify, u64(0L)))
        val na = readFrame(in)
        assert(na(0) == NotifyAck, s"expected NOTIFY_ACK, got ${na(0)}")
        val resume = readU64(na, 1)
        resumes.add(resume)
        // control channel: ACK advances the trim point, RESTART aborts
        val ctl = new Thread(() =>
          try while (true) {
            val f = readFrame(in)
            f(0) match {
              case Ack     => lastAck = math.max(lastAck, readU64(f, 1))
              case Restart => restart = true
              case _       =>
            }
          } catch { case _: Exception => restart = true })
        ctl.setDaemon(true)
        ctl.start()
        // ALO replay: everything from the requested point of reference
        var i = resume
        while (i < payloads.length && !restart) {
          writeFrame(out, typed(Message, u64(i) ++ payloads(i.toInt)))
          i += 1
        }
        if (!restart) writeFrame(out, typed(EosMessage))
        ctl.join() // drain trailing ACKs until the worker closes
      } catch { case _: java.io.IOException => }
      finally { try conn.close() catch { case _: java.io.IOException => } }
    }

    def close(): Unit = { closed = true; server.close() }
  }

  /** One fault-injection rule — the reference aloc_sink's
    * `("txnid-regexp", regexp, phase1-vote, close-before, close-after)`
    * tuple (testing/correctness/tests/aloc_sink/README.abort-rules.md):
    * when a PHASE1's txn id matches `regexp` (search semantics), the
    * receiver forces the reply vote to `vote`; `closeBefore` drops the
    * connection BEFORE replying (the reply is lost), `closeAfter` drops
    * it after. Applied at most `maxHits` times: the reference injects a
    * single fault per test, and where Wallaroo's incrementing 2PC round
    * number naturally un-matches a retried checkpoint, Spark replays the
    * SAME txn id — an unbounded rule would re-fire forever. */
  final class AbortRule(regexp: String, val vote: Boolean,
      val closeBefore: Boolean, val closeAfter: Boolean,
      val maxHits: Int = 1) {
    private val pat = java.util.regex.Pattern.compile(regexp)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    /** True exactly when the rule matches AND has firings left — claims
      * one firing. */
    def claim(txn: String): Boolean =
      pat.matcher(txn).find() && hits.getAndIncrement() < maxHits
  }

  /** Plays the protocol's receiving side the way the reference's external
    * sink processes do: data frames staged per connection, promoted to the
    * in-doubt map at PHASE1 (with the where-list's end offset), applied to
    * `committed` or discarded at PHASE2. In-doubt transactions survive
    * reconnects; staged-but-unprepared bytes die with their connection.
    * `rules` injects the reference's abort-rules faults at phase 1;
    * `closeAfterPhase2` drops the connection right after applying a
    * PHASE2 commit whose txn matches (the replayed-phase-2 / lost-link
    * window after a durable peer commit). */
  final class TwoPcReceiver(voteAbort: String => Boolean = _ => false,
      rules: Seq[AbortRule] = Nil,
      closeAfterPhase2: String => Boolean = _ => false) {
    val server = new ServerSocket(0)
    val committed = new java.util.concurrent.CopyOnWriteArrayList[String]
    val inDoubt =
      new java.util.concurrent.ConcurrentHashMap[String, (Vector[String], Long)]
    // Committed offset PER STREAM, monotone (max-merge): a single global
    // slot cross-talked between sinks on disjoint streams (the topology
    // ConnectorSocketSink's docs endorse) and could REGRESS when two
    // in-doubt txns resolved out of iteration order — either way the next
    // NOTIFY_ACK handed a sink a foreign or stale resume point. A txn id
    // embeds its stream name ("<stream>:c_id=<epoch>"), which keys the
    // commit; NOTIFY carries the name to key the ACK.
    val committedOffsets =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]
    @volatile var aborts = 0
    @volatile private var closed = false

    /** Resume point for `stream` (0 until its first commit). */
    def committedOffset(stream: String): Long =
      Option(committedOffsets.get(stream)).fold(0L)(_.longValue)

    private val acceptor = new Thread("twopc-test-acceptor") {
      override def run(): Unit =
        try while (!closed) {
          val conn = server.accept()
          val t = new Thread(() => handle(conn))
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => } // server closed
    }
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(conn: Socket): Unit = {
      val staged = ArrayBuffer.empty[String]
      try {
        val in = new DataInputStream(conn.getInputStream)
        val out = new DataOutputStream(conn.getOutputStream)
        while (true) {
          val f = readFrame(in)
          f(0) match {
            case Hello =>
              writeFrame(out, typed(Ok, u64(0L)))
            case Notify =>
              // frame: [type][u64 stream id][u16-len stream name]
              val stream = readShortBytes(f, 9)._1
              writeFrame(out, typed(NotifyAck, u64(committedOffset(stream))))
            case Message =>
              val streamId = readU64(f, 1)
              val payload = java.util.Arrays.copyOfRange(f, 17, f.length)
              if (streamId == 1L) staged += new String(payload, UTF_8)
              else payload(0) match {
                case TwoPcWire.ListUncommitted =>
                  val rtag = java.nio.ByteBuffer.wrap(payload, 1, 8).getLong
                  writeFrame(out, typed(Message, u64(0L) ++ u64(0L) ++
                    TwoPcWire.replyUncommitted(rtag, inDoubt.keySet().asScala.toSeq)))
                case TwoPcWire.Phase1 =>
                  val (txn, whereList) = TwoPcWire.readPhase1(payload)
                  // promoted BEFORE any injected close: phase 1 was
                  // received, so the txn is in doubt and survives the
                  // connection — only unprepared staged bytes die with it
                  inDoubt.put(txn, (staged.toVector, whereList.head._3))
                  staged.clear()
                  rules.find(_.claim(txn)) match {
                    case Some(r) =>
                      if (r.closeBefore) { conn.close(); return } // reply lost
                      writeFrame(out, typed(Message, u64(0L) ++ u64(0L) ++
                        TwoPcWire.phase2r(TwoPcWire.Phase1Reply, txn, r.vote)))
                      if (r.closeAfter) { conn.close(); return }
                    case None =>
                      writeFrame(out, typed(Message, u64(0L) ++ u64(0L) ++
                        TwoPcWire.phase2r(TwoPcWire.Phase1Reply, txn, !voteAbort(txn))))
                  }
                case TwoPcWire.Phase2 =>
                  val (txn, commit) = TwoPcWire.readPhase2r(payload)
                  val entry = inDoubt.remove(txn)
                  if (entry != null) {
                    if (commit) {
                      committed.addAll(entry._1.asJava)
                      val stream = txn.substring(0,
                        math.max(0, txn.lastIndexOf(":c_id=")))
                      committedOffsets.merge(stream, Long.box(entry._2),
                        (a, b) => if (a >= b) a else b)
                    } else aborts += 1
                  }
                  if (commit && closeAfterPhase2(txn)) { conn.close(); return }
                case _ =>
              }
            case _ =>
          }
        }
      } catch { case _: java.io.IOException => } // sink went away
      finally { try conn.close() catch { case _: java.io.IOException => } }
    }

    def close(): Unit = { closed = true; server.close() }
  }
}
