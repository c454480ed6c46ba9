package graft.pipeline

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Encoder, Encoders}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's passthrough app (examples/pony/passthrough/
  * passthrough.pony) parameterizes source kind × step kind × sink kind
  * (`--source tcp|connector [--key-by ...] [--step asis|asis-state] --sink
  * tcp|connector`) — its point is that ANY transport composes with ANY
  * step and ANY other transport. The homogeneous cells are already
  * oracle-gated (p_tcp_roundtrip, p_connector_roundtrip) and the
  * connector→connector relay is exactly-once-pinned (ProtocolRelaySpec);
  * these tests pin the CROSS cells, each through a real socket pair:
  *   - framed TCP in → key_by → stateful identity step → connector 2PC out
  *     (multi_worker_forwarding.pony is the stateless subset of this)
  *   - connector in → framed TCP sink out
  */
object PassthroughSpec {
  /** passthrough's `--step asis-state`: a keyed state step that changes
    * nothing — but genuinely reads and writes per-key state, so the
    * keyed-host machinery is actually in the path. Top-level so the
    * closure ships without the suite as $outer. */
  final class SeenCount extends Serializable { var n: Long = 0 }
  object StateIdentity extends StateComputation[String, String, SeenCount] {
    override val name = "state identity"
    def initialState(): SeenCount = new SeenCount
    def apply(e: String, st: SeenCount): ComputationResult[String] = {
      st.n += 1
      ComputationResult.One(e)
    }
  }
}

class PassthroughSpec extends AnyFunSuite {
  import FramedFixtures.StringFrames
  import PassthroughSpec.StateIdentity
  private lazy val spark = TestSpark.spark

  private implicit val strEnc: Encoder[String] = Encoders.STRING

  private def awaitCond(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("passthrough: framed TCP in, keyed state-identity, connector 2PC out") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    val n = 120
    val msgs = (0 until n).map(i => s"${('a' + i % 4).toChar}|rec-$i")
    // the sender half: one framed stream, the giles-sender role
    val server = new ServerSocket(0)
    val sender = new Thread("passthrough-framed-sender") {
      override def run(): Unit =
        try {
          val conn = server.accept()
          val out = new DataOutputStream(conn.getOutputStream)
          msgs.foreach { m =>
            val p = m.getBytes(UTF_8); out.writeInt(p.length); out.write(p)
          }
          out.flush(); conn.close()
        } catch { case _: java.io.IOException => }
    }
    sender.setDaemon(true); sender.start()
    val receiver = new ProtocolPeers.TwoPcReceiver()
    val ckpt = java.nio.file.Files.createTempDirectory("passthrough_ckpt").toString
    val h = Graft.source("passthrough-tcp-in",
        FramedSocketSource("127.0.0.1", server.getLocalPort, StringFrames))
      .keyBy(_.takeWhile(_ != '|')) // passthrough's --key-by first-byte
      .to(StateIdentity)
      .toSink(ConnectorSocketSink[String]("127.0.0.1", receiver.server.getLocalPort,
        (v: String) => v.getBytes(UTF_8)),
        checkpointLocation = Some(ckpt))
    try {
      // wait for the wire to visibly flow, then drain what's buffered;
      // the FINAL epoch's phase 2 rides query termination, so the full
      // count is asserted after stop (the ProtocolRelaySpec contract)
      assert(awaitCond(30000) {
        h.processAllAvailable(); receiver.committed.size > 0
      }, "far peer never progressed")
      h.processAllAvailable()
    } finally {
      h.stop()
      server.close()
    }
    assert(awaitCond(10000)(
      receiver.committed.size == n && receiver.inDoubt.isEmpty),
      s"far peer landed ${receiver.committed.size} of $n " +
        s"(in doubt: ${receiver.inDoubt.keySet()})")
    val got = receiver.committed.asScala.toVector
    assert(got.sorted == msgs.sorted.toVector,
      s"multiset diverged: ${got.size} of $n records")
    // per-key order: the keyed host preserves each key's sequence even
    // though cross-key interleave is free
    for (k <- Seq("a", "b", "c", "d"))
      assert(got.filter(_.startsWith(k)) == msgs.filter(_.startsWith(k)).toVector,
        s"key $k reordered")
    receiver.close()
  }

  test("passthrough: connector in, framed TCP sink out") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    val n = 150
    val payloads = (0 until n).map(i => s"pt-$i".getBytes(UTF_8))
    val sender = new ProtocolPeers.ReplaySender(payloads, cookie = "pt")
    // the receiving half: a giles-receiver inbox draining every sink
    // partition's connection (the WireQueries relay shape)
    val inbox = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val ingest = new ServerSocket(0)
    val acceptor = new Thread("passthrough-tcp-out") {
      override def run(): Unit =
        try while (true) {
          val conn = ingest.accept()
          val t = new Thread(() => {
            val in = new DataInputStream(conn.getInputStream)
            try while (true) {
              val len = in.readInt()
              val buf = new Array[Byte](len)
              in.readFully(buf)
              inbox.add(new String(buf, UTF_8))
            } catch { case _: java.io.IOException => }
            finally { try conn.close() catch { case _: java.io.IOException => } }
          })
          t.setDaemon(true); t.start()
        } catch { case _: java.io.IOException => }
    }
    acceptor.setDaemon(true); acceptor.start()
    val h = Graft.source("passthrough-conn-in",
        ConnectorSocketSource("127.0.0.1", sender.server.getLocalPort,
          FramedFixtures.StringFrames, cookie = Some("pt")))
      .map(identity[String]) // --step asis
      .toSink(TcpSink[String]("127.0.0.1", ingest.getLocalPort,
        (v: String) => v.getBytes(UTF_8)))
    try {
      assert(awaitCond(30000) {
        h.processAllAvailable(); inbox.size() >= n
      }, s"TCP sink delivered ${inbox.size()} of $n")
    } finally {
      h.stop()
      ingest.close()
      sender.close()
    }
    assert(inbox.asScala.toVector.sorted == payloads.map(new String(_, UTF_8)).sorted,
      "multiset diverged across the connector-to-TCP bridge")
  }
}
