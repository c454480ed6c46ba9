package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The full connector-protocol stack end to end: an at-least-once
  * resumable socket INGRESS ([[ConnectorSocketSource]]) feeding a
  * transformation feeding the exactly-once 2PC socket EGRESS
  * ([[ConnectorSocketSink]]), killed mid-stream and restarted from its
  * checkpoint. The ingress may re-request frames its checkpoint never
  * committed and the egress may replay an epoch — the composition must
  * still land every record at the far peer exactly once, which is the
  * reference's end-to-end effectively-once claim for a connector-source →
  * connector-sink topology. */
class ProtocolRelaySpec extends AnyFunSuite {
  import FramedFixtures.StringFrames
  private lazy val spark = TestSpark.spark

  private def awaitCond(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("socket-to-socket relay is exactly-once across a mid-stream kill") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val n = 200
    val payloads = (0 until n).map(i => s"rec-$i".getBytes(UTF_8))
    val sender = new ProtocolPeers.ReplaySender(payloads, cookie = "relay")
    val receiver = new ProtocolPeers.TwoPcReceiver()
    val ckpt = Files.createTempDirectory("relay_ckpt").toString

    def startQuery() = Graft.source("relay-in",
        ConnectorSocketSource("127.0.0.1", sender.server.getLocalPort, StringFrames,
          cookie = Some("relay"), maxFramesPerTrigger = 25))
      .map(_.toUpperCase) // a stateless stage between the two protocol halves
      .toSink(ConnectorSocketSink[String]("127.0.0.1", receiver.server.getLocalPort,
        (v: String) => v.getBytes(UTF_8)),
        checkpointLocation = Some(ckpt))

    // --- incarnation 1: kill once the far peer has committed some epochs
    val h1 = startQuery()
    assert(awaitCond(30000)(receiver.committed.size >= 50),
      s"far peer never progressed: ${receiver.committed.size}")
    h1.stop()
    val atKill = receiver.committed.size
    assert(atKill < n, s"test needs a mid-stream kill, got $atKill of $n")

    // --- incarnation 2: resume from the checkpoint; the ingress
    // re-requests uncommitted frames, the egress resolves its in-doubt
    // epoch, and the relay drains to the end. The FINAL epoch's phase 2
    // rides query termination (no later trigger exists to carry it), so
    // drain first, stop, then assert the far peer's total.
    val h2 = startQuery()
    // the resumed ingress connects lazily (the resume point is only known
    // at the first offset poll), so "available" is empty for an instant —
    // wait for the replay to visibly flow before draining
    assert(awaitCond(30000)(receiver.committed.size >= n - 25),
      s"replay never flowed: ${receiver.committed.size}")
    h2.processAllAvailable()
    h2.stop()
    assert(awaitCond(10000)(
      receiver.committed.size == n && receiver.inDoubt.isEmpty),
      s"relay did not land exactly-once: ${receiver.committed.size} of $n " +
        s"(in doubt: ${receiver.inDoubt.keySet()})")

    // exactly-once, order preserved end to end: the ingress is one
    // ordered stream, the pipeline is narrow, and the egress writes
    // batches in epoch order
    val got = receiver.committed.asScala.toVector
    assert(got == (0 until n).map(i => s"REC-$i").toVector,
      s"far peer stream diverged: got ${got.size} records, " +
        s"first mismatch at ${got.zipWithIndex.find { case (v, i) => v != s"REC-$i" }}")
    sender.close()
    receiver.close()
  }
}
