package graft.pipeline

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object CelsiusFixtures {
  /** 4-byte big-endian IEEE f32, length framed (multi_sink.pony
    * CelsiusDecoder). */
  object F32Decoder extends FramedDecoder[Float] {
    def decode(payload: Array[Byte]): Float = ByteBuffer.wrap(payload).getFloat
    def eventTimeNs(t: Float): Long = 0L
  }

  def parseF32Frames(path: String): Seq[Float] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    (0 until bytes.length by 8).map(off => ByteBuffer.wrap(bytes, off + 4, 4).getFloat)
  }
}

/** Port of the multi_sink correctness app
  * (testing/correctness/apps/multi_sink/multi_sink.pony:36-46): the
  * celsius pipeline — framed f32 source → ×1.8 → +32 — fanned out to TWO
  * sinks via `to_sinks`, against the app's own framed golden (which holds
  * both sinks' output: every converted value exactly twice). IEEE
  * binary32 arithmetic is bit-identical between Pony F32 and Scala
  * Float, so the compare is exact. */
class MultiSinkCelsiusSpec extends AnyFunSuite {
  import CelsiusFixtures._
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  private val dir = "/root/reference/testing/correctness/apps/multi_sink"

  test("celsius conversion to two sinks matches the framed golden") {
    import spark.implicits._
    assume(Files.exists(Paths.get(s"$dir/_test.msg")), "reference fixture not present")
    // Hadoop hides `_`-prefixed files — stage a copy.
    val staged = Files.createTempDirectory("celsius_fixture")
    Files.copy(Paths.get(s"$dir/_test.msg"), staged.resolve("temps.bin"))

    Graft.source("celsius", FramedFileSource(
        staged.resolve("temps.bin").toString, F32Decoder, streaming = false))
      .map(f => f * 1.8f) // Multiply (:55-60)
      .map(f => f + 32f)  // Add (:62-67)
      .toSinks(Seq(MemorySink("celsius_out1"), MemorySink("celsius_out2")))

    def sinkBits(view: String): Seq[Int] = spark.table(view)
      .select("_1").as[Float].collect().toSeq
      .map(java.lang.Float.floatToRawIntBits)

    val expected = parseF32Frames(s"$dir/_expected.msg")
      .map(java.lang.Float.floatToRawIntBits)
    val s1 = sinkBits("celsius_out1")
    val s2 = sinkBits("celsius_out2")
    assert(s1.sorted == s2.sorted) // both sinks see the identical stream
    assert((s1 ++ s2).sorted == expected.sorted)
    assert(s1.size == 100 && expected.size == 200)
  }

  test("TcpSink survives one injected peer reset without failing the query") {
    import java.io.DataInputStream
    import java.net.ServerSocket
    import java.nio.charset.StandardCharsets.UTF_8
    import spark.implicits._

    // Receiver that hard-closes its FIRST connection after 5 frames (the
    // injected reset), then serves reconnects normally.
    val server = new ServerSocket(0)
    val received = new java.util.concurrent.CopyOnWriteArrayList[String]
    @volatile var connections = 0
    val acceptor = new Thread(() =>
      try while (true) {
        val conn = server.accept()
        connections += 1
        val killAfter = if (connections == 1) 5 else Int.MaxValue
        val t = new Thread(() =>
          try {
            val in = new DataInputStream(conn.getInputStream)
            var n = 0
            while (n < killAfter) {
              val len = in.readInt()
              val b = new Array[Byte](len)
              in.readFully(b)
              received.add(new String(b, UTF_8))
              n += 1
            }
            conn.setSoLinger(true, 0) // RST, not FIN: a real peer crash
            conn.close()
          } catch { case _: java.io.IOException => })
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => })
    acceptor.setDaemon(true)
    acceptor.start()

    // one partition = one connection, so the injected reset hits the
    // stream mid-flight (32 single-frame connections would dodge it).
    // The encode pause paces the writes: raw TCP only surfaces a dead
    // peer at the NEXT write after the RST propagates, so an unpaced
    // 40-frame burst can fit entirely in the socket buffer before the
    // reset arrives and dodge detection — the documented raw-TCP
    // limitation this test must not race against.
    val n = 40
    val ds = spark.range(n).map(i => (s"m-$i", 0L)).coalesce(1)
    TcpSink[String]("127.0.0.1", server.getLocalPort,
      (v: String) => { Thread.sleep(15); v.getBytes(UTF_8) }, backoffMs = 100L)
      .writeBatch(ds) // must NOT throw: the reset is survived, not fatal

    // at-least-once across the reset: every frame arrives (the replay
    // duplicates the pre-reset prefix; nothing is lost)
    val deadline = System.currentTimeMillis() + 10000
    while (received.size < n && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    val got = scala.jdk.CollectionConverters.ListHasAsScala(received).asScala.toSet
    assert(got == (0 until n).map(i => s"m-$i").toSet,
      s"missing frames after reset: got ${got.size} distinct of $n")
    assert(connections >= 2, "the reset never forced a reconnect")
    server.close()
  }
}
