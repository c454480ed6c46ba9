package graft.pipeline

import java.io.DataOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

object DecoderFilterFixtures {
  /** Port of the reference's OddFilterDecoder
    * (testing/correctness/apps/decoder_filter/decoder_filter.pony:52-60:
    * `decode(data): (U64 | None)` keeps even numbers and returns None for
    * odd ones — the reference test for decode-time drop): 8-byte
    * big-endian u64 payloads under the default 4-byte length framing. */
  object OddFilterDecoder extends FramedDecoder[Long] {
    def decode(payload: Array[Byte]): Long =
      java.nio.ByteBuffer.wrap(payload).getLong
    override def decodeOpt(payload: Array[Byte]): Option[Long] = {
      val n = decode(payload)
      if (n % 2 == 0) Some(n) else None
    }
    def eventTimeNs(t: Long): Long = t
  }
}

/** decoder_filter ported: the framed-source decode contract is
  * `decode(payload): (T | None)` — a decoder can DROP a frame at the
  * source (heartbeats, protocol noise, filter-at-decode) and the framing
  * loop must advance past the dropped frame's bytes so every later frame
  * still decodes (the alignment half is the reason the reference tests
  * this as its own app: a drop that desynced the framing would corrupt
  * everything after it, not just lose one message). */
class DecoderFilterSpec extends AnyFunSuite {
  import DecoderFilterFixtures._
  private lazy val spark = TestSpark.spark

  private def frame(out: DataOutputStream, n: Long): Unit = {
    out.writeInt(8)
    out.writeLong(n)
  }

  test("frames(): dropped frames are skipped, alignment preserved, trailing drop ends cleanly") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    Seq(0L, 1L, 2L, 3L, 4L, 7L).foreach(frame(out, _)) // ends on a DROPPED frame
    val it = FramedDecoder.frames(OddFilterDecoder, bos.toByteArray)
    assert(it.toSeq === Seq(0L, 2L, 4L)) // evens survive, odds (incl. trailing 7) vanish
  }

  /** The TCP drop contract, driven through either decode path: the
    * in-scan default (drops inside the DSv2 reader, before any row
    * exists) and the typed-flatMap form (drops above the scan). Both
    * must produce exactly the evens in arrival order — the r16 inline
    * path changes WHERE the drop happens, never WHAT survives. (This
    * fixture's decoder does not override decodeSliceOpt, so the inline
    * run also covers the default copy-and-delegate slice decode.) */
  private def tcpDropRun(inline: Boolean): Seq[Long] = {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val server = new java.net.ServerSocket(0)
    val sender = new Thread("decoder-filter-sender") {
      override def run(): Unit = {
        val conn = server.accept()
        val out = new DataOutputStream(
          new java.io.BufferedOutputStream(conn.getOutputStream))
        (0L until 20L).foreach(frame(out, _))
        out.flush()
        conn.close()
      }
    }
    sender.start()
    val view = s"decoder_filter_out_${System.nanoTime()}"
    val h = Graft.source("decoder-filter",
        FramedSocketSource("127.0.0.1", server.getLocalPort, OddFilterDecoder,
          inlineDecode = inline))
      .toSink(MemorySink(view))
    sender.join()
    // poll until all 10 surviving frames are in the sink (ADVICE r13):
    // the source's reader thread buffers asynchronously, so a fixed sleep
    // + processAllAvailable can complete on a partial prefix and flake —
    // drive micro-batches until the table reaches the expected count
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    h.processAllAvailable()
    while (spark.table(view).count() < 10 && System.nanoTime() < deadline) {
      Thread.sleep(50)
      h.processAllAvailable()
    }
    val got = spark.table(view).collect().map(_.getLong(0)).toSeq
    h.stop()
    server.close()
    got
  }

  test("framed TCP source: odd frames dropped at decode, evens arrive intact and in order") {
    // exactly the evens, in arrival order: every value after a dropped
    // odd frame is bit-correct, so the drop consumed its bytes exactly
    assert(tcpDropRun(inline = true) === (0L until 20L by 2L).toSeq)
  }

  test("the typed-flatMap path (inlineDecode = false) drops identically") {
    assert(tcpDropRun(inline = false) === (0L until 20L by 2L).toSeq)
  }

  test("framed file source: the same dropping decoder filters a framed log batch-side") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("decoder_filter").toFile
    val out = new DataOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "log.bin")))
    (0L until 11L).foreach(frame(out, _))
    out.close()
    val got = Graft.source("decoder-filter-file",
        FramedFileSource(dir.getAbsolutePath, OddFilterDecoder, streaming = false))
      .dataset.collect().map(_._1).sorted.toSeq
    graft.StreamBench.deleteRecursively(dir)
    assert(got === Seq(0L, 2L, 4L, 6L, 8L, 10L))
  }

  test("a total decoder is unaffected: decodeOpt defaults to Some(decode)") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    Seq("a", "bb", "").foreach { m =>
      val p = m.getBytes(UTF_8); out.writeInt(p.length); out.write(p)
    }
    val it = FramedDecoder.frames(FramedFixtures.StringFrames, bos.toByteArray)
    assert(it.toSeq === Seq("a", "bb", ""))
  }
}
