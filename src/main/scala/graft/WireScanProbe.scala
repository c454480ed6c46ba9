package graft

import java.net.ServerSocket

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Scratch probe (not part of the driver contract): per-layer cost of
  * the framed-socket ingest path, to localize where wire rows/s goes.
  * Serves N 24-byte frames over one localhost socket and times, as
  * separate runs:
  *   raw    — the DSv2 scan alone (offset, payload) → noop;
  *   decode — the [[FramedSocketSource.load]] typed-decode path → noop;
  *   dsl    — the full DSL wrap (Graft.source → filter → EmptySink).
  */
object WireScanProbe {
  def main(args: Array[String]): Unit = {
    val nFrames = args.headOption.map(_.toInt).getOrElse(4000000)
    val spark = Sessions.local("graft-wire-scan-probe")
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    implicit val long5Enc: org.apache.spark.sql.Encoder[(Long, Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)

    def serveAll(): ServerSocket = {
      val ssk = new ServerSocket(0)
      val t = new Thread("wire-scan-server") {
        override def run(): Unit =
          try {
            val conn = ssk.accept()
            val out = new java.io.DataOutputStream(
              new java.io.BufferedOutputStream(conn.getOutputStream, 1 << 20))
            val bb = java.nio.ByteBuffer.allocate(24)
            var i = 0L
            while (i < nFrames) {
              bb.clear(); bb.putLong(i % 1500); bb.putLong(i); bb.putLong(i * 1000)
              out.writeInt(24); out.write(bb.array()); i += 1
            }
            out.flush(); conn.close()
          } catch { case _: java.io.IOException => }
      }
      t.setDaemon(true); t.start(); ssk
    }

    // Row accounting depends on the decode path (FramedSocketSource doc):
    // the raw scan and the flatMap path count FRAMES SCANNED in
    // numInputRows (decode/drops happen above the scan), while the
    // inline-decode default counts DECODED rows — a dropping decoder's
    // drops never become rows. Each variant passes the row count it
    // drains to completion on; throughput is still reported in FRAMES/s
    // (frames served / wall), the wire-side unit every variant shares,
    // so the drop50 line reads directly against the decode line — a
    // cheaper-than-decode reading means a dropped frame costs the frame
    // walk and the slice decode but no row machinery.
    def timed(label: String, expectRows: Long = nFrames.toLong)(
        mk: Int => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val srv = serveAll()
      // per-query-id counts (ADVICE r10: the listener bus is async and
      // session-global — a straggler progress event from a previous
      // timed() query must not credit this one's total)
      val seenByQuery = new java.util.concurrent.ConcurrentHashMap[
        java.util.UUID, java.util.concurrent.atomic.AtomicLong]()
      // frame-range completion per query: the highest committed source
      // endOffset (FrameCount's json is the plain frame count). A
      // dropping decoder emits fewer ROWS than frames, so the row count
      // alone can stop the clock before the tail frames' walk is in a
      // published progress event (ADVICE r16) — the drain is complete
      // only when the offset frontier has consumed every served frame.
      val offsetByQuery = new java.util.concurrent.ConcurrentHashMap[
        java.util.UUID, java.util.concurrent.atomic.AtomicLong]()
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          seenByQuery
            .computeIfAbsent(e.progress.id,
              _ => new java.util.concurrent.atomic.AtomicLong(0L))
            .addAndGet(e.progress.numInputRows)
          e.progress.sources.headOption.foreach { s =>
            val end = try Option(s.endOffset).map(_.trim.toLong) catch {
              case _: NumberFormatException => None
            }
            end.foreach(o => offsetByQuery
              .computeIfAbsent(e.progress.id,
                _ => new java.util.concurrent.atomic.AtomicLong(0L))
              .accumulateAndGet(o, math.max))
          }
          ()
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      try {
        val t0 = System.nanoTime()
        val q = mk(srv.getLocalPort)
        def seen(): Long =
          Option(seenByQuery.get(q.id)).map(_.get).getOrElse(0L)
        def offset(): Long =
          Option(offsetByQuery.get(q.id)).map(_.get).getOrElse(0L)
        def drained(): Boolean = seen() >= expectRows && offset() >= nFrames
        val deadline = System.nanoTime() + 600L * 1000000000L
        var lastLog = System.nanoTime()
        while (!drained() && System.nanoTime() < deadline) {
          Thread.sleep(25)
          if (q.exception.isDefined) throw q.exception.get
          if (System.nanoTime() - lastLog > 2000000000L) {
            lastLog = System.nanoTime()
            val lp = Option(q.lastProgress)
            println(s"[wire-scan] ...$label seen=${seen()} lastBatch=" +
              lp.map(p => s"${p.batchId}/${p.numInputRows}rows").getOrElse("none"))
          }
        }
        val sec = (System.nanoTime() - t0) / 1e9
        q.stop()
        val done = seen()
        if (!drained())
          println(f"[wire-scan] $label%-8s TIMED OUT at $done of $expectRows rows " +
            f"(offset ${offset()} of $nFrames frames) after ${sec}%7.2f s")
        else
          println(f"[wire-scan] $label%-8s $nFrames frames  ${sec}%7.2f s  ${nFrames / sec / 1e6}%6.2f M frames/s")
      } finally {
        spark.streams.removeListener(listener)
        srv.close()
      }
    }

    // raw DSv2 scan, no typed ops
    timed("raw") { port =>
      spark.readStream
        .format(classOf[FramedSocketTableProvider].getName)
        .option("host", "127.0.0.1").option("port", port.toString)
        .load()
        .writeStream.format("noop").option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wsp_raw").toString)
        .start()
    }

    // the in-scan decode path (FramedSocketSource's default): decode +
    // serialize inside the DSv2 reader, no typed flatMap boundary
    timed("decode") { port =>
      FramedSocketSource("127.0.0.1", port, StreamBench.SpreadWireDecoder(0L))
        .load(spark)
        .writeStream.format("noop").option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wsp_dec").toString)
        .start()
    }

    // the pre-r16 typed-flatMap path (inlineDecode = false), kept
    // measurable so the in-scan gain stays pinned to numbers
    timed("flatmap") { port =>
      FramedSocketSource("127.0.0.1", port, StreamBench.SpreadWireDecoder(0L),
        inlineDecode = false)
        .load(spark)
        .writeStream.format("noop").option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wsp_fm").toString)
        .start()
    }

    // decode-drop pricing (VERDICT r13 #6): the same typed-decode path
    // with a decodeOpt dropping 50% of frames at the source — the
    // reference's heartbeat/filter-at-decode use case
    // (framed_source_notify.pony:118-133), which no bench row exercised
    // at a HIGH drop rate. Read against the `decode` line in frames/s:
    // parity means a dropped frame costs exactly the frame walk.
    // survivors = frames with an even running index = ceil(nFrames/2)
    // exactly (ADVICE r16: the old floor-divide undercounted by one on
    // odd nFrames; completion is offset-gated regardless, so the clock
    // covers the full frame range including trailing drops)
    timed("drop50", expectRows = (nFrames + 1L) / 2) { port =>
      FramedSocketSource("127.0.0.1", port, DroppingWireDecoder)
        .load(spark)
        .writeStream.format("noop").option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wsp_drop").toString)
        .start()
    }

    // full DSL wrap
    timed("dsl") { port =>
      val h = Graft.source("wire-scan-dsl",
          FramedSocketSource("127.0.0.1", port, StreamBench.SpreadWireDecoder(0L)))
        .filter(_._4 >= 0)
        .toSink(EmptySink[(Long, Long, Long, Long, Long)]())
      h.query.get
    }

    // the strict-FIFO mode's price: ordered=true plans each batch as
    // ONE partition (single-task decode), so ordered-vs-decode is the
    // cost a tie-heavy decoder pays for arrival order surviving the
    // keyed shuffle (FramedSocketSource class doc)
    timed("ordered") { port =>
      FramedSocketSource("127.0.0.1", port, StreamBench.SpreadWireDecoder(0L),
        ordered = true)
        .load(spark)
        .writeStream.format("noop").option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wsp_ord").toString)
        .start()
    }

    spark.stop()
  }

  /** SpreadWireDecoder with the reference's decode-time drop: every
    * odd-cents frame (exactly half the probe's generated stream) returns
    * None from decodeOpt, so the run prices the drop path itself. */
  object DroppingWireDecoder extends FramedDecoder[(Long, Long, Long, Long, Long)] {
    private val base = StreamBench.SpreadWireDecoder(0L)
    def decode(payload: Array[Byte]): (Long, Long, Long, Long, Long) = base.decode(payload)
    override def decodeOpt(payload: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
      val t = base.decode(payload)
      if (t._4 % 2 == 0) Some(t) else None // cents = the generator's running index
    }
    def eventTimeNs(t: (Long, Long, Long, Long, Long)): Long = t._5
  }
}
