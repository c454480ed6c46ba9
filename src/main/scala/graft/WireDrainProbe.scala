package graft

import java.net.{ServerSocket, Socket}

/** Scratch probe (not part of the driver contract): the NO-SPARK ceiling
  * of the wire rig's transport half, for the r16 wire-gap attribution
  * (VERDICT r15 next #1 — "the senders-share-the-box confound must be
  * measured, not assumed").
  *
  * Reproduces stream_market_spread_wire's exact transport shape — 2 legs
  * × N shards of pre-framed ~4 MB slabs, each served by its own thread
  * over a localhost socket — but replaces the whole Spark side with one
  * plain drain thread per socket doing exactly what
  * FramedSocketSource's reader thread does (64 KB bulk reads + a
  * header-walk counting complete frames) and NOTHING else: no chunk
  * sealing, no driver buffer, no micro-batches, no decode, no shuffle,
  * no state. The merged frames/s this prints is the hardest upper bound
  * any Spark-side work can reach on this box with in-process senders;
  * the gap between it and the STREAM_WIRE_STATELESS reading prices the
  * micro-batch scan+decode machinery, and the gap between stateless and
  * the full row prices the keyed shuffle+state stage.
  *
  * Args: [framesPerShard] [shardsPerLeg] (defaults 500000 × 4 ≈ the
  * sf0.1 rig's 4 M merged rows).
  */
object WireDrainProbe {
  def main(args: Array[String]): Unit = {
    val framesPerShard = args.headOption.map(_.toInt).getOrElse(500000)
    val shards = args.lift(1).map(_.toInt).getOrElse(4)

    // pre-framed slabs, the rig's staging shape (24-byte payloads)
    val SlabBytes = 4 << 20
    def stageSlabs(): Array[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val buf = new java.io.ByteArrayOutputStream(SlabBytes + 64)
      val bb = java.nio.ByteBuffer.allocate(28)
      var i = 0
      while (i < framesPerShard) {
        bb.clear(); bb.putInt(24)
        bb.putLong(i % 1500L); bb.putLong(i.toLong); bb.putLong(i * 1000L)
        buf.write(bb.array(), 0, 28)
        if (buf.size() >= SlabBytes) { out += buf.toByteArray; buf.reset() }
        i += 1
      }
      if (buf.size() > 0) out += buf.toByteArray
      out.toArray
    }
    val slabs = stageSlabs()

    def serveAll(): ServerSocket = {
      val ss = new ServerSocket(0)
      val t = new Thread("drain-probe-server") {
        override def run(): Unit =
          try {
            val conn = ss.accept()
            val out = conn.getOutputStream
            var i = 0
            while (i < slabs.length) { out.write(slabs(i)); i += 1 }
            out.flush(); conn.close()
          } catch { case _: java.io.IOException => }
      }
      t.setDaemon(true); t.start(); ss
    }

    def drain(port: Int, counter: java.util.concurrent.atomic.AtomicLong): Thread = {
      val t = new Thread("drain-probe-reader") {
        override def run(): Unit = {
          val sock = new Socket("127.0.0.1", port)
          val in = sock.getInputStream
          val readBuf = new Array[Byte](1 << 16)
          var buf = new Array[Byte]((4 << 20) + (1 << 16))
          var bufLen = 0
          var scanPos = 0
          var frames = 0L
          try {
            var n = in.read(readBuf)
            while (n >= 0) {
              if (bufLen + n > buf.length)
                buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, bufLen + n))
              System.arraycopy(readBuf, 0, buf, bufLen, n)
              bufLen += n
              var more = true
              while (more && bufLen - scanPos >= 4) {
                val len = graft.pipeline.FramedSocket.frameLen(buf, scanPos)
                if (bufLen - scanPos - 4 >= len) { scanPos += 4 + len; frames += 1 }
                else more = false
              }
              // recycle the buffer like the source's seal() does (keep the
              // partial tail) so memory stays ~one chunk
              if (scanPos >= (4 << 20)) {
                val tail = bufLen - scanPos
                if (tail > 0) System.arraycopy(buf, scanPos, buf, 0, tail)
                bufLen = tail; scanPos = 0
              }
              n = in.read(readBuf)
            }
          } catch { case _: java.io.IOException => }
          finally { try sock.close() catch { case _: java.io.IOException => } }
          counter.addAndGet(frames)
          ()
        }
      }
      t.start(); t
    }

    // 2 legs × N shards, exactly the rig's socket count
    val counter = new java.util.concurrent.atomic.AtomicLong(0L)
    val servers = Array.fill(2 * shards)(serveAll())
    val t0 = System.nanoTime()
    val readers = servers.map(s => drain(s.getLocalPort, counter))
    readers.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    val expected = 2L * shards * framesPerShard
    val got = counter.get()
    servers.foreach(s => try s.close() catch { case _: java.io.IOException => })
    println(f"[wire-drain] ${2 * shards} sockets  $got%d of $expected%d frames  " +
      f"$sec%6.2f s  ${got / sec / 1e6}%6.2f M frames/s merged (no Spark)")
  }
}
