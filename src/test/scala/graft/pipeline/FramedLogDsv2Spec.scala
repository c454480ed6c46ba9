package graft.pipeline

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import FramedFixtures.StringFrames

/** The DSv2 connector source (SURVEY §2.4 #31): frame-aligned byte
  * offsets as checkpointed points-of-reference, live tail of an
  * append-only framed log, and mid-file resume after restart. */
class FramedLogDsv2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def append(path: String, msgs: Seq[String]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path, true))
    msgs.foreach { m =>
      val payload = m.getBytes(UTF_8)
      out.writeInt(payload.length)
      out.write(payload)
    }
    out.close()
  }

  test("tails appended frames and resumes mid-file from the checkpoint") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val log = Files.createTempDirectory("framedlog").resolve("events.log").toString
    val ckpt = Files.createTempDirectory("framedlog_ckpt").toString
    val out = Files.createTempDirectory("framedlog_out").toString
    append(log, Seq("one", "two"))

    def pipeline() = Graft
      .source("framed-log", FramedLogSource(log, StringFrames))
      .map(s => s.toUpperCase)

    val h1 = pipeline().toSink(IdempotentParquetSink(out), checkpointLocation = Some(ckpt))
    h1.processAllAvailable()
    append(log, Seq("three")) // appended AFTER the query started: live tail
    h1.processAllAvailable()
    h1.stop()

    // Restart from the checkpoint; only the newly appended frame is read.
    append(log, Seq("four"))
    val h2 = pipeline().toSink(IdempotentParquetSink(out), checkpointLocation = Some(ckpt))
    h2.processAllAvailable()
    h2.stop()

    val rows = spark.read.parquet(out).select("_1").as[String].collect().toSeq.sorted
    assert(rows == Seq("FOUR", "ONE", "THREE", "TWO")) // each frame exactly once
  }

  test("a partially-written trailing frame is held back, then delivered") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    val log = Files.createTempDirectory("framedlog2").resolve("partial.log").toString
    append(log, Seq("full"))
    // Write a frame header claiming 10 bytes but only 2 bytes of payload.
    val raw = new DataOutputStream(new FileOutputStream(log, true))
    raw.writeInt(10); raw.write("hi".getBytes(UTF_8)); raw.close()

    assert(FramedLog.frameAlignedEnd(log, 0L, Long.MaxValue) == 4L + 4L)
    // The writer completes the frame: the end advances over it.
    val fin = new DataOutputStream(new FileOutputStream(log, true))
    fin.write("12345678".getBytes(UTF_8)); fin.close()
    assert(FramedLog.frameAlignedEnd(log, 0L, Long.MaxValue) == 8L + 14L)
  }

  test("maxBytesPerTrigger bounds each micro-batch") {
    val log = Files.createTempDirectory("framedlog3").resolve("bounded.log").toString
    append(log, Seq("aaaa", "bbbb", "cccc")) // 8 bytes per frame
    assert(FramedLog.frameAlignedEnd(log, 0L, 1L) == 8L)   // one frame
    assert(FramedLog.frameAlignedEnd(log, 8L, 9L) == 24L)  // two more
  }

  test("property: offsets are always frame-aligned and walking covers every frame") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 25).foreach { _ =>
      val msgs = Seq.fill(rnd.nextInt(30) + 1)("x" * rnd.nextInt(40))
      val log = Files.createTempDirectory("framedprop").resolve("p.log").toString
      append(log, msgs)
      val frameEnds = msgs.scanLeft(0L)((pos, m) => pos + 4 + m.length).tail
      // Full walk reaches EOF exactly.
      assert(FramedLog.frameAlignedEnd(log, 0L, Long.MaxValue) == frameEnds.last)
      // From any frame boundary with any byte budget, the end is one of
      // the true frame boundaries at or after the start.
      (0L +: frameEnds).foreach { start =>
        val budget = rnd.nextInt(80) + 1
        val end = FramedLog.frameAlignedEnd(log, start, budget.toLong)
        assert(end == start || frameEnds.contains(end))
        assert(end >= start)
      }
    }
  }
}
