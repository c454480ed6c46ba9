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
}
