package graft.pipeline

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object MultiPipelineFixtures {
  /** (stream_id, seq) as two big-endian u32s, length framed
    * (multi_pipeline.pony Decoder:79-91). */
  object PairDecoder extends FramedDecoder[(Long, Long)] {
    def decode(payload: Array[Byte]): (Long, Long) = {
      val b = ByteBuffer.wrap(payload)
      (b.getInt & 0xffffffffL, b.getInt & 0xffffffffL)
    }
    def eventTimeNs(t: (Long, Long)): Long = t._2
  }

  /** Comp1/Comp2 (:56-77): identity pass-throughs (the app tests that
    * two independent sources survive a merge intact). */
  def identityStage(name0: String): StatelessComputation[(Long, Long), (Long, Long)] =
    new StatelessComputation[(Long, Long), (Long, Long)] {
      override val name = name0
      def apply(in: (Long, Long)): ComputationResult[(Long, Long)] =
        ComputationResult.One(in)
    }
}

/** Port of the multi_pipeline correctness app
  * (testing/correctness/apps/multi_pipeline/multi_pipeline.pony:35-50):
  * two framed sources each through two stateless stages, merged into one
  * sink; the golden expects every stream's full 1..N sequence to survive
  * the merge. */
class MultiPipelineSpec extends AnyFunSuite {
  import MultiPipelineFixtures._
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  private val dir = "/root/reference/testing/correctness/apps/multi_pipeline"

  test("two merged pipelines deliver both streams' sequences intact") {
    import spark.implicits._
    assume(Files.exists(Paths.get(s"$dir/_test1.msg")), "reference fixture not present")
    val staged = Files.createTempDirectory("multipipe_fixture")
    Files.copy(Paths.get(s"$dir/_test1.msg"), staged.resolve("s1.bin"))
    Files.copy(Paths.get(s"$dir/_test2.msg"), staged.resolve("s2.bin"))

    def pipeline(file: String, tag: String) = Graft
      .source(s"mp-$tag", FramedFileSource(
        staged.resolve(file).toString, PairDecoder, streaming = false))
      .to(identityStage(s"comp1-$tag"))
      .to(identityStage(s"comp2-$tag"))

    pipeline("s1.bin", "inputs1")
      .merge(pipeline("s2.bin", "inputs2"))
      .toSink(MemorySink("multipipe_out"))

    val got = spark.sql("SELECT _1._1, _1._2 FROM multipipe_out")
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).sorted.toSeq }

    val expected = {
      val txt = new String(Files.readAllBytes(Paths.get(s"$dir/_expected.json")), "UTF-8")
      """"(\d+)":\s*\[([^\]]*)\]""".r.findAllMatchIn(txt).map { m =>
        m.group(1).toLong -> m.group(2).split(",").map(_.trim.toLong).toSeq
      }.toMap
    }
    assert(expected.keySet == Set(1L, 2L))
    assert(got == expected)
  }
}
