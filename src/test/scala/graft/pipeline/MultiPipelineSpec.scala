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

  test("idle source in a merge never holds the watermark back (watermarks.pony:81-123)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.{Encoder, Encoders}
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val e3: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    // The reference evicts idle upstreams from its min-of-upstreams stage
    // watermark so a silent source cannot stall open windows. This engine
    // gets the same observable behavior structurally: merge() unions the
    // stamped streams BEFORE the single withWatermark in the stateful
    // stage, so the query watermark rides the max event time across the
    // union — per-source watermarks (and Spark's min-of-watermarks
    // multipleWatermarkPolicy stall) never exist. A window keyed to the
    // silent source's data must fire from the live source's progress
    // alone.
    val sec = 1000000000L
    val live = MemoryStream[(Long, Long, Long)]
    val idle = MemoryStream[(Long, Long, Long)]
    def src(name: String, m: MemoryStream[(Long, Long, Long)]) =
      Graft.source(name, DatasetSource(m.toDS(), (e: (Long, Long, Long)) => e._3))
    val handle = src("live-src", live)
      .merge(src("idle-src", idle))
      .keyBy(_._1.toString)
      .to(Graft.rangeWindows(10 * sec).over(graft.operators.PipelineQueries.WindowCents))(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
      .toSink(MemorySink("idle_merge_out"))
    // batch 1: both sources emit inside their first 10 s window
    live.addData(Seq((1L, 10L, 1 * sec), (1L, 20L, 2 * sec)))
    idle.addData(Seq((2L, 5L, 3 * sec), (2L, 7L, 4 * sec)))
    handle.processAllAvailable()
    // batches 2..3: ONLY the live source advances event time
    live.addData(Seq((1L, 1L, 40 * sec)))
    handle.processAllAvailable()
    live.addData(Seq((1L, 1L, 70 * sec)))
    handle.processAllAvailable()
    val got = spark.sql("SELECT _1._1, _1._2, _1._3 FROM idle_merge_out")
      .as[(String, Long, Long)].collect()
    handle.stop()
    // the silent source's window fired on the live source's watermark:
    // its 12 cents across 2 events are in emitted (non-empty) windows
    val idleFired = got.filter(r => r._1 == "2" && r._3 > 0)
    assert(idleFired.map(_._2).sum == 12, s"idle-key windows: ${got.toSeq}")
    assert(idleFired.map(_._3).sum == 2)
  }
}
