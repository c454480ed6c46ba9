package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

object MultiPartitionFixtures {
  final case class Msg(key: String, value: Long, seq: Long)

  /** trace_id step (multi_partition_detector.py:219-224): per-key state
    * touched per message, message passed through. */
  final class LastSeen extends Serializable { var last: Long = -1L }
  object TraceId extends StateComputation[Msg, Msg, LastSeen] {
    override val name = "trace id"
    def initialState(): LastSeen = new LastSeen
    def apply(m: Msg, st: LastSeen): ComputationResult[Msg] = {
      st.last = m.value
      ComputationResult.One(m)
    }
  }

  /** trace_window step (:227-231): per-key ring of the last 4 values;
    * emits the ring head (= the just-pushed value) per message. */
  final class RingState extends Serializable {
    var buf: Vector[Long] = Vector.empty
    def push(v: Long): Unit = { buf = (buf :+ v).takeRight(4) }
  }
  object TraceWindow extends StateComputation[Msg, (String, Long, Long), RingState] {
    override val name = "trace window"
    def initialState(): RingState = new RingState
    def apply(m: Msg, st: RingState): ComputationResult[(String, Long, Long)] = {
      st.push(m.value)
      ComputationResult.One((m.key, st.buf.last, m.seq))
    }
  }

  /** _validate.py:27-63 validate_stream, ported verbatim: +1 extends the
    * contiguous segment, +n (n>1) opens a new segment, any decrement is a
    * rollback. A healthy run is (segments=1, rollbacks=0) per key. */
  def validateStream(stream: Seq[Long]): (Int, Int) =
    if (stream.isEmpty) (0, 0)
    else if (stream.size == 1) (1, 0)
    else {
      var a = stream.head
      var segments = 1
      var rollbacks = 0
      stream.tail.foreach { v =>
        val diff = v - a
        if (diff > 1) segments += 1
        else if (diff < 1) rollbacks += 1
        a = v
      }
      (segments, rollbacks)
    }
}

/** Port of the multi_partition_detector correctness app
  * (testing/correctness/apps/multi_partition_detector): a round-robin
  * keyed generator (key = i mod P, value increments each full cycle)
  * through the app's depth-1 topology — key_by → trace_id → key_by →
  * trace_window — with the chained stateful stages bridged by
  * [[Pipeline.through]], validated by the reference's own
  * segments/rollbacks rules per key. */
class MultiPartitionDetectorSpec extends AnyFunSuite {
  import MultiPartitionFixtures._

  private implicit val msgEnc: Encoder[Msg] = Encoders.product[Msg]

  test("per-key sequences stay contiguous through two chained stateful stages") {
    val spark = TestSpark.spark
    implicit val ss: SparkSession = spark
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val P = 8
    val N = 400
    // MultiPartitionGenerator.apply (:94-109): key cycles 0..P-1, value
    // increments when the key wraps.
    val msgs = (0 until N).map(i => Msg((i % P).toString, (i / P).toLong, i.toLong))

    val handoff = Files.createTempDirectory("graft_mpd_handoff").toString
    val stream = MemoryStream[Msg]
    val (h1, mid) = Graft
      .source("mpd", DatasetSource(stream.toDS(), (m: Msg) => m.seq))
      .keyBy(_.key)
      .to(TraceId)
      .through(handoff)
    val h2 = mid
      .keyBy(_.key)
      .to(TraceWindow)(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
      .toSink(MemorySink("mpd_out"))

    msgs.grouped(150).foreach { chunk =>
      stream.addData(chunk)
      h1.processAllAvailable(); h2.processAllAvailable()
    }
    h1.stop(); h2.stop()

    val out = spark.sql("SELECT _1._1, _1._2, _1._3 FROM mpd_out")
      .as[(String, Long, Long)].collect()
    assert(out.length == N) // every message exactly once through both stages
    out.groupBy(_._1).foreach { case (key, rows) =>
      val values = rows.sortBy(_._3).map(_._2).toSeq
      assert(values.length == N / P, s"key $key lost or duplicated messages")
      // The reference validator's healthy-run verdict.
      assert(validateStream(values) == ((1, 0)), s"key $key: $values")
    }
  }

  test("validate_stream port matches the reference rules") {
    assert(validateStream(Nil) == ((0, 0)))
    assert(validateStream(Seq(7)) == ((1, 0)))
    assert(validateStream(Seq(1, 2, 3, 4)) == ((1, 0)))
    assert(validateStream(Seq(1, 2, 5, 6)) == ((2, 0)))      // gap: new segment
    assert(validateStream(Seq(1, 2, 3, 2, 3)) == ((1, 1)))   // decrement: rollback
    assert(validateStream(Seq(1, 1)) == ((1, 1)))            // diff 0 counts as rollback
  }
}
