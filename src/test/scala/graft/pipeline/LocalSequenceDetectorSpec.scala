package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

object LocalSequenceFixtures {
  final case class SeqValue(key: String, value: Long, seq: Long)

  /** CheckSequence (local_sequence_detector.pony:79-96): a local state
    * latches the parity of the first value it sees and fails if a later
    * value's parity differs — proving streams from different workers
    * (whose generators use different parity offsets, :110-130) are never
    * routed into one local state. Emits (key, value, observed parity). */
  final class ParityState extends Serializable { var mod: Long = -1L }
  object CheckSequence extends StateComputation[SeqValue, (String, Long, Long), ParityState] {
    override val name = "check sequence"
    def initialState(): ParityState = new ParityState
    def apply(sv: SeqValue, st: ParityState): ComputationResult[(String, Long, Long)] = {
      if (st.mod == -1L) st.mod = sv.value % 2
      require(sv.value % 2 == st.mod,
        s"local sequence mixed parities: ${sv.value} into mod ${st.mod}")
      ComputationResult.One((sv.key, sv.value, st.mod))
    }
  }

  /** A row carrying its stable origin, for the streaming local_key_by
    * workaround (origin embedded in the key). */
  final case class Tagged(origin: Long, key: String, value: Long, seq: Long)

  /** SeqValueGenerator (:110-140): keys a..d round-robin, per-key values
    * stepping by 2 from the worker's offset — every value a worker emits
    * keeps the worker's parity. */
  def workerStream(offset: Long, n: Int): Seq[SeqValue] = {
    val keys = Vector("a", "b", "c", "d")
    val last = collection.mutable.Map.empty[String, Long].withDefaultValue(offset)
    (0 until n).map { i =>
      val k = keys(i % keys.size)
      last(k) += 2
      SeqValue(k, last(k), i.toLong)
    }
  }
}

/** Port of the local_sequence_detector correctness app
  * (testing/correctness/apps/local_sequence_detector): `local_key_by`
  * must scope the next stage's state to (upstream partition, key) — two
  * source partitions generating opposite-parity sequences for the SAME
  * keys must never share a state instance. */
class LocalSequenceDetectorSpec extends AnyFunSuite {
  import LocalSequenceFixtures._
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark
  private implicit val svEnc: Encoder[SeqValue] = Encoders.product[SeqValue]

  private def twoWorkerSource(): Pipeline[SeqValue] = {
    // One generator stream per source partition (worker 0 even parity,
    // worker 1 odd) — parallelize with exactly 2 slices.
    val rdd = spark.sparkContext
      .parallelize(Seq(workerStream(0, 100), workerStream(1, 100)), 2)
      .flatMap(identity)
    Graft.source("local-seq", DatasetSource(
      spark.createDataset(rdd), (sv: SeqValue) => sv.seq * 1000000000L))
  }

  test("local_key_by keeps each worker's sequence in its own state") {
    import spark.implicits._
    twoWorkerSource()
      .localKeyBy(_.key)
      .to(CheckSequence)(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
      .toSink(MemorySink("local_seq_out"))
    val out = spark.sql("SELECT _1._1, _1._2, _1._3 FROM local_seq_out")
      .as[(String, Long, Long)].collect()
    assert(out.length == 200) // every message passed its parity check
    // Both parities flowed through separate states for the same keys.
    assert(out.map(_._3).toSet == Set(0L, 1L))
    assert(out.map(_._1).toSet == Set("a", "b", "c", "d"))
  }

  test("streaming local_key_by fails fast (micro-batch partition ids are not a worker identity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SeqValue]
    val p = Graft.source("local-seq-stream",
      DatasetSource(mem.toDS(), (sv: SeqValue) => sv.seq * 1000000000L))
    val ex = intercept[IllegalArgumentException](p.localKeyBy(_.key))
    assert(ex.getMessage.contains("stable"))
    intercept[IllegalArgumentException](p.localCollect())
  }

  test("streaming equivalent: key_by with an origin tag keeps per-origin state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The documented workaround: the element carries its origin (here the
    // generator's parity offset), and the key embeds it. Two micro-batches
    // interleave both origins — state must stay per-(origin, key) even
    // though batch-2 rows land on arbitrary task partitions.
    val mem = MemoryStream[Tagged]
    val handle = Graft.source("tagged-seq",
        DatasetSource(mem.toDS(), (t: Tagged) => t.seq * 1000000000L))
      .map(t => SeqValue(t.origin + ":" + t.key, t.value, t.seq))(Encoders.product[SeqValue])
      .keyBy(_.key)
      .to(CheckSequence)(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
      .toSink(MemorySink("tagged_seq_out"))
    val (w0a, w0b) = workerStream(0, 100).splitAt(50)
    val (w1a, w1b) = workerStream(1, 100).splitAt(50)
    def tag(svs: Seq[SeqValue]): Seq[Tagged] =
      svs.map(sv => Tagged(sv.value % 2, sv.key, sv.value, sv.seq))
    mem.addData(tag(w0a ++ w1a))
    handle.processAllAvailable()
    mem.addData(tag(w0b ++ w1b))
    handle.processAllAvailable()
    val got = spark.sql("SELECT _1._1, _1._2, _1._3 FROM tagged_seq_out")
      .as[(String, Long, Long)].collect()
    handle.stop()
    // every message passed its parity check, across both micro-batches
    assert(got.length == 200)
    assert(got.map(_._3).toSet == Set(0L, 1L))
  }

  test("control: a global key_by WOULD merge the workers' streams") {
    import spark.implicits._
    twoWorkerSource()
      .keyBy(_.key)
      .to(CheckSequence)(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
      .toSink(MemorySink("global_seq_out"))
    // The batch sink registers a lazy view; force execution.
    val ex = intercept[Exception](spark.table("global_seq_out").count())
    assert(ex.getMessage.contains("mixed parities") ||
      Option(ex.getCause).exists(_.getMessage.contains("mixed parities")))
  }
}
