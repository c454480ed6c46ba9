package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Fixtures at top level: state shipped through the store must not
  * capture the ScalaTest spec (not serializable). */
object StateIntrospectionFixtures {
  final class SumCount extends Serializable { var sum: Long = 0; var n: Long = 0 }
  object SumCountComp extends StateComputation[(Long, Long, Long), (Long, Long), SumCount] {
    override val name = "sum count"
    def initialState(): SumCount = new SumCount
    def apply(e: (Long, Long, Long), st: SumCount): ComputationResult[(Long, Long)] = {
      st.sum += e._2; st.n += 1
      ComputationResult.One((e._1, st.sum))
    }
  }
}

/** [[StateIntrospection.keyedComputationState]] — the recovery gate's
  * double-apply detector (VERDICT r14 next #2) as a unit contract: read a
  * finished flatMapGroupsWithState query's final keyed state back from
  * its checkpoint through Spark's state-store reader, decode the kryo
  * blob, and surface the USER state object per key. The bench asserts
  * per-key (sum, n) equality across a killed and an uninterrupted chain;
  * this spec pins the decode itself against a driver-side recomputation,
  * across batches (so the state round-tripped the store at least once)
  * and across both trips of the same checkpoint (stable reads). */
class StateIntrospectionSpec extends AnyFunSuite {
  import StateIntrospectionFixtures._

  private implicit val outEnc: org.apache.spark.sql.Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  test("decodes the final per-key user state from a finished query's checkpoint") {
    val spark = TestSpark.spark
    implicit val ss: SparkSession = spark
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft_introspect_ckpt").toString
    val in = MemoryStream[(Long, Long, Long)]
    val h = Graft.source("introspect", DatasetSource(in.toDS(), (e: (Long, Long, Long)) => e._3))
      .keyBy(_._1.toString)
      .to(SumCountComp)
      .toSink(EmptySink[(Long, Long)](), checkpointLocation = Some(ckpt))
    try {
      // two batches, so every key's state has round-tripped the store at
      // least once before its second update — the decode must see the
      // CUMULATIVE state, not just the last batch's delta
      in.addData((1L, 10L, 1L), (2L, 5L, 2L), (1L, 7L, 3L))
      h.processAllAvailable()
      in.addData((2L, 2L, 4L), (3L, 100L, 5L))
      h.processAllAvailable()
    } finally h.stop()

    def decoded(): Map[String, (Long, Long)] =
      StateIntrospection.keyedComputationState(spark, ckpt).map {
        case (k, st: SumCount) => k -> ((st.sum, st.n))
        case (k, other) => fail(s"key $k decoded to ${other.getClass}")
      }.toMap
    val expected = Map("1" -> ((17L, 2L)), "2" -> ((7L, 2L)), "3" -> ((100L, 1L)))
    assert(decoded() === expected)
    // stable across reads of the same checkpoint (the bench reads each
    // chain once; a flaky read would fake a double-apply)
    assert(decoded() === expected)
    // the driver-collect bound is ENFORCED (VERDICT r15 next #6): a
    // checkpoint with more live keys than maxKeys fails with a sizing
    // message instead of a silent driver OOM, and the bound is
    // caller-overridable (this checkpoint holds 3 keys). The message
    // names the BOUND, not the exact count — the single-pass check
    // (ADVICE r16: no count()-then-collect() double scan) proves
    // over-bound by taking one extra row, it never counts the rest
    val e = intercept[IllegalArgumentException](
      StateIntrospection.keyedComputationState(spark, ckpt, maxKeys = 2))
    assert(e.getMessage.contains("more than 2 live keys"))
    assert(StateIntrospection.keyedComputationState(spark, ckpt, maxKeys = 3)
      .size === 3)
  }

  test("a checkpoint without state fails loudly, not with a wrong-column read") {
    val spark = TestSpark.spark
    intercept[Exception](StateIntrospection.keyedComputationState(
      spark, Files.createTempDirectory("graft_introspect_empty").toString))
  }
}
