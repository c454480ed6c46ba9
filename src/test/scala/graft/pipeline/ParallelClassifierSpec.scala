package graft.pipeline

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

object ParallelClassifierFixtures {
  /** Port of the reference's classify computation
    * (testing/correctness/apps/parallel_classifier/parallel_classifier.py:
    * 56-60: tag every message with the PID of the worker that processed
    * it). The Spark analogue of a worker identity at a keyed stage is the
    * shuffle-partition/task id — stable within one batch stage, distinct
    * across the parallel tasks the key routing spreads work over. Runs as
    * a keyed StateComputation so the tag is taken AFTER the hash routing
    * (the thing the reference app exists to observe), not where the data
    * already was. */
  object Classify extends StateComputation[Long, (Long, Int), Null] {
    override val name = "classify"
    def initialState(): Null = null
    def apply(e: Long, st: Null): ComputationResult[(Long, Int)] =
      ComputationResult.One((e, org.apache.spark.TaskContext.getPartitionId()))
  }
}

/** parallel_classifier ported: the reference app keys a stream, classifies
  * on whatever worker the key routing picked, and its validator asserts
  * two invariants (validate.py:14-17): every input item reaches the sink
  * exactly once, and the observed worker set has the expected size — i.e.
  * the key routing actually PARALLELIZED the work rather than serializing
  * it through one worker. Here the hash routing is Spark's shuffle
  * (SURVEY §2.2 #16), so the invariants become: the output multiset is
  * exactly the input, and the keyed stage's rows were processed across
  * every shuffle partition (4 in the test session; 3000 distinct keys
  * make an untouched partition impossible under the fixed hash). */
class ParallelClassifierSpec extends AnyFunSuite {
  import ParallelClassifierFixtures._
  private lazy val spark = TestSpark.spark

  test("keyed classify preserves every item and spreads across all shuffle partitions") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val n = 3000L
    val src = spark.range(n).as[Long]
    // AQE's partition coalescing folds a 3000-row shuffle into ONE task —
    // the right call at scale (it right-sizes tasks to the advisory
    // bytes), but it would mask the invariant under test here, which is
    // the hash ROUTING's spread. Pin coalescing off for this query only.
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    val got =
      try Graft.source("parallel-classifier", DatasetSource(src, (_: Long) => 0L))
        .keyBy(_.toString)
        .to(Classify)(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt))
        .dataset.collect().map(_._1)
      finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    // invariant 1 (n_input_items == n_output_ids): exactly-once through
    // the routed stage
    assert(got.map(_._1).sorted.toSeq === (0L until n).toSeq)
    // invariant 2 (n_worker_pids == n_workers): the hash routing used the
    // stage's full parallelism — deterministic here (fixed hash, fixed
    // key set, fixed partition count)
    val parts = got.map(_._2).distinct.sorted.toSeq
    val expected = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(parts.size === expected,
      s"keyed work landed on ${parts.size} of $expected shuffle partitions ($parts)")
  }
}
