package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The autoscale story (reference: core/autoscale/autoscale.pony grow/
  * shrink with live key migration). Spark pins stateful-operator
  * parallelism into the checkpoint at first query start — there is no
  * live migration. This spec makes the restriction LOUD and proves the
  * supported mitigation: for a replayable source, rescale = fresh
  * checkpoint + bounded replay, which rebuilds identical state at the
  * new parallelism (the sink side stays exactly-once via
  * IdempotentParquetSink / TwoPhaseCommitSink batch replay rules). */
object RescaleFixtures {
  final class Tot extends Serializable { var n: Long = 0 }
  /** Running per-key occurrence count over (word, seq) rows. */
  object WordSeqTotal extends StateComputation[(String, Long), (String, Long), Tot] {
    override val name = "word seq total"
    def initialState(): Tot = new Tot
    def apply(in: (String, Long), st: Tot): ComputationResult[(String, Long)] = {
      st.n += 1
      ComputationResult.One((in._1, st.n))
    }
  }
}

class RescaleSpec extends AnyFunSuite {
  import StreamingFixtures._
  import RescaleFixtures._

  test("checkpointed state parallelism is pinned: a conf change does not rescale") {
    val spark = TestSpark.spark
    implicit val ss: SparkSession = spark
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val ckpt = Files.createTempDirectory("rescale_pin").toString
      val out = Files.createTempDirectory("rescale_pin_out").toString
      val words = MemoryStream[String]
      def pipeline() = Graft
        .source("rescale-pin", DatasetSource(words.toDS(), (_: String) => 0L))
        .keyBy(identity)
        .to(CountWord)

      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val h1 = pipeline().toSink(IdempotentParquetSink(out), Some(ckpt))
      words.addData("a", "b")
      h1.processAllAvailable()
      val p1 = h1.query.get.lastProgress.stateOperators.head.numShufflePartitions
      h1.stop()
      assert(p1 == 4)

      // "grow" by conf alone — Spark silently keeps the checkpointed 4
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val h2 = pipeline().toSink(IdempotentParquetSink(out), Some(ckpt))
      words.addData("a", "c")
      h2.processAllAvailable()
      val p2 = h2.query.get.lastProgress.stateOperators.head.numShufflePartitions
      h2.stop()
      assert(p2 == 4, "state parallelism must stay pinned to the checkpoint")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("mitigation: replayable source + fresh checkpoint rebuilds state at the new parallelism") {
    val spark = TestSpark.spark
    implicit val ss: SparkSession = spark
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // a replayable source: 200 words across 4 parquet files
      val staged = Files.createTempDirectory("rescale_src").toString
      (0 until 200).map(i => (s"w${i % 7}", i.toLong)).toDF("word", "seq")
        .repartition(4).write.mode("overwrite").parquet(staged)
      def pipeline() = Graft
        .source("rescale-replay", ParquetReplaySource[(String, Long)](
          staged,
          (r: Row) => (r.getString(0), r.getLong(1)),
          (r: Row) => r.getLong(1),
          maxFilesPerTrigger = 2))
        .keyBy(_._1)
        .to(WordSeqTotal)(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))

      def finalTotals(view: String): Map[String, Long] = spark
        .sql(s"SELECT _1._1, _1._2 FROM $view").as[(String, Long)]
        .collect().groupBy(_._1).map { case (w, rows) => w -> rows.map(_._2).max }

      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val h1 = pipeline().toSink(MemorySink("rescale_a"),
        Some(Files.createTempDirectory("rescale_c1").toString))
      h1.processAllAvailable()
      val p1 = h1.query.get.lastProgress.stateOperators.head.numShufflePartitions
      h1.stop()

      // rescale: new checkpoint, higher parallelism, full replay
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val h2 = pipeline().toSink(MemorySink("rescale_b"),
        Some(Files.createTempDirectory("rescale_c2").toString))
      h2.processAllAvailable()
      val p2 = h2.query.get.lastProgress.stateOperators.head.numShufflePartitions
      h2.stop()

      assert(p1 == 4 && p2 == 8) // the rescale actually happened
      val a = finalTotals("rescale_a")
      assert(a == finalTotals("rescale_b")) // identical state at 2x parallelism
      assert(a.values.sum == 200L) // every word counted exactly once
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
