package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Checkpointed restart + effectively-once sink — the Spark equivalent of
  * the reference's 2PC connector sink + checkpoint/recovery
  * (core/sink/connector_sink/connector_sink.pony:128-135; the
  * effectively-once torture harness testing/correctness/scripts/
  * effectively-once/). A query restarted from its checkpoint must (a)
  * resume per-key state (running totals continue, not reset) and (b) not
  * duplicate output (each micro-batch lands in its own batch_id directory;
  * a replayed batch overwrites the identical directory). */
class PipelineRestartSpec extends AnyFunSuite {
  import StreamingFixtures._

  test("restart from checkpoint resumes state; idempotent sink never duplicates") {
    val spark = TestSpark.spark
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val out = Files.createTempDirectory("graft_out").toString

    val words = MemoryStream[String]
    def pipeline() = Graft
      .source("restart-wc", DatasetSource(words.toDS(), (_: String) => 0L))
      .keyBy(identity)
      .to(CountWord)

    // First run: two batches, then stop.
    val h1 = pipeline().toSink(IdempotentParquetSink(out), checkpointLocation = Some(ckpt))
    words.addData("a", "b", "a")
    h1.processAllAvailable()
    words.addData("a", "c")
    h1.processAllAvailable()
    h1.stop()

    // Restart from the same checkpoint; state must carry over.
    val h2 = pipeline().toSink(IdempotentParquetSink(out), checkpointLocation = Some(ckpt))
    words.addData("a", "b")
    h2.processAllAvailable()
    h2.stop()

    val rows = spark.read.parquet(out)
      .selectExpr("_1._1 AS word", "_1._2 AS cnt").as[(String, Long)]
      .collect().toSeq.sorted
    // Running totals across all three batches, each word occurrence exactly
    // once: a→1,2 | a→3 | a→4 ; b→1 | b→2 ; c→1.
    assert(rows == Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 1L), ("b", 2L), ("c", 1L)))
    // Batches landed in distinct batch_id partitions (0,1 then 2).
    val batchDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted
    assert(batchDirs.length == 3)
  }
}
