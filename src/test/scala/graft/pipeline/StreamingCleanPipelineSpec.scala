package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The composed STREAMING training-data ingest — the end-to-end shape a
  * corpus pipeline actually runs, as one DSL topology:
  *
  *   source → quality score (stateless map) → quality filter →
  *   dedupBy(fingerprint) → idempotent parquet sink
  *
  * i.e. t_quality + t_fingerprint + d_exact's first-wins dedup, but as a
  * LIVE stream with exactly-once delivery: the same corpus arriving
  * across several micro-batches (with cross-batch duplicates) lands in
  * parquet exactly once per surviving fingerprint, and a query restart
  * mid-corpus neither loses nor duplicates rows (replayable source +
  * batchId-idempotent sink + dedup state in the checkpoint).
  */
object StreamingCleanFixtures {
  // (docId, text) → scored (docId, fp, nTokens); top-level so the closure
  // shipped to executors does not capture the spec (not serializable)
  def score(d: (Long, String)): (Long, String, Int) = {
    val norm = d._2.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
    (d._1, norm, norm.split(" ").count(_.nonEmpty))
  }
}

class StreamingCleanPipelineSpec extends AnyFunSuite {
  import StreamingCleanFixtures.score
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  test("clean-corpus pipeline: score, filter, dedup, sink — across batches and a restart") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_clean_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_clean_out").toString
    val docs = MemoryStream[(Long, String)]
    def pipeline() = Graft
      .source("clean", DatasetSource(docs.toDS(), (d: (Long, String)) => d._1))
      .map(score)
      .filter(_._3 >= 2) // quality gate: ≥ 2 tokens
      .dedupBy(_._2)     // exact dedup on normalized text
    def start() = pipeline().toSink(
      IdempotentParquetSink(out), checkpointLocation = Some(ckpt))

    val h1 = start()
    try {
      docs.addData((1L, "The quick fox!"), (2L, "the QUICK fox"), (3L, "lone"))
      h1.processAllAvailable() // 2 dups → one kept; "lone" fails quality
      docs.addData((4L, "brand new doc"), (5L, "the quick fox."))
      h1.processAllAvailable() // cross-batch dup of fp("the quick fox")
    } finally h1.stop()

    // Restart mid-corpus from the checkpoint: dedup state must survive.
    val h2 = start()
    try {
      docs.addData((6L, "The Quick Fox"), (7L, "another fresh doc"))
      h2.processAllAvailable()
    } finally h2.stop()

    val kept = spark.read.parquet(out)
      .selectExpr("_1._1 AS doc_id", "_1._2 AS fp").as[(Long, String)]
      .collect().toSeq.sorted
    assert(kept == Seq(
      (1L, "the quick fox"), (4L, "brand new doc"), (7L, "another fresh doc")))
  }
}
