package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import StreamingFixtures.CountWord

/** The 100 TB streaming-state path: the default HDFS-backed state store
  * keeps every key's state on-heap per executor, which caps total state at
  * cluster memory; RocksDB spills to local disk and is the provider a
  * large deployment runs (the reference's equivalent concern is its
  * per-worker `_state_map` + event-log spill, core/topology/runner.pony:320).
  * The engine's state wrappers are provider-agnostic (opaque bytes via the
  * Kryo codec) — this spec proves the same pipeline + checkpoint restart
  * works under RocksDB.
  */
class RocksDBStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("stateful pipeline runs and restarts on the RocksDB state store") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", Provider)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocks_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_rocks_out").toString
    try {
      val words = MemoryStream[String]
      def pipeline() = Graft
        .source("rocks", DatasetSource(words.toDS(), (_: String) => 0L))
        .keyBy(identity)
        .to(CountWord)
      val h1 = pipeline().toSink(IdempotentParquetSink(out), checkpointLocation = Some(ckpt))
      words.addData("a", "b", "a")
      h1.processAllAvailable()
      h1.stop()

      // Restart from the RocksDB-backed checkpoint: running totals resume.
      val h2 = pipeline().toSink(IdempotentParquetSink(out), checkpointLocation = Some(ckpt))
      words.addData("a", "c")
      h2.processAllAvailable()
      h2.stop()

      val rows = spark.read.parquet(out)
        .selectExpr("_1._1 AS word", "_1._2 AS cnt").as[(String, Long)]
        .collect().toSeq.sorted
      // State carried across the restart: a → 1,2 then resumes at 3.
      assert(rows == Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 1L), ("c", 1L)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
