package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import WindowTestKit.seconds

/** Streaming exact-dedup ([[Pipeline.dedupBy]] /
  * [[Pipeline.dedupByWithin]]) — Spark's dropDuplicates state semantics
  * surfaced through the DSL:
  *  - unbounded dedup suppresses re-occurrences across micro-batches
  *    forever (state = one entry per distinct fingerprint);
  *  - within-watermark dedup suppresses only while the fingerprint is
  *    younger than the horizon — once the watermark passes it, the entry
  *    is EVICTED and a later duplicate is re-emitted (bounded state, the
  *    100 TB trade).
  */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  test("dedupBy keeps first occurrence across micro-batches") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)] // (payload, ts)
    val handle = Graft.source("dd", DatasetSource(in.toDS(), (p: (String, Long)) => p._2))
      .dedupBy(_._1)
      .toSink(MemorySink("dd_out"))
    try {
      in.addData(("a", 1L), ("b", 2L), ("a", 3L))
      handle.processAllAvailable()
      in.addData(("a", 4L), ("c", 5L), ("b", 6L))
      handle.processAllAvailable()
    } finally handle.stop()
    val kept = spark.sql("SELECT _1._1, _1._2 FROM dd_out")
      .as[(String, Long)].collect().toSeq.sorted
    assert(kept == Seq(("a", 1L), ("b", 2L), ("c", 5L)))
  }

  test("dedupByWithin evicts expired fingerprints (bounded state)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val handle = Graft.source("ddw", DatasetSource(in.toDS(), (p: (String, Long)) => p._2))
      .dedupByWithin(_._1, seconds(10))
      .toSink(MemorySink("ddw_out"))
    try {
      in.addData(("a", seconds(1)), ("b", seconds(2)))
      handle.processAllAvailable()
      // dup inside the horizon: suppressed
      in.addData(("a", seconds(5)))
      handle.processAllAvailable()
      // advance the watermark far past a's expiry...
      in.addData(("z", seconds(60)))
      handle.processAllAvailable()
      // ...then a re-arrives: its entry expired, so it is re-emitted
      in.addData(("a", seconds(65)))
      handle.processAllAvailable()
    } finally handle.stop()
    val kept = spark.sql("SELECT _1._1, _1._2 FROM ddw_out")
      .as[(String, Long)].collect().toSeq.sorted
    assert(kept == Seq(
      ("a", seconds(1)), ("a", seconds(65)), ("b", seconds(2)), ("z", seconds(60))))
  }

  test("out-of-order input: streaming keeps the KEY exactly once (representative may differ from batch)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val handle = Graft.source("ddo", DatasetSource(in.toDS(), (p: (String, Long)) => p._2))
      .dedupBy(_._1)
      .toSink(MemorySink("ddo_out"))
    try {
      in.addData(("x", 30L), ("x", 10L)) // later event time arrives first
      handle.processAllAvailable()
    } finally handle.stop()
    val kept = spark.sql("SELECT _1._1, _1._2 FROM ddo_out")
      .as[(String, Long)].collect().toSeq
    // Streaming keeps exactly one x — first ARRIVAL, so possibly ts=30;
    // the batch replay (next test) would keep ts=10. Same key set, maybe
    // a different representative: the documented divergence.
    assert(kept.map(_._1) == Seq("x"))
  }

  test("batch dedupBy keeps the event-time-first occurrence") {
    import spark.implicits._
    val data = spark.createDataset(Seq(("x", 30L), ("x", 10L), ("y", 5L), ("x", 20L)))
    val kept = Graft.source("ddb", DatasetSource(data, (p: (String, Long)) => p._2))
      .dedupBy(_._1)
      .dataset.collect().map(_._1).toSeq.sorted
    assert(kept == Seq(("x", 10L), ("y", 5L)))
  }
}
