package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TestSpark

/** Proves q_events_session_native's scale claim: the same
  * `session_window` aggregation runs under Structured Streaming — and
  * the STATE STORE merges a session that arrives split across
  * micro-batches (the thing the sort-based window-function form
  * structurally cannot do). */
class SessionWindowStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  test("session_window merges sessions across micro-batches in streaming") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (user_id, ts_sec)
    val sessions = in.toDS()
      .select(col("_1").as("user_id"), expr("timestamp_seconds(_2)").as("ts"),
        col("_2").as("ts_sec"))
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min("ts_sec").as("start_sec"), max("ts_sec").as("end_sec"))
      .select("user_id", "n_events", "start_sec", "end_sec")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // One session split across two micro-batches (gap 10 min < 30 min
      // threshold), then a >30 min gap opens a second session, then a
      // far-future event closes the watermark over everything.
      in.addData((1L, 1000L), (1L, 1300L))
      q.processAllAvailable()
      in.addData((1L, 1900L)) // 10 min after 1300 — SAME session, new batch
      q.processAllAvailable()
      in.addData((1L, 5000L)) // ~52 min gap — new session
      q.processAllAvailable()
      in.addData((2L, 100000L)) // advance watermark: emit user 1's sessions
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events, start_sec, end_sec FROM sess_out")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      // The split session merged to one row of 3 events spanning 1000-1900.
      assert(rows == Seq((1L, 3L, 1000L, 1900L), (1L, 1L, 5000L, 5000L)).sorted)
    } finally q.stop()
  }
}
