package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TestSpark

/** Proves q_events_interval_join's streaming claim: the same
  * click→purchase interval join runs as a Spark STREAM-STREAM join —
  * matches pair up across micro-batch boundaries (a click buffered in
  * the join state store meets a purchase arriving later), and the
  * watermark + time-range condition bound both sides' buffered state
  * (the property that makes the join runnable forever at 100 TB/day).
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  test("stream-stream interval join matches across micro-batches") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Long)]    // (user, click_id, ts_sec)
    val purchases = MemoryStream[(Long, Long, Long)] // (user, purchase_id, ts_sec)
    val c = clicks.toDS()
      .select(col("_1").as("user_id"), col("_2").as("click_id"),
        expr("timestamp_seconds(_3)").as("cts"))
      .withWatermark("cts", "1 minute")
    val p = purchases.toDS()
      .select(col("_1").as("p_user"), col("_2").as("purchase_id"),
        expr("timestamp_seconds(_3)").as("pts"))
      .withWatermark("pts", "1 minute")
    val joined = c.join(p,
      col("user_id") === col("p_user") &&
      col("pts") >= col("cts") &&
      col("pts") < col("cts") + expr("interval 30 minutes"))
      .select("click_id", "purchase_id", "user_id")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 100L, 1000L), (2L, 101L, 1000L))
      q.processAllAvailable()
      // purchase arrives TWO BATCHES after its click: the click must
      // still be buffered in the join state
      purchases.addData((1L, 200L, 1600L)) // 10 min after click 100 → match
      q.processAllAvailable()
      purchases.addData((2L, 201L, 4000L)) // 50 min after click 101 → outside window
      clicks.addData((1L, 102L, 3900L))    // 100 s before purchase 201? wrong user — no
      q.processAllAvailable()
      // advance both watermarks so earlier state can be dropped
      clicks.addData((9L, 999L, 100000L))
      purchases.addData((9L, 998L, 100000L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT click_id, purchase_id, user_id FROM ssj_out")
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(rows == Seq((100L, 200L, 1L), (999L, 998L, 9L)))
    } finally q.stop()
  }
}
