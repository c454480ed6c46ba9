package graft

import org.apache.spark.sql.SparkSession

/** Streaming-throughput benchmark, reported alongside the batch queries
  * (keys prefixed `stream_`, values in seconds like every other entry).
  * Filled in by the streaming core build — see Task: streaming bench.
  */
object StreamBench {
  def run(spark: SparkSession, sfDir: String): Seq[(String, Double)] =
    Seq.empty
}
