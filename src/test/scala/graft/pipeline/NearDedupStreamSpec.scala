package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash

/** Streaming NEAR-dup dedup ([[Pipeline.nearDedupBy]]): SimHash collapses
  * near-identical payloads to one exact state-store key, so duplicates
  * that are not byte-identical are still suppressed across micro-batches
  * — the streaming complement of the batch d_simhash_pairs operator. */
class NearDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  private val base =
    "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew strong coffee and twelve jugs of milk wait quietly near the door"
  // appending an already-present token leaves the DISTINCT token set —
  // and therefore the signature — unchanged by construction
  private val nearDup = base + " the quick the"
  private val distinctDoc =
    "completely unrelated text about glaciers carving deep valleys " +
      "through ancient granite under pale winter light"

  test("near-identical docs collapse to one signature; distinct docs survive") {
    assert(SimHash.signature(base) === SimHash.signature(nearDup),
      "test construction: repeated tokens must not move the signature")
    assert(SimHash.signature(base) !== SimHash.signature(distinctDoc))

    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)] // (id, text, ts)
    val handle = Graft.source("nd",
        DatasetSource(in.toDS(), (p: (Long, String, Long)) => p._3))
      .nearDedupBy(_._2)
      .toSink(MemorySink("nd_out"))
    try {
      in.addData((1L, base, 1L))
      handle.processAllAvailable()
      // a LATER micro-batch carries the near-dup: suppressed by state
      in.addData((2L, nearDup, 2L), (3L, distinctDoc, 3L))
      handle.processAllAvailable()
    } finally handle.stop()
    val kept = spark.sql("SELECT _1._1 FROM nd_out")
      .as[Long].collect().toSeq.sorted
    assert(kept === Seq(1L, 3L), "near-dup must be dropped, distinct doc kept")
  }
}
