package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** The stream_ann cell-probe (per-cell keyed state scoring wire-format
  * probes against stored codes — [[StreamBench.AnnCellProbe]]) must
  * compute the SAME ADC distances as the batch IVF-PQ search: same
  * lookup tables, same left-to-right add order, bit-equal doubles. This
  * differential runs the probe through the DSL in batch mode over the
  * exact index/probe rows stream_ann stages, and compares every
  * (query, cell) winner against the batch scorer's per-cell argmin. */
class StreamAnnDifferentialSpec extends AnyFunSuite {
  private lazy val spark = pipeline.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming cell-probe winners == batch ADC per-cell argmins, bit-exact") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    implicit val annEnc: Encoder[(Long, Long, Long, Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    implicit val outEnc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)

    // expected: per (query, probed cell), the min-(adist, neighbor) row
    val expected = operators.Similarity.annAdcScores(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getLong(2))))
      .groupBy(_._1)
      .map { case (qc, rows) => qc -> rows.map(_._2).minBy(identity) }

    // the same rows in stream_ann's wire format, replayed in BATCH mode
    // (index rows at ts 0 sort before probes within each key)
    val codeArr = (0 until operators.Similarity.PqSub)
      .map(m => s"cast(code_$m as double)").mkString("array(", ", ", ")")
    val idxRows = operators.Similarity.buildIvfPqIndex(spark, dir)
      .select(lit(0L).as("kind"), col("cent_id"), col("neighbor_id").as("id"),
        expr(codeArr).as("payload"), lit(0L).as("ts"))
    val probeRows = operators.Similarity.annProbePayloads(spark, dir)
      .select(lit(1L).as("kind"), col("cent_id"), col("query_id").as("id"),
        col("payload"), lit(1000000000000000L).as("ts"))
    val merged = idxRows.union(probeRows)
      .as[(Long, Long, Long, Array[Double], Long)]

    implicit val inEnc: Encoder[(Long, Long, Long, Array[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    val got = Graft.source("ann-diff",
        DatasetSource(merged, (e: (Long, Long, Long, Array[Double], Long)) => e._5))
      .map(e => (e._1, e._2, e._3, e._4))
      .keyBy(_._2.toString)
      .to(StreamBench.AnnCellProbe)
      .dataset
      .collect()
      .map(r => (r._1._1, r._1._2, r._1._3)) // (query_id, bestId, bestD)

    // the cell id isn't in the probe output, so compare as multisets of
    // (query -> winner) occurrences: one winner per probed non-empty cell
    val gotBag = got.groupBy(x => (x._1, x._3, x._2)).view.mapValues(_.length).toMap
    val expBag = expected.toSeq
      .map { case ((q, _), (d, id)) => (q, d, id) }
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(gotBag === expBag,
      s"streaming winners diverged: got ${gotBag.size} distinct, expected ${expBag.size}")
    assert(got.nonEmpty)
  }
}
