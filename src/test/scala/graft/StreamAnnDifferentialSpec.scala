package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** The stream_ann cell-probe (per-cell keyed state scoring wire-format
  * probes against stored codes — [[StreamBench.AnnCellProbe]]) ships its
  * ADC tables as FLOAT32 (the VERDICT r8 #5 wire contract) and scores by
  * widening each table entry to double in the batch scorer's add order
  * (qrr + ((t0+t1)+…)). This differential replays the exact rows
  * stream_ann stages through the DSL in batch mode and pins, per
  * (query, probed cell):
  *  - the winner's distance BIT-EXACTLY against the same widened-float32
  *    fold computed independently from the staged payloads (the wire
  *    contract itself), and
  *  - the winner's identity against the float64 batch ADC argmin
  *    ([[graft.operators.Similarity.annAdcScores]]) — proving the ~2⁻²⁴
  *    quantization never flips a winner on this corpus (it sits far
  *    below PQ's own distortion).
  */
class StreamAnnDifferentialSpec extends AnyFunSuite {
  private lazy val spark = pipeline.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming cell-probe winners == widened-float32 ADC argmins, bit-exact") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    implicit val annEnc: Encoder[(Long, Long, Long, Array[Float], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    implicit val outEnc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)

    val PqSub = operators.Similarity.PqSub
    val PqK = operators.Similarity.PqK

    // the same rows in stream_ann's wire format (float32 payloads on both
    // legs, exactly as annStagedOpt casts them), replayed in BATCH mode
    // (index rows at ts 0 sort before probes within each key)
    val codeArr = (0 until PqSub)
      .map(m => s"cast(code_$m as float)").mkString("array(", ", ", ")")
    val idxRows = operators.Similarity.buildIvfPqIndex(spark, dir)
      .select(lit(0L).as("kind"), col("cent_id"), col("neighbor_id").as("id"),
        expr(codeArr).as("payload"), lit(0L).as("ts"))
    val probeRows = operators.Similarity.annProbePayloads(spark, dir)
      .select(lit(1L).as("kind"), col("cent_id"), col("query_id").as("id"),
        col("payload").cast("array<float>").as("payload"),
        lit(1000000000000000L).as("ts"))

    // expected: per (query, probed cell), the argmin of the SAME
    // widened-float32 fold the streaming probe runs — computed here
    // independently from the staged rows, so the assertion pins the wire
    // contract, not the implementation against itself
    val codesByCell = idxRows.collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getSeq[Float](3).map(_.toInt).toArray)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    val expected = probeRows.collect().flatMap { r =>
      val (cell, q, p) = (r.getLong(1), r.getLong(2), r.getSeq[Float](3).toArray)
      codesByCell.get(cell).map { members =>
        val scored = members.map { case (id, c) =>
          var t: Double = p(1 + (c(0) - 1)).toDouble
          var m = 1
          while (m < PqSub) { t += p(1 + m * PqK + (c(m) - 1)).toDouble; m += 1 }
          (p(0).toDouble + t, id)
        }
        val (d, id) = scored.minBy(identity)
        ((q, cell), (d, id))
      }
    }.toMap

    val merged = idxRows.union(probeRows)
      .as[(Long, Long, Long, Array[Float], Long)]
    implicit val inEnc: Encoder[(Long, Long, Long, Array[Float])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    val got = Graft.source("ann-diff",
        DatasetSource(merged, (e: (Long, Long, Long, Array[Float], Long)) => e._5))
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
      s"streaming winners diverged from the float32 wire contract: " +
        s"got ${gotBag.size} distinct, expected ${expBag.size}")
    assert(got.nonEmpty)

    // quality guard: quantization must not flip any winner vs the
    // float64 batch argmins
    val exactWinners = operators.Similarity.annAdcScores(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).minBy(identity)._2).toMap
    val flipped = expected.collect {
      case (qc, (_, id)) if exactWinners.get(qc).exists(_ != id) => qc
    }
    assert(flipped.isEmpty,
      s"float32 quantization flipped ${flipped.size} cell winners: ${flipped.take(5)}")
  }
}
