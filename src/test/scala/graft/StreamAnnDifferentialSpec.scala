package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AnnWire
import graft.pipeline._

/** The stream_ann cell-probe (per-cell keyed state scoring wire-format
  * probes against stored code words — [[StreamBench.AnnCellProbe]])
  * ships the [[AnnWire]] bit-packed uint16 contract (VERDICT r8 #5).
  * This differential replays the exact rows stream_ann stages through
  * the DSL in batch mode and pins, per (query, probed cell):
  *  - the winner's distance BIT-EXACTLY against [[AnnWire.score]]
  *    applied to independently packed payloads/words collected here —
  *    the wire contract itself, integer-exact by construction, and
  *  - the winner's identity against the float64 batch ADC argmin
  *    ([[graft.operators.Similarity.annAdcScores]]) — proving the
  *    uint16 quantization (≤ (hi−lo)/16 384 per distance, two orders
  *    below PQ's own distortion) never flips a winner on this corpus.
  */
class StreamAnnDifferentialSpec extends AnyFunSuite {
  private lazy val spark = pipeline.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming cell-probe winners == packed-uint16 ADC argmins, bit-exact") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    implicit val annEnc: Encoder[(Long, Long, Long, Array[Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    implicit val outEnc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    import spark.implicits._

    // the same rows in stream_ann's wire format (AnnWire packing on both
    // legs, exactly as annStagedOpt builds them), replayed in BATCH mode
    // (index rows at ts 0 sort before probes within each key)
    val idxRows = graft.operators.Similarity.buildIvfPqIndex(spark, dir)
      .select(col("cent_id"), col("neighbor_id"),
        array((0 until AnnWire.Tables).map(m => col(s"code_$m").cast("int")): _*)
          .as("codes"))
      .as[(Long, Long, Seq[Int])]
      .map { case (cent, id, codes) =>
        (0L, cent, id, Array(AnnWire.packCodes(codes.toArray)), 0L) }
    val probeRows = graft.operators.Similarity.annProbePayloads(spark, dir)
      .select(col("query_id"), col("cent_id"), col("payload"))
      .as[(Long, Long, Seq[Double])]
      .map { case (q, cent, pl) =>
        (1L, cent, q, AnnWire.packProbe(pl.head, pl.drop(1).toArray),
          1000000000000000L) }

    // expected: per (query, probed cell), the argmin of AnnWire.score
    // over the cell's packed words — computed here independently from
    // the staged rows, so the assertion pins the wire contract, not the
    // implementation against itself
    val wordsByCell = idxRows.collect()
      .map(r => (r._2, (r._3, r._4(0))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    val expected = probeRows.collect().flatMap { case (_, cell, q, payload, _) =>
      wordsByCell.get(cell).map { members =>
        val (d, id) = members
          .map { case (id, w) => (AnnWire.score(payload, w), id) }
          .minBy(identity)
        ((q, cell), (d, id))
      }
    }.toMap

    val merged = idxRows.union(probeRows)
    implicit val inEnc: Encoder[(Long, Long, Long, Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    val got = Graft.source("ann-diff",
        DatasetSource(merged, (e: (Long, Long, Long, Array[Long], Long)) => e._5))
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
      s"streaming winners diverged from the packed wire contract: " +
        s"got ${gotBag.size} distinct, expected ${expBag.size}")
    assert(got.nonEmpty)

    // quality guard: uint16 quantization must not flip any winner vs the
    // float64 batch argmins
    val exactWinners = graft.operators.Similarity.annAdcScores(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).minBy(identity)._2).toMap
    val flipped = expected.collect {
      case (qc, (_, id)) if exactWinners.get(qc).exists(_ != id) => qc
    }
    assert(flipped.isEmpty,
      s"uint16 quantization flipped ${flipped.size} cell winners: ${flipped.take(5)}")
  }

  test("packCodes rejects code ids past the cost-table width (ADVICE r9)") {
    // score() indexes the flat m*Codes+c table, so a 1-based id in
    // (Codes, 256] would silently read a NEIGHBORING subspace's entry —
    // it must fail at pack time, not scramble distances
    import graft.functions.AnnWire
    val ok = Array.fill(AnnWire.Tables)(AnnWire.Codes) // max legal id
    AnnWire.packCodes(ok) // must not throw
    val bad = ok.clone(); bad(3) = AnnWire.Codes + 1
    val e = intercept[IllegalArgumentException](AnnWire.packCodes(bad))
    assert(e.getMessage.contains("code id"))
    val zero = ok.clone(); zero(0) = 0 // below the 1-based floor
    intercept[IllegalArgumentException](AnnWire.packCodes(zero))
  }
}
