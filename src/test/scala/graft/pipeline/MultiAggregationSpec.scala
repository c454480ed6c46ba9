package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

object MultiAggregationFixtures {
  /** multi_aggregation.pony:61-71 Event — event time ns, u32 data, key. */
  final case class AggEvent(eventTimeNs: Long, data: Long, key: String)

  final class EvTotal extends Serializable { var sum: Long = 0 }

  /** SumEvents / SumEvents2 (:79-124): windowed sum with zero-sum
    * suppression; the output event's time IS the window end. */
  final class SumEvents(override val name: String)
      extends Aggregation[AggEvent, AggEvent, EvTotal] {
    def initialAccumulator(): EvTotal = new EvTotal
    def update(e: AggEvent, t: EvTotal): Unit = t.sum += e.data
    def combine(a: EvTotal, b: EvTotal): EvTotal = {
      val t = new EvTotal; t.sum = a.sum + b.sum; t
    }
    def output(key: String, windowEndTs: Long, t: EvTotal): Option[AggEvent] =
      if (t.sum > 0) Some(AggEvent(windowEndTs, t.sum, key)) else None
  }

  /** EventDecoder (:139-151): 4 chars ms + 4 chars data + 4 chars key;
    * the fixture file separates records with newlines. */
  def parseEvents(path: String): Seq[AggEvent] =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8").split("\n").toSeq
      .map(r => AggEvent(r.substring(0, 4).toLong * 1000000L, r.substring(4, 8).toLong,
        r.substring(8, 12)))

  /** EventEncoder (:130-137): `t=<ns/1e6>,data=<sum>,key=<k>`. */
  def encode(e: AggEvent): String = s"t=${e.eventTimeNs / 1000000L},data=${e.data},key=${e.key}"

  /** Golden sink fixture: length-framed encoded lines. */
  def parseExpected(path: String): Seq[String] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val out = Seq.newBuilder[String]
    var off = 0
    while (off < bytes.length) {
      val len = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      out += new String(bytes, off + 4, len, "UTF-8").stripLineEnd
      off += 4 + len
    }
    out.result()
  }
}

/** Port of the multi_aggregation correctness app
  * (testing/correctness/apps/multi_aggregation): TWO chained windowed
  * aggregations — key_by → 50 ms aligned tumbling sum → 1 s aligned
  * tumbling sum — against the app's own framed golden fixtures. The
  * second fixture pair exercises the grid RE-ANCHOR after an idle gap
  * (the reference's triggerDiff skip): the 1 s stage's second window
  * lands at t=7099, not the naive 7049 grid position. */
class MultiAggregationSpec extends AnyFunSuite {
  import MultiAggregationFixtures._
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark
  private implicit val evEnc: Encoder[AggEvent] = Encoders.product[AggEvent]

  private val dir = "/root/reference/testing/correctness/apps/multi_aggregation"

  private def run(eventsFile: String, view: String): Seq[String] = {
    val events = parseEvents(s"$dir/$eventsFile")
    Graft.source(view, DatasetSource(spark.createDataset(events), (e: AggEvent) => e.eventTimeNs))
      .keyBy(_.key)
      .to(Graft.rangeWindows(50L * 1000000L).over(new SumEvents("SumEvents")))
      .keyBy(_.key) // the reference inherits the key partition; re-key explicitly
      .to(Graft.rangeWindows(1000L * 1000000L).over(new SumEvents("SumEvents2")))
      .toSink(MemorySink(view))
    spark.table(view).collect()
      .map(r => (r.getStruct(0), r.getLong(1)))
      .sortBy(_._2)
      .map { case (s, _) => encode(AggEvent(s.getLong(0), s.getLong(1), s.getString(2))) }
      .toSeq
  }

  test("golden: one 1s window over 50ms pre-aggregated sums") {
    assume(Files.exists(Paths.get(s"$dir/_events.msg")), "reference fixture not present")
    assert(run("_events.msg", "magg_out") == parseExpected(s"$dir/_expected.msg"))
  }

  test("golden: idle gap re-anchors the second stage's window grid") {
    assume(Files.exists(Paths.get(s"$dir/_events1.msg")), "reference fixture not present")
    assert(run("_events1.msg", "magg1_out") == parseExpected(s"$dir/_expected1.msg"))
  }
}
