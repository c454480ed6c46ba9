package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import WindowTestKit.{seconds, Total}

/** Top-level fixtures (must not capture the spec — executor-serialized). */
object ExampleAppFixtures {
  /** The alerts examples' shared transaction generator
    * (examples/python/alerts_stateless/alerts.py:77-88 — Python ints are
    * arbitrary-precision and `%` is floor-mod, hence BigInt here).
    * amount' = ((amount * 2305843009213693951 + 7) mod 2500) - 1250. */
  val GenMult = BigInt("2305843009213693951")
  def nextAmount(prev: Long): Long =
    (((BigInt(prev) * GenMult + 7).mod(BigInt(2500))) - 1250).toLong

  /** Stateless stream: initial Transaction(0, 1), then apply(prev)
    * (GenSource contract, core/source/gen_source/gen_source.pony:54-67). */
  def statelessTransactions(n: Int): Seq[(Long, Long)] = {
    val b = Seq.newBuilder[(Long, Long)]
    var amount = 1L
    b += ((0L, amount))
    var tid = 1L
    while (tid < n) {
      amount = nextAmount(amount)
      b += ((tid, amount))
      tid += 1
    }
    b.result()
  }

  /** Stateful/windowed stream: 5 users round-robin; a user's amount is
    * forced to ∓6000 when their running total exits ±5000
    * (alerts_stateful/alerts.py:86-110). Emits (user, amount, seq). */
  val Users = Vector("Fido", "Rex", "Dr. Whiskers", "Feathers", "Mountaineer")
  def statefulTransactions(n: Int): Seq[(String, Long, Long)] = {
    val b = Seq.newBuilder[(String, Long, Long)]
    var amount = 1L
    var userIdx = 0
    val totals = Array(1L, 0L, 0L, 0L, 0L)
    b += ((Users(0), amount, 0L))
    var i = 1L
    while (i < n) {
      var a = nextAmount(amount)
      userIdx = (userIdx + 1) % Users.length
      val total = totals(userIdx)
      if (total > 5000) a = -6000L
      else if (total < -5000) a = 6000L
      totals(userIdx) = total + a
      amount = a
      b += ((Users(userIdx), a, i))
      i += 1
    }
    b.result()
  }

  /** alerts_stateless check_transaction (alerts.py:62-68): deposit alert
    * above 1000, withdrawal alert below −1000, nothing otherwise. */
  object CheckTransaction extends StatelessComputation[(Long, Long), (Long, Long, Boolean)] {
    override val name = "check transaction"
    def apply(t: (Long, Long)): ComputationResult[(Long, Long, Boolean)] =
      if (t._2 > 1000) ComputationResult.One((t._1, t._2, true))
      else if (t._2 < -1000) ComputationResult.One((t._1, t._2, false))
      else ComputationResult.Discard
  }

  final class TxTotal extends Serializable { var total: Long = 0 }

  /** alerts_stateful check_transaction_total (alerts.py:72-78): per-user
    * running total; alert when it exits ±2000 (state never reset). */
  object CheckTransactionTotal
      extends StateComputation[(String, Long, Long), (String, Long, Boolean), TxTotal] {
    override val name = "check transaction total"
    def initialState(): TxTotal = new TxTotal
    def apply(t: (String, Long, Long), st: TxTotal): ComputationResult[(String, Long, Boolean)] = {
      st.total += t._2
      if (st.total > 2000) ComputationResult.One((t._1, st.total, true))
      else if (st.total < -2000) ComputationResult.One((t._1, st.total, false))
      else ComputationResult.Discard
    }
  }

  /** alerts_windowed TotalAggregation (alerts.py:73-93): windowed sum with
    * None-suppression inside ±2000 — the Aggregation contract's optional
    * output in action. */
  object TotalAggregation extends Aggregation[(String, Long, Long), (String, Long), Total] {
    override val name = "total agg"
    def initialAccumulator(): Total = new Total
    def update(input: (String, Long, Long), acc: Total): Unit = acc.v += input._2
    def combine(a: Total, b: Total): Total = { val t = new Total; t.v = a.v + b.v; t }
    def output(key: String, windowEndTs: Long, acc: Total): Option[(String, Long)] =
      if (acc.v > 2000 || acc.v < -2000) Some((key, acc.v)) else None
  }

  /** alerts_local_aggregations (examples/pony/alerts_local_aggregations/
    * alerts.pony:96-120): a worker-local per-key pre-stage feeding the
    * global per-key running total. */
  object LocalCheck extends StateComputation[(String, Long, Long), (String, Long, Long), TxTotal] {
    override val name = "local check transaction"
    def initialState(): TxTotal = new TxTotal
    def apply(t: (String, Long, Long), st: TxTotal): ComputationResult[(String, Long, Long)] = {
      st.total += t._2
      ComputationResult.One(t) // TransactionGroup(user, amount): pass-through
    }
  }
  object GlobalCheck extends StateComputation[(String, Long, Long), (String, Long), TxTotal] {
    override val name = "check transaction total"
    def initialState(): TxTotal = new TxTotal
    def apply(t: (String, Long, Long), st: TxTotal): ComputationResult[(String, Long)] = {
      st.total += t._2
      ComputationResult.One((t._1, st.total))
    }
  }

  /** alphabet votes message: 1-byte letter + big-endian u32 count, length
    * framed (alphabet.py:72-76 `@wallaroo.decoder(header_length=4,
    * length_fmt=">I")` + `struct.unpack(">sI", bs)`). */
  final case class Votes(letter: String, count: Long)
  object VotesDecoder extends FramedDecoder[Votes] {
    def decode(payload: Array[Byte]): Votes = Votes(
      payload(0).toChar.toString,
      ((payload(1) & 0xffL) << 24) | ((payload(2) & 0xffL) << 16) |
        ((payload(3) & 0xffL) << 8) | (payload(4) & 0xffL))
    def eventTimeNs(t: Votes): Long = 0L
  }

  object AddVotes extends Aggregation[Votes, (String, Long), Total] {
    override val name = "add votes"
    def initialAccumulator(): Total = new Total
    def update(input: Votes, acc: Total): Unit = acc.v += input.count
    def combine(a: Total, b: Total): Total = { val t = new Total; t.v = a.v + b.v; t }
    def output(key: String, windowEndTs: Long, acc: Total): Option[(String, Long)] =
      Some((key, acc.v))
  }
}

/** Golden-output ports of the remaining reference example apps
  * (SURVEY §5b): the alerts family (stateless / stateful / windowed,
  * examples/python/alerts_*) driven by the examples' own deterministic
  * generator, and alphabet against the reference's framed binary fixture
  * and `_expected.json` golden (examples/python/alphabet_partitioned/). */
class ExampleAppsSpec extends AnyFunSuite {
  import ExampleAppFixtures._
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  private val N = 400

  test("alerts_stateless app: threshold alerts match the generator stream") {
    import spark.implicits._
    val txs = statelessTransactions(N)
    Graft.source("alerts-stateless", DatasetSource(
        spark.createDataset(txs), (t: (Long, Long)) => t._1 * 1000000000L))
      .to(CheckTransaction)
      .toSink(MemorySink("alerts_stateless_out"))
    val got = spark.sql("SELECT _1._1, _1._2, _1._3 FROM alerts_stateless_out")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val expected = txs.collect {
      case (tid, a) if a > 1000  => (tid, a, true)
      case (tid, a) if a < -1000 => (tid, a, false)
    }
    assert(got.nonEmpty && got.exists(_._3) && got.exists(!_._3))
    assert(got == expected)
  }

  test("alerts_stateful app: per-user running-total alerts, batch == sim == streaming") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val txs = statefulTransactions(N)
    // Independent simulation of the reference app's per-key semantics.
    val expected = {
      val totals = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      txs.flatMap { case (u, a, _) =>
        totals(u) += a
        val t = totals(u)
        if (t > 2000) Some((u, t, true))
        else if (t < -2000) Some((u, t, false)) else None
      }
    }

    Graft.source("alerts-stateful", DatasetSource(
        spark.createDataset(txs), (t: (String, Long, Long)) => t._3 * 1000000000L))
      .keyBy(_._1)
      .to(CheckTransactionTotal)
      .toSink(MemorySink("alerts_stateful_batch"))

    val stream = MemoryStream[(String, Long, Long)]
    val handle = Graft.source("alerts-stateful-s", DatasetSource(
        stream.toDS(), (t: (String, Long, Long)) => t._3 * 1000000000L))
      .keyBy(_._1)
      .to(CheckTransactionTotal)
      .toSink(MemorySink("alerts_stateful_stream"))
    txs.grouped(150).foreach { chunk => stream.addData(chunk); handle.processAllAvailable() }
    handle.stop()

    def collectAlerts(view: String): Seq[(String, Long, Boolean)] = spark
      .sql(s"SELECT _1._1, _1._2, _1._3, _2 FROM $view")
      .as[(String, Long, Boolean, Long)].collect().toSeq
      .sortBy(r => (r._1, r._4)).map(r => (r._1, r._2, r._3))

    assert(expected.nonEmpty && expected.exists(_._3) && expected.exists(!_._3))
    assert(collectAlerts("alerts_stateful_batch").sortBy(r => (r._1)) ==
      expected.sortBy(r => (r._1))) // per-key order: event-ts replay
    assert(collectAlerts("alerts_stateful_stream").groupBy(_._1) ==
      collectAlerts("alerts_stateful_batch").groupBy(_._1))
  }

  test("alerts_windowed app: sliding 9s/3s suppressed totals, batch == streaming, sums exact") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val txs = statefulTransactions(N)
    def tsNs(t: (String, Long, Long)): Long = seconds(t._3)
    def windows = Graft.rangeWindows(seconds(9)).withSlide(seconds(3)).over(TotalAggregation)

    Graft.source("alerts-windowed", DatasetSource(spark.createDataset(txs), tsNs _))
      .keyBy(_._1)
      .to(windows)
      .toSink(MemorySink("alerts_windowed_batch"))

    val stream = MemoryStream[(String, Long, Long)]
    val handle = Graft.source("alerts-windowed-s", DatasetSource(stream.toDS(), tsNs _))
      .keyBy(_._1)
      .to(windows)
      .toSink(MemorySink("alerts_windowed_stream"))
    txs.grouped(150).foreach { chunk => stream.addData(chunk); handle.processAllAvailable() }
    handle.stop()

    def collect(view: String): Set[(String, Long, Long)] = spark
      .sql(s"SELECT _1._1, _1._2, _2 FROM $view")
      .as[(String, Long, Long)].collect().toSet

    val batch = collect("alerts_windowed_batch")
    assert(batch.nonEmpty)
    assert(batch == collect("alerts_windowed_stream"))
    // Every emitted alert is a bit-exact window sum over [end-9s, end) for
    // its user, and clears the ±2000 suppression threshold.
    batch.foreach { case (user, total, outTs) =>
      val end = outTs + 1
      val sum = txs.filter(t => t._1 == user && tsNs(t) >= end - seconds(9) && tsNs(t) < end)
        .map(_._2).sum
      assert(total == sum, s"window sum mismatch for $user@$end")
      assert(total > 2000 || total < -2000)
    }
  }

  test("alerts_local_aggregations app: local pre-stage then global running totals") {
    import spark.implicits._
    val txs = statefulTransactions(300)
    // Batch pipelines chain stateful stages natively (flatMapSortedGroups
    // composes); local_key_by routes worker-local in the reference and is
    // a keyBy alias here — the local stage passes amounts through, so the
    // downstream totals are partition-invariant either way.
    Graft.source("alerts-local", DatasetSource(
        spark.createDataset(txs), (t: (String, Long, Long)) => t._3 * 1000000000L))
      .localKeyBy(_._1)
      .to(LocalCheck)
      .keyBy(_._1)
      .to(GlobalCheck)
      .toSink(MemorySink("alerts_local_out"))
    val out = spark.sql("SELECT _1._1, _1._2, _2 FROM alerts_local_out")
      .as[(String, Long, Long)].collect()
    assert(out.length == txs.length) // one running total per transaction
    val finals = out.groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._3)._2 }
    val want = txs.groupBy(_._1).map { case (u, ts) => u -> ts.map(_._2).sum }
    assert(finals == want)
  }

  test("GenSource: rate-driven indexed generator feeds the stateless alerts pipeline") {
    import spark.implicits._
    // Indexed form of the generator (GenSource is i => T so any partition
    // can compute its rows independently — the survey's scale note).
    val handle = Graft.source("gen-alerts", GenSource[(Long, Long)](
        i => (i, (((BigInt(i) * GenMult + 7).mod(BigInt(2500))) - 1250).toLong),
        rowsPerSecond = 5000, numPartitions = 2))
      .to(CheckTransaction)
      .toSink(MemorySink("gen_alerts_out"))
    try {
      Thread.sleep(2000) // let the rate source emit a couple of seconds
      handle.processAllAvailable()
    } finally handle.stop()
    val got = spark.sql("SELECT _1._1, _1._2, _1._3 FROM gen_alerts_out")
      .as[(Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (tid, amount, isDeposit) =>
      val expected = (((BigInt(tid) * GenMult + 7).mod(BigInt(2500))) - 1250).toLong
      assert(amount == expected && (amount > 1000 || amount < -1000) &&
        isDeposit == (amount > 1000))
    }
  }

  test("alphabet app: framed binary fixture replay matches the reference golden") {
    import spark.implicits._
    val dir = "/root/reference/examples/python/alphabet_partitioned"
    assume(Files.exists(Paths.get(s"$dir/_test.txt")), "reference fixture not present")
    // Hadoop's path filter hides files starting with `_` — stage a copy.
    val staged = Files.createTempDirectory("alphabet_fixture")
    Files.copy(Paths.get(s"$dir/_test.txt"), staged.resolve("votes.bin"))

    Graft.source("alphabet-golden", FramedFileSource(
        staged.resolve("votes.bin").toString, VotesDecoder, streaming = false))
      .keyBy(_.letter)
      .toGlobalWindow(AddVotes)
      .toSink(MemorySink("alphabet_golden_out"))

    // Final running total per letter = the app's last output per key.
    val got = spark.sql(
      "SELECT _1._1 AS letter, max(_1._2) AS votes FROM alphabet_golden_out GROUP BY 1")
      .as[(String, Long)].collect().toMap
    val expected = {
      val txt = new String(Files.readAllBytes(Paths.get(s"$dir/_expected.json")), "UTF-8")
      """"([a-z])":\s*(\d+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toLong).toMap
    }
    assert(expected.size == 26)
    assert(got == expected)
    // One running output per input message (1000 framed votes).
    assert(spark.table("alphabet_golden_out").count() == 1000)
  }
}
