package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.pipeline._

/** Batch-replay registry entries for the pipeline DSL — every streaming
  * operator gets an oracle-checked batch form here (the driver's
  * CORRECTNESS gate), while its streaming form is exercised by the
  * MemoryStream suites. The batch path replays each key in event-time
  * order with the watermark riding the max event ts, then flushes with
  * TimeoutWatermark — a deterministic "perfectly ordered stream".
  *
  * p_wordcount / p_alphabet are the reference's canonical example apps
  * (examples/python/word_count, examples/python/alphabet) run over the
  * testdata corpus; p_countwin exercises count windows
  * (core/windows/windows.pony:428-519); q_events_sliding is the
  * Spark-native sliding-window path (built-in `window()`, the 100 TB
  * shape); p_ephemeral exercises ephemeral one-shot windows
  * (core/windows/ephemeral_window.pony — no SQL form, rows-only check).
  *
  * Money math: exact integer cents (`round(value*100)`) or DECIMAL sums,
  * never float accumulation, so results are order- and
  * parallelism-independent (same discipline as Queries.scala).
  */
object PipelineQueries {

  private implicit val strEnc: Encoder[String] = Encoders.STRING
  private implicit val long3Enc: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  private implicit val strLongEnc: Encoder[(String, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
  private implicit val strLong2Enc: Encoder[(String, Long, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)

  // ---- computations (the reference example apps' logic) ------------------
  final class WordTotal extends Serializable { var count: Long = 0 }

  /** word_count.py:57-63: per-word running total. */
  object CountWord extends StateComputation[String, (String, Long), WordTotal] {
    override val name = "count word"
    def initialState(): WordTotal = new WordTotal
    def apply(word: String, total: WordTotal): ComputationResult[(String, Long)] = {
      total.count += 1
      ComputationResult.One((word, total.count))
    }
  }

  final class CentsAcc extends Serializable { var cents: Long = 0; var n: Long = 0 }

  /** One home for the integer-cents accumulation discipline — the cents
    * aggregations differ only in input arity and output shape, and a fix
    * to the discipline (e.g. an overflow guard) must hit all of them at
    * once, not five inline copies (the Portable precedent). */
  private def centsAgg[In, Out](aggName: String, centsOf: In => Long)(
      shape: (String, CentsAcc) => Out): Aggregation[In, Out, CentsAcc] =
    new Aggregation[In, Out, CentsAcc] {
      override val name = aggName
      def initialAccumulator(): CentsAcc = new CentsAcc
      def update(in: In, acc: CentsAcc): Unit = { acc.cents += centsOf(in); acc.n += 1 }
      def combine(a: CentsAcc, b: CentsAcc): CentsAcc = {
        val c = new CentsAcc; c.cents = a.cents + b.cents; c.n = a.n + b.n; c
      }
      def output(key: String, windowEndTs: Long, acc: CentsAcc): Option[Out] =
        Some(shape(key, acc))
    }

  /** alphabet.py:44-60 vote totals, in integer cents; the running count
    * rides along so downstream can pick the FINAL running total
    * order-safely (max on the strictly-increasing n, not on cents). */
  val RunningCents: Aggregation[(String, Long), (String, Long, Long), CentsAcc] =
    centsAgg[(String, Long), (String, Long, Long)]("running cents", _._2)(
      (k, a) => (k, a.cents, a.n))

  /** Per-window (key, cents, count) for count/ephemeral windows. */
  val WindowCents: Aggregation[(Long, Long, Long), (String, Long, Long), CentsAcc] =
    centsAgg[(Long, Long, Long), (String, Long, Long)]("window cents", _._2)(
      (k, a) => (k, a.cents, a.n))

  /** Keyless stats pair for the Aggregator-bridge path. */
  val CentsStats: Aggregation[(String, Long), (Long, Long), CentsAcc] =
    centsAgg[(String, Long), (Long, Long)]("cents stats", _._2)(
      (_, a) => (a.cents, a.n))

  /** events as (user_id, cents, ts_ns) — the stream the window queries eat. */
  private def eventStream(s: SparkSession, dir: String): Dataset[(Long, Long, Long)] =
    Tables.events(s, dir)
      .select(col("user_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"), col("ts_ns"))
      .as[(Long, Long, Long)]

  // ---------------------------------------------------------- p_wordcount
  def pWordcount(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    val toks = Tables.documents(s, dir)
      .select(explode(expr(Portable.sparkTokens(Portable.sqlAsciiLower("text")))).as("tok"))
      .as[String]
    Graft.source("wordcount", DatasetSource(toks, (_: String) => 0L))
      .keyBy(identity)
      .to(CountWord)
      .dataset // ((word, running_count), ts) — final count = max per word
      .groupBy(col("_1._1").as("word"))
      .agg(max(col("_1._2")).as("n"))
  }

  val pWordcountSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(${Portable.duckTokens(Portable.sqlAsciiLower("text"))}) AS word FROM documents)
       |SELECT word, COUNT(*) AS n FROM toks GROUP BY word""".stripMargin

  // ---------------------------------------------------------- p_alphabet
  def pAlphabet(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    val votes = Tables.events(s, dir)
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("cents"))
      .as[(String, Long)]
    Graft.source("alphabet", DatasetSource(votes, (_: (String, Long)) => 0L))
      .keyBy(_._1)
      .toGlobalWindow(RunningCents)
      .dataset // running (key, cents, n) per message; n strictly increases,
      // so max(struct(n, cents)) is the FINAL total whatever the sign of
      // individual cents (the pCollect pattern — a refund-shaped negative
      // row would make a bare max(cents) report a pre-dip peak)
      .groupBy(col("_1._1").as("event_type"))
      .agg(max(struct(col("_1._3").as("n"), col("_1._2").as("c"))).as("b"))
      .select(col("event_type"), col("b.c").as("total_cents"),
        col("b.n").as("n_events"))
  }

  val pAlphabetSql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------- p_countwin
  val CountWindowSize = 50

  def pCountwin(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    Graft.source("countwin", DatasetSource(eventStream(s, dir), (e: (Long, Long, Long)) => e._3))
      .keyBy(_._1.toString)
      .to(Graft.countWindows(CountWindowSize).over(WindowCents))
      .dataset
      .select(col("_1._1").cast("bigint").as("user_id"),
        col("_1._2").as("sum_cents"), col("_1._3").as("n_events"))
  }

  /** Oracle: the k-th count window of a key = rows with row_number in
    * [k·N, (k+1)·N) ordered by ts (unique per (user, ts) in the testdata;
    * the batch replay sorts identically). */
  val pCountwinSql: String =
    s"""WITH e AS (
       |  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
       |  FROM events)
       |SELECT user_id, CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n_events
       |FROM e GROUP BY user_id, (rn - 1) // $CountWindowSize""".stripMargin

  // ------------------------------------------------------ q_events_sliding
  /** Spark-native sliding windows — built-in `window()` (epoch-aligned,
    * fully Catalyst-optimized: partial agg map-side, one shuffle on
    * (window, event_type)). This is the scale path for drop-policy range
    * windows; the pane state machine covers the semantics Spark lacks. */
  def qEventsSliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"), col("event_type"))
      .agg(sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("n_events"))
      .select(expr("unix_micros(w.start)").as("ws"), col("event_type"),
        col("sum_value"), col("n_events"))

  val qEventsSlidingSql: String =
    """WITH e AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type,
      |         CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events),
      |w AS (
      |  SELECT us - (us % 600000000) - k * 600000000 AS ws, event_type, v
      |  FROM e CROSS JOIN (SELECT unnest(range(0, 3)) AS k) ks)
      |SELECT ws, event_type, CAST(SUM(v) AS DOUBLE) AS sum_value,
      |       COUNT(*) AS n_events
      |FROM w GROUP BY ws, event_type""".stripMargin

  // ---------------------------------------------------------- p_sliding
  /** The PANE MACHINE's sliding windows (panes_range_windows.pony) batch-
    * replayed with a DuckDB oracle — q_events_sliding covers the
    * Spark-native `window()` path; this covers the DSL path whose grid
    * anchors at each key's FIRST event (not the epoch). 7-day range /
    * 1-day slide: the machine re-anchors its grid after an idle gap
    * longer than range − pane (the triggerDiff skip), so the per-key
    * arithmetic grid oracle is exact only while gaps stay under 6 days —
    * the testdata's max per-user gap is 4.1 (sf0.01) / 5.9 (sf0.1) days.
    * Empty grid windows emit identity outputs (reference semantics);
    * both sides keep n_events > 0 so the compare is over data windows.
    * The window boundary is reported as the window START in integer µs:
    * DuckDB's parquet reader truncates TIMESTAMP(NANOS) to µs, so the
    * anchor's sub-µs digits exist only on the Spark side — flooring the
    * start to µs erases exactly that remainder on both engines (the
    * window END µs would straddle the truncation and diverge). */
  val SlideNs: Long = 86400L * 1000000000L
  val RangeNs: Long = 7 * SlideNs

  def pSliding(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    Graft.source("sliding", DatasetSource(eventStream(s, dir), (e: (Long, Long, Long)) => e._3))
      .keyBy(_._1.toString)
      .to(Graft.rangeWindows(RangeNs).withSlide(SlideNs).over(WindowCents))
      .dataset
      .filter(col("_1._3") > 0)
      .select(col("_1._1").cast("bigint").as("user_id"),
        expr(s"(_2 + 1 - ${RangeNs}L) div 1000").as("ws_us"),
        col("_1._2").as("sum_cents"), col("_1._3").as("n_events"))
  }

  val pSlidingSql: String =
    s"""WITH e AS (
       |  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
       |         epoch_ns(ts) AS t
       |  FROM events),
       |a AS (SELECT user_id, MIN(t) AS anchor FROM e GROUP BY user_id),
       |x AS (
       |  SELECT e.user_id, cents, anchor,
       |         ((t - anchor) // $SlideNs) - j.j AS k
       |  FROM e JOIN a USING (user_id)
       |  CROSS JOIN (SELECT unnest(range(0, ${RangeNs / SlideNs})) AS j) j)
       |SELECT user_id, (anchor + k * $SlideNs) // 1000 AS ws_us,
       |       CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n_events
       |FROM x WHERE k >= 0
       |GROUP BY user_id, anchor, k""".stripMargin

  // ---------------------------------------------------------- p_unaligned
  /** UNALIGNED sliding windows under the oracle gate — the reference's
    * per-key window stagger (panes_range_windows.pony:97-110: each key's
    * grid shifts by a random offset ≤ 0.8×range, the thundering-herd
    * mitigation). Our `.unaligned()` derives the stagger from the
    * portable hash of the key (deterministic across task retries —
    * Builders.scala:61-63), which is what makes an exact DuckDB oracle
    * POSSIBLE: the oracle re-derives each key's stagger from the same
    * md5 fragment and shifts the [[pSliding]] arithmetic grid by it.
    *
    * Two determinism guards: (1) event times are fed µs-truncated
    * (`(ts_ns div 1000) * 1000`) so the anchor has no sub-µs digits —
    * the stagger is an arbitrary ns value, and a sub-µs anchor remainder
    * would straddle µs flooring differently per engine; (2) the grid
    * oracle's validity bound tightens vs [[pSliding]]: the machine's
    * triggerDiff skip re-anchors after an idle gap whose threshold
    * depends on the key's grid phase, which the stagger now shifts —
    * the entry is therefore verified hash-exact at the gate's SFs (the
    * data's per-key gaps sit inside every key's staggered threshold)
    * rather than by a one-size bound. */
  def pUnaligned(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        expr("(ts_ns div 1000) * 1000").as("t"))
      .as[(Long, Long, Long)]
    Graft.source("unaligned", DatasetSource(ev, (e: (Long, Long, Long)) => e._3))
      .keyBy(_._1.toString)
      .to(Graft.rangeWindows(RangeNs).withSlide(SlideNs).unaligned().over(WindowCents))
      .dataset
      .filter(col("_1._3") > 0)
      .select(col("_1._1").cast("bigint").as("user_id"),
        expr(s"(_2 + 1 - ${RangeNs}L) div 1000").as("ws_us"),
        col("_1._2").as("sum_cents"), col("_1._3").as("n_events"))
  }

  val pUnalignedSql: String = {
    // the stagger re-derivation: lower 32 bits of the portable hash of
    // the key string over 2^32 → fraction, ((f * 0.8) * range) truncated —
    // the exact float chain of RangeWindowsStateInitializer + PanesRange-
    // Windows (both multiplications double-precision, same association)
    val h = Portable.duckHash("CAST(user_id AS VARCHAR)", "stagger")
    s"""WITH e AS (
       |  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
       |         epoch_us(ts) * 1000 AS t
       |  FROM events),
       |st AS (
       |  SELECT user_id,
       |    CAST(trunc(((CAST(($h) % 4294967296 AS DOUBLE) / 4294967296.0 * 0.8)
       |                * CAST($RangeNs AS DOUBLE))) AS BIGINT) AS stg
       |  FROM (SELECT DISTINCT user_id FROM e)),
       |a AS (
       |  SELECT e.user_id, MIN(t) - MAX(stg) AS anchor
       |  FROM e JOIN st USING (user_id) GROUP BY e.user_id),
       |x AS (
       |  SELECT e.user_id, cents, anchor,
       |         ((t - anchor) // $SlideNs) - j.j AS k
       |  FROM e JOIN a USING (user_id)
       |  CROSS JOIN (SELECT unnest(range(0, ${RangeNs / SlideNs})) AS j) j)
       |SELECT user_id, (anchor + k * $SlideNs) // 1000 AS ws_us,
       |       CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n_events
       |FROM x WHERE k >= 0
       |GROUP BY user_id, anchor, k""".stripMargin
  }

  // ---------------------------------------------------------- p_agg_bridge
  /** The Aggregation contract run through Catalyst as a Spark
    * `Aggregator[IN,BUF,OUT]` ([[AggregationAsAggregator]]): typed
    * groupByKey + agg — partial aggregation happens map-side before the
    * shuffle (the reference's `local_key_by` pre-aggregation for free),
    * unlike the per-key state-machine path. */
  def pAggBridge(s: SparkSession, dir: String): DataFrame = {
    val votes = Tables.events(s, dir)
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("cents"))
      .as[(String, Long)]
    val bridge = new AggregationAsAggregator(CentsStats)(
      AggregationAsAggregator.bufferEnc(classOf[CentsAcc]),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    votes.groupByKey(_._1)
      .agg(bridge.toColumn)
      .toDF("event_type", "stats")
      .select(col("event_type"), col("stats._1").as("total_cents"),
        col("stats._2").as("n_events"))
  }

  val pAggBridgeSql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------- p_ephemeral
  /** Ephemeral one-shot windows per user (trigger 1 h after the window
    * opens, state dropped 30 min later, late data dropped): session-like
    * bursts. Semantics vector-tested in EphemeralWindowsSpec; the batch
    * replay is deterministic (watermark = running max event ts), so the
    * oracle walks the same segmentation with a recursive CTE. */
  def pEphemeral(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    val hourNs = 3600L * 1000000000L
    Graft.source("ephemeral", DatasetSource(eventStream(s, dir), (e: (Long, Long, Long)) => e._3))
      .keyBy(_._1.toString)
      .to(Graft.ephemeralWindows(hourNs, hourNs / 2).over(WindowCents))
      .dataset
      .select(col("_1._1").cast("bigint").as("user_id"),
        col("_1._2").as("sum_cents"), col("_1._3").as("n_events"))
  }

  /** Exact oracle for the ephemeral replay. Per key (events sorted by ts,
    * watermark = running max ts = each event's own ts):
    *   - a window anchors at its first event's ts `a`;
    *   - events are folded into the window until the first event with
    *     ts > a + trigger, which fires the output (and is itself included —
    *     [[EphemeralWindow.apply]] updates before it tries to trigger);
    *   - later events are dropped (Drop policy) until the first event with
    *     ts >= a + trigger + postTrigger, which is also consumed, after
    *     which the NEXT event anchors a fresh window;
    *   - an un-fired window flushes its contents at end of stream.
    * `nx` precomputes, for every potential anchor row, the last included
    * row (trig_rn) and the next window's anchor row (next_rn) — legal
    * because per-key ts is strictly increasing in the testdata at µs
    * precision — and the recursive CTE walks the anchor chain. Trigger and
    * remove offsets are whole-µs multiples, so DuckDB's µs-truncated
    * TIMESTAMP(NANOS) agrees with Spark's full-ns arithmetic everywhere
    * except an exact-boundary gap (absent from the testdata, verified). */
  val pEphemeralSql: String = {
    val hourNs = 3600L * 1000000000L
    val trigNs = hourNs
    val removeNs = hourNs + hourNs / 2
    s"""WITH RECURSIVE e AS (
       |  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
       |         epoch_ns(ts) AS t,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
       |         COUNT(*) OVER (PARTITION BY user_id) AS mx
       |  FROM events),
       |nx AS (
       |  SELECT a.user_id, a.rn, a.mx,
       |         MIN(CASE WHEN b.t > a.t + $trigNs THEN b.rn END) AS trig_rn,
       |         MIN(CASE WHEN b.t >= a.t + $removeNs THEN b.rn END) + 1 AS next_rn
       |  FROM e a LEFT JOIN e b ON b.user_id = a.user_id AND b.rn > a.rn
       |  GROUP BY a.user_id, a.rn, a.mx, a.t),
       |w AS (
       |  SELECT user_id, rn, trig_rn, next_rn, mx FROM nx WHERE rn = 1
       |  UNION ALL
       |  SELECT n.user_id, n.rn, n.trig_rn, n.next_rn, n.mx
       |  FROM w JOIN nx n ON n.user_id = w.user_id AND n.rn = w.next_rn)
       |SELECT w.user_id, CAST(SUM(ev.cents) AS BIGINT) AS sum_cents,
       |       COUNT(*) AS n_events
       |FROM w JOIN e ev ON ev.user_id = w.user_id
       |  AND ev.rn >= w.rn AND ev.rn <= COALESCE(w.trig_rn, w.mx)
       |GROUP BY w.user_id, w.rn""".stripMargin
  }

  // ---------------------------------------------------------- p_late_fire
  /** The fire-per-message late-data policy under the driver's oracle gate
    * (core/windows/late_data_policy.pony:2-5; applied
    * panes_range_windows.pony:146-168): a late row never reaches the
    * panes — it fires a singleton window whose output ts is its own event
    * time. Lateness requires arrival order ≠ event-time order, which the
    * batch replay (sorted per key) can never produce, so this entry runs
    * the REAL streaming host over a deterministic three-phase
    * MemoryStream arrival script:
    *   1. every on-time row (each key's machine anchors at its first
    *      event and triggers along its own event-time progress);
    *   2. the stragglers — rows with event_id % 10 == 0 arriving more
    *      than one full window range behind their key's on-time maximum,
    *      so each is unambiguously late (its ts is below every pane the
    *      key could still hold open) whatever the trigger history;
    *   3. a per-key sentinel at M0 + 2·range (M0 = global max event ts)
    *      whose watermark ride flushes every data window; the sentinel's
    *      own windows can never trigger and are excluded by the output's
    *      ts ≤ M0 + range − 1 bound.
    * The rows are collected driver-side to play the external producer's
    * arrival schedule (the same rig contract as
    * [[graft.operators.WireQueries]]); the pipeline itself is the real
    * keyed streaming stage. Oracle = the pSliding grid over on-time rows
    * (same anchor arithmetic, gaps < range − pane verified at tested SFs)
    * UNION ALL one singleton per straggler. */
  val LateUserMax = 300L

  /** The shared arrival rig for the late-data entries: collect the bounded
    * event slice driver-side (the external producer's schedule — same
    * contract as [[graft.operators.WireQueries]]), classify stragglers
    * (event_id % 10 == 0, more than one window range behind the key's
    * max), and return (ontime, stragglers, m0 = global max ts, span). */
  private def lateArrival(s: SparkSession, dir: String): (
      Array[(Long, Long, Long)], Array[(Long, Long, Long)], Long, Long) = {
    val rows = Tables.events(s, dir)
      .filter(col("user_id") < LateUserMax)
      // ts floored to µs (the pUnaligned pattern): under the
      // TIMESTAMP(NANOS) parquet layout the Spark side keeps sub-µs
      // digits DuckDB's reader truncates, and every downstream value —
      // straggler classification vs kmax, the anchor grid, window ends
      // (anchor + k·slide + range − 1, whose −1 crosses the µs boundary),
      // the m0 output bound — would diverge by 1 µs between the engines.
      // Flooring at ingest erases the remainder identically on both
      // sides; under the current µs layout it is the identity.
      .select(col("user_id"), expr("cast(round(value * 100) as bigint)").as("cents"),
        expr("(ts_ns div 1000) * 1000").as("ts_ns"), col("event_id"))
      .as[(Long, Long, Long, Long)](Encoders.tuple(Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .collect()
    val kmax = rows.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val m0 = rows.map(_._3).max
    val span = m0 - rows.map(_._3).min
    val (stragglers, ontime) = rows.partition(r =>
      r._4 % 10 == 0 && r._3 <= kmax(r._1) - RangeNs)
    (ontime.map(r => (r._1, r._2, r._3)), stragglers.map(r => (r._1, r._2, r._3)),
      m0, span)
  }

  /** Run the three-phase script (on-time, stragglers, per-key sentinels at
    * `sentinelTs`) through the given windowed stage and return the
    * filtered, µs-floored output. */
  private def runLateScript(s: SparkSession, name: String,
      init: StateInitializer[(Long, Long, Long), (String, Long, Long)],
      ontime: Array[(Long, Long, Long)], stragglers: Array[(Long, Long, Long)],
      sentinelTs: Long, maxOutTs: Long): DataFrame = {
    implicit val ss: SparkSession = s
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sentinels = (ontime ++ stragglers).map(_._1).distinct.sorted
      .map(u => (u, 0L, sentinelTs))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val view = s"${name.replace('-', '_')}_${System.nanoTime()}"
    val h = Graft.source(name,
        DatasetSource(mem.toDS(), (e: (Long, Long, Long)) => e._3))
      .keyBy(_._1.toString)
      .to(init)
      .toSink(MemorySink(view))
    try {
      Seq(ontime.toSeq, stragglers.toSeq, sentinels.toSeq).foreach { batch =>
        mem.addData(batch); h.processAllAvailable()
      }
      h.processAllAvailable() // armed timers fire after the last wm advance
    } finally h.stop()
    s.table(view)
      .filter(col("_1._3") > 0 && col("_2") <= lit(maxOutTs))
      .select(col("_1._1").cast("bigint").as("user_id"),
        expr("_2 div 1000").as("ts_us"),
        col("_1._2").as("sum_cents"), col("_1._3").as("n_events"))
  }

  def pLateFire(s: SparkSession, dir: String): DataFrame = {
    val (ontime, stragglers, m0, _) = lateArrival(s, dir)
    runLateScript(s, "late-fire",
      Graft.rangeWindows(RangeNs).withSlide(SlideNs)
        .withLateDataPolicy(LateDataPolicy.FirePerMessage).over(WindowCents),
      ontime, stragglers, m0 + 2 * RangeNs, m0 + RangeNs - 1)
  }

  val pLateFireSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
       |         epoch_ns(ts) AS t
       |  FROM events WHERE user_id < $LateUserMax),
       |km AS (SELECT user_id, MAX(t) AS kmax FROM e GROUP BY user_id),
       |m AS (SELECT MAX(t) AS m0 FROM e),
       |cls AS (
       |  SELECT e.*, (event_id % 10 = 0 AND t <= kmax - ${RangeNs}) AS late
       |  FROM e JOIN km USING (user_id)),
       |ot AS (SELECT * FROM cls WHERE NOT late),
       |a AS (SELECT user_id, MIN(t) AS anchor FROM ot GROUP BY user_id),
       |x AS (
       |  SELECT ot.user_id, cents, anchor,
       |         ((t - anchor) // $SlideNs) - j.j AS k
       |  FROM ot JOIN a USING (user_id)
       |  CROSS JOIN (SELECT unnest(range(0, ${RangeNs / SlideNs})) AS j) j),
       |win AS (
       |  SELECT user_id, (anchor + k * $SlideNs + $RangeNs - 1) // 1000 AS ts_us,
       |         CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n_events
       |  FROM x CROSS JOIN m
       |  WHERE k >= 0 AND anchor + k * $SlideNs + $RangeNs - 1 <= m0 + $RangeNs - 1
       |  GROUP BY user_id, anchor, k)
       |SELECT * FROM win
       |UNION ALL
       |SELECT user_id, t // 1000 AS ts_us, cents AS sum_cents,
       |       CAST(1 AS BIGINT) AS n_events
       |FROM cls WHERE late""".stripMargin

  // ---------------------------------------------------------- p_late_delay
  /** Allowed lateness (`with_delay`, windows.pony:54-56;
    * panes_range_windows.pony:349-354): the SAME out-of-order arrival
    * script as [[pLateFire]], but with a delay wider than the data's
    * timeline span and the default Drop policy — so every straggler still
    * finds its window open and aggregates into it, and the output is the
    * plain per-key grid over ALL rows as if arrival order never mattered.
    * Against p_late_fire this is the policy-knob A/B the conformance
    * suite pins per-vector, here proven end to end under the driver's
    * hash gate: same input, same arrival, different window contents.
    *
    * The delay D = (span/slide + 2)·slide also freezes the machine's
    * grid: with D beyond the span, a trigger's re-anchor jump
    * (lowestPossibleNewStart = wm − range − D) can never pass the ring's
    * last pane, so every window stays on the anchor−D grid and the
    * arithmetic oracle is exact — verified at sf0.001/0.01/0.1.
    * Anchor = (key's first ON-TIME event) − D: the wrapper is created in
    * phase 1, where only on-time rows exist. */
  def pLateDelay(s: SparkSession, dir: String): DataFrame = {
    val (ontime, stragglers, m0, span) = lateArrival(s, dir)
    val delayNs = (span / SlideNs + 2) * SlideNs
    runLateScript(s, "late-delay",
      Graft.rangeWindows(RangeNs).withSlide(SlideNs).withDelay(delayNs)
        .over(WindowCents),
      ontime, stragglers, m0 + 2 * (RangeNs + delayNs), m0 + RangeNs - 1)
  }

  val pLateDelaySql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
       |         epoch_ns(ts) AS t
       |  FROM events WHERE user_id < $LateUserMax),
       |km AS (SELECT user_id, MAX(t) AS kmax FROM e GROUP BY user_id),
       |m AS (SELECT MAX(t) AS m0,
       |             ((MAX(t) - MIN(t)) // $SlideNs + 2) * $SlideNs AS dly
       |      FROM e),
       |cls AS (
       |  SELECT e.*, (event_id % 10 = 0 AND t <= kmax - ${RangeNs}) AS late
       |  FROM e JOIN km USING (user_id)),
       |a AS (
       |  SELECT user_id, MIN(t) - (SELECT dly FROM m) AS anchor
       |  FROM cls WHERE NOT late GROUP BY user_id),
       |x AS (
       |  SELECT cls.user_id, cents, anchor,
       |         ((t - anchor) // $SlideNs) - j.j AS k
       |  FROM cls JOIN a USING (user_id)
       |  CROSS JOIN (SELECT unnest(range(0, ${RangeNs / SlideNs})) AS j) j)
       |SELECT user_id, (anchor + k * $SlideNs + $RangeNs - 1) // 1000 AS ts_us,
       |       CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n_events
       |FROM x CROSS JOIN m
       |WHERE k >= 0 AND anchor + k * $SlideNs + $RangeNs - 1 <= m0 + $RangeNs - 1
       |GROUP BY user_id, anchor, k""".stripMargin

  // ---------------------------------------------------------- p_collect
  /** The `collect` combinator (application.pony:250-253, key generated at
    * key.pony:21-23): route EVERYTHING to one key — a global
    * serialization point — then a global-window running aggregate. The
    * final (max-count) running output must equal the plain global SQL
    * aggregate; this is deliberately the anti-scale shape the reference
    * also documents (one key = one partition's state), registered to
    * prove the combinator, with [[pAggBridge]] as the scale path. */
  val GlobalCents: Aggregation[(Long, Long, Long), (Long, Long), CentsAcc] =
    centsAgg[(Long, Long, Long), (Long, Long)]("global cents", _._2)(
      (_, a) => (a.cents, a.n))

  def pCollect(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    implicit val long2Enc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    Graft.source("collect", DatasetSource(eventStream(s, dir), (e: (Long, Long, Long)) => e._3))
      .collectAll()
      .toGlobalWindow(GlobalCents)
      .dataset // running (cents, n) per message; n strictly increases
      .agg(max(struct(col("_1._2").as("n"), col("_1._1").as("c"))).as("b"))
      .select(col("b.c").as("total_cents"), col("b.n").as("n_events"))
  }

  val pCollectSql: String =
    """SELECT CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
      |       COUNT(*) AS n_events
      |FROM events""".stripMargin

  // ---------------------------------------------------------- p_local_preagg
  /** local_collect as PRE-AGGREGATION (application.pony:255-256, followed
    * by the global combine — the reference's two-level aggregation
    * pattern): each source partition folds its events into one
    * (cents, n) partial via partition-scoped state, then the partials —
    * one row per parallel unit — combine globally. Next to [[pCollect]]'s
    * single serialization point this is the scale shape: only P partial
    * rows ever cross a partition boundary. The oracle is the plain
    * global aggregate — the two-level fold must be invisible in the
    * result. */
  val LocalCents: Aggregation[(Long, Long, Long), (String, Long, Long), CentsAcc] =
    centsAgg[(Long, Long, Long), (String, Long, Long)]("local cents", _._2)(
      (k, a) => (k, a.cents, a.n))

  def pLocalPreagg(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    Graft.source("local-preagg",
        DatasetSource(eventStream(s, dir), (e: (Long, Long, Long)) => e._3))
      .localCollect()
      .toGlobalWindow(LocalCents)
      .dataset // running (partition key, cents, n), n strictly increasing per key
      .groupBy(col("_1._1").as("part"))
      .agg(max(struct(col("_1._3").as("n"), col("_1._2").as("c"))).as("b"))
      .agg(sum(col("b.c")).cast("long").as("total_cents"),
        sum(col("b.n")).cast("long").as("n_events"))
  }

  // same oracle as p_collect: the partials must recombine exactly
  val pLocalPreaggSql: String = pCollectSql

  // ---------------------------------------------------------- p_dedup
  /** The DSL dedup stage ([[Pipeline.dedupBy]]) batch-replayed over the
    * documents corpus: fingerprint = md5 of normalized text, event time =
    * doc_id (unique, so "first in event time" is exactly min doc_id and
    * the replay is deterministic). The streaming form of the same stage
    * is Spark's dropDuplicates[WithinWatermark] (DedupStreamSpec). */
  def pDedup(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    implicit val longStrEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), expr(s"md5(${Portable.sparkNormText()})").as("fp"))
      .as[(Long, String)]
    Graft.source("dedup", DatasetSource(docs, (d: (Long, String)) => d._1))
      .dedupBy(_._2)
      .dataset
      .select(col("_1._1").as("doc_id"), col("_1._2").as("fp"))
  }

  val pDedupSql: String =
    s"""SELECT MIN(doc_id) AS doc_id, md5(${Portable.duckNormText()}) AS fp
       |FROM documents GROUP BY 2""".stripMargin

  // ---------------------------------------------------------- p_neardup
  /** The NEAR-dup dedup stage ([[Pipeline.nearDedupBy]]) batch-replayed
    * over the corpus: fingerprint = the 60-bit JVM [[graft.functions.SimHash]]
    * signature (bit-identical to the SQL d_simhash — the differential is
    * pinned by SimHashConsistencySpec AND by this oracle, which derives
    * the signature independently in DuckDB). First doc per signature in
    * event-time (= doc_id) order survives; its signature rides along so
    * the oracle can verify the collapse, not just the survivor set. */
  def pNearDedup(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    implicit val strEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val sigEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)](strEnc)
    Graft.source("neardup", DatasetSource(docs, (d: (Long, String)) => d._1))
      .nearDedupBy(_._2)
      .dataset
      .select(col("_1._1").as("doc_id"), col("_1._2").as("text"))
      .as[(Long, String)](strEnc)
      .map { case (id, t) => (id, graft.functions.SimHash.signature(t)) }(sigEnc)
      .toDF("doc_id", "simhash")
  }

  val pNearDedupSql: String =
    s"""WITH ${Dedup.duckSimhashCtes}
       |SELECT MIN(doc_id) AS doc_id, simhash FROM sig GROUP BY simhash""".stripMargin

  // ---------------------------------------------------------- p_funnel
  /** The funnel as the reference's signature pattern — a per-key sequence
    * detector (StateComputation, computations.pony:48-109): per user, an
    * O(1) depth counter advances when the NEXT expected step arrives, and
    * each advance emits (user, new_depth) downstream — the streaming form
    * a real-time conversion dashboard consumes, vs [[Queries.qEventsFunnel]]'s
    * batch window-chain over the same semantics. Contiguity is by
    * construction: step i only counts once steps 0..i-1 are done, so the
    * state is ONE int however many steps the funnel has. Per-user event
    * times are strictly increasing in the testdata, so the event-time
    * batch replay is deterministic and the window-chain oracle (strictly-
    * earlier gating) walks the identical sequence. */
  final class FunnelDepth extends Serializable { var depth: Int = 0 }

  object FunnelDetect
      extends StateComputation[(Long, String, Long), (Long, Long), FunnelDepth] {
    override val name = "funnel detect"
    def initialState(): FunnelDepth = new FunnelDepth
    def apply(in: (Long, String, Long), st: FunnelDepth): ComputationResult[(Long, Long)] = {
      val i = Queries.funnelSteps.indexOf(in._2)
      if (i == st.depth) {
        st.depth += 1
        ComputationResult.One((in._1, st.depth.toLong))
      } else ComputationResult.Discard
    }
  }

  def pFunnel(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    implicit val inEnc: Encoder[(Long, String, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong)
    implicit val outEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    val evs = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_ns"))
      .as[(Long, String, Long)]
    Graft.source("funnel", DatasetSource(evs, (e: (Long, String, Long)) => e._3))
      .keyBy(_._1.toString)
      .to(FunnelDetect)
      .dataset // (user, depth) per advance; final depth = max per user
      .groupBy(col("_1._1").as("user_id"))
      .agg(max(col("_1._2")).as("steps_completed"))
  }

  /** Same window-chain as q_events_funnel's oracle, collapsed per user:
    * contiguous gating makes the per-step flags sum to the depth. */
  val pFunnelSql: String = {
    val steps = Queries.funnelSteps
    val win = "PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    val ctes = steps.zipWithIndex.map { case (step, i) =>
      val gate = if (i == 0) "" else s" AND p${i - 1} IS NOT NULL"
      s"""w$i AS (
         |  SELECT *, MIN(CASE WHEN event_type = '$step'$gate THEN ts_us END)
         |    OVER ($win) AS p$i
         |  FROM ${if (i == 0) "base" else s"w${i - 1}"})"""
    }.mkString(",\n")
    val flags = steps.zipWithIndex.map { case (step, i) =>
      val gate = if (i == 0) "" else s" AND p${i - 1} IS NOT NULL"
      s"MAX(CASE WHEN event_type = '$step'$gate THEN 1 ELSE 0 END) AS s$i"
    }.mkString(",\n    ")
    s"""WITH base AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
       |$ctes,
       |per_user AS (
       |  SELECT user_id,
       |    $flags
       |  FROM w${steps.size - 1} GROUP BY user_id)
       |SELECT user_id, CAST(${steps.indices.map(i => s"s$i").mkString(" + ")} AS BIGINT)
       |  AS steps_completed
       |FROM per_user WHERE s0 = 1""".stripMargin
  }

  // ---------------------------------------------------------- p_topk
  /** The reference's canonical demo shape — a windowed leaderboard
    * (the trending-topics app: keyed counts flowing into a board state
    * that re-ranks on every update) — through the DSL as a THREE-stage
    * chain: stateless hour/type assignment → keyed count-window partial
    * counts → a per-hour global-window board.
    *
    * Scale shape (100 TB): the count window is the reference's
    * `local_key_by`-style pre-aggregation — the board key (one per hour)
    * sees ceil(n/[[TopkPartialN]]) partial counts per type instead of
    * every event, so the single-key board stage processes |types|-scale
    * traffic while the (hour,type)-keyed stage carries the row volume
    * across 32 partitions. The board accumulator is a |types|-entry map,
    * bytes per hour of state however large the corpus.
    *
    * Epoch-aligned hours are assigned in the stateless stage (the DSL's
    * pane grid anchors per-key at first watermark — reference apps that
    * need calendar alignment do exactly this assignment upstream:
    * window start = ts div 1h, carried as the key). `updates` counts the
    * board's inputs per hour — strictly increasing per key, so the batch
    * replay's FINAL board (complete counts, order-independent) is
    * exactly the max-updates row; the oracle reproduces it closed-form:
    * updates = Σ_type ceil(n_ht / N). Board string = "type:n" joined in
    * (n desc, type asc) order — [[Queries.TopKTypes]] entries, scalar
    * output (ScalarOutputSpec). */
  val TopkPartialN = 50

  object AssignHourType
      extends StatelessComputation[(String, Long), (Long, String)] {
    override val name = "assign hour"
    def apply(in: (String, Long)): ComputationResult[(Long, String)] =
      ComputationResult.One(
        ((in._2 / 3600000000000L) * 3600000000L, in._1))
  }

  final class TypeCountAcc extends Serializable {
    var h: Long = -1L; var t: String = null; var n: Long = 0L
  }

  /** Partial (hour, type, n) counts emitted every [[TopkPartialN]]
    * messages (plus the flush remainder) by a count window. */
  object TypePartialCount
      extends Aggregation[(Long, String), (Long, String, Long), TypeCountAcc] {
    override val name = "partial type count"
    def initialAccumulator(): TypeCountAcc = new TypeCountAcc
    def update(in: (Long, String), acc: TypeCountAcc): Unit = {
      acc.h = in._1; acc.t = in._2; acc.n += 1
    }
    def combine(a: TypeCountAcc, b: TypeCountAcc): TypeCountAcc = {
      val c = new TypeCountAcc
      c.h = if (a.h >= 0) a.h else b.h
      c.t = if (a.t != null) a.t else b.t
      c.n = a.n + b.n
      c
    }
    def output(key: String, wEnd: Long, acc: TypeCountAcc): Option[(Long, String, Long)] =
      if (acc.n == 0) None else Some((acc.h, acc.t, acc.n))
  }

  final class BoardAcc extends Serializable {
    val counts = new scala.collection.mutable.HashMap[String, Long]
    var updates: Long = 0L
  }

  /** Per-hour leaderboard: fold partial counts, emit the re-ranked board
    * on every update (the live-dashboard stream), tagged with the
    * monotone update ordinal that lets batch select the final board. */
  object LeaderBoard
      extends Aggregation[(Long, String, Long), (Long, Long, String), BoardAcc] {
    override val name = "leader board"
    def initialAccumulator(): BoardAcc = new BoardAcc
    def update(in: (Long, String, Long), acc: BoardAcc): Unit = {
      acc.counts(in._2) = acc.counts.getOrElse(in._2, 0L) + in._3
      acc.updates += 1
    }
    def combine(a: BoardAcc, b: BoardAcc): BoardAcc = {
      val c = new BoardAcc
      a.counts.foreach { case (t, n) => c.counts(t) = n }
      b.counts.foreach { case (t, n) => c.counts(t) = c.counts.getOrElse(t, 0L) + n }
      c.updates = a.updates + b.updates
      c
    }
    def output(key: String, wEnd: Long, acc: BoardAcc): Option[(Long, Long, String)] = {
      val board = acc.counts.toSeq
        .sortBy { case (t, n) => (-n, t) }
        .take(Queries.TopKTypes)
        .map { case (t, n) => s"$t:$n" }
        .mkString(",")
      Some((key.toLong, acc.updates, board))
    }
  }

  def pTopk(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    implicit val longStrEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val partialEnc: Encoder[(Long, String, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong)
    implicit val boardEnc: Encoder[(Long, Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING)
    val evs = Tables.events(s, dir)
      .select(col("event_type"), col("ts_ns")).as[(String, Long)]
    Graft.source("topk", DatasetSource(evs, (e: (String, Long)) => e._2))
      .to(AssignHourType)
      .keyBy(ht => s"${ht._1}|${ht._2}")
      .to(Graft.countWindows(TopkPartialN).over(TypePartialCount))
      .keyBy(_._1.toString)
      .toGlobalWindow(LeaderBoard)
      .dataset
      .select(col("_1._1").as("window_start_us"), col("_1._2").as("updates"),
        col("_1._3").as("topk"))
      .groupBy(col("window_start_us"))
      .agg(max(col("updates")).as("updates"),
        expr("max_by(topk, updates)").as("topk"))
  }

  val pTopkSql: String =
    s"""WITH e AS (
       |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS h_us,
       |         event_type AS t
       |  FROM events),
       |c AS (SELECT h_us, t, COUNT(*) AS n FROM e GROUP BY 1, 2),
       |r AS (SELECT h_us, t, n,
       |        row_number() OVER (PARTITION BY h_us
       |          ORDER BY n DESC, t ASC) AS rk
       |      FROM c),
       |b AS (SELECT h_us, string_agg(t || ':' || n, ',' ORDER BY rk) AS topk
       |      FROM r WHERE rk <= ${Queries.TopKTypes} GROUP BY h_us),
       |u AS (SELECT h_us,
       |        CAST(SUM((n + ${TopkPartialN - 1}) // $TopkPartialN) AS BIGINT)
       |          AS updates
       |      FROM c GROUP BY h_us)
       |SELECT b.h_us AS window_start_us, u.updates, b.topk
       |FROM b JOIN u USING (h_us)""".stripMargin

  // ---------------------------------------------------- p_market_spread
  /** The reference's flagship demo — Market Spread
    * (examples/python/market_spread/market_spread.py:58-100): TWO sources
    * (market data + orders) merged into one stream
    * (application.pony:118-147 `merge`), keyed by instrument, flowing
    * into ONE per-key state that the market-data leg WRITES and the
    * order leg READS — the reference's hand-rolled stream-stream keyed
    * enrichment (SURVEY §2.6: "the closest thing to a join").
    *
    * Testdata mapping: 'view' events are the quote stream (last value =
    * the instrument's live price), 'purchase' events are the orders;
    * key = user_id stands in for the symbol. An order is REJECTED when
    * no quote has been seen yet or its price sits outside ±20% of the
    * last quote (market_spread.py:85-100 rejects on a wide bid/ask
    * spread; one value per quote gives the single-sided analogue).
    * Integer cents only — both engines derive identical booleans.
    *
    * Determinism: per-user event times are strictly increasing AT
    * MICROSECOND granularity in the testdata (TablesSpec's
    * "per-user event times are strictly increasing" test pins it at all
    * three SFs), so the batch replay's per-key ns-ordered sort
    * interleaves the two merged legs exactly as the oracle's ASOF join
    * (strictly-earlier quote at epoch_us) sees them — a same-µs
    * quote/order pair would break the equivalence, which is why the
    * invariant is guarded by a spec rather than assumed.
    *
    * Scale shape (100 TB): ONE shuffle of both legs on the key; state is
    * 8 bytes per live instrument (the last quote), not a buffered join
    * window — this is why the reference demos the pattern at 1.5 M
    * msgs/s/worker and why Spark's own stream-stream join (which buffers
    * both sides to the watermark) is the wrong plan for it. The
    * streaming twin runs in MarketSpreadSpec; StreamBench's
    * stream_statecomp row prices the same shape at volume. */
  final class LastQuote extends Serializable { var cents: Long = -1L }

  object MarketCheck extends StateComputation[
      (Long, Long, Long, Long, Long), (Long, Long, Long, Long, Boolean), LastQuote] {
    override val name = "market check"
    def initialState(): LastQuote = new LastQuote
    def apply(e: (Long, Long, Long, Long, Long), st: LastQuote):
        ComputationResult[(Long, Long, Long, Long, Boolean)] = {
      val (kind, eventId, userId, cents, _) = e
      if (kind == 0L) { st.cents = cents; ComputationResult.Discard }
      else {
        val q = st.cents
        val rejected = q < 0L || cents * 10L > q * 12L || cents * 10L < q * 8L
        ComputationResult.One((eventId, userId, cents, q, rejected))
      }
    }
  }

  def pMarketSpread(s: SparkSession, dir: String): DataFrame = {
    implicit val ss: SparkSession = s
    implicit val in5: Encoder[(Long, Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)
    implicit val out5: Encoder[(Long, Long, Long, Long, Boolean)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaBoolean)
    def leg(kind: Long, eventType: String) = Tables.events(s, dir)
      .filter(col("event_type") === eventType)
      .select(lit(kind).as("kind"), col("event_id"), col("user_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"), col("ts_ns"))
      .as[(Long, Long, Long, Long, Long)]
    val quotes = Graft.source("market-data",
      DatasetSource(leg(0L, "view"), (e: (Long, Long, Long, Long, Long)) => e._5))
    val orders = Graft.source("orders",
      DatasetSource(leg(1L, "purchase"), (e: (Long, Long, Long, Long, Long)) => e._5))
    quotes.merge(orders)
      .keyBy(_._3.toString)
      .to(MarketCheck)
      .dataset
      .select(col("_1._1").as("event_id"), col("_1._2").as("user_id"),
        col("_1._3").as("order_cents"), col("_1._4").as("quote_cents"),
        col("_1._5").as("rejected"))
  }

  /** DuckDB's native ASOF join is the batch-declarative form of the same
    * semantics: each order picks the latest strictly-earlier quote. */
  val pMarketSpreadSql: String =
    """WITH quotes AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |         CAST(round(value * 100) AS BIGINT) AS quote_cents
      |  FROM events WHERE event_type = 'view'),
      |orders AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |         CAST(round(value * 100) AS BIGINT) AS order_cents
      |  FROM events WHERE event_type = 'purchase')
      |SELECT o.event_id, o.user_id, o.order_cents,
      |  COALESCE(q.quote_cents, -1) AS quote_cents,
      |  (q.quote_cents IS NULL
      |    OR o.order_cents * 10 > q.quote_cents * 12
      |    OR o.order_cents * 10 < q.quote_cents * 8) AS rejected
      |FROM orders o ASOF LEFT JOIN quotes q
      |  ON o.user_id = q.user_id AND o.ts_us > q.ts_us""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "p_market_spread" -> ((pMarketSpread _, Some(pMarketSpreadSql))),
    "p_dedup" -> ((pDedup _, Some(pDedupSql))),
    "p_funnel" -> ((pFunnel _, Some(pFunnelSql))),
    "p_neardup" -> ((pNearDedup _, Some(pNearDedupSql))),
    "p_wordcount" -> ((pWordcount _, Some(pWordcountSql))),
    "p_alphabet" -> ((pAlphabet _, Some(pAlphabetSql))),
    "p_countwin" -> ((pCountwin _, Some(pCountwinSql))),
    "q_events_sliding" -> ((qEventsSliding _, Some(qEventsSlidingSql))),
    "p_sliding" -> ((pSliding _, Some(pSlidingSql))),
    "p_unaligned" -> ((pUnaligned _, Some(pUnalignedSql))),
    "p_agg_bridge" -> ((pAggBridge _, Some(pAggBridgeSql))),
    "p_ephemeral" -> ((pEphemeral _, Some(pEphemeralSql))),
    "p_late_fire" -> ((pLateFire _, Some(pLateFireSql))),
    "p_late_delay" -> ((pLateDelay _, Some(pLateDelaySql))),
    "p_collect" -> ((pCollect _, Some(pCollectSql))),
    "p_local_preagg" -> ((pLocalPreagg _, Some(pLocalPreaggSql))),
    "p_topk" -> ((pTopk _, Some(pTopkSql))))
}
