package graft.pipeline

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import StreamingFixtures.{CountWord, SumEv}
import WindowTestKit.seconds

/** Differential: the transformWithState host ([[WrapperProcessor]], real
  * per-key timers) must emit EXACTLY the same output set as the default
  * flatMapGroupsWithState host for every stateful stage family — keyed
  * StateComputation, sliding range windows (timer re-triggering), count
  * windows (timer flush of a partial window), ephemeral windows (timer-
  * driven state removal + key reopen). Same chunks, same micro-batch
  * boundaries, outputs compared as multisets.
  *
  * TWS requires the RocksDB state store provider, so each TWS run sets it
  * alongside graft.streaming.stateHost; the fmgws run stays on the default
  * provider — the comparison also re-proves provider-independence of the
  * state wrappers (RocksDBStateSpec's concern) along the way.
  */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit def ss: SparkSession = spark

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val HostKey = "graft.streaming.stateHost"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Run `build` over the chunks on the given host, one processAllAvailable
    * per chunk (identical micro-batch boundaries on both hosts), and return
    * the sink rows rendered sorted. */
  private def run[T: Encoder, U](
      chunks: Seq[Seq[T]], tsOf: T => Long, tws: Boolean, table: String)(
      build: Pipeline[T] => Pipeline[U]): Seq[String] = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevHost = spark.conf.getOption(HostKey)
    val prevProv = spark.conf.getOption(ProviderKey)
    if (tws) {
      spark.conf.set(HostKey, "transformWithState")
      spark.conf.set(ProviderKey, Provider)
    }
    try {
      val in = MemoryStream[T]
      val handle = build(
        Graft.source(table, DatasetSource(in.toDS(), tsOf))).toSink(MemorySink(table))
      try chunks.foreach { c => in.addData(c); handle.processAllAvailable() }
      finally handle.stop() // a failed run must not leak a live query into the shared session
      spark.table(table).collect().map(_.toString).toSeq.sorted
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v match { case Some(p) => spark.conf.set(k, p); case None => spark.conf.unset(k) }
      restore(HostKey, prevHost)
      restore(ProviderKey, prevProv)
    }
  }

  private def differential[T: Encoder, U](name: String,
      chunks: Seq[Seq[T]], tsOf: T => Long)(build: Pipeline[T] => Pipeline[U]): Unit = {
    val fmgws = run(chunks, tsOf, tws = false, s"${name}_fmgws")(build)
    val twsOut = run(chunks, tsOf, tws = true, s"${name}_tws")(build)
    assert(twsOut == fmgws,
      s"$name: transformWithState output differs from flatMapGroupsWithState")
    assert(fmgws.nonEmpty, s"$name: differential is vacuous (no output)")
  }

  test("keyed StateComputation: hosts agree") {
    import spark.implicits._
    differential("twsd_state",
      Seq(Seq("a b a", "b c"), Seq("a c c"), Seq("d")), (_: String) => 0L)(
      _.flatMapSeq((l: String) => l.split(" ").toSeq).keyBy(identity).to(CountWord))
  }

  test("sliding range windows: hosts agree (timer re-triggering)") {
    import spark.implicits._
    val chunks = Seq(
      Seq(Ev("k", 2, seconds(92)), Ev("k", 3, seconds(94)), Ev("j", 7, seconds(95))),
      Seq(Ev("k", 1, seconds(102)), Ev("j", 2, seconds(104))),
      // j-only traffic advances the watermark; k's windows must be
      // re-triggered by the TIMER on both hosts.
      Seq(Ev("j", 5, seconds(115)), Ev("j", 6, seconds(118))),
      Seq(Ev("k", 0, seconds(500)), Ev("j", 0, seconds(500))))
    differential("twsd_slide", chunks, (e: Ev) => e.ts)(
      _.keyBy(_.k).to(Graft.rangeWindows(seconds(10)).withSlide(seconds(2)).over(SumEv)))
  }

  test("count windows: hosts agree (timer flush of partial windows)") {
    import spark.implicits._
    val chunks = Seq(
      Seq(Ev("k", 1, seconds(10)), Ev("k", 2, seconds(11)), Ev("k", 3, seconds(12)),
        Ev("k", 4, seconds(13))), // triggers one full window of 3, leaves 1 pending
      // k silent while j advances the watermark far enough for k's 5 s
      // timeout flush to fire on both hosts.
      Seq(Ev("j", 10, seconds(30))),
      Seq(Ev("j", 20, seconds(40))))
    differential("twsd_count", chunks, (e: Ev) => e.ts)(
      _.keyBy(_.k).to(Graft.countWindows(3).over(SumEv)))
  }

  test("TWS host restarts from its checkpoint (state + timers in RocksDB)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevHost = spark.conf.getOption(HostKey)
    val prevProv = spark.conf.getOption(ProviderKey)
    spark.conf.set(HostKey, "transformWithState")
    spark.conf.set(ProviderKey, Provider)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_tws_out").toString
    try {
      val words = MemoryStream[String]
      def pipeline() = Graft
        .source("twsr", DatasetSource(words.toDS(), (_: String) => 0L))
        .keyBy(identity)
        .to(CountWord)
      val h1 = pipeline().toSink(IdempotentParquetSink(out), checkpointLocation = Some(ckpt))
      try { words.addData("a", "b", "a"); h1.processAllAvailable() }
      finally h1.stop()

      val h2 = pipeline().toSink(IdempotentParquetSink(out), checkpointLocation = Some(ckpt))
      try { words.addData("a", "c"); h2.processAllAvailable() }
      finally h2.stop()

      val rows = spark.read.parquet(out)
        .selectExpr("_1._1 AS word", "_1._2 AS cnt").as[(String, Long)]
        .collect().toSeq.sorted
      // Running totals resumed across the restart: a → 1,2 then 3.
      assert(rows == Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 1L), ("c", 1L)))
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v match { case Some(p) => spark.conf.set(k, p); case None => spark.conf.unset(k) }
      restore(HostKey, prevHost)
      restore(ProviderKey, prevProv)
    }
  }

  test("ephemeral windows: hosts agree (timer removal + reopen)") {
    import spark.implicits._
    val chunks = Seq(
      Seq(Ev("k", 1, seconds(10)), Ev("k", 2, seconds(12))),
      Seq(Ev("j", 1, seconds(17))),  // wm past k's trigger point (10+5)
      Seq(Ev("j", 1, seconds(25))),  // wm past k's remove point (15+5): state dropped
      Seq(Ev("k", 9, seconds(30))),  // k reopens a fresh window
      Seq(Ev("j", 0, seconds(60))))  // flush the reopened window
    differential("twsd_ephem", chunks, (e: Ev) => e.ts)(
      _.keyBy(_.k).to(Graft.ephemeralWindows(seconds(5), seconds(5)).over(SumEv)))
  }
}
