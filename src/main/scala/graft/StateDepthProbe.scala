package graft

import java.nio.file.Files

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Scratch probe (not part of the driver contract): streaming STATE
  * DEPTH on tws+RocksDB (VERDICT r9 #4). Every bench stream row holds
  * ≤ ~100 K state rows — far from the spill regime a 100 TB deployment's
  * state store lives in — so this probe ladders the KEY count (the
  * state_rows axis) at a FIXED replay volume and records wall, sustained
  * rate, state rows/memory and summed commit_ms per step. Key widening:
  * `user_id · K + ts_ns mod K` splits each user into K keys, so rows and
  * event-time distribution stay identical while per-key history shrinks
  * K× and the store holds K× more keys — isolating state-depth cost from
  * input-volume cost. Three topologies: keyed scalar state (SpreadCheck,
  * 1 state row/key), sliding range windows (state rows = keys × live
  * windows — the depth workhorse), and Spark-native session windows
  * (state rows = open sessions). The SCALING.md table reads commit_ms
  * against state rows: sublinear growth = the RocksDB changelog commit
  * is amortizing; linear-or-worse is the honest wall.
  */
object StateDepthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val keyMults = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 10))
    val reps = args.lift(1).map(_.toInt).getOrElse(80)
    val spark = Sessions.local("graft-state-depth-probe")
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    implicit val long3Enc: org.apache.spark.sql.Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)

    // same replay staging as StreamBench's event rows (x80, 128 files)
    val staged = Files.createTempDirectory("graft_state_depth").toString
    Tables.events(spark, sfDir)
      .select(col("user_id"), expr("cast(round(value * 100) as bigint)").as("cents"),
        col("ts_ns"))
      .crossJoin(spark.range(reps.toLong).select(col("id")))
      .select(col("user_id"), col("cents"), (col("ts_ns") + col("id")).as("ts_ns"))
      .repartition(128).write.mode("overwrite").parquet(staged)
    val nRows = spark.read.parquet(staged).count()

    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    // validated override + measured-rule default, shared with StreamBench
    // (the ladder runs set GRAFT_STREAM_SHUFFLE explicitly per cell)
    spark.conf.set("spark.sql.shuffle.partitions",
      StreamBench.streamShufflePartitions(spark).toString)
    // the tws+rocksdb host — the provider a spill-regime deployment runs
    spark.conf.set("graft.streaming.stateHost", "transformWithState")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")

    def source(keyMult: Int) = ParquetReplaySource[(Long, Long, Long)](
      staged,
      (r: Row) => (r.getLong(0) * keyMult + math.floorMod(r.getLong(2), keyMult.toLong),
        r.getLong(1), r.getLong(2)),
      (r: Row) => r.getLong(2),
      maxFilesPerTrigger = 32)

    def stats(q: Option[org.apache.spark.sql.streaming.StreamingQuery]): (Long, Long, Long) =
      q.map(progressStats).getOrElse((0L, 0L, 0L))

    def run(label: String, keyMult: Int)(
        build: SourceConfig[(Long, Long, Long)] => Pipeline[_]): Unit = {
      val t0 = System.nanoTime()
      val handle = build(source(keyMult)) match {
        case p: Pipeline[t] => p.toSink(EmptySink[t](),
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      }
      handle.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val (rows, mem, commitMs) = stats(handle.query)
      println(f"[state-depth] $label%-14s keys x$keyMult%-4d ${sec}%7.2f s  " +
        f"${nRows / sec / 1e6}%5.2f M rows/s  state_rows=$rows%-8d " +
        f"state_mb=${mem / 1e6}%8.1f  commit_ms=$commitMs")
      handle.stop()
      // the StreamBench between-trials teardown: unload cached providers,
      // collect, and drain writeback debt so a prior run's flush storm
      // can't land inside this run's commit path (the r10 diagnosis —
      // the first published x100 statecomp cell predates this)
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      System.gc()
      StreamBench.syncFs()
    }

    for (k <- keyMults) {
      run("statecomp_tws", k)(src =>
        Graft.source("depth-statecomp", src)
          .keyBy(_._1.toString)
          .to(StreamBench.SpreadCheck)(
            Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)))
      run("sliding_tws", k)(src =>
        Graft.source("depth-sliding", src)
          .keyBy(_._1.toString)
          .to(Graft.rangeWindows(1800L * 1000000000L).withSlide(600L * 1000000000L)
            .over(graft.operators.PipelineQueries.WindowCents))(
            Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)))
      // session windows ride the Spark-native host (session_window needs
      // the SQL aggregation path, as in StreamBench's sessionTrial)
      sessionRun(spark, "session", k, staged, nRows)
    }

    // Attribution cell (VERDICT r10 #6): one extra session cell at the
    // SAME ×K key multiplier over HALF the replica count. Measured
    // finding (SCALING.md §r11): live sessions track the REPLICA
    // count, not the key grid — each (base session, replica) pair is
    // its own keyed session, so this cell halves live sessions AND
    // replayed rows together while the key space stays ×K (state_rows
    // in the printout verifies: 7 637 200 → 3 818 600 at ×100/80→40).
    // Read it against the full-volume cell as a joint-volume scaling
    // check: wall ≈ half with commit_ms flat (the measured outcome)
    // means the ×K wall growth is LINEAR per-session aggregation work
    // and the store commit is depth-independent; a wall that stayed
    // high, or a commit that halved, would point at the store instead.
    if (args.lift(2).contains("half")) {
      val halfStaged = Files.createTempDirectory("graft_state_depth_half").toString
      Tables.events(spark, sfDir)
        .select(col("user_id"), expr("cast(round(value * 100) as bigint)").as("cents"),
          col("ts_ns"))
        .crossJoin(spark.range((reps / 2).toLong).select(col("id")))
        .select(col("user_id"), col("cents"), (col("ts_ns") + col("id")).as("ts_ns"))
        .repartition(128).write.mode("overwrite").parquet(halfStaged)
      val halfRows = spark.read.parquet(halfStaged).count()
      StreamBench.syncFs()
      sessionRun(spark, "session_half", keyMults.max, halfStaged, halfRows)
      StreamBench.deleteRecursively(new java.io.File(halfStaged))
    }

    spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    StreamBench.deleteRecursively(new java.io.File(staged))
    spark.stop()
  }

  /** Steady-state telemetry from a finished query's progress events:
    * (state rows at last batch, memory, summed commit ms) — one copy,
    * shared by the tws ladder rows and the session cells. */
  private def progressStats(
      q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long, Long) = {
    val all = q.recentProgress.filter(_.numInputRows > 0)
    val ps = if (all.length > 1) all.drop(1) else all
    val ops = ps.flatMap(_.stateOperators)
    if (ops.isEmpty) (0L, 0L, 0L)
    else {
      val last = ps.last.stateOperators
      (last.map(_.numRowsTotal).sum, last.map(_.memoryUsedBytes).sum,
        ops.map(_.commitTimeMs).sum)
    }
  }

  private def sessionRun(spark: org.apache.spark.sql.SparkSession, label: String,
      k: Int, stagedDir: String, rowCount: Long): Unit = {
    val t0 = System.nanoTime()
    val schema = spark.read.parquet(stagedDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 32).parquet(stagedDir)
      .select((col("user_id") * k + pmod(col("ts_ns"), lit(k.toLong))).as("user_id"),
        timestamp_micros(expr("ts_ns div 1000")).as("ts"), col("cents"))
      .withWatermark("ts", "3650 days")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
      .writeStream.format("noop").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val (rows, mem, commitMs) = progressStats(q)
    println(f"[state-depth] $label%-14s keys x$k%-4d ${sec}%7.2f s  " +
      f"${rowCount / sec / 1e6}%5.2f M rows/s  state_rows=$rows%-8d " +
      f"state_mb=${mem / 1e6}%8.1f  commit_ms=$commitMs")
    q.stop()
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    System.gc()
    StreamBench.syncFs()
  }
}
