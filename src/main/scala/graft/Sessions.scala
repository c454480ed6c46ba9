package graft

import org.apache.spark.sql.SparkSession

/** One place to build SparkSessions so Verify, Bench and the test suites
  * agree on session-wide semantics. Nothing here mutates a session after
  * construction — all confs are fixed at build time (the events table's
  * TIMESTAMP(NANOS) handling used to be set lazily at plan-build time,
  * which is racy; see ADVICE r1).
  */
object Sessions {

  /** Confs every graft session needs, applied to a builder. */
  def tune(b: SparkSession.Builder, shufflePartitions: String): SparkSession.Builder = {
    // Shuffle/spill files on tmpfs when available: this rig's /tmp sits on
    // a shared-host virtio disk whose IO stalls showed up as 5-40x swings
    // on the shuffle-heavy operators (round-4 bench forensics); RAM is
    // 128 GiB vs a few GiB of shuffle at bench scale. A real cluster
    // points spark.local.dir at executor-local NVMe instead.
    // GRAFT_DISK_LOCAL_DIR=<path> points spark.local.dir at that path
    // (e.g. executor-local NVMe); GRAFT_DISK_LOCAL_DIR= (empty) just opts
    // out of the tmpfs default and leaves Spark's /tmp default (ADVICE r4:
    // the value used to be ignored, which surprised anyone setting a path).
    val localDir = sys.env.get("GRAFT_DISK_LOCAL_DIR") match {
      case Some(dir) if dir.nonEmpty => Some(dir)
      case Some(_)                   => None
      case None =>
        val shm = new java.io.File("/dev/shm/graft-spark-local")
        if (shm.isDirectory || shm.mkdirs()) Some(shm.getAbsolutePath) else None
    }
    val tuned = b.config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet has shipped ts as TIMESTAMP(NANOS) (Spark has no
      // ns timestamp type, so read the raw int64 — reference keeps u64 ns
      // event time: lib/wallaroo/core/source/source_handler.pony:28) and
      // as TIMESTAMP(MICROS), where this conf is a no-op. Tables.events
      // branches on the loaded dataType; keep the conf for the ns layout.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Streaming-checkpoint file checksums (Spark 4.1 default ON) write
      // and fsync a SECOND file per state-store delta/metadata-log entry.
      // Measured on the keyed wire row (r17 adjacent-run pairs, SCALING.md
      // r17 §fixed-cost split): summed per-batch state commit 2.3-3.2 s
      // with checksums vs 0.72-0.83 s without — ~3× on the state-commit
      // path — while walCommit/commitOffsets stay ~40 ms either way (the
      // metadata-log protocol itself, not the checksum, is their floor).
      // The reference's own state checkpoint has no checksum layer
      // (recovery log = raw entries + length framing), so OFF is also the
      // like-for-like comparison shape. Deployments that want media-
      // corruption detection on checkpoint files opt back in:
      // GRAFT_CKPT_CHECKSUM=1.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.get("GRAFT_CKPT_CHECKSUM").contains("1").toString)
    localDir.fold(tuned)(tuned.config("spark.local.dir", _))
  }

  /** local[n] session for Verify/Bench/tests; n from SPARK_GRAFT_CPUS,
    * defaulting to every available core (the target rig is local[32]);
    * shuffle partitions match so each core gets exactly one shuffle task. */
  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = tune(SparkSession.builder().appName(appName).master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
