package graft.operators

/** Staging root for operators that materialize an intermediate ARTIFACT
  * as part of their contract (q_bucket_join's bucketed tables,
  * p_ann_search's partitioned index) — r17, guide §6.
  *
  * These artifacts are written and read back inside every invocation
  * (nothing survives a run; the per-call generation suffixes and the
  * keep-2 cleanup at the call sites are unchanged). What the staging
  * root decides is only WHICH DEVICE absorbs the write: the default
  * `java.io.tmpdir` put them on this rig's shared-host virtio /tmp —
  * the same device whose I/O stalls sent shuffle times 5-40x sideways
  * before spark.local.dir moved to tmpfs (Sessions.tune, round-4
  * forensics) — so the staged-write rows paid disk latency that
  * measures the host, not the operator. A real deployment stages
  * index/table builds on executor-local NVMe or cluster storage.
  *
  * Same env contract as GRAFT_DISK_LOCAL_DIR: GRAFT_STAGE_DIR=<path>
  * stages there (e.g. NVMe on a cluster); GRAFT_STAGE_DIR= (empty)
  * opts out of the tmpfs default and keeps java.io.tmpdir; unset picks
  * a per-user dir under /dev/shm when available and falls back to
  * java.io.tmpdir.
  *
  * Guards on the unset-default path (VERDICT r17 next #7a / ADVICE r17):
  *  - the dir is per-user (`graft-stage-<user>`) and must be OWNED by
  *    the current user — a world-shared fixed path could be
  *    pre-created by another local user;
  *  - tmpfs must have ≥ [[MinShmFreeBytes]] usable — staged artifacts
  *    scale with the dataset (q_bucket_join stages lineitem/orders
  *    projections, keep-2 retains two generations) and /dev/shm is the
  *    same RAM that backs spark.local.dir's shuffle space, so a large
  *    scale factor must degrade to disk staging, not exhaust memory
  *    mid-run (bench scale: ~15 MB staged vs 128 GiB);
  *  - a NON-LOCAL Spark master warns loudly: node-local staging breaks
  *    the read-back on a multi-executor cluster — set GRAFT_STAGE_DIR
  *    to shared/NVMe storage there.
  */
object Staging {
  /** Floor of usable bytes /dev/shm must report for the tmpfs default
    * to engage (4 GiB — two generations of staged artifacts plus slack
    * at any SF this rig benches; beyond that, fall back to disk). */
  private[operators] val MinShmFreeBytes: Long = 4L << 30

  private def warnIfNonLocalMaster(): Unit =
    for {
      spark <- org.apache.spark.sql.SparkSession.getActiveSession
      master = spark.sparkContext.master
      if !master.startsWith("local")
    } System.err.println(s"[staging] WARNING: master '$master' is not " +
      "local and GRAFT_STAGE_DIR is unset — the /dev/shm default is " +
      "node-local, so executors cannot read back staged artifacts; set " +
      "GRAFT_STAGE_DIR to shared or executor-visible storage")

  lazy val root: String = sys.env.get("GRAFT_STAGE_DIR") match {
    case Some(dir) if dir.nonEmpty => dir
    case Some(_)                   => sys.props("java.io.tmpdir")
    case None =>
      warnIfNonLocalMaster()
      val user = sys.props.getOrElse("user.name", "unknown")
      val shm = new java.io.File(s"/dev/shm/graft-stage-$user")
      val ownedByUs =
        try {
          (shm.isDirectory || shm.mkdirs()) &&
            java.nio.file.Files.getOwner(shm.toPath).getName == user
        } catch { case _: Exception => false }
      if (ownedByUs && shm.getUsableSpace >= MinShmFreeBytes)
        shm.getAbsolutePath
      else sys.props("java.io.tmpdir")
  }
}
