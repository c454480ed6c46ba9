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
  * /dev/shm when available (this rig: 128 GiB RAM vs ~15 MB of staged
  * artifacts at bench scale) and falls back to java.io.tmpdir.
  */
object Staging {
  lazy val root: String = sys.env.get("GRAFT_STAGE_DIR") match {
    case Some(dir) if dir.nonEmpty => dir
    case Some(_)                   => sys.props("java.io.tmpdir")
    case None =>
      val shm = new java.io.File("/dev/shm/graft-stage")
      if (shm.isDirectory || shm.mkdirs()) shm.getAbsolutePath
      else sys.props("java.io.tmpdir")
  }
}
