package graft.pipeline

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The per-key replay core shared by BOTH streaming hosts
  * (`flatMapGroupsWithState` in [[Pipeline]] and [[WrapperProcessor]]):
  * sort the micro-batch's rows for a key in event-time order, feed the
  * state machine with the watermark riding max(query watermark, max event
  * ts processed so far), handle mid-batch state removal/recreation.
  *
  * Rows stay in their host's native row type `R` (accessor functions
  * extract payload/ts) so neither host allocates per-row wrappers on the
  * hot path.
  */
private[pipeline] object StatefulReplay {

  /** Replay one key's micro-batch rows. Returns (outputs, final state);
    * `None` state means the machine requested removal (retain_state=false,
    * runner.pony:448-450) with no subsequent event re-opening it. */
  def replayInput[R, T, U](
      init: StateInitializer[T, U], key: String, rows: Iterator[R],
      wmNs: Long, existing: Option[KeyState[T, U]],
      value: R => T, ts: R => Long): (Vector[(U, Long)], Option[KeyState[T, U]]) = {
    var ks = existing.getOrElse(KeyState[T, U](init.stateWrapper(key), 0L))
    val outs = Vector.newBuilder[(U, Long)]
    var retain = true
    val buf = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    rows.foreach(r => buf += r.asInstanceOf[AnyRef])
    val arr = buf.toArray
    java.util.Arrays.sort(arr, new java.util.Comparator[AnyRef] {
      def compare(a: AnyRef, b: AnyRef): Int =
        java.lang.Long.compare(ts(a.asInstanceOf[R]), ts(b.asInstanceOf[R]))
    })
    // The watermark presented to the state machine rides max(query
    // watermark, max event ts processed so far) — the reference's sources
    // stamp each message's event time into the stage watermark as it
    // flows (core/source/source_handler.pony:28, watermarks.pony), which
    // Spark only folds into its global watermark at batch boundaries;
    // riding the per-key event time restores the per-message trigger
    // cadence and makes the streaming and batch-replay paths anchor
    // windows identically.
    var rideWm = wmNs
    var i = 0
    while (i < arr.length) {
      val r = arr(i).asInstanceOf[R]
      if (!retain) { // state was dropped mid-batch: fresh wrapper
        ks = KeyState[T, U](init.stateWrapper(key), ks.outputWm)
        retain = true
      }
      val t = ts(r)
      rideWm = math.max(rideWm, t)
      val (os, ow, ret) = ks.wrapper(value(r), t, rideWm)
      outs ++= os
      ks.outputWm = math.max(ks.outputWm, ow)
      retain = ret
      i += 1
    }
    (outs.result(), if (retain) Some(ks) else None)
  }

  /** Fire the per-key timer (the reference's per-step timer re-triggering
    * windows on watermark advance, runner.pony:465-501). */
  def fireTimeout[T, U](ks: KeyState[T, U], wmNs: Long):
      (Vector[(U, Long)], Option[KeyState[T, U]]) = {
    val (os, ow, retain) = ks.wrapper.onTimeout(wmNs, ks.outputWm)
    ks.outputWm = math.max(ks.outputWm, ow)
    (os, if (retain) Some(ks) else None)
  }
}

/** Streaming host #2: Spark 4's `transformWithState` (SPARK-46815) — the
  * same unit-tested [[StateWrapper]] machines on a [[StatefulProcessor]]
  * with FIRST-CLASS per-key event-time timers, selected per session via
  * `spark.conf.set("graft.streaming.stateHost", "transformWithState")`
  * (alias `"tws"`; the default host accepts `"flatMapGroups"`/`"fmgws"`).
  *
  * Why two hosts: `flatMapGroupsWithState` models the reference's
  * per-step timer (runner.pony:465-501) as a GroupStateTimeout — it fires
  * only for keys that saw no traffic in the batch, and each key carries at
  * most one implicit timeout timestamp. TWS timers are real state-store
  * entries (register/delete/list), the exact shape of the reference's
  * timer facility, and the API the Spark project is evolving (multiple
  * typed state variables, TTL, initial state). This host keeps exactly one
  * pending timer per key at watermark+1 — delete-then-register on every
  * re-arm — so the trigger cadence matches host #1 batch-for-batch
  * (TransformWithStateSpec pins output equality between the hosts).
  *
  * Scale notes: requires the RocksDB state store provider (a Spark
  * restriction on this API — and the provider a 100 TB deployment runs
  * anyway); state round-trips through the same Kryo codec as host #1, so
  * per-batch state costs are identical; timer entries add one (key, ts)
  * row per live key per batch to the timer column family, which RocksDB
  * absorbs in the same commit.
  */
private[pipeline] final class WrapperProcessor[T, U](
    init: StateInitializer[T, U], armTimer: Boolean)
    extends StatefulProcessor[String, (String, T, Long, java.sql.Timestamp), (U, Long)] {

  @transient private var st: ValueState[KeyState[T, U]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState("wrapper",
      Encoders.kryo(classOf[KeyState[T, U]]), TTLConfig.NONE)

  private def wmNs(tv: TimerValues): Long = {
    val ms = tv.getCurrentWatermarkInMs
    if (ms <= 0) 0L else ms * 1000000L
  }

  /** Exactly one pending timer per key: delete whatever is registered,
    * re-register at watermark+1 (host #1's setTimeoutTimestamp contract). */
  private def rearm(tv: TimerValues): Unit = {
    clearTimers()
    getHandle.registerTimer(math.max(tv.getCurrentWatermarkInMs, 0L) + 1L)
  }

  /** Materialize the timer list BEFORE deleting: mutating the timer
    * column family while iterating it relies on unspecified iterator
    * snapshot semantics — safe today only because the invariant is a
    * single timer, and this shouldn't break if that's ever relaxed or
    * the provider's iterator changes (ADVICE r3). */
  private def clearTimers(): Unit = {
    val h = getHandle
    val pending = scala.collection.mutable.ArrayBuffer.empty[Long]
    val it = h.listTimers()
    while (it.hasNext) pending += it.next().asInstanceOf[Long]
    pending.foreach(h.deleteTimer)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, T, Long, java.sql.Timestamp)],
      tv: TimerValues): Iterator[(U, Long)] = {
    val (outs, next) = StatefulReplay.replayInput[(String, T, Long, java.sql.Timestamp), T, U](
      init, key, rows, wmNs(tv),
      if (st.exists()) Some(st.get()) else None, _._2, _._3)
    next match {
      case Some(ks) => st.update(ks); if (armTimer) rearm(tv)
      case None     => st.clear(); clearTimers()
    }
    outs.iterator
  }

  override def handleExpiredTimer(key: String, tv: TimerValues,
      expired: ExpiredTimerInfo): Iterator[(U, Long)] = {
    if (!st.exists()) return Iterator.empty
    val (outs, next) = StatefulReplay.fireTimeout(st.get(), wmNs(tv))
    next match {
      case Some(ks) => st.update(ks); if (armTimer) rearm(tv)
      case None     => st.clear()
    }
    outs.iterator
  }
}
