package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Power-of-two-bin latency histogram
  * (core/metrics/histogram.pony:21-66): bin i holds values in
  * [2^(i−1), 2^i) — 2,3→bin 2, 4..7→bin 3 — i.e. floor(log2(v))+1, the
  * Pony `64 - v.clz()` exactly; `report`'s labels are EXCLUSIVE upper
  * bounds (a recorded 8 reports under label 16). Min/max and total count
  * ride along for throughput reporting. 65 bins cover the full
  * u64/Long range. (The former doc claimed ceil(log2) with inclusive
  * bounds — it contradicted both this code and the reference formula it
  * mirrors; MetricsSpec pins the real contract.) */
final class LatencyHistogram extends Serializable {
  private val counts = new Array[Long](65)
  private var minV: Long = Long.MaxValue
  private var maxV: Long = 0L

  /** 64 − clz(v): 0→bin 0, 1→bin 1, 3..4→bin 2... matching the Pony
    * `64 - v.clz()` (get_idx). */
  def binIdx(v: Long): Int =
    if (v == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)

  def record(v: Long): Unit = synchronized {
    counts(binIdx(v)) += 1
    if (v < minV) minV = v
    if (v > maxV) maxV = v
  }

  def count(i: Int): Long = synchronized(counts(i))
  def size: Long = synchronized(counts.sum)
  def min: Long = synchronized(minV)
  def max: Long = synchronized(maxV)

  /** Non-empty bins as (upper-bound, count) pairs. */
  def report: Seq[(Long, Long)] = synchronized {
    (0 until 65).collect {
      case i if counts(i) > 0 =>
        (if (i >= 63) Long.MaxValue else 1L << i, counts(i))
    }
  }
}

/** Streaming metrics via Spark's listener bus — the role of the
  * reference's MetricsReporter + monitoring hub
  * (core/metrics/metrics.pony:37-49: computation, start-to-end,
  * node-ingress-egress, pipeline-ingestion categories map onto
  * QueryProgressEvent's operator/batch durations). Per-query:
  * batch-duration histogram (ms, power-of-2 bins) and processed-rows
  * throughput. */
final class GraftMetricsListener extends StreamingQueryListener {
  final case class QueryMetrics(
      batchDurationMs: LatencyHistogram = new LatencyHistogram,
      var rows: Long = 0L,
      var batches: Long = 0L)

  private val queries = new ConcurrentHashMap[String, QueryMetrics]()

  // A query started without .queryName(...) reports a NULL name, and
  // ConcurrentHashMap rejects null keys — the listener bus would swallow
  // the NPE and that query's metrics silently vanish. Key such queries
  // by their stable id instead.
  private def keyOf(name: String, id: java.util.UUID): String =
    if (name != null) name else id.toString

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    queries.putIfAbsent(keyOf(event.name, event.id), QueryMetrics())

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val m = queries.computeIfAbsent(
      keyOf(event.progress.name, event.progress.id), _ => QueryMetrics())
    m.batchDurationMs.record(event.progress.batchDuration)
    m.synchronized { m.rows += event.progress.numInputRows; m.batches += 1 }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def metricsFor(name: String): Option[QueryMetrics] = Option(queries.get(name))

  def summary: Map[String, (Long, Long, Seq[(Long, Long)])] = {
    val out = Map.newBuilder[String, (Long, Long, Seq[(Long, Long)])]
    queries.forEach((k, m) => out += k -> ((m.rows, m.batches, m.batchDurationMs.report)))
    out.result()
  }
}
