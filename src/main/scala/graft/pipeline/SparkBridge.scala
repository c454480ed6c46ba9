package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference `Aggregation[In, Out, Acc]` contract
  * (core/aggregations/aggregations.pony:24-39) expressed as a Spark
  * `Aggregator[IN, BUF, OUT]` — the mapping SURVEY §2.3 #17 promises:
  * initial_accumulator/update/combine/output ↔ zero/reduce/merge/finish.
  *
  * Spark's typed aggregation cannot see the grouping key or a window end
  * inside `finish`, so they are injected at construction (defaults for
  * global use); `output = None` suppression maps to a `null` result the
  * caller filters (the reference applies the suppression at emit time —
  * windows.pony GlobalWindow; same visible effect).
  *
  * Use this bridge when an Aggregation should run through Catalyst's
  * partial aggregation (map-side combine before the shuffle — the
  * reference's `local_key_by` pre-aggregation, application.pony:241-248,
  * for free) rather than through a per-key state machine.
  */
final class AggregationAsAggregator[In, Out, Acc](
    agg: Aggregation[In, Out, Acc],
    key: String = "",
    windowEndTs: Long = 0L)(
    implicit accEnc: Encoder[Acc], outEnc: Encoder[Out])
    extends Aggregator[In, Acc, Out] {
  def zero: Acc = agg.initialAccumulator()
  def reduce(acc: Acc, in: In): Acc = { agg.update(in, acc); acc }
  def merge(a: Acc, b: Acc): Acc = agg.combine(a, b)
  def finish(acc: Acc): Out =
    agg.output(key, windowEndTs, acc).getOrElse {
      // 'null result the caller filters' is unenforceable for value
      // types: null.asInstanceOf[Long] is 0L, so suppression would
      // silently become a legitimate-looking zero row. Fail loudly —
      // an Aggregation that suppresses must bridge with an AnyRef Out.
      if (outEnc.clsTag.runtimeClass.isPrimitive)
        throw new IllegalStateException(
          s"Aggregation '${agg.name}' suppressed its output (None) but its " +
            s"Out type ${outEnc.clsTag.runtimeClass} is a value type — null " +
            "would silently decay to zero. Use a boxed/Product Out (or an " +
            "Option field) when output() can return None.")
      null.asInstanceOf[Out]
    }
  def bufferEncoder: Encoder[Acc] = accEnc
  def outputEncoder: Encoder[Out] = outEnc
}

object AggregationAsAggregator {
  /** Buffer encoder for arbitrary accumulators. Kryo, matching the
    * streaming state codec: the buffer round-trips on every partial-agg
    * spill/merge, so codec throughput is on the aggregation hot path. */
  def bufferEnc[Acc <: AnyRef](cls: Class[Acc]): Encoder[Acc] =
    Encoders.kryo(cls)
}
