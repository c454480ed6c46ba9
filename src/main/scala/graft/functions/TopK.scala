package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One ANN candidate flowing through [[TopKAgg]]: `key` is the ranking
  * value (exact cosine or ADC distance), `id` the neighbor id (the
  * deterministic tie-break), `vd`/`nrm` an optional carried payload (the
  * float vector + its norm, so the exact re-rank stage can score the
  * survivors without a second corpus scan; pass an empty array + 0.0
  * when the tail needs no payload). */
case class TopKCand(key: Double, id: Long, vd: Seq[Double], nrm: Double)

/** Bounded top-k-per-group as a typed Aggregator — the scale-safe
  * replacement for `row_number().over(Window.partitionBy(query_id))`
  * rank tails. The window form sorts the ENTIRE candidate stream through
  * one partition per query (a parallelism ceiling of NumQueries and a
  * full per-query sort); this buffer holds at most 2k candidates per
  * (group, input-partition), is mergeable, and therefore runs under
  * Spark's partial aggregation: every input partition reduces its
  * candidates map-side, the shuffle carries ≤k-entry buffers instead of
  * candidates, and no sort ever sees more than the buffered 2k rows.
  *
  * Ordering contract (must match the window it replaces so the oracle
  * stays hash-exact): `desc=false` selects the k smallest by
  * (key asc, id asc), `desc=true` the k largest by (key desc, id asc);
  * key compare is `java.lang.Double.compare` with -0.0 normalized to
  * 0.0 first — exactly Spark's nanSafeCompareDoubles (NaN greatest,
  * signed zeros EQUAL, so a ±0.0 tie falls through to the id
  * tie-break like the window and the DuckDB oracle both do).
  * `finish` emits the survivors already sorted, so `posexplode` yields
  * the 1-based rank as `pos + 1`.
  *
  * Amortized cost: insert is an append; every time the buffer reaches 2k
  * it sorts and truncates to k — O(log k) compares per candidate, O(k)
  * longs+doubles of memory per group per partition, regardless of group
  * cardinality.
  */
final class TopKAgg(k: Int, desc: Boolean)
    extends Aggregator[TopKCand, ArrayBuffer[TopKCand], Seq[TopKCand]] {
  require(k > 0)

  private object Ord extends Ordering[TopKCand] {
    // == 0.0 is true for both zeros and false for NaN, so the branch
    // maps -0.0 → 0.0 and leaves every other value (incl. NaN) alone
    private def norm(x: Double): Double = if (x == 0.0d) 0.0d else x
    def compare(a: TopKCand, b: TopKCand): Int = {
      val c0 = java.lang.Double.compare(norm(a.key), norm(b.key))
      val c = if (desc) -c0 else c0
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  def zero: ArrayBuffer[TopKCand] = ArrayBuffer.empty

  private def pruned(b: ArrayBuffer[TopKCand]): ArrayBuffer[TopKCand] =
    if (b.length <= k) b
    else {
      val arr = b.toArray
      java.util.Arrays.sort(arr, Ord)
      b.clear()
      var i = 0
      while (i < k) { b += arr(i); i += 1 }
      b
    }

  def reduce(b: ArrayBuffer[TopKCand], a: TopKCand): ArrayBuffer[TopKCand] = {
    b += a
    if (b.length >= 2 * k) pruned(b) else b
  }

  def merge(a: ArrayBuffer[TopKCand], b: ArrayBuffer[TopKCand]): ArrayBuffer[TopKCand] =
    pruned(a ++= b)

  def finish(b: ArrayBuffer[TopKCand]): Seq[TopKCand] = {
    val arr = b.toArray
    java.util.Arrays.sort(arr, Ord)
    arr.take(k).toSeq
  }

  def bufferEncoder: Encoder[ArrayBuffer[TopKCand]] =
    Encoders.kryo(classOf[ArrayBuffer[TopKCand]])
  def outputEncoder: Encoder[Seq[TopKCand]] = ExpressionEncoder()
}
