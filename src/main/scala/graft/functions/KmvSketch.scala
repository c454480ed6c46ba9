package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded KMV (k-minimum-values) sketch as a typed Aggregator: the
  * buffer is the sorted array of the ≤ k smallest DISTINCT hash values
  * seen — at most k longs per group per partial buffer, regardless of
  * group cardinality. `reduce` is an insert-if-smaller into a bounded
  * sorted array; `merge` is the same insert fold (mergeable = the
  * sketch's defining property), so Spark's map-side partial aggregation
  * applies and the shuffle carries k longs per group — this is what
  * makes the estimator usable where exact COUNT(DISTINCT) shuffles every
  * (group, value) pair.
  *
  * finish() emits (distinct-count-in-buffer, k-th smallest hash) — the
  * two numbers the KMV estimate n ≈ (k−1)·M/h_k needs; the estimate
  * itself is computed in the query so the constant M (2^48, the
  * portable-hash range) stays beside the oracle SQL that mirrors it.
  */
final class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], (Int, Long)] {
  require(k > 0)

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var r = a
    var i = 0
    while (i < b.length) { r = insert(r, b(i)); i += 1 }
    r
  }

  def finish(b: Array[Long]): (Int, Long) =
    (b.length, if (b.length == k) b(k - 1) else Long.MaxValue)

  /** Sorted-array insert keeping the k smallest, skipping duplicates
    * (KMV is over DISTINCT hashes — a repeated value must not occupy a
    * second slot). */
  private def insert(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (ins >= k) b // larger than the current k-th smallest
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo(classOf[Array[Long]])
  def outputEncoder: Encoder[(Int, Long)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
}
