package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation by deterministic salting — the manual
  * fallback when AQE's skew-join split can't apply (aggregation-side
  * skew, or a join AQE won't rewrite, e.g. under a required output
  * partitioning).
  *
  * The shape: a shuffle partitions by `hash(key) % P`, so one hot key —
  * a viral user, an empty-string fingerprint, a null-ish default — lands
  * its ENTIRE row set in one task while the other P−1 finish early; the
  * stage runs at the speed of that straggler (and at 100 TB, spills).
  * Salting widens the hot key across `nSalts` partitions:
  *
  *  - join: big side gets salt = H(row-id) % n (deterministic — xxhash64,
  *    no RNG, so retries/replays route identically); the SMALL side
  *    is exploded n× (one copy per salt value) and the join key becomes
  *    (key, salt). Replication factor n on the small side buys n-way
  *    parallelism on the hot key — same trade as a broadcast join, paid
  *    only n× instead of executors×.
  *  - aggregation: partial-agg by (key, salt), final agg by key. Spark's
  *    own map-side partial aggregation already does this implicitly for
  *    algebraic aggs, which is why only JOINS and exact-distinct need
  *    manual salt here.
  *
  * SkewSpec proves both properties: result equality with the unsalted
  * plan, and the hot key's shuffle-partition share dropping from ~all
  * rows in one task to spread across n.
  */
object Skew {

  /** Deterministic salt in [0, nSalts) from a row-id expression. NULL ids
    * salt as the empty string — concat would otherwise null the whole
    * hash and the salted using-join would DROP the row (the plain join
    * keeps it: its join key, not the id, decides matching).
    *
    * xxhash64, not the md5-based portable hash (r17; guide §2.5's own
    * recipe "pmod(xxhash64(id), …)"): the salt is PHYSICAL routing only —
    * no oracle mirrors it, so it needs determinism under task retry
    * (xxhash64 is a pure function of its input), not cross-engine
    * portability. The md5 form cost one digest + hex-conv per big-side
    * row on the hot path; xxhash64 is a codegen'd primitive. */
  def saltExpr(idExpr: String, nSalts: Int): String =
    s"pmod(xxhash64(coalesce(cast(($idExpr) as string), '')), $nSalts)"

  /** Salted equi-join: `big ⋈ small ON key` rewritten to route the big
    * side's hot keys across `nSalts` shuffle partitions. `idExpr` is any
    * big-side expression unique-ish per row (it only needs to spread —
    * an id column, or the key concatenated with a payload column). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      idExpr: String, nSalts: Int): DataFrame = {
    val b = big.withColumn("_salt", expr(saltExpr(idExpr, nSalts)))
    val s = small.withColumn("_salt",
      explode(expr(s"sequence(bigint(0), bigint(${nSalts - 1}))")))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted exact-distinct count per key: COUNT(DISTINCT v) shuffles every
    * (key, v) pair to key's one partition; salting by the VALUE splits a
    * hot key's distinct-set across n partial sets that are disjoint by
    * construction (same v → same salt), so the final per-key sum of
    * partial counts is exact. */
  def saltedDistinctCount(df: DataFrame, key: String, valueExpr: String,
      nSalts: Int, out: String): DataFrame =
    df.select(col(key), expr(valueExpr).as("_v"))
      .withColumn("_salt", expr(saltExpr("cast(_v as string)", nSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(countDistinct(col("_v")).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(out))
}
