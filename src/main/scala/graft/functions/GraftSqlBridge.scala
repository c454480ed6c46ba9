package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Package-local bridge to Spark's InternalRow-based DataFrame
  * constructor, for `graft.operators.Caching.reuse`.
  *
  * Why it exists: a cached subtree persisted through the PUBLIC surface
  * (`df.rdd` → `createDataFrame(rdd, schema)`) round-trips every row
  * through external `Row` objects — deserialization on write, a Catalyst
  * converter on every read, and a heap of boxed objects in the block
  * store whose GC pressure measurably slows the queries that follow
  * (round-4 bench: d_ngram_jaccard 6 s → 28 s on the Row path).
  * Persisting the `InternalRow` (UnsafeRow — one compact byte array per
  * row) RDD instead keeps the cache allocation-free on read and ~columnar
  * in size, but the constructor that accepts an InternalRow RDD is
  * `private[sql]`, hence this one-object shim in the sql package — the
  * established pattern for Spark-native libraries that manage RDD-backed
  * plans (GraphFrames ships the same bridge).
  */
object GraftSqlBridge {
  /** The physical InternalRow RDD of a DataFrame. Rows are reused
    * mutable buffers — callers persisting the RDD must copy ([[Caching]]
    * does). */
  def toInternalRowRdd(df: Dataset[Row]): RDD[InternalRow] =
    df.queryExecution.toRdd

  def fromInternalRowRdd(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): Dataset[Row] =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, false)

  /** `(count, sum of xxhash64(<all columns>))` over an InternalRow RDD,
    * the sum as an EXACT signed 128-bit value `(hi, lo)` — identical
    * equality semantics to SQL's
    * `agg(count(1), sum(xxhash64(cols*).cast("decimal(38,0)")))`
    * (|sum| < 2⁶³·count < 2¹²⁷, so neither form can overflow or round),
    * but computed in ONE shuffle-free job: per-partition partials fold
    * on the driver, so the action that computes the checksum is also the
    * action that materializes (and persists) the RDD — no separate SQL
    * query, no partial→final aggregation exchange, no AQE stage job
    * (VERDICT r17 next #5: the d_cluster CC loop paid a two-stage
    * checksum aggregate per alternation). The hash is Catalyst's own
    * [[XxHash64]] with the SQL function's seed (42) and null rule,
    * evaluated on each row with the schema's field order — bit-identical
    * to `xxhash64(col₀, col₁, …)`. */
  def xxhash64Checksum(rdd: RDD[InternalRow], schema: StructType): (Long, Long, Long) = {
    val hashExpr = catalyst.expressions.XxHash64(
      schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        catalyst.expressions.BoundReference(i, f.dataType, f.nullable)
      }, 42L)
    // 128-bit signed accumulate: value = hi·2⁶⁴ + (lo as unsigned);
    // adding a signed 64-bit v contributes its sign extension to hi plus
    // the unsigned carry out of the low word.
    val partials = rdd.mapPartitions { it =>
      var cnt = 0L
      var hi = 0L
      var lo = 0L
      while (it.hasNext) {
        val h = hashExpr.eval(it.next()).asInstanceOf[Long]
        val nlo = lo + h
        hi += (h >> 63) + (((lo & h) | ((lo | h) & ~nlo)) >>> 63)
        lo = nlo
        cnt += 1
      }
      Iterator.single((cnt, hi, lo))
    }.collect()
    var cnt = 0L
    var hi = 0L
    var lo = 0L
    partials.foreach { case (c, phi, plo) =>
      val nlo = lo + plo
      hi += phi + (((lo & plo) | ((lo | plo) & ~nlo)) >>> 63)
      lo = nlo
      cnt += c
    }
    (cnt, hi, lo)
  }
}
