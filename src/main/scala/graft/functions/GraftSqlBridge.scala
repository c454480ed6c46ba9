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
}
