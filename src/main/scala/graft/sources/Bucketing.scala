package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-parquet co-location — the storage-side half of the 100 TB
  * join strategy.
  *
  * A fact-to-fact equi-join (lineitem ⋈ orders on orderkey) shuffles BOTH
  * sides every run: at 100 TB that shuffle dominates the query. Bucketing
  * pays the shuffle once at write time — each side is hash-partitioned
  * into N buckets on the join key and sorted within each bucket — after
  * which every subsequent join on that key is a zero-exchange sort-merge
  * join: Catalyst reads the bucket spec from the table metadata, plans
  * matching `HashPartitioning(key, N)` on both sides, and elides the
  * `Exchange` (and with `sortBy`, the per-task `Sort`) entirely.
  * BucketedJoinSpec asserts the plan shape.
  *
  * This is the Spark-native analogue of the reference keeping co-keyed
  * state on the same worker across steps (its consistent-hash routing,
  * core/routing/hash_partitions.pony) — the partitioning is agreed ONCE
  * and reused, instead of re-established per stage.
  *
  * Sizing at 100 TB: buckets ≈ table_bytes / target_task_bytes (128–256
  * MB); both sides of a recurring join must use the SAME bucket count
  * (or integer multiples, with `spark.sql.bucketing.coalesceBucketsInJoin
  * .enabled`) and the same key. Skewed keys skew buckets — bucket on the
  * highest-cardinality join key, never on a low-cardinality column.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted external parquet table.
    * `saveAsTable` is required — bucket metadata lives in the catalog,
    * plain `.parquet(path)` writes would lose it.
    *
    * Any existing catalog entry is dropped first: `mode("overwrite")`
    * alone reuses the existing table's path/bucket spec, so re-running
    * with a different path or bucket count could fail or silently write
    * under the old definition (ADVICE r3). Drop-then-create means last
    * writer wins (single-writer assumed — concurrent writers to the same
    * table name race, as with any catalog DDL). Note the drop removes
    * METADATA only (external table): re-pointing `path` leaves the old
    * location's files for the owner to reap. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
