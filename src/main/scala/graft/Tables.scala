package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet star schema (see TESTDATA.md).
  *
  * All readers go through [[Tables.load]] so every query inherits the same
  * scan behavior: parquet vectorized reads, predicate pushdown and column
  * pruning are left to Catalyst (we never cache or materialize here — at
  * 100 TB the scan must stream).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at any realistic scale factor
    * (region/nation are fixed-size dimension tables in TPC-H-style data;
    * supplier/part grow with SF but stay several orders of magnitude
    * smaller than lineitem — at 100 TB of lineitem, part/supplier are
    * 10s of GB and should NOT be broadcast; only region/nation always
    * qualify, so only they are hinted unconditionally).
    */
  val alwaysBroadcast: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (alwaysBroadcast(name)) org.apache.spark.sql.functions.broadcast(df) else df
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * has no native type for. We read it as a raw nanosecond Long
    * (`spark.sql.legacy.parquet.nanosAsLong`, set once at SparkSession
    * construction — see [[Sessions.tune]]) — mirroring the reference's
    * u64-ns event time (source_handler.pony:28) — keep it as `ts_ns` for
    * ns-exact window arithmetic, and derive a µs `ts` TimestampType
    * column for Spark's built-in event-time operators. Integer `div`
    * (not `/`) so the 1.7e18-scale ns value never round-trips through a
    * 53-bit double. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events reads TIMESTAMP(NANOS) parquet: build the session with " +
        "graft.Sessions (sets spark.sql.legacy.parquet.nanosAsLong=true)")
    load(s, d, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  /** documents carry the corpus text the dedup/text operators shingle and
    * md5 — per-row CPU dwarfs scan cost for them. The small-SF testdata is
    * one parquet row group = ONE scan task, which serializes all that
    * hashing; spread rows across the cluster first. Conditional so a
    * corpus that already arrives as many files (the 100 TB case) is never
    * gratuitously shuffled — then the scan's own parallelism wins. */
  def documents(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "documents")
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
