package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.pipeline.TestSpark

/** Proves [[Skew]]'s two claims on a manufactured hot key (~90% of events
  * remapped to one user):
  *  1. the salted join / salted distinct-count return EXACTLY the plain
  *     plans' results (salting is a physical rewrite, never semantic);
  *  2. the hot key's rows, which hash-partition into ONE shuffle task
  *     unsalted, spread across the salt space salted — the straggler
  *     becomes n parallel tasks.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val Salts = 8

  /** events with ~90% of rows remapped to user 0 (deterministic). */
  private def skewed = Tables.events(spark, sfDir)
    .select(col("event_id"), col("event_type"),
      when(expr(s"pmod(${graft.functions.Portable.sparkHash("cast(event_id as string)", "skw")}, 10)") < 9, 0L)
        .otherwise(col("user_id")).as("user_id"),
      expr("cast(round(value * 100) as bigint)").as("cents"))

  test("salted join equals plain join and spreads the hot key") {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ — the regime where salting matters
    try {
      val ev = skewed
      val dim = ev.groupBy("user_id").agg(count(lit(1)).as("user_n"))
      val plain = ev.join(dim, "user_id")
        .select("event_id", "user_id", "user_n")
      val salted = Skew.saltedJoin(ev, dim, "user_id", "cast(event_id as string)", Salts)
        .select("event_id", "user_id", "user_n")
      val l = plain.collect().map(_.toString).sorted.toSeq
      val r = salted.collect().map(_.toString).sorted.toSeq
      assert(l == r && l.nonEmpty)

      // Distribution: per-(routing key) row counts. Unsalted, the hot
      // user is one shuffle key carrying ~90% of rows; salted it is
      // Salts keys of ~90/Salts% each.
      val total = ev.count().toDouble
      val hotShareUnsalted = ev.groupBy("user_id").count()
        .orderBy(desc("count")).limit(1).collect()(0).getLong(1) / total
      val hotShareSalted = ev
        .withColumn("_salt", expr(Skew.saltExpr("cast(event_id as string)", Salts)))
        .groupBy("user_id", "_salt").count()
        .orderBy(desc("count")).limit(1).collect()(0).getLong(1) / total
      assert(hotShareUnsalted > 0.8, s"fixture lost its skew: $hotShareUnsalted")
      assert(hotShareSalted < 2.0 * hotShareUnsalted / Salts,
        s"salting left a concentrated key: $hotShareSalted vs $hotShareUnsalted over $Salts salts")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }

  test("salted join keeps rows whose salt id is NULL") {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // props is NULL-able in events? Manufacture one: null id for even event_ids.
      val ev = skewed.withColumn("maybe_id",
        when(col("event_id") % 2 === 0, col("event_id").cast("string")))
      val dim = ev.groupBy("user_id").agg(count(lit(1)).as("user_n"))
      val plain = ev.join(dim, "user_id").select("event_id", "user_n")
        .collect().map(_.toString).sorted.toSeq
      val salted = Skew.saltedJoin(ev, dim, "user_id", "maybe_id", Salts)
        .select("event_id", "user_n")
        .collect().map(_.toString).sorted.toSeq
      // regression: a NULL id must salt as '' and keep the row, never drop it
      assert(salted == plain && plain.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }

  test("salted distinct count is exact") {
    val ev = skewed
    val plain = ev.groupBy("user_id")
      .agg(countDistinct(col("cents")).as("n_distinct"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedDistinctCount(ev, "user_id", "cents", Salts, "n_distinct")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }
}
