package graft

/** Dev tool: `runMain graft.CcJobsProbe [sfDir] [runs]` — runs d_cluster
  * (the connected-components fixpoint) to a noop sink with a job-level
  * listener attached and prints the TOTAL Spark job count plus wall
  * seconds per run. The r18 optimization folds the per-alternation
  * convergence checksum into the round's materializing action
  * (VERDICT r17 next #5: "done = jobs-per-alternation 2→1"), which is
  * invisible in a physical plan (the CC loop is RDD-materialized) — this
  * probe is the committed evidence shape for it. */
object CcJobsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local("graft-cc-jobs-probe")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "region").write.format("noop").mode("overwrite").save()
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        ()
      }
    })
    (1 to runs).foreach { r =>
      jobs.set(0L)
      val t0 = System.nanoTime()
      graft.operators.Dedup.dCluster(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async — settle before reading
      Thread.sleep(500)
      println(f"[cc-jobs] run $r: jobs=${jobs.get()} wall=$sec%.3f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    spark.stop()
  }
}
