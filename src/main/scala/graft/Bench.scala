package graft

/** Per-round benchmark main. Each registered query is driven to a
  * `noop`-format write — unlike `.count()`, which lets Catalyst prune
  * every unused projection (a map-only query would be timed as a bare
  * scan-count), the noop sink evaluates the full result rows but writes
  * nothing (ADVICE r1).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    // Untimed warmup: pay JVM/codegen/parquet-reader initialization once,
    // instead of billing ~6 s of JIT to whichever query sorts first.
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "region").write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (streamSecs, streamRps) = StreamBench.run(spark, sfDir)
    val qs = (results ++ streamSecs)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rps = streamRps.map { case (k, v) => "\"" + k + "\":" + v.round }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"stream_rows_per_sec":$rps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
