package graft

import org.apache.spark.sql.functions._

/** Scratch probe (not part of the driver contract): the eval-set
  * capacity of d_decontaminate_semantic after the EvalMaxCosine matrix
  * expression (VERDICT r9 #2). The replaced form string-built one
  * `greatest(vec_dot(vd, <64-double literal>)/…)` term per eval vector —
  * at 10⁴ eval rows that is a ~40 MB expression tree and a generated
  * method far past Janino's 64 KB limit; it could not run at all. This
  * probe times the matrix form over a replicated corpus at eval sizes
  * 20 → 10⁴ and asserts the plan stays a zero-exchange scan, showing
  * wall linear in E (the O(E·dim) row loop) with no structural cliff.
  * A second ladder times the registered JOIN path
  * (d_decontaminate_semantic_join — the escape hatch past
  * SemEvalMaxDoubles) on the same inputs, asserting its
  * exactly-one-slim-exchange shape and pricing the matrix/join
  * crossover the guard message names.
  */
object DecontamProbe
    extends org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val evalSizes = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(20, 1000, 10000))
    val spark = Sessions.local("graft-decontam-probe")
    graft.functions.VectorFunctions.register(spark)
    val staged = java.nio.file.Files.createTempDirectory("graft_decontam").toString

    val emb = Tables.embeddings(spark, sfDir)
    val maxV = emb.agg(max("vec_id")).head().getLong(0) + 1
    emb.crossJoin(spark.range(n).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * maxV).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$staged/embeddings.parquet")

    def vecs() = Tables.embeddings(spark, staged)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("vd"))
      .withColumn("nrm", expr("sqrt(vec_dot(vd, vd))"))
    val corpus = vecs()
    val corpusN = corpus.count()

    // synthetic eval suites: deterministic unit-scale vectors from a
    // seeded generator (a probe needs stable sizes, not stable bits)
    def evalDf(e: Int) = {
      val rand = new scala.util.Random(e)
      import spark.implicits._
      Seq.tabulate(e)(i =>
        (i.toLong, Array.fill(64)(rand.nextDouble() * 2 - 1).toSeq))
        .toDF("vec_id", "vd")
        .withColumn("vd", col("vd").cast("array<double>"))
        .withColumn("nrm", expr("sqrt(vec_dot(vd, vd))"))
    }

    for (e <- evalSizes) {
      val out = graft.operators.Similarity
        .dDecontaminateSemanticWith(corpus, evalDf(e), 0.4)
      // AdaptiveSparkPlanHelper.collect descends INTO the
      // AdaptiveSparkPlanExec root AQE wraps the plan in (ADVICE r10:
      // plain TreeNode.collect saw only that leaf, so the zero-shuffle
      // require was vacuously true)
      val shuffles = collect(out.queryExecution.executedPlan) {
        case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => x
      }.size
      val t0 = System.nanoTime()
      out.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[decontam x$n] corpus=$corpusN eval=$e%-6d ${wall}%8.2f s  " +
        s"exchanges=$shuffles")
      require(shuffles == 0, "decontamination must stay a zero-shuffle scan")
      System.gc()
    }

    // The registered JOIN path (the escape hatch past SemEvalMaxDoubles)
    // at the same eval ladder: its structural claim is ONE slim keyed
    // exchange (~24 B/corpus row) whatever E — the broadcast pairing and
    // the partial MAX never move the corpus. Timing it side by side with
    // the matrix path prices the crossover the guard message names.
    for (e <- evalSizes) {
      val out = graft.operators.Similarity
        .dDecontaminateSemanticJoinWith(corpus, evalDf(e), 0.4)
      val shuffles = collect(out.queryExecution.executedPlan) {
        case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => x
      }.size
      val t0 = System.nanoTime()
      out.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[decontam-join x$n] corpus=$corpusN eval=$e%-6d ${wall}%8.2f s  " +
        s"exchanges=$shuffles")
      require(shuffles == 1,
        "the join path must pay exactly the one slim max exchange")
      System.gc()
    }

    StreamBench.deleteRecursively(new java.io.File(staged))
    spark.stop()
  }
}
