package graft

import org.apache.spark.sql.functions._

/** Scratch scale probe (not part of the driver contract): replicates the
  * documents/embeddings tables N× into a temp dir and times the dedup/ANN
  * operators that were round-1 scale-killers, to check growth is
  * near-linear after the fixes. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val spark = Sessions.local("graft-scale-probe")
    val staged = java.nio.file.Files.createTempDirectory("graft_scale").toString

    // documents: doc_id remapped per replica so ids stay unique
    val docs = Tables.documents(spark, sfDir)
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1
    docs.crossJoin(spark.range(n).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * maxId).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$staged/documents.parquet")
    val emb = Tables.embeddings(spark, sfDir)
    val maxV = emb.agg(max("vec_id")).head().getLong(0) + 1
    emb.crossJoin(spark.range(n).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * maxV).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$staged/embeddings.parquet")

    // events: event_id remapped per replica, user_id KEPT — so each user's
    // history grows 20× (the per-user sort/window state is what the funnel
    // and retention probes need to stress; fresh users would just be ×20
    // independent small problems). ts stays a raw ns long end-to-end.
    val evs = Tables.events(spark, sfDir)
    val maxE = evs.agg(max("event_id")).head().getLong(0) + 1
    evs.crossJoin(spark.range(n).select(col("id").as("rep")))
      .select((col("event_id") + col("rep") * maxE).as("event_id"),
        col("ts_ns").as("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$staged/events.parquet")

    val allProbes = Seq("d_exact", "d_ngram_jaccard", "d_minhash_lsh",
      "d_cluster", "d_simhash_pairs", "s_cosine_dups", "s_cosine_dups_scale",
      "s_ann_lsh", "t_clean_corpus", "t_repetition", "d_semantic_scale",
      "t_line_dedup", "s_ann_ivf_probe", "t_substring_dedup",
      "t_decontaminate", "t_top_terms", "t_pii_scrub",
      "t_perplexity", "q_events_funnel", "q_events_retention",
      "d_canonical", "t_mix_domains", "s_centroid_outliers", "p_funnel",
      "q_events_anomaly", "t_pipeline_e2e", "t_bpe_train", "t_bpe_encode",
      "m_phash_dedup", "t_quality_model", "t_seq_pack",
      "s_knn_graph", "s_quantize", "p_neardup", "t_ngram_lm",
      "t_dataset_card", "p_topk", "s_ann_pq", "s_ann_ivfpq",
      "p_market_spread", "s_ann_brute", "t_sample_stratified", "p_unaligned",
      "p_ann_search", "d_decontaminate_semantic")
    // optional second arg: comma-separated probe subset
    val probes = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(allProbes).filter(allProbes.contains)
    probes.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, staged).write.format("noop").mode("overwrite").save()
      println(f"[probe x$n] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc() // same teardown hygiene as Bench: cleanup outside the timed window
    }
    // The scale-sized variant: 12-bit bands → 4096 buckets per band.
    if (args.lift(1).isEmpty) {
      val t0 = System.nanoTime()
      operators.Similarity.sCosineDupsWith(spark, staged, 8, 12)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe x$n] s_cosine_dups_8x12 ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
