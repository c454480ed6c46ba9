package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-5 cleaning operators — properties the
  * hash-vs-oracle gate can't express (it proves both engines agree, not
  * that the agreed answer has the intended shape). */
class CleaningOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("d_canonical keeps exactly one representative per cluster, covering every doc") {
    val out = Dedup.dCanonical(spark, dir).cache()
    try {
      val perCluster = out.groupBy("cluster_id")
        .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("kept_n"))
      assert(perCluster.filter(col("kept_n") =!= 1L).count() === 0,
        "every cluster must keep exactly one doc")
      val nDocs = graft.Tables.documents(spark, dir).count()
      assert(out.count() === nDocs, "every doc must be labeled")
      // the representative must be a quality argmax of its cluster:
      // no cluster-mate may strictly beat the kept doc's score
      val q = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), expr(TextAnalysis.sparkQualityScore).as("qs"))
      val j = out.join(q, "doc_id")
      val kept = j.filter(col("kept"))
        .select(col("cluster_id"), col("qs").as("kept_qs"))
      val beaten = j.join(kept, "cluster_id")
        .filter(col("qs") > col("kept_qs"))
      assert(beaten.count() === 0, "kept doc must have max quality in cluster")
    } finally out.unpersist()
  }

  test("t_mix_domains hits its integer targets exactly and never oversamples a domain") {
    val out = TextAnalysis.tMixDomains(spark, dir).cache()
    try {
      val counts = out.groupBy("lang")
        .agg(count(lit(1)).as("got"), max("lang_target").as("tgt"))
      assert(counts.filter(col("got") =!= col("tgt")).count() === 0,
        "each domain must yield exactly its target count")
      val total = out.count()
      assert(total <= TextAnalysis.MixSampleN,
        s"floor allocation can only undershoot N: $total")
      // α = 0.5 up-weights small domains: sampled fraction of the
      // smallest domain must be >= that of the largest
      val byLang = graft.Tables.documents(spark, dir)
        .groupBy("lang").agg(count(lit(1)).as("c"))
      val fr = counts.join(byLang, "lang")
        .select(col("lang"), col("c"), col("got") / col("c") as "frac")
        .collect().sortBy(_.getAs[Long]("c"))
      assert(fr.head.getAs[Double]("frac") >= fr.last.getAs[Double]("frac") - 1e-9,
        "temperature sampling must not under-weight the smallest domain")
    } finally out.unpersist()
  }

  test("s_centroid_outliers flags the far-from-centroid tail at ~10%") {
    val out = Similarity.sCentroidOutliers(spark, dir).cache()
    try {
      val n = out.count()
      val flagged = out.filter(col("is_outlier")).count()
      // strict-> above the exact nearest-rank P90: at most 10%, and
      // nonzero unless a label's top decile is all ties
      assert(flagged > 0 && flagged <= (n * 0.11).toLong + 1,
        s"flagged $flagged of $n")
      // every outlier must be strictly farther than every non-outlier
      // within its label
      val maxIn = out.filter(!col("is_outlier"))
        .groupBy("label").agg(max("d2_centroid").as("max_in"))
      val minOut = out.filter(col("is_outlier"))
        .groupBy("label").agg(min("d2_centroid").as("min_out"))
      val bad = maxIn.join(minOut, "label").filter(col("min_out") <= col("max_in"))
      assert(bad.count() === 0, "outlier set must be an upper tail per label")
    } finally out.unpersist()
  }

  test("t_quality_model score is the exact hash-weight sum (JVM differential)") {
    val out = TextAnalysis.tQualityModel(spark, dir).cache()
    try {
      // recompute a sample of documents token-by-token on the JVM with
      // the same portable hash — the engine's HOF fold must agree exactly
      val docs = graft.Tables.documents(spark, dir)
        .select("doc_id", "text").limit(20).collect()
      val expected = docs.map { r =>
        val toks = r.getString(1).toLowerCase.split(" ", -1)
        r.getLong(0) -> toks.map(t =>
          graft.functions.Portable.jvmHash(t, "qmw") % 2001 - 1000).sum
      }.toMap
      val got = out.filter(col("doc_id").isin(expected.keys.toSeq: _*))
        .select("doc_id", "score_int", "n_toks", "keep", "score").collect()
      assert(got.length === expected.size)
      got.foreach { r =>
        assert(r.getLong(1) === expected(r.getLong(0)),
          s"doc ${r.getLong(0)}: engine fold must equal JVM sum")
        assert(r.getBoolean(3) === (r.getDouble(4) > 0.0))
        assert(r.getLong(2) > 0L)
      }
    } finally out.unpersist()
  }

  test("t_seq_pack slices tile every sequence exactly and cover every doc") {
    val out = TextAnalysis.tSeqPack(spark, dir).cache()
    try {
      val L = TextAnalysis.PackBudget
      val lastSeq = out.agg(max("seq_id")).head.getLong(0)
      // every sequence but the last is filled to exactly L tokens with
      // slices that tile [0, L): positions are contiguous and non-overlapping
      val perSeq = out.groupBy("seq_id").agg(
        sum("len").as("filled"), min("pos_begin").as("first"),
        max(col("pos_begin") + col("len")).as("end"))
      val badFull = perSeq.filter(col("seq_id") < lastSeq &&
        (col("filled") =!= L || col("first") =!= 0L || col("end") =!= L))
      assert(badFull.count() === 0, "interior sequences must be exactly full")
      // per doc: slices are contiguous in doc_off and sum to the doc's tokens
      val docs = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), expr(
          s"cast(size(${graft.functions.Portable.sparkTokens("text")}) as bigint)")
          .as("n_toks"))
      val perDoc = out.groupBy("doc_id").agg(
        sum("len").as("covered"), min("doc_off").as("off0"))
      val badDoc = perDoc.join(docs, "doc_id")
        .filter(col("covered") =!= col("n_toks") || col("off0") =!= 0L)
      assert(badDoc.count() === 0, "doc slices must cover each doc exactly once")
      // overlap-freedom inside a sequence: count of slices == count of
      // distinct pos_begin and tiling implies no two slices share a position
      val dup = out.groupBy("seq_id", "pos_begin").count().filter(col("count") > 1)
      assert(dup.count() === 0, "two slices must not start at the same position")
    } finally out.unpersist()
  }

  test("t_ngram_lm scores every token exactly once with non-negative bits") {
    val out = TextAnalysis.tNgramLm(spark, dir).cache()
    try {
      val docs = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), expr(
          s"cast(size(${graft.functions.Portable.sparkTokens("text")}) as bigint)")
          .as("n_toks"))
      // first token + one bigram per adjacent pair = exactly n_toks events
      val bad = out.join(docs, "doc_id").filter(col("n_scored") =!= col("n_toks"))
      assert(bad.count() === 0, "every token must be scored exactly once")
      assert(out.filter(col("total_bits") < 0).count() === 0,
        "conditional counts can never exceed their context count")
      assert(out.count() === docs.count(), "every doc must be scored")
    } finally out.unpersist()
  }

  test("t_dataset_card metrics are internally consistent") {
    val card = TextAnalysis.tDatasetCard(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card.size === 8)
    val nDocs = graft.Tables.documents(spark, dir).count().toDouble
    assert(card("n_docs") === nDocs)
    assert(card("dup_rate") >= 0.0 && card("dup_rate") < 1.0)
    assert(card("p50_doc_tokens") <= card("p90_doc_tokens"))
    assert(card("mean_doc_tokens") > 0.0 &&
      math.abs(card("n_tokens") - card("mean_doc_tokens") * nDocs) < 1e-6)
    assert(card("n_langs") >= 1.0 && card("n_sources") >= 1.0)
  }

  test("p_funnel depths are monotone counts bounded by the step list") {
    val out = graft.operators.PipelineQueries.pFunnel(spark, dir).cache()
    try {
      val n = out.count()
      assert(n > 0)
      val bad = out.filter(col("steps_completed") < 1 ||
        col("steps_completed") > Queries.funnelSteps.size)
      assert(bad.count() === 0, "depth must be in [1, n_steps]")
    } finally out.unpersist()
  }
}
