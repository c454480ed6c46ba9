package graft

import org.apache.spark.sql.functions._

/** Scratch probe (not part of the driver contract): old-vs-new IVF cell
  * assignment shape at scale — the ×20 demonstration VERDICT r8 #3 asked
  * for (the missing third of r7 #1's "done"). Stages embeddings ×N into
  * a temp dir, then times corpus-wide nearest-centroid assignment at
  * several centroid counts C two ways:
  *  - NEW: the [[graft.functions.NearestCells]] codegen'd row-local
  *    argmax over the plan-time centroid matrix (zero extra rows, zero
  *    exchange, zero window);
  *  - OLD: the shape it replaced — broadcast-join every vector against
  *    ALL C centroids (corpus×C intermediate rows) and keep the argmax
  *    through a `row_number().over(partitionBy(vec_id))` window, i.e.
  *    corpus×C rows (vectors included) through a full exchange + sort.
  * The win should GROW with C: the old shape's exchange volume is
  * corpus×C while the new shape stays one row per corpus vector with an
  * O(C·dim) row-local loop.
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val cs = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(128, 512))
    val spark = Sessions.local("graft-assign-probe")
    graft.functions.VectorFunctions.register(spark)
    val staged = java.nio.file.Files.createTempDirectory("graft_assign").toString

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

    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[assign x$n] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    for (c <- cs) {
      val centRows = vecs().filter(col("vec_id") < c)
        .select(col("vec_id"), col("vd"), col("nrm")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
        .sortBy(_._1)
      // NEW: plan-time matrix, row-local argmax
      val nearest = org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.NearestCells(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("vd"),
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("nrm"),
          new graft.functions.CentroidMatrix(centRows.flatMap(_._2),
            centRows.map(_._3), centRows.map(_._1)), 1))
      time(s"C=$c nearest_cells")(
        vecs().withColumn("cent_id", nearest.getItem(0))
          .select("vec_id", "cent_id"))
      // OLD: broadcast explode + window argmax (the pre-r8 shape)
      import org.apache.spark.sql.expressions.Window
      val centsDf = spark.createDataFrame(
        centRows.map { case (id, cd, cn) => (id, cd.toSeq, cn) }.toSeq)
        .toDF("cent_id", "cd", "cn")
      time(s"C=$c explode+window (old)")(
        vecs().join(broadcast(centsDf))
          .withColumn("ccos", expr("vec_dot(vd, cd) / (nrm * cn)"))
          .withColumn("rk", row_number().over(Window.partitionBy("vec_id")
            .orderBy(col("ccos").desc, col("cent_id").asc)))
          .filter(col("rk") === 1)
          .select("vec_id", "cent_id"))
    }
    // ×N staging is multi-hundred-MB per run — delete it (same hygiene
    // as StreamBench's staging dirs) so repeated probes don't fill /tmp
    StreamBench.deleteRecursively(new java.io.File(staged))
    spark.stop()
  }
}
