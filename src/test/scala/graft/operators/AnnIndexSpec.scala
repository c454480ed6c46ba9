package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TestSpark

/** The IVF-PQ index LIFECYCLE: a deployment builds the index once,
  * writes it to parquet partitioned by the coarse cell, and serves
  * queries from the materialized copy. Pins that
  *  1. the index schema is the compact layout the 100 TB story claims
  *     (id + cell + PqSub small code ids; vectors ride along only for
  *     the re-rank fetch),
  *  2. searching a parquet-round-tripped index is IDENTICAL to the
  *     inline registered query — build and search re-derive their
  *     centroids/codebooks deterministically, so no model state needs
  *     shipping alongside the index files. */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("materialized index: parquet round-trip searches identically to inline") {
    val inline = Similarity.sAnnIvfPq(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val index = Similarity.buildIvfPqIndex(spark, dir)
    val expectedCols = Seq("neighbor_id", "vd", "nrm") ++
      (0 until Similarity.PqSub).map(m => s"code_$m") :+ "cent_id"
    assert(index.columns.toSeq.sorted == expectedCols.sorted)
    val tmp = Files.createTempDirectory("graft_ann_index").toString
    try {
      index.write.partitionBy("cent_id").mode("overwrite").parquet(tmp)
      val loaded = spark.read.parquet(tmp)
      val fromDisk = Similarity.ivfPqSearch(spark, dir, loaded)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(fromDisk == inline)
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("index codes are within the codebook range (1-based, <= PqK)") {
    import org.apache.spark.sql.functions._
    val index = Similarity.buildIvfPqIndex(spark, dir)
    val bad = (0 until Similarity.PqSub).map(m =>
      index.filter(col(s"code_$m") < 1 || col(s"code_$m") > Similarity.PqK).count()).sum
    assert(bad == 0L)
  }
}
