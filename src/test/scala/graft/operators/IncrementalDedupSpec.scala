package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** d_incremental's three-way classification on a corpus built to hit
  * every branch — the testdata exercises `dup_of_snapshot` only at
  * sf0.1 and `dup_in_increment` nowhere, so the oracle alone would
  * leave those paths unwitnessed. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark

  test("snapshot dup, increment dup, and new docs classify with the right canonicals") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    try {
      // ids 0..9; split = (4 * 9) div 5 = 7 → snapshot {0..6}, increment {7, 8, 9}
      val texts = Map(
        7L -> "alpha beta", // same text as snapshot doc 0 → dup_of_snapshot
        8L -> "zeta eta",   // first of its text in the increment → new
        9L -> "zeta eta")   // same text, larger id → dup_in_increment
      val rows = (0L to 9L).map { id =>
        val t = texts.getOrElse(id, if (id == 0L) "alpha beta" else s"unique text $id")
        (id, t, "en", "syn", t.length.toLong)
      }
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val out = Dedup.dIncremental(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
      assert(out.keySet === Set(7L, 8L, 9L))
      assert(out(7L) === (("dup_of_snapshot", 0L)))
      assert(out(8L) === (("new", 8L)))
      assert(out(9L) === (("dup_in_increment", 8L)))
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
