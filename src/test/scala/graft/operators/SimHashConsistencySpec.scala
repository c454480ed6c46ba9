package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The JVM SimHash twin must produce bit-identical signatures to the SQL
  * form in [[Dedup.dSimhash]] — the streaming near-dedup stage and the
  * batch operator share semantics only if this differential holds. */
class SimHashConsistencySpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("JVM signature == SQL signature for every corpus doc") {
    val sql = Dedup.dSimhash(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val jvm = graft.functions.SimHash.signature(r.getString(1))
      assert(jvm === sql(r.getLong(0)),
        s"doc ${r.getLong(0)}: JVM twin diverged from SQL simhash")
    }
  }
}
