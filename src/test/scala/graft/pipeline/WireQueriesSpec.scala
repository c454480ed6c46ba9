package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WireQueries

/** The oracle-checked wire round trips ([[graft.operators.WireQueries]])
  * at sf0.001: each entry's result must equal the same aggregate computed
  * directly on the table — i.e. the socket transport (framed TCP, the
  * connector ALO/2PC conversation, the rate-source generator) must be
  * invisible in the data. The driver's DuckDB gate re-proves this at
  * sf0.01; this spec keeps it in CI. */
class WireQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def direct(extraFilter: Option[String]): DataFrame = {
    val base = graft.Tables.events(spark, dir)
    extraFilter.fold(base)(base.filter(_))
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
  }

  test("p_tcp_roundtrip: framed TCP egress→ingress preserves the multiset exactly") {
    assert(rows(WireQueries.pTcpRoundtrip(spark, dir)) === rows(direct(None)))
  }

  test("p_connector_roundtrip: ALO in + 2PC out lands the slice exactly once") {
    assert(rows(WireQueries.pConnectorRoundtrip(spark, dir)) ===
      rows(direct(Some(s"event_id < ${WireQueries.ConnRoundtripN}"))))
  }

  test("p_connector_roundtrip: per-invocation checkpoint scratch is reclaimed") {
    // the rig creates a p_conn_rt_ckpt* temp dir per call; left behind it
    // accumulates one WAL+commit-log dir per Verify/Bench trial in /tmp
    // (the writeback-debt channel the bench's sync discipline drains)
    def ckptDirs(): Set[String] = {
      val kids = new java.io.File(sys.props("java.io.tmpdir")).listFiles()
      if (kids == null) Set.empty
      else kids.iterator.filter(_.getName.startsWith("p_conn_rt_ckpt"))
        .map(_.getName).toSet
    }
    val before = ckptDirs()
    WireQueries.pConnectorRoundtrip(spark, dir).collect()
    assert((ckptDirs() -- before) === Set.empty)
  }

  test("p_gen_source: the indexed generator emits 0 until N exactly once") {
    val got = WireQueries.pGenSource(spark, dir)
    val n = WireQueries.GenSourceN
    val expected = spark.range(n)
      .select((col("id") % 7).as("m"), ((col("id") * 37) % 1000).as("v"))
      .groupBy(concat(lit("e"), col("m")).as("event_type"))
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
    assert(rows(got) === rows(expected))
  }
}
