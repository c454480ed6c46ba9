package graft.pipeline

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q_events_sliding", "p_agg_bridge", "p_wordcount", "p_countwin")) {
      println(s"========== $name")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
