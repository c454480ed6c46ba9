package graft

/** Scratch recall probe (not part of the driver contract): recall@k of
  * one ANN variant vs brute force, Spark-side only — for tuning PQ
  * fidelity knobs before committing them to the oracle chains. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq("ivfpq"))
    val spark = Sessions.local("graft-recall-probe")
    val brute = operators.Similarity.sAnnBrute(spark, dir)
      .select("query_id", "neighbor_id")
    val n = brute.count()
    for (name <- names) {
      val variant = (name match {
        case "ivfpq"       => operators.Similarity.sAnnIvfPq(spark, dir)
        case "pq"          => operators.Similarity.sAnnPq(spark, dir)
        case "ivf_probe"   => operators.Similarity.sAnnIvfProbe(spark, dir)
        case "ivf_trained" => operators.Similarity.sAnnIvfTrained(spark, dir)
        case "ivf"         => operators.Similarity.sAnnIvf(spark, dir)
        case "lsh"         => operators.Similarity.sAnnLsh(spark, dir)
        case other => sys.error(
          s"unknown variant '$other' (try ivfpq, pq, ivf_probe, ivf_trained, ivf, lsh)")
      }).select("query_id", "neighbor_id")
      val m = variant.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(s"[recall-probe] $name $m/$n = ${m.toDouble / n}")
    }
    spark.stop()
  }
}
