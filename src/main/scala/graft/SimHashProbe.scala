package graft
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("simhash-probe")
    val texts = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("text").collect().map(_.getString(0))
    val reps = 40
    println(s"docs=${texts.length}, avg len=${texts.map(_.length).sum / texts.length}")
    // warmup
    var sink = 0L
    for (_ <- 1 to 3; t <- texts) sink ^= functions.SimHash.fastSignature(t)
    val t0 = System.nanoTime()
    for (_ <- 1 to reps; t <- texts) sink ^= functions.SimHash.fastSignature(t)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"fastSignature single-thread: ${texts.length * reps / sec}%.0f rows/s (sink=$sink)")
    spark.stop()
  }
}
