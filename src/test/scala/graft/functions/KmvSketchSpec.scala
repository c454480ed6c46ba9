package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit invariants for the bounded KMV Aggregator (the oracle gate
  * checks the end-to-end estimate; this pins the buffer algebra):
  * bounded size, distinctness, exact k-smallest vs brute force, and
  * merge ≡ reduce-all (the mergeability that makes map-side partial
  * aggregation correct) across random splits. */
class KmvSketchSpec extends AnyFunSuite {
  private val K = 8
  private val sk = new KmvSketch(K)

  private def reduceAll(vs: Seq[Long]): Array[Long] =
    vs.foldLeft(sk.zero)(sk.reduce)

  test("buffer holds the k smallest distinct values, sorted") {
    val rand = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val vs = Seq.fill(100)(rand.nextLong(1000))
      val b = reduceAll(vs)
      val want = vs.distinct.sorted.take(K)
      assert(b.toSeq == want)
      assert(b.length <= K)
    }
  }

  test("merge of any split equals reduce of the whole") {
    val rand = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val vs = Seq.fill(120)(rand.nextLong(500))
      val whole = reduceAll(vs).toSeq
      val cut = rand.nextInt(vs.length + 1)
      val (l, r) = vs.splitAt(cut)
      assert(sk.merge(reduceAll(l), reduceAll(r)).toSeq == whole)
      // merge with zero on either side
      assert(sk.merge(sk.zero, reduceAll(vs)).toSeq == whole)
      assert(sk.merge(reduceAll(vs), sk.zero).toSeq == whole)
    }
  }

  test("finish reports size and k-th smallest (MaxValue when under-full)") {
    assert(sk.finish(reduceAll(Seq(5L, 3L, 5L))) == ((2, Long.MaxValue)))
    val full = reduceAll(1L to 20L)
    assert(sk.finish(full) == ((K, K.toLong))) // k-th smallest of 1..20 is k
  }
}
