package graft.functions

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k Aggregator must select EXACTLY the rows the
  * row_number() window it replaced would have kept — same ordering, same
  * tie-breaks — under any split of the input into partial buffers. */
class TopKAggSpec extends AnyFunSuite {

  private def reference(rows: Seq[TopKCand], k: Int, desc: Boolean): Seq[TopKCand] = {
    val ord = Ordering.fromLessThan[TopKCand] { (a, b) =>
      val c0 = java.lang.Double.compare(a.key, b.key)
      val c = if (desc) -c0 else c0
      if (c != 0) c < 0 else a.id < b.id
    }
    rows.sorted(ord).take(k)
  }

  private def runSplit(agg: TopKAgg, rows: Seq[TopKCand], splits: Int): Seq[TopKCand] = {
    val groups = rows.grouped(math.max(1, rows.size / splits)).toSeq
    val bufs = groups.map(g => g.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
  }

  test("matches sort-take-k under every partial split, asc and desc") {
    val rnd = new Random(7)
    for (desc <- Seq(false, true); n <- Seq(0, 1, 5, 64, 257, 1000)) {
      // duplicate keys on purpose: the id tie-break must decide
      val rows = Seq.tabulate(n)(i =>
        TopKCand(rnd.nextInt(50).toDouble / 7.0, rnd.nextLong().abs, Nil, 0.0))
      val expect = reference(rows, 5, desc)
      for (splits <- Seq(1, 3, 16)) {
        val agg = new TopKAgg(5, desc)
        assert(runSplit(agg, rows, splits) === expect,
          s"desc=$desc n=$n splits=$splits")
      }
    }
  }

  test("buffer never exceeds 2k entries") {
    val agg = new TopKAgg(4, desc = false)
    var b = agg.zero
    for (i <- 0 until 1000) {
      b = agg.reduce(b, TopKCand(i.toDouble, i.toLong, Nil, 0.0))
      assert(b.length < 2 * 4, s"buffer grew unbounded at row $i")
    }
  }

  test("merge is associative-enough: merging pruned buffers keeps the true top-k") {
    // worst case for a bounded structure: the true top-k is spread one
    // element per partial buffer, everything else is decoys
    val agg = new TopKAgg(3, desc = false)
    val bufs = (0 until 10).map { p =>
      val rows = TopKCand(p.toDouble, p.toLong, Nil, 0.0) +:
        Seq.tabulate(50)(i => TopKCand(1000.0 + i, p * 100L + i, Nil, 0.0))
      rows.foldLeft(agg.zero)(agg.reduce)
    }
    val got = agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
    assert(got.map(_.id) === Seq(0L, 1L, 2L))
  }

  test("carries the payload of the selected rows intact") {
    val agg = new TopKAgg(2, desc = true)
    val rows = Seq(
      TopKCand(0.9, 1L, Seq(1.0, 2.0), 0.5),
      TopKCand(0.1, 2L, Seq(9.0), 0.1),
      TopKCand(0.8, 3L, Seq(3.0), 0.7))
    val got = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    assert(got === Seq(TopKCand(0.9, 1L, Seq(1.0, 2.0), 0.5),
      TopKCand(0.8, 3L, Seq(3.0), 0.7)))
  }

  test("signed zeros tie and fall through to the id tie-break, like Spark's sort") {
    // Spark's nanSafeCompareDoubles (and DuckDB) treat -0.0 == 0.0; a
    // raw java.lang.Double.compare would rank -0.0 first and pick id 9
    // here instead of the id-asc winner
    val agg = new TopKAgg(1, desc = false)
    val rows = Seq(
      TopKCand(0.0, 9L, Nil, 0.0),
      TopKCand(-0.0, 12L, Nil, 0.0),
      TopKCand(0.0, 3L, Nil, 0.0))
    assert(agg.finish(rows.foldLeft(agg.zero)(agg.reduce)).map(_.id) === Seq(3L))
  }

  test("NaN keys sort greatest, matching Spark's Double total order") {
    val agg = new TopKAgg(2, desc = false)
    val rows = Seq(
      TopKCand(Double.NaN, 1L, Nil, 0.0),
      TopKCand(1.0, 2L, Nil, 0.0),
      TopKCand(2.0, 3L, Nil, 0.0))
    assert(agg.finish(rows.foldLeft(agg.zero)(agg.reduce)).map(_.id) === Seq(2L, 3L))
  }
}
