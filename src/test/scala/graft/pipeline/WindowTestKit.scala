package graft.pipeline

/** Shared fixtures for the window vector suites — ports of the reference's
  * test aggregations (_test_windows.pony:955-1008: _Total/_Sum/_NonZeroSum/
  * _Collect) and time helpers (wallaroo_labs/time). */
object WindowTestKit {
  def seconds(n: Long): Long = n * 1000000000L
  def millis(n: Long): Long = n * 1000000L

  final class Total extends Serializable { var v: Long = 0 }

  object Sum extends Aggregation[Long, Long, Total] {
    override val name = "Sum"
    def initialAccumulator(): Total = new Total
    def update(input: Long, acc: Total): Unit = acc.v += input
    def combine(a: Total, b: Total): Total = { val t = new Total; t.v = a.v + b.v; t }
    def output(key: String, windowEndTs: Long, acc: Total): Option[Long] = Some(acc.v)
  }

  object NonZeroSum extends Aggregation[Long, Long, Total] {
    override val name = "NonZeroSum"
    def initialAccumulator(): Total = new Total
    def update(input: Long, acc: Total): Unit = acc.v += input
    def combine(a: Total, b: Total): Total = { val t = new Total; t.v = a.v + b.v; t }
    def output(key: String, windowEndTs: Long, acc: Total): Option[Long] =
      if (acc.v > 0) Some(acc.v) else None
  }

  final class Collected extends Serializable {
    val arr = scala.collection.mutable.ArrayBuffer.empty[Long]
  }

  object Collect extends Aggregation[Long, Vector[Long], Collected] {
    override val name = "Collect"
    def initialAccumulator(): Collected = new Collected
    def update(input: Long, acc: Collected): Unit = acc.arr += input
    def combine(a: Collected, b: Collected): Collected = {
      val c = new Collected; c.arr ++= a.arr; c.arr ++= b.arr; c
    }
    def output(key: String, windowEndTs: Long, acc: Collected): Option[Vector[Long]] =
      Some(acc.arr.toVector)
  }

  /** _test_windows.pony:1062-1071 — note the original helper hard-codes
    * _NonZeroSum whatever aggregation is passed; mirrored here. */
  def totalTumblingWindow(range: Long): InitializableWindows[Long, Long, Total] =
    new InitializableWindows[Long, Long, Total]((_, wm) =>
      new PanesRangeWindows("key", NonZeroSum, range, range, 0L,
        LateDataPolicy.Drop, wm, 0.0))

  def rangeWindowsWrapper[Out, Acc](agg: Aggregation[Long, Out, Acc],
      range: Long, slide: Long, delay: Long,
      policy: LateDataPolicy = LateDataPolicy.Drop,
      stagger: Double = 0.0): InitializableWindows[Long, Out, Acc] =
    new InitializableWindows[Long, Out, Acc]((_, wm) =>
      new PanesRangeWindows("key", agg, range, slide, delay, policy, wm, stagger))

  def ephemeralWrapper[Out, Acc](agg: Aggregation[Long, Out, Acc],
      triggerRange: Long, postTriggerRange: Long, delay: Long = 0L,
      policy: LateDataPolicy = LateDataPolicy.Drop): InitializableWindows[Long, Out, Acc] =
    new InitializableWindows[Long, Out, Acc]((firstTs, wm) =>
      new EphemeralWindow("key", agg, triggerRange, postTriggerRange, delay,
        policy, firstTs, wm))

  /** _OutArray: just the output values of a result triple. */
  def outs[Out](res: (Vector[(Out, Long)], Long, Boolean)): Vector[Out] = res._1.map(_._1)
}
