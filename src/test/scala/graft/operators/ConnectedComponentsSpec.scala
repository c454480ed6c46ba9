package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the large-star/small-star connected-components contract
  * (Dedup.connectedComponents): logarithmic-round convergence on
  * high-diameter graphs — the shape round-3's min-label propagation
  * silently miscut at diameter > ClusterMaxIters — and a LOUD failure
  * instead of partial labels when the iteration cap is genuinely hit. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark

  private def labelsOf(edges: Seq[(Long, Long)], maxIters: Int = Dedup.ClusterMaxIters) = {
    import spark.implicits._
    Dedup.connectedComponents(edges.toDF("a", "b"), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("diameter-25 chain collapses to one component within ClusterMaxIters") {
    // Min-label propagation needs D rounds for a diameter-D chain, so at
    // the r3 cap of 20 this exact input returned SPLIT clusters with no
    // error; star alternation needs ~log D rounds.
    val got = labelsOf((0 until 25).map(i => (100L + i, 101L + i)))
    assert(got.keySet == (100L to 125L).map(identity).toSet)
    assert(got.values.toSet == Set(100L))
  }

  test("components stay separate; reversed/duplicate/self edges normalize") {
    val got = labelsOf(Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (11L, 10L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("empty edge set converges immediately to no labels") {
    assert(labelsOf(Seq.empty).isEmpty)
  }

  test("star graph and clique converge (min id wins regardless of shape)") {
    val star = labelsOf((1L to 8L).map(i => (50L, 50L + i)))
    assert(star.values.toSet == Set(50L) && star.size == 9)
    val clique = labelsOf(for { i <- 0L to 5L; j <- (i + 1) to 5L } yield (i, j))
    assert(clique.values.toSet == Set(0L) && clique.size == 6)
  }

  test("non-convergence throws instead of returning split clusters") {
    val err = intercept[IllegalStateException] {
      labelsOf((0 until 200).map(i => (i.toLong, i + 1L)), maxIters = 1)
    }
    assert(err.getMessage.contains("did not converge"))
  }

  test("the one-job RDD checksum equals the SQL xxhash64 decimal sum (r18)") {
    // The convergence checksum moved from a per-alternation SQL
    // aggregate (its own planning + partial→final exchange) to a
    // shuffle-free fold over the round's persisted InternalRow RDD
    // (VERDICT r17 next #5). Detection semantics must be IDENTICAL:
    // both forms are exact sums, so equal multisets ⟺ equal checksums.
    import org.apache.spark.sql.functions.{col, count, lit, sum, xxhash64}
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // include sign-heavy hashes and duplicate rows (multiset semantics)
    val rows = Seq.fill(5000)((rnd.nextLong() % 1000, rnd.nextLong() % 1000)) ++
      Seq((1L, 2L), (1L, 2L), (Long.MinValue, Long.MaxValue))
    val df = rows.toDF("a", "b").repartition(7)
    val (rdd, wrapped) = Caching.reuseWithHandle(df)
    val (cnt, hi, lo) =
      org.apache.spark.sql.GraftSqlBridge.xxhash64Checksum(rdd, wrapped.schema)
    val r = df.agg(count(lit(1)),
      sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head()
    val sqlCnt = r.getLong(0)
    val sqlSum = r.getDecimal(1).toBigInteger
    // reconstruct the 128-bit value: hi·2⁶⁴ + (lo as unsigned)
    val got = java.math.BigInteger.valueOf(hi)
      .shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    assert(cnt === sqlCnt)
    assert(got === sqlSum)
    rdd.unpersist()
    // empty input: zero count, zero sum (the SQL form's null-sum case)
    val (emptyRdd, emptyDf) =
      Caching.reuseWithHandle(df.filter(lit(false)))
    assert(org.apache.spark.sql.GraftSqlBridge.xxhash64Checksum(
      emptyRdd, emptyDf.schema) === ((0L, 0L, 0L)))
    emptyRdd.unpersist()
  }
}
