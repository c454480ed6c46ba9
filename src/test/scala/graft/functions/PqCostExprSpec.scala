package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17: [[PqCodes]] / [[PqCostTables]] replace the literal-tree ADC cost
  * expressions (per subspace: `array(<PqK cost terms>)`, each term a
  * subDim-double literal + slice + vec_dot). This spec is the
  * differential that pins the new expressions bit-exactly to the OLD
  * form — the literal SQL below is the pre-r17 `pqCostArr` builder
  * verbatim, so every DuckDB-oracle property proven against that form
  * carries over: cost arithmetic and fold order, the argmin first-index
  * tie rule, slice semantics past a short vector's end, and null
  * propagation.
  */
class PqCostExprSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.Sessions.tune(
      SparkSession.builder().appName("pqcost-spec").master("local[4]"), "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val Sub = 4
  private val SubDim = 4
  private val K = 8

  private def dotJ(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Deterministic books with an exact-tie pair: codebook rows 2 and 5 of
    * every subspace are IDENTICAL, so their costs tie bit-exactly and the
    * argmin must pick the smaller code id whenever that row wins. */
  private def books: Array[Array[Array[Double]]] =
    Array.tabulate(Sub, K, SubDim) { (m, k, d) =>
      val kk = if (k == 5) 2 else k // rows 2 and 5 identical
      math.sin(m * 131 + kk * 17 + d * 3).abs * (if ((m + kk + d) % 2 == 0) 1 else -1)
    }

  /** The pre-r17 literal builder, verbatim (vecCol fixed to `vn`). */
  private def oldCostArr(bs: Array[Array[Array[Double]]], m: Int): String = {
    val subExpr = s"slice(vn, ${m * SubDim + 1}, $SubDim)"
    (0 until K).map { k =>
      val c = bs(m)(k)
      val cLit = c.mkString("array(", "D, ", "D)")
      s"(${dotJ(c, c)}D - (2 * vec_dot($subExpr, $cLit)))"
    }.mkString("array(", ", ", ")")
  }

  private def df = {
    VectorFunctions.register(spark)
    val rand = new scala.util.Random(7)
    val full = Seq.fill(500)(Array.fill(Sub * SubDim)(rand.nextDouble() * 2 - 1))
    // short vectors exercise the slice-past-end path (empty slice → cost
    // degenerates to the cc constant, identically in both forms)
    val short = Seq.fill(20)(Array.fill(SubDim * 2 + 1)(rand.nextDouble() * 2 - 1))
    import spark.implicits._
    (full ++ short).toDF("vn")
  }

  test("PqCodes is bit-identical to array_position(array_min) over the literal trees") {
    val bs = books
    val bm = new PqBooksMatrix(bs)
    val oldCodes = (0 until Sub).map { m =>
      val costs = oldCostArr(bs, m)
      expr(s"array_position($costs, array_min($costs))").as(s"old_$m")
    }
    val newCol = org.apache.spark.sql.graft.ColumnBridge.column(
      PqCodes(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("vn"), bm))
    val out = df.select(col("vn") +: newCol.as("codes") +: oldCodes: _*)
    val mismatch = (0 until Sub).map(m =>
      s"(element_at(codes, ${m + 1}) <> old_$m)").mkString(" or ")
    assert(out.filter(mismatch).count() === 0)
    // the tie row actually decides something: code 3 (row index 2) must
    // appear somewhere, and code 6 (its identical twin at index 5) never
    val hist = out.selectExpr("explode(codes) as c").groupBy("c").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.contains(3L), "expected the duplicated codebook row to win somewhere")
    assert(!hist.contains(6L), "tie must break toward the smaller code id")
  }

  test("PqCostTables matches the literal cost arrays element-for-element") {
    val bs = books
    val bm = new PqBooksMatrix(bs)
    val oldCosts = (0 until Sub).map(m => expr(oldCostArr(bs, m)).as(s"old_$m"))
    val newCol = org.apache.spark.sql.graft.ColumnBridge.column(
      PqCostTables(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("vn"), bm))
    val out = df.select(col("vn") +: newCol.as("qc") +: oldCosts: _*)
    // bit-identical doubles: <> catches any drifted element; NaN can't
    // occur (costs are sums/products of finite doubles)
    val mismatch = (0 until Sub)
      .map(m => s"(element_at(qc, ${m + 1}) <> old_$m)").mkString(" or ")
    assert(out.filter(mismatch).count() === 0)
  }

  test("a null element inside a scanned subspace nulls the output, like vec_dot") {
    val bs = books
    val bm = new PqBooksMatrix(bs)
    VectorFunctions.register(spark)
    import spark.implicits._
    val rows: Seq[Seq[java.lang.Double]] =
      Seq(Seq.tabulate(Sub * SubDim)(i => if (i == 5) null
        else java.lang.Double.valueOf(i * 0.25 - 1)))
    val d = rows.toDF("vn")
    val codes = org.apache.spark.sql.graft.ColumnBridge.column(
      PqCodes(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("vn"), bm))
    val tables = org.apache.spark.sql.graft.ColumnBridge.column(
      PqCostTables(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("vn"), bm))
    val r = d.select(codes.as("c"), tables.as("t")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("codegen compiles on a NON-nullable array input (ADVICE r17: the " +
      "isNull assignment is only emitted when the expression is nullable)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val bm = new PqBooksMatrix(books)
    val in = ArrayType(DoubleType, containsNull = false)
    val codes = PqCodes(BoundReference(0, in, nullable = false), bm)
    val tables = PqCostTables(BoundReference(0, in, nullable = false), bm)
    assert(!codes.nullable && !tables.nullable)
    // GenerateUnsafeProjection THROWS on a Janino failure — unlike the
    // query path, which would silently fall back to interpreted eval and
    // hide exactly the defect this pins (the old code assigned ev.isNull,
    // a variable nullSafeCodeGen never declares on this branch)
    val proj = GenerateUnsafeProjection.generate(Seq(codes, tables))
    val v = new GenericArrayData(
      Array.tabulate(Sub * SubDim)(d => math.cos(d * 0.7)))
    val row = proj(InternalRow(v))
    assert(row.getArray(0).toLongArray() ===
      codes.codes(v).asInstanceOf[ArrayData].toLongArray())
    val expTables = tables.tables(v).asInstanceOf[ArrayData]
    val gotTables = row.getArray(1)
    (0 until Sub).foreach { m =>
      assert(gotTables.getArray(m).toDoubleArray() ===
        expTables.getArray(m).toDoubleArray())
    }
  }
}
