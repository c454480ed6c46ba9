package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd dot product must be bit-identical to the portable
  * higher-order-function fold (the form the DuckDB oracle mirrors), and
  * must stay inside a WholeStageCodegen span instead of falling back to
  * interpreted eval the way `aggregate(zip_with(...))` does.
  */
class VecDotSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.Sessions.tune(
      SparkSession.builder().appName("vecdot-spec").master("local[4]"), "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"

  test("vec_dot is bit-identical to the sequential HOF fold on 1000 random vectors") {
    VectorFunctions.register(spark)
    val rand = new scala.util.Random(42)
    val rows = Seq.fill(1000)((
      Array.fill(64)(rand.nextDouble() * 2 - 1),
      Array.fill(64)(rand.nextDouble() * 2 - 1)))
    import spark.implicits._
    val df = rows.toDF("a", "b")
      .withColumn("native", expr("vec_dot(a, b)"))
      .withColumn("hof", expr(hofDot))
    // bit-identical, not approximately equal: same fold order, same doubles
    assert(df.filter("native <> hof or native is null").count() === 0)
  }

  // r13 sweep: the type check accepts array<double> with nullable
  // elements (parquet's default array shape), but the loop read a null
  // slot as 0.0 where the portable HOF fold — and so the DuckDB oracle —
  // yields NULL. Pre-fix: vec_dot below returns 2.0 and the filter
  // counts a mismatch.
  test("a null element yields NULL, matching the portable fold") {
    VectorFunctions.register(spark)
    val df = spark.sql(
      """SELECT array(1.0d, cast(null as double)) AS a,
        |       array(2.0d, 3.0d) AS b""".stripMargin)
      .withColumn("native", expr("vec_dot(a, b)"))
      .withColumn("hof", expr(hofDot))
    val r = df.select("native", "hof").head()
    assert(r.isNullAt(0), s"null element must yield NULL, got ${r.get(0)}")
    assert(r.isNullAt(1)) // the portable form's semantics, for the record
    // and the non-null nullable-schema path still computes exactly
    val ok = spark.sql(
      "SELECT array(1.0d, 2.0d) AS a, array(3.0d, 4.0d) AS b")
      .selectExpr("vec_dot(a, b) AS d").head().getDouble(0)
    assert(ok === 11.0)
  }

  test("GraftExtensions injects vec_dot at session build") {
    spark // force the shared context first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    // getOrCreate returns the existing default session (ignoring
    // extensions) unless cleared; the SparkContext itself is reused.
    // spark.sql.extensions is a *static* conf read from the
    // SparkContext's conf, so with a shared context it is silently
    // ignored — withExtensions exercises the same injection path.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().appName("vecdot-ext").master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT vec_dot(array(1d, 2d), array(3d, 4d)) AS d").collect()
      assert(r(0).getDouble(0) === 11.0) // do NOT stop s2: shared context
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("nulls and unequal lengths") {
    VectorFunctions.register(spark)
    val df = spark.sql(
      """SELECT vec_dot(cast(null as array<double>), array(1d)) AS n,
        |       vec_dot(array(1d, 2d, 3d), array(10d, 10d)) AS trunc,
        |       vec_dot(cast(array() as array<double>),
        |               cast(array() as array<double>)) AS empty""".stripMargin)
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 30.0) // min-length semantics
    assert(r.getDouble(2) === 0.0)
  }

  test("vec_dot runs through the generated-code path inside WholeStageCodegen") {
    VectorFunctions.register(spark)
    // non-foldable, codegen-friendly input: array() of id arithmetic (a
    // HOF like transform would itself knock the Project out of codegen,
    // and a literal would constant-fold into a LocalTableScan)
    def arr(seed: Int): String =
      (1 to 8).map(i => s"cast((id * $i + $seed) % 97 as double)")
        .mkString("array(", ", ", ")")
    val base = spark.range(500).selectExpr(s"${arr(1)} AS a", s"${arr(2)} AS b")
    val native = base.withColumn("d", expr("vec_dot(a, b)"))
    val planLine = native.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("vec_dot")).get.trim
    // the Project holding vec_dot carries the codegen marker *(n)
    assert(planLine.startsWith("*("), s"vec_dot not codegen'd: $planLine")
    // and the generated code computes the same values as the HOF fold
    val hof = base.withColumn("d", expr(hofDot))
    assert(native.select("d").collect().map(_.getDouble(0)).toSeq ===
      hof.select("d").collect().map(_.getDouble(0)).toSeq)
  }
}
