package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The matrix max-cosine expression (VERDICT r9 #2) must be bit-identical
  * to the `greatest(vec_dot(vd, <literal>) / (nrm * <en>), …)` chain it
  * replaced — the d_decontaminate_semantic oracle was certified against
  * that literal form, so any float divergence here would break the hash
  * gate. Also pins the [[CentroidMatrix]] identity-equality contract the
  * plan-time holders rely on, and that the expression stays codegen'd. */
class EvalMaxCosineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.Sessions.tune(
      SparkSession.builder().appName("evalmaxcos-spec").master("local[4]"), "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def corpus(n: Int, seed: Int) = {
    VectorFunctions.register(spark)
    val rand = new scala.util.Random(seed)
    import spark.implicits._
    Seq.fill(n)(Array.fill(64)(rand.nextDouble() * 2 - 1)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "vd")
      .withColumn("nrm", expr("sqrt(vec_dot(vd, vd))"))
  }

  private def evalRows(n: Int, seed: Int): Array[(Long, Array[Double], Double)] = {
    val rand = new scala.util.Random(seed)
    Array.tabulate(n) { i =>
      val v = Array.fill(64)(rand.nextDouble() * 2 - 1)
      (i.toLong, v, math.sqrt(v.map(x => x * x).sum))
    }
  }

  private def matrixCol(rows: Array[(Long, Array[Double], Double)]) =
    org.apache.spark.sql.graft.ColumnBridge.column(EvalMaxCosine(
      UnresolvedAttribute.quoted("vd"), UnresolvedAttribute.quoted("nrm"),
      new CentroidMatrix(rows.flatMap(_._2), rows.map(_._3), rows.map(_._1))))

  test("bit-identical to the greatest(vec_dot literal) chain") {
    val ev = evalRows(37, seed = 7) // odd count, > 2 (exercises the fold)
    val terms = ev.map { case (_, ed, en) =>
      val lit = ed.mkString("array(", "D, ", "D)")
      s"(vec_dot(vd, $lit) / (nrm * ${en}D))"
    }
    val df = corpus(500, seed = 11)
      .withColumn("m", matrixCol(ev))
      .withColumn("g", expr(terms.mkString("greatest(", ", ", ")")))
    assert(df.filter("m <> g or m is null").count() === 0)
  }

  test("singleton eval set is its own max") {
    val ev = evalRows(1, seed = 3)
    val lit = ev(0)._2.mkString("array(", "D, ", "D)")
    val df = corpus(100, seed = 5)
      .withColumn("m", matrixCol(ev))
      .withColumn("g", expr(s"vec_dot(vd, $lit) / (nrm * ${ev(0)._3}D)"))
    assert(df.filter("m <> g or m is null").count() === 0)
  }

  test("stays inside WholeStageCodegen") {
    // non-local input (a LocalRelation would constant-fold the whole
    // Project into a LocalTableScan — same trap as VecDotSpec)
    VectorFunctions.register(spark)
    val arr = (1 to 8).map(i => s"cast((id * $i + 1) % 97 as double)")
      .mkString("array(", ", ", ")")
    val df = spark.range(100).selectExpr(s"$arr AS vd")
      .withColumn("nrm", expr("sqrt(vec_dot(vd, vd))"))
      .withColumn("m", matrixCol(evalRows(4, 1)))
    val planLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("eval_max_cosine")).get.trim
    assert(planLine.startsWith("*("), s"eval_max_cosine not codegen'd: $planLine")
  }

  test("a 10^4-row eval matrix evaluates (the literal form's codegen wall)") {
    // 10^4 greatest() terms would be a multi-MB generated method — the
    // matrix form is one 5 MB plan constant and an O(E*dim) loop
    val ev = evalRows(10000, seed = 13)
    val out = corpus(200, seed = 17).withColumn("m", matrixCol(ev))
      .agg(max("m")).head().getDouble(0)
    assert(out > 0.0 && out <= 1.0 + 1e-9)
  }

  test("mixed-dimension eval sets are rejected, not silently misaligned") {
    // rows of length 63/65/64/64 sum to 256 = 4×64, so the flat matrix's
    // divisibility check alone would pass and every row after the first
    // would read its neighbor's elements — the library overload must
    // fail loudly instead
    import spark.implicits._
    VectorFunctions.register(spark)
    val evals = Seq(63, 65, 64, 64).zipWithIndex
      .map { case (d, i) => (i.toLong, Array.fill(d)(0.5)) }
      .toDF("vec_id", "vd")
      .withColumn("nrm", expr("sqrt(vec_dot(vd, vd))"))
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Similarity.dDecontaminateSemanticWith(
        corpus(10, seed = 23), evals, 0.9)
    }
    assert(ex.getMessage.contains("dimension"), ex.getMessage)
  }

  test("CentroidMatrix equality is identity, not structure") {
    val a = new CentroidMatrix(Array(1.0, 2.0), Array(1.0), Array(0L))
    val b = new CentroidMatrix(Array(1.0, 2.0), Array(1.0), Array(0L))
    assert(a == a && a != b, "plan-time matrices compare by reference")
    // and the expressions holding the SAME instance stay equal through
    // the copy()/withNewChildren churn canonicalization performs
    val e = EvalMaxCosine(UnresolvedAttribute.quoted("vd"),
      UnresolvedAttribute.quoted("nrm"), a)
    assert(e.withNewChildren(e.children) == e)
  }
}
