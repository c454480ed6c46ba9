package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the similarity operators' hot loop.
  *
  * The portable SQL form `aggregate(zip_with(a, b, (x,y) -> x*y), 0d,
  * (acc,v) -> acc+v)` is a higher-order function — Spark evaluates it
  * interpreted (CodegenFallback) with one boxed lambda call per element,
  * and it breaks the surrounding whole-stage-codegen span. At 100 TB the
  * dot product is the inner loop of every ANN/near-dup query, so it gets
  * the preferred treatment from the build rules: a first-class
  * `Expression` with `doGenCode` — a primitive `double` loop over the two
  * `ArrayData`, fused into the enclosing codegen stage.
  *
  * Semantics match the sequential fold exactly (same order, same double
  * arithmetic, length = min of the two — embeddings are fixed-width so
  * the min never triggers), which keeps results bit-identical to the
  * DuckDB oracle's `list_reduce`. Null ELEMENTS follow the portable
  * form too (r13 sweep): `aggregate(zip_with(...))` yields NULL when
  * any element is null, and this expression formerly read the null
  * slot as 0.0 — a silent result divergence. When either input's
  * element type is provably non-null (containsNull=false) the
  * null-check compiles away and the loop stays tight; parquet arrays
  * commonly declare nullable elements even when no null is ever
  * present, so the nullable path keeps one predictable branch per
  * element rather than rejecting the schema at analysis.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  /** True when a null ELEMENT is possible per the input schemas. */
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _                => false
  })

  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else {
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elementsNullable)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Make `vec_dot` callable from SQL text / `expr(...)` in this session.
    * Idempotent; called by the query builders that use it, so the driver
    * can run them from any session it constructs. */
  /** Arity-checked builder shared by both registration paths — a wrong
    * SQL call must fail with the function's name and signature, not a
    * bare NoSuchElementException from exprs.head. */
  private[functions] def build(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): VecDot = {
    require(exprs.length == 2,
      s"vec_dot(array<double>, array<double>) takes exactly 2 arguments, got ${exprs.length}")
    VecDot(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", build, "built-in")
}

/** Session-extensions entry point: registers the library's native
  * expressions at session build —
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes them available
  * cluster-wide without any imperative registration. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorFunctions.build(exprs)))
}
