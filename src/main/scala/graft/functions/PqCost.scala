package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Plan-time PQ codebook constant for [[PqCodes]] / [[PqCostTables]] —
  * the [[CentroidMatrix]] discipline applied to the PQ cost tables
  * (r17 optimization; guide §§1.2/7.2: per-task work and plan health).
  *
  * The previous shape string-built the ADC cost tables as LITERAL
  * expression trees: per subspace an `array(...)` of [[PqK]] cost terms,
  * each carrying an embedded subDim-double literal array plus a
  * `slice` + `vec_dot` call — PqSub×PqK ≈ 256 dot-product subtrees and
  * ~10⁴ Catalyst nodes PER SITE (corpus codes, query tables, probe
  * payloads). Analysis, canonicalization and constant-folding walk that
  * tree every time the plan is touched, the generated task binaries ran
  * >1 MB (the bench's "Broadcasting large task binary" warnings), and
  * Janino compiles minutes of method text over a full ANN-variant union
  * (s_ann_recall). Here the codebooks ride ONE reference object shipped
  * once per task like any literal, the plan carries a single expression
  * node, and the per-row loop is compiled JVM code.
  *
  * Bit-exactness contract (the DuckDB oracles and the old literal form):
  * cost(m, k) = cc(m,k) − (2·dot) where cc is `dotJ(c, c)` computed on
  * the driver at build time — the same JVM double the literal form
  * embedded — and dot folds the row's elements
  * `v[m·subDim + d] · book(m,k)(d)` left-to-right over
  * d < min(subDim, |v| − m·subDim), exactly `vec_dot(slice(v, m·subDim+1,
  * subDim), <literal>)` ([[VecDot]] order; `slice` past the array end
  * yields the shorter suffix, an empty slice dots to 0.0).
  *
  * Null GRANULARITY deliberately diverges from the literal form
  * (ADVICE r17): a null element in ONE subspace nulls the ENTIRE
  * codes/tables output here, where the old per-subspace
  * `array_position`/cost-array columns nulled only that subspace's
  * code_m/qcost_m and left the others valid. The divergence is
  * unreachable at every call site — embedding vectors never carry null
  * ELEMENTS (Tables loads them as parquet double arrays whose rows the
  * 104-query oracle hash-matches; a null element would already null
  * `nrm`/`vn` upstream and diverge those queries) — and collapsing to
  * whole-output null keeps the expression one branch per row instead of
  * per (row × subspace). PqCostExprSpec pins the new behavior.
  * Identity equality/hash for O(1) plan-time tree compares
  * ([[CentroidMatrix]]'s rationale).
  */
final class PqBooksMatrix(books: Array[Array[Array[Double]]]) extends Serializable {
  require(books.nonEmpty && books.forall(_.length == books(0).length),
    "books must be PqSub x PqK x subDim")
  val sub: Int = books.length
  val k: Int = books(0).length
  val subDim: Int = books(0)(0).length
  require(books.forall(_.forall(_.length == subDim)),
    "every codebook row must have the same sub-dimension")
  /** Row-major [m][k][d] flattening of the codebooks. */
  val flat: Array[Double] = {
    val out = new Array[Double](sub * k * subDim)
    var m = 0
    while (m < sub) {
      var kk = 0
      while (kk < k) {
        System.arraycopy(books(m)(kk), 0, out, (m * k + kk) * subDim, subDim)
        kk += 1
      }
      m += 1
    }
    out
  }
  /** cc(m,k) = dotJ(c, c) — the same driver-computed double the literal
    * form embedded via `${dotJ(c, c)}D`. */
  val cc: Array[Double] = {
    val out = new Array[Double](sub * k)
    var m = 0
    while (m < sub) {
      var kk = 0
      while (kk < k) {
        val c = books(m)(kk)
        var s = 0.0
        var d = 0
        while (d < subDim) { s += c(d) * c(d); d += 1 }
        out(m * k + kk) = s
        kk += 1
      }
      m += 1
    }
    out
  }
  override def hashCode(): Int = System.identityHashCode(this)
  override def equals(o: Any): Boolean = o match {
    case r: AnyRef => this eq r
    case _         => false
  }
  override def toString: String = s"PqBooksMatrix(${sub}x${k}x$subDim)"
}

private[functions] trait PqBooksExpression extends UnaryExpression {
  def vec: Expression
  def b: PqBooksMatrix
  override def child: Expression = vec

  protected def elementsNullable: Boolean = vec.dataType match {
    case ArrayType(_, cn) => cn
    case _                => false
  }
  override def nullable: Boolean = vec.nullable || elementsNullable

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  /** cost(m, k) over `v`, or NaN-boxed null: callers pass a scratch
    * Array[Double](k) that receives subspace m's full cost row; returns
    * false iff a null element was hit (output must be null). */
  protected final def costRow(v: ArrayData, m: Int, out: Array[Double]): Boolean = {
    val sd = b.subDim
    val off = m * sd
    val lim = math.max(0, math.min(sd, v.numElements() - off))
    val checkNulls = elementsNullable
    if (checkNulls) {
      var d = 0
      while (d < lim) {
        if (v.isNullAt(off + d)) return false
        d += 1
      }
    }
    var kk = 0
    while (kk < b.k) {
      val base = (m * b.k + kk) * sd
      var s = 0.0
      var d = 0
      while (d < lim) { s += v.getDouble(off + d) * b.flat(base + d); d += 1 }
      out(kk) = b.cc(m * b.k + kk) - (2 * s)
      kk += 1
    }
    true
  }
}

/** 1-based PQ code per subspace as ONE codegen'd expression — replaces
  * PqSub separate `array_position(array(<PqK literal cost terms>),
  * array_min(...))` columns. Output `array<bigint>` of length PqSub;
  * element m is the first index (1-based) of the minimal cost in
  * subspace m — `array_min` + `array_position` first-match semantics via
  * [[SQLOrderingUtil.compareDoubles]] (−0.0 == 0.0, NaN greatest), the
  * exact tie rule of the literal form and the DuckDB
  * `ROW_NUMBER() ... ORDER BY cost ASC, code_id ASC` twins. */
case class PqCodes(vec: Expression, b: PqBooksMatrix) extends PqBooksExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_codes"

  def codes(v: ArrayData): Any = {
    val out = new Array[Long](b.sub)
    val costs = new Array[Double](b.k)
    var m = 0
    while (m < b.sub) {
      if (!costRow(v, m, costs)) return null
      var best = 0
      var kk = 1
      while (kk < b.k) {
        if (SQLOrderingUtil.compareDoubles(costs(kk), costs(best)) < 0) best = kk
        kk += 1
      }
      out(m) = best + 1L
      m += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = codes(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    // when nullable is false, nullSafeCodeGen's non-nullable branch never
    // declares ev.isNull (it is the literal "false"), so assigning it
    // would fail Janino compilation and silently fall back to interpreted
    // evaluation (ADVICE r17) — and codes() can only return null when
    // elementsNullable, i.e. when nullable is true, so the branch is dead
    // there anyway
    nullSafeCodeGen(ctx, ev, v =>
      if (nullable) {
        val tmp = ctx.freshName("codes")
        s"""
           |Object $tmp = $ref.codes($v);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
         """.stripMargin
      } else
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.codes($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(vec = newChild)
}

/** The per-subspace ADC cost tables as ONE codegen'd expression —
  * `array<array<double>>` of shape PqSub×PqK; `out[m][k]` is the literal
  * form's `qcost_m[k+1]`. Query-side rows are few, but the literal trees
  * cost the DRIVER the same analysis/codegen walk per plan — this keeps
  * the whole probe subtree one node. */
case class PqCostTables(vec: Expression, b: PqBooksMatrix) extends PqBooksExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_cost_tables"

  def tables(v: ArrayData): Any = {
    val out = new Array[ArrayData](b.sub)
    var m = 0
    while (m < b.sub) {
      val costs = new Array[Double](b.k)
      if (!costRow(v, m, costs)) return null
      out(m) = new GenericArrayData(costs)
      m += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(a: Any): Any = tables(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCostTables", this, classOf[PqCostTables].getName)
    // see PqCodes.doGenCode: ev.isNull is only a variable when nullable
    nullSafeCodeGen(ctx, ev, v =>
      if (nullable) {
        val tmp = ctx.freshName("tables")
        s"""
           |Object $tmp = $ref.tables($v);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
         """.stripMargin
      } else
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.tables($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCostTables =
    copy(vec = newChild)
}
