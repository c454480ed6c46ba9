package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Plan-time vector-matrix constant for the matrix expressions below —
  * a C×dim row-major flat array plus per-row norms and ids — with
  * IDENTITY equality/hash (VERDICT r9 #1, the budget note at the old
  * NearestCells:38-42 cashed in): Catalyst compares expression trees
  * during canonicalization, subexpression elimination and plan-cache
  * lookups, and a structural `Seq[Double]` compare is O(C·dim) per pair
  * — at the count-laddered C → √n sizing that is ~10⁵–10⁶ doubles
  * walked every time two plans are held side by side. The matrix is
  * built exactly once per operator invocation and threaded by reference
  * through every `copy()`/`withNewChildren` the optimizer performs, so
  * reference identity IS value identity for any comparison that can
  * occur within a plan; two independently-built matrices comparing
  * unequal merely forgoes a subexpression-dedup no query here relies
  * on. Arrays (not Seqs) also drop the per-element boxing on the eval
  * hot path. */
final class CentroidMatrix(val flat: Array[Double], val cn: Array[Double],
    val ids: Array[Long]) extends Serializable {
  require(cn.nonEmpty && flat.length % cn.length == 0 && ids.length == cn.length,
    "flat must be C x dim row-major with one norm and id per row")
  // The documented tie rule ("ties toward the smaller cent_id") is
  // implemented as "ties toward the smaller ROW INDEX" — identical only
  // when ids ascend. Every construction site sorts, but nothing enforced
  // it (r13 sweep): an unsorted caller would silently diverge from the
  // ORDER BY ccos DESC, cent_id ASC oracles this class is pinned against.
  require({
    var j = 1; var sorted = true
    while (sorted && j < ids.length) { sorted = ids(j - 1) < ids(j); j += 1 }
    sorted
  }, "centroid ids must be strictly ascending (the tie rule is by row index)")
  val rows: Int = cn.length
  val dim: Int = flat.length / cn.length

  /** Cosine of an input row vector against matrix row `j` — THE shared
    * bit-exactness contract of [[NearestCells]] and [[EvalMaxCosine]]
    * (both scaladocs pin it against the DuckDB oracles): fold dimensions
    * left-to-right over min(dim, |v|) elements (the [[VecDot]] order — a
    * short vector scores its present dimensions, missing ones contribute
    * 0 rather than an out-of-bounds read, ADVICE r8), divided by
    * `n * cn(j)`. One definition so an FMA/guard tweak can never
    * desynchronize the two expressions. */
  def cosRow(j: Int, v: org.apache.spark.sql.catalyst.util.ArrayData, n: Double): Double = {
    val lim = math.min(dim, v.numElements())
    var s = 0.0
    var d = 0
    val off = j * dim
    while (d < lim) { s += v.getDouble(d) * flat(off + d); d += 1 }
    s / (n * cn(j))
  }
  override def hashCode(): Int = System.identityHashCode(this)
  override def equals(o: Any): Boolean = o match {
    case r: AnyRef => this eq r
    case _ => false
  }
  override def toString: String = s"CentroidMatrix(${rows}x$dim)"
}

/** Nearest-centroid selection as ONE codegen'd expression — the fix for
  * the IVF cell-assignment scale-killer (VERDICT r7 #1).
  *
  * The previous shape materialized corpus×C rows (broadcast join against
  * every centroid) and then exchanged ALL of them through a
  * `row_number().over(partitionBy(vec_id))` window just to pick a per-row
  * argmax. At the documented deployment sizing (C → √n) that is
  * corpus×10⁴ rows shuffled for a value each row can compute locally.
  * Here the centroid matrix rides the expression itself (a plan-time
  * constant, shipped once per task like any literal), and each row emits
  * its `keep` nearest cell ids directly: zero extra rows, zero exchange,
  * zero window, fused into the enclosing whole-stage-codegen span.
  *
  * Semantics are bit-identical to the window it replaces: score is
  * `vec_dot(vd, cd_j) / (nrm * cn_j)` with the dot folded left-to-right
  * over dimensions (the [[VecDot]] order, which the DuckDB oracle's
  * `list_reduce` mirrors), ranking is cosine DESC with ties toward the
  * smaller cent_id, and double comparison is Spark's own sort semantics
  * ([[SQLOrderingUtil.compareDoubles]]: −0.0 == 0.0, NaN greatest) so the
  * selection can never diverge from what `ORDER BY ccos DESC, cent_id`
  * produced. Output is the `min(keep, C)` ids in rank order as
  * `array<bigint>`: `keep = 1` callers take element 0, probe callers
  * explode it.
  *
  * The matrix rides in a [[CentroidMatrix]] holder — identity-hashed, so
  * plan-time tree comparisons are O(1) instead of O(C·dim) at the
  * laddered C → √n sizing. At C = √(10⁸) ≈ 10⁴ and dim 64 the constant
  * is ~5 MB — the same order as a broadcast dimension table, shipped
  * once per executor.
  */
case class NearestCells(vec: Expression, nrm: Expression,
    m: CentroidMatrix, keep: Int)
    extends BinaryExpression {

  require(keep >= 1, "keep must be >= 1")

  override def left: Expression = vec
  override def right: Expression = nrm
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, nrm.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got " +
          s"${vec.dataType.sql} and ${nrm.dataType.sql}")
    }

  /** The per-row selection — called from both interpreted eval and the
    * generated code (the loop is a compiled JVM method either way; what
    * matters for codegen health is that the EXPRESSION doesn't fall back,
    * so the surrounding stage stays fused). */
  def selectCells(v: ArrayData, n: Double): ArrayData = {
    val c = m.rows
    if (keep == 1) {
      // Zero-allocation argmax for the dominant assignment path (keep=1
      // over every corpus row): the general path below allocates two
      // O(C) arrays per ROW — ~90 KB of young-gen churn per row at the
      // laddered C ≈ 10⁴. Same comparator and same first-index
      // tie-break as the selection sort, so the result is bit-identical.
      var bestIdx = 0
      var bestCos = m.cosRow(0, v, n)
      var j = 1
      while (j < c) {
        val cc = m.cosRow(j, v, n)
        if (SQLOrderingUtil.compareDoubles(cc, bestCos) > 0) { bestCos = cc; bestIdx = j }
        j += 1
      }
      return new GenericArrayData(Array(m.ids(bestIdx)))
    }
    val ccos = new Array[Double](c)
    var j = 0
    while (j < c) { ccos(j) = m.cosRow(j, v, n); j += 1 }
    // Selection sort: O(keep·C) — fine at keep ≤ IvfProbeMax; switch to a
    // bounded max-heap if keep is ever raised toward C (ADVICE r8).
    val k = math.min(keep, c)
    val out = new Array[Long](k)
    val taken = new Array[Boolean](c)
    var r = 0
    while (r < k) {
      var best = -1
      var i = 0
      while (i < c) {
        if (!taken(i) &&
          (best < 0 || SQLOrderingUtil.compareDoubles(ccos(i), ccos(best)) > 0))
          best = i
        i += 1
      }
      taken(best) = true
      out(r) = m.ids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    selectCells(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, (v, n) => s"${ev.value} = $ref.selectCells($v, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(vec = newLeft, nrm = newRight)
}

/** Max cosine of a row's vector against a plan-time eval matrix — the
  * [[NearestCells]] sibling that lifts d_decontaminate_semantic's
  * eval-set cap (VERDICT r9 #2). The previous form string-built one
  * `greatest(vec_dot(vd, <64-double literal>) / ..., …)` term per eval
  * vector: ideal at the 20-row bench eval set, but a realistic benchmark
  * suite (10³–10⁵ prompts) would blow the generated expression past
  * Janino method limits (interpreted fallback at best, a stalled driver
  * building a multi-MB tree at worst). Here the eval matrix rides a
  * [[CentroidMatrix]] holder and the row pays one compiled
  * O(E·dim) loop — same zero-shuffle, zero-join plan shape
  * (PlanShapeSpec pins exchange count 0), eval capacity bounded by
  * executor memory (~5 MB per 10⁴ prompts) instead of codegen size.
  *
  * Bit-exactness contract (the DuckDB oracle re-derives the max over a
  * join): each score folds dimensions 0..dim−1 left-to-right (the
  * [[VecDot]] order) over min(dim, |v|) elements, divided by
  * `(nrm * en_j)` exactly as the literal form's `/ (nrm * <en>D)`;
  * the max scans eval rows in matrix order (the caller sorts by vec_id)
  * keeping the earlier row on ties via [[SQLOrderingUtil.compareDoubles]]
  * — `greatest(...)`'s own semantics (NaN greatest, −0.0 == 0.0), and
  * order-independent for the non-NaN cosines real embeddings produce,
  * which is what lets the oracle's unordered MAX agree. */
case class EvalMaxCosine(vec: Expression, nrm: Expression, m: CentroidMatrix)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = nrm
  override def dataType: DataType = DoubleType
  override def prettyName: String = "eval_max_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, nrm.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got " +
          s"${vec.dataType.sql} and ${nrm.dataType.sql}")
    }

  def maxCos(v: ArrayData, n: Double): Double = {
    var best = 0.0
    var j = 0
    while (j < m.rows) {
      val c = m.cosRow(j, v, n) // the shared fold (CentroidMatrix.cosRow)
      if (j == 0 || SQLOrderingUtil.compareDoubles(c, best) > 0) best = c
      j += 1
    }
    best
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    maxCos(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("evalMaxCosine", this, classOf[EvalMaxCosine].getName)
    nullSafeCodeGen(ctx, ev, (v, n) => s"${ev.value} = $ref.maxCos($v, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EvalMaxCosine =
    copy(vec = newLeft, nrm = newRight)
}
