package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Plan-time hyperplane family for [[LshBandKeys]] — the
  * [[CentroidMatrix]] discipline applied to the banded-LSH bucket
  * expressions (r17 optimization; guide §§1.2/7.2).
  *
  * The previous shape string-built `array(<bands sums>)` where every
  * band summed planesPerBand terms of
  * `case when vec_dot(vd, <64-double literal>) >= 0 then 2^j else 0` —
  * at the scale sizing (k up to 16 bits × ~20+ bands) that is hundreds
  * of embedded 64-double literals and ~10⁴ Catalyst nodes, built TWICE
  * per query (both sides of the candidate self-join) and walked by
  * analysis/folding/codegen on every plan. Here the plane family rides
  * one identity-hashed reference object and the row pays a compiled
  * O(bands·k·dim) loop.
  *
  * Bit-exactness contract (the literal form and the DuckDB twins):
  * bucket(b) = Σ_j (dot_j ≥ 0 ? 2^j : 0) where dot_j folds
  * `vd[d] · plane(b,j)(d)` left-to-right over d < min(dim, |vd|)
  * ([[VecDot]] order), `≥ 0` is Java primitive-double semantics
  * (−0.0 ≥ 0 true, NaN false), and a NULL dot (a null element inside
  * the folded range) contributes 0 — SQL `CASE WHEN null` takes the
  * ELSE branch, unlike the PQ expressions' null propagation. Plane
  * identity is the caller's (b·stride + j) → [[graft.operators.Similarity.planeRow]]
  * family, materialized into the holder at build time.
  */
final class PlanesMatrix(planes: Array[Array[Double]], val bands: Int,
    val ppb: Int) extends Serializable {
  require(bands >= 1 && ppb >= 1 && planes.length == bands * ppb,
    "planes must be (bands x planesPerBand) rows in (b, j) row-major order")
  val dim: Int = planes(0).length
  require(planes.forall(_.length == dim), "plane rows must share one dim")
  /** Row-major (b, j) flattening. */
  val flat: Array[Double] = {
    val out = new Array[Double](bands * ppb * dim)
    var i = 0
    while (i < planes.length) {
      System.arraycopy(planes(i), 0, out, i * dim, dim)
      i += 1
    }
    out
  }
  override def hashCode(): Int = System.identityHashCode(this)
  override def equals(o: Any): Boolean = o match {
    case r: AnyRef => this eq r
    case _         => false
  }
  override def toString: String = s"PlanesMatrix(${bands}x${ppb}x$dim)"
}

/** All banded-LSH bucket keys of a vector as ONE codegen'd expression —
  * output `array<int>` of length bands, element b the b-th band's
  * sign-bit bucket. Callers `posexplode` it exactly as they did the
  * literal `array(...)` form. */
case class LshBandKeys(vec: Expression, m: PlanesMatrix) extends UnaryExpression {
  override def child: Expression = vec
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  private def elementsNullable: Boolean = vec.dataType match {
    case ArrayType(_, cn) => cn
    case _                => false
  }

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  def bandKeys(v: ArrayData): ArrayData = {
    val lim = math.min(m.dim, v.numElements())
    val anyNull = elementsNullable && {
      // one scan decides nullity for every dot over the same prefix
      var d = 0
      var found = false
      while (!found && d < lim) { found = v.isNullAt(d); d += 1 }
      found
    }
    // a null element inside the fold nulls every dot (all dots share the
    // same prefix); CASE WHEN null yields the ELSE 0 — every bucket is 0
    if (anyNull) return new GenericArrayData(new Array[Int](m.bands))
    val out = new Array[Int](m.bands)
    var b = 0
    while (b < m.bands) {
      var bucket = 0
      var j = 0
      while (j < m.ppb) {
        val base = (b * m.ppb + j) * m.dim
        var s = 0.0
        var d = 0
        while (d < lim) { s += v.getDouble(d) * m.flat(base + d); d += 1 }
        if (s >= 0) bucket += (1 << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = bandKeys(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBandKeys", this, classOf[LshBandKeys].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.bandKeys($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(vec = newChild)
}
