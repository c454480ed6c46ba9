package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17: [[LshBandKeys]] replaces the literal banded-LSH bucket trees.
  * Differential against the pre-r17 string-built form (verbatim below),
  * including the two semantic corners the scaladoc pins: −0.0/NaN dot
  * comparison via Java `>=`, and a null element zeroing every term
  * (SQL `CASE WHEN null` → ELSE) rather than nulling the output. */
class LshBandKeysSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.Sessions.tune(
      SparkSession.builder().appName("lshbands-spec").master("local[4]"), "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val Dim = 16
  private val Bands = 5
  private val Ppb = 7
  private val Stride = 11 // != ppb: exercises the decoupled plane identity

  private def plane(p: Int): Array[Double] =
    Array.tabulate(Dim)(d => if ((p * 31 + d * 7) % 3 == 0) 1.0 else -1.0)

  /** The pre-r17 literal builder, verbatim modulo the local plane family. */
  private def oldBandKeys: String =
    (0 until Bands).map { b =>
      (0 until Ppb).map { j =>
        val lit = plane(b * Stride + j).mkString("array(", "D, ", "D)")
        s"(case when vec_dot(vd, $lit) >= 0 then ${1 << j} else 0 end)"
      }.mkString("(", " + ", ")")
    }.mkString("array(", ", ", ")")

  private def newCol = {
    val pm = new PlanesMatrix(
      Array.tabulate(Bands * Ppb)(i => plane((i / Ppb) * Stride + (i % Ppb))),
      Bands, Ppb)
    org.apache.spark.sql.graft.ColumnBridge.column(
      LshBandKeys(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted("vd"), pm))
  }

  test("band keys match the literal form on random, short, and boundary vectors") {
    VectorFunctions.register(spark)
    val rand = new scala.util.Random(3)
    import spark.implicits._
    val rows = Seq.fill(400)(Array.fill(Dim)(rand.nextDouble() * 2 - 1)) ++
      Seq.fill(20)(Array.fill(Dim / 2 + 1)(rand.nextDouble() * 2 - 1)) ++ // short
      Seq(Array.fill(Dim)(0.0), Array.fill(Dim)(-0.0)) // sign-of-zero dots
    val out = rows.toDF("vd")
      .withColumn("nw", newCol)
      .withColumn("old", expr(oldBandKeys))
    val mismatch = (0 until Bands)
      .map(b => s"(element_at(nw, ${b + 1}) <> element_at(old, ${b + 1}))")
      .mkString(" or ")
    assert(out.filter(mismatch).count() === 0)
  }

  test("a null element zeroes every band term, exactly like CASE WHEN null") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val rows: Seq[Seq[java.lang.Double]] =
      Seq(Seq.tabulate(Dim)(i => if (i == 2) null
        else java.lang.Double.valueOf(if (i % 2 == 0) 1.0 else -1.0)))
    val out = rows.toDF("vd")
      .withColumn("nw", newCol)
      .withColumn("old", expr(oldBandKeys))
      .head()
    assert(!out.isNullAt(1) && !out.isNullAt(2))
    assert(out.getSeq[Int](1) === out.getSeq[Int](2))
    assert(out.getSeq[Int](1).forall(_ == 0))
  }
}
