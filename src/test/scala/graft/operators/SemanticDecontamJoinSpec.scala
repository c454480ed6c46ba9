package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TestSpark

/** The broadcast-join decontamination path
  * ([[Similarity.dDecontaminateSemanticJoinWith]]) is the documented
  * escape hatch for eval sets past the plan-time matrix bound
  * (SemEvalMaxDoubles). It must return bit-identical rows to the
  * oracle-certified matrix path on the same inputs — the per-pair score
  * is the same vec_dot fold and MAX over non-NaN doubles is
  * order-independent — and its plan must actually be the advertised
  * shape: eval side broadcast (BroadcastNestedLoopJoin, never a
  * cartesian product), corpus un-shuffled before the pairing, one slim
  * keyed exchange for the final max. */
class SemanticDecontamJoinSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def split() = {
    val v = Similarity.vecs(spark, dir)
    (v.filter(col("vec_id") >= Similarity.NumQueries),
      v.filter(col("vec_id") < Similarity.NumQueries))
  }

  test("bit-identical to the plan-time matrix path") {
    val (corpus, evals) = split()
    val m = Similarity
      .dDecontaminateSemanticWith(corpus, evals, Similarity.SemContamCos)
    val j = Similarity
      .dDecontaminateSemanticJoinWith(corpus, evals, Similarity.SemContamCos)
    // exact float equality, not tolerance: the shared fold-order contract
    // (EvalMaxCosine's scaladoc) is the thing under test
    assert(m.count() === j.count())
    assert(m.join(j, Seq("vec_id", "max_eval_cos", "contaminated")).count()
      === m.count())
  }

  test("duplicate corpus ids keep one output row each, like the matrix path") {
    // VERDICT r10 #3: the old groupBy("vec_id") collapsed duplicate ids
    // to one row where the matrix path's row-local withColumn keeps
    // both; the per-row surrogate restores row-for-row agreement on
    // arbitrary DataFrames, not just the unique-id vecs() shape.
    val (corpus, evals) = split()
    val dup = corpus.union(corpus.limit(3))
    val m = Similarity
      .dDecontaminateSemanticWith(dup, evals, Similarity.SemContamCos)
    val j = Similarity
      .dDecontaminateSemanticJoinWith(dup, evals, Similarity.SemContamCos)
    assert(j.count() === dup.count(), "one output row per input row")
    // bit-identical multiset: group both sides by the full row and
    // compare multiplicities (exact doubles — same fold-order contract)
    val mG = m.groupBy("vec_id", "max_eval_cos", "contaminated").count()
    val jG = j.groupBy("vec_id", "max_eval_cos", "contaminated").count()
    assert(mG.join(jG, Seq("vec_id", "max_eval_cos", "contaminated", "count"))
      .count() === mG.count())
    assert(mG.count() === jG.count())
  }

  test("empty and ragged eval sets fail loudly, matching the matrix path") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val (corpus, evals) = split()
    val empty = evals.filter(col("vec_id") < 0)
    val exEmpty = intercept[IllegalArgumentException] {
      Similarity.dDecontaminateSemanticJoinWith(corpus, empty, 0.4)
    }
    assert(exEmpty.getMessage.contains("non-empty"), exEmpty.getMessage)
    // ragged dims would silently truncate every vec_dot to min(dim)
    val ragged = Seq((0L, Array.fill(63)(0.5)), (1L, Array.fill(65)(0.5)))
      .toDF("vec_id", "vd")
      .withColumn("nrm", expr("sqrt(vec_dot(vd, vd))"))
    val exRagged = intercept[IllegalArgumentException] {
      Similarity.dDecontaminateSemanticJoinWith(corpus, ragged, 0.4)
    }
    assert(exRagged.getMessage.contains("dimension"), exRagged.getMessage)
  }

  test("plan: eval side broadcast, no cartesian, no corpus pre-shuffle") {
    val (corpus, evals) = split()
    val plan = Similarity
      .dDecontaminateSemanticJoinWith(corpus, evals, Similarity.SemContamCos)
      .queryExecution.executedPlan
    def all(p: SparkPlan): Seq[SparkPlan] = collect(p) { case n => n }
    val nodes = all(plan).map(_.nodeName)
    assert(nodes.exists(_.contains("BroadcastNestedLoopJoin")),
      s"eval side must broadcast, got: ${nodes.distinct.mkString(", ")}")
    assert(!nodes.exists(_.contains("CartesianProduct")),
      "the pairing must never plan a CartesianProduct")
    // exactly one shuffle: the 16 B/row (vec_id, partial-max) exchange
    // after the map-side partial aggregate — the corpus itself is paired
    // and partially reduced without moving
    val exchanges = all(plan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(exchanges === 1, s"expected the one slim max exchange, got $exchanges")
  }
}
