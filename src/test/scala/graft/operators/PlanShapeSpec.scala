package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the exchange COUNT the scaling notes claim for specific
  * operators — a zero-shuffle scan that silently grows an Exchange, or a
  * single-Exchange window query that starts double-shuffling, is a scale
  * regression the oracle gate cannot see (the rows stay identical). */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = graft.pipeline.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** KEYED exchanges only (hash/range). The table loaders insert one
    * RoundRobin exchange to spread a single-file test parquet across
    * cores (Tables.scala:66) — data-independent, not a keyed shuffle,
    * and absent at real scale where the scan has many files. */
  private def shuffles(plan: SparkPlan): Int =
    plan.collect {
      case e: ShuffleExchangeExec
          if !e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => e
    }.size

  private def planOf(name: String): SparkPlan = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // AQE wraps exchanges in query stages, hiding them from plan.collect
    // — make the count a static plan property (same rationale as
    // BucketedJoinSpec).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      // d_semantic persists its assignment subtree at construction time
      // (Caching.reuse); an accumulated CacheManager would substitute
      // InMemoryRelation into later plans here (same hygiene as
      // PlanGuardSpec.planOf)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("t_quality_model is a zero-shuffle scan") {
    assert(shuffles(planOf("t_quality_model")) === 0,
      "classifier scoring must stay a per-row projection")
  }

  test("s_quantize is a zero-shuffle scan") {
    assert(shuffles(planOf("s_quantize")) === 0,
      "quantization must stay a per-row projection")
  }

  test("q_events_topk_window shuffles events once; the rank moves only the type table") {
    // exchange 1: the (window, type) count agg over events (map-side
    // combined); exchange 2: the rank's window-only re-partition — but
    // its input is the per-window TYPE table, not events. Exactly 2, and
    // a third would mean events are moving twice.
    assert(shuffles(planOf("q_events_topk_window")) === 2,
      "leaderboard must shuffle events once and rank over types only")
  }

  test("p_topk's board stage never sees an events-volume exchange") {
    // The DSL chain's keyed exchanges: (1) keyBy(hour|type) into the
    // count-window state host — the only exchange carrying event-volume
    // rows; (2) keyBy(hour) into the board host, fed ceil(n/50) partial
    // counts; (3) the final groupBy(window_start_us) over one board row
    // per update. A fourth keyed exchange means events are moving twice.
    assert(shuffles(planOf("p_topk")) === 3,
      "leaderboard chain must shuffle events once, partials once, boards once")
  }

  test("ANN rank tails are bounded aggregations, not full-sort windows") {
    // VERDICT r6 #1: row_number().over(partitionBy(query_id)) sorted the
    // whole candidate stream through ≤NumQueries partitions. The TopKAgg
    // tail must show up as an ObjectHashAggregate pair (partial map-side,
    // final after a buffers-only exchange) and NO window operator at all
    // in the searches that rank only per query.
    for (name <- Seq("s_ann_brute", "s_ann_lsh", "s_ann_pq")) {
      val plan = planOf(name)
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty, s"$name must not rank via a window sort")
      val oha = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      }
      assert(oha.nonEmpty, s"$name must rank via the bounded TopKAgg")
    }
    // The IVF forms (r8): cell assignment is the NearestCells expression
    // — a row-local codegen'd argmax over the plan-time centroid matrix —
    // so there is NO window operator anywhere: not for the rank tail
    // (TopKAgg) and not for assignment (the old corpus×C broadcast-join
    // explosion + row_number exchange, VERDICT r7 #1).
    // (d_semantic/_scale share the same assignment code path but persist
    // it through Caching.reuse's RDD bridge, which hides the subtree from
    // SQL-plan collects — the IVF pins below cover the shared helper.)
    for (name <- Seq("s_ann_ivf", "s_ann_ivf_trained", "s_ann_ivf_probe",
        "s_ann_ivfpq")) {
      val plan = planOf(name)
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty,
        s"$name must assign cells via NearestCells and rank via TopKAgg — no windows")
    }
  }

  test("IVF cell assignment adds no corpus-volume exchange") {
    // s_ann_ivf_trained: corpus rows move through exactly ONE keyed
    // exchange (the cent_id candidate join); the rank tail moves bounded
    // TopKAgg buffers through a second. The old assignment shape added a
    // corpus×C-row exchange on vec_id before either — 3 keyed exchanges
    // here means the explosion is back.
    assert(shuffles(planOf("s_ann_ivf_trained")) <= 2,
      "cell assignment must stay row-local (no argmax exchange)")
  }

  test("p_ann_search prunes index partitions dynamically by probed cell") {
    // The materialized index is parquet partitioned by cent_id; the probe
    // side is a bounded broadcast. Dynamic partition pruning is what
    // makes the 100 TB story real — only the ~P/C probed cells' FILES are
    // read, not the whole index. Losing the DPP subquery would silently
    // regress the scan to full-index reads with identical results.
    val plan = planOf("p_ann_search").toString
    assert(plan.contains("dynamicpruning"),
      "index scan must carry a dynamicpruning partition filter on cent_id")
  }

  test("d_decontaminate_semantic is a zero-shuffle scan") {
    // The eval set rides the plan as literals; the corpus max-cosine is
    // a row-local greatest over codegen'd dots. An Exchange here means
    // the eval comparison regressed to a join.
    assert(shuffles(planOf("d_decontaminate_semantic")) === 0,
      "semantic decontamination must stay a per-row projection")
  }

  test("s_centroid_outliers selects its P90 without a window sort") {
    // VERDICT r8 #4: the old row_number().over(partitionBy(label)) put
    // each label's FULL row set through one sorted partition — a hot
    // label serialized the query. The two-phase bucketed selection must
    // leave no WindowExec anywhere (phase 2/3 are plain aggregations
    // over ≤OutlierBuckets rows per label and one bucket's rows).
    val plan = planOf("s_centroid_outliers")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      "P90 selection must be the bucketed two-phase rank, not a label-partitioned window")
  }

  test("q_events_anomaly shuffles each scan once on event_type") {
    // the median branch and the deviation branch each hash-partition
    // their events scan once; the MAD rank and the flag join ride the
    // deviation branch's partitioning via broadcasts (no third keyed
    // shuffle of event rows)
    assert(shuffles(planOf("q_events_anomaly")) === 2,
      "median/MAD must not re-shuffle event rows beyond one pass per branch")
  }
}
