package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Schema-drift canary over EVERY table loader — the round-5 lesson
  * (`events.ts` silently regenerated from TIMESTAMP(NANOS) to
  * timestamp[us], killing 17 oracle entries before anything noticed)
  * generalized: the driver regenerates /root/testdata between rounds, so
  * each loader is pinned to the LOGICAL columns the registry depends on,
  * not a physical layout. A regeneration that changes what the loaders
  * present fails here first, with a message naming the table — instead of
  * as an analysis error deep inside some query's plan.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Logical contract per table: column name → accepted dataTypes.
    * Integral key/count columns accept any integral width (the generator
    * has shipped int32 and int64 for dimension keys). Raw date columns
    * accept TIMESTAMP or TIMESTAMP_NTZ (Spark 4 infers NTZ from
    * no-timezone parquet; with the session pinned to UTC both name the
    * same instant, and the oracle queries are green under either) —
    * events.ts alone is REQUIRED to be TimestampType because its loader
    * normalizes whatever the file holds. */
  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val anyTimestamp: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private def contract(name: String): Map[String, Set[DataType]] = name match {
    case "region"   => Map("r_regionkey" -> integral, "r_name" -> Set(StringType))
    case "nation"   => Map("n_nationkey" -> integral, "n_name" -> Set(StringType),
      "n_regionkey" -> integral)
    case "customer" => Map("c_custkey" -> integral, "c_nationkey" -> integral,
      "c_acctbal" -> Set(DoubleType), "c_mktsegment" -> Set(StringType))
    case "supplier" => Map("s_suppkey" -> integral, "s_nationkey" -> integral,
      "s_acctbal" -> Set(DoubleType))
    case "part"     => Map("p_partkey" -> integral, "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType), "p_size" -> integral)
    case "orders"   => Map("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_totalprice" -> Set(DoubleType), "o_orderdate" -> anyTimestamp,
      "o_orderpriority" -> Set(StringType))
    case "lineitem" => Map("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType), "l_discount" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> anyTimestamp)
    case "events"   => Map("event_id" -> integral, "ts" -> Set[DataType](TimestampType),
      "ts_ns" -> Set[DataType](LongType), "user_id" -> integral,
      "event_type" -> Set(StringType), "value" -> Set(DoubleType),
      "props" -> Set(StringType))
    case "documents" => Map("doc_id" -> integral, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType), "n_chars" -> integral)
    case "embeddings" => Map("vec_id" -> integral,
      "embedding" -> Set[DataType](ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> integral)
  }

  private def load(name: String) = name match {
    case "events"    => graft.Tables.events(spark, dir)
    case "documents" => graft.Tables.documents(spark, dir)
    case other       => graft.Tables.load(spark, dir, other)
  }

  test("every table loader presents its contract columns against the current testdata") {
    val problems = graft.Tables.names.flatMap { name =>
      try {
        val schema = load(name).schema
        contract(name).flatMap { case (col, accepted) =>
          schema.fields.find(_.name == col) match {
            case None => Some(s"$name.$col missing (has ${schema.fieldNames.mkString(",")})")
            case Some(f) if !accepted.contains(f.dataType) =>
              Some(s"$name.$col is ${f.dataType.simpleString}, expected one of " +
                accepted.map(_.simpleString).mkString("/"))
            case _ => None
          }
        }
      } catch {
        case e: Throwable => Seq(s"$name failed to load: ${e.getMessage}")
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("every table has rows at sf0.001") {
    for (name <- graft.Tables.names)
      assert(load(name).limit(1).count() == 1L, s"$name is empty")
  }

  test("per-user event times are strictly increasing at MICROSECOND granularity") {
    // p_market_spread's oracle equivalence rests on this (ADVICE r6):
    // the batch/stream replay orders merged legs by ts_ns while the
    // DuckDB ASOF oracle compares strictly at epoch_us — two same-user
    // events inside one microsecond would be ordered by the replay but
    // excluded by the oracle's strict o.ts_us > q.ts_us. Guard the
    // invariant at every SF the driver touches so a testdata
    // regeneration that violates it fails HERE, not as an opaque hash
    // mismatch. (Same-ns ties would also make the per-key replay sort
    // nondeterministic; µs-strict implies ns-strict.)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val w = Window.partitionBy("user_id").orderBy("ts_ns")
      val violations = graft.Tables.events(spark, s"/root/testdata/$sf")
        .select(col("user_id"), col("ts_ns"),
          // integer division — ts_ns ~1.7e18 exceeds double precision,
          // so `/ 1000` (float div) would corrupt the µs values
          expr("ts_ns div 1000").as("ts_us"))
        .withColumn("prev_us", lag("ts_us", 1).over(w))
        .filter(col("prev_us").isNotNull && col("ts_us") <= col("prev_us"))
        .count()
      assert(violations === 0L,
        s"$sf: $violations same-user event pairs within one microsecond — " +
          "p_market_spread's replay/ASOF-oracle equivalence is broken")
    }
  }
}
