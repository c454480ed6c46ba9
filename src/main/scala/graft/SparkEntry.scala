package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator registry in the library. Each registry maps
  * query name → (builder, optional DuckDB oracle SQL); builders take
  * (SparkSession, sfDir) and return a DataFrame whose column names match
  * the oracle's aliases exactly.
  */
object SparkEntry {

  private def registries: Seq[Map[String, ((SparkSession, String) => DataFrame, Option[String])]] =
    Seq(operators.Queries.all, operators.TextAnalysis.all, operators.Dedup.all,
      operators.Similarity.all, operators.Multimodal.all,
      operators.PipelineQueries.all, operators.WireQueries.all)

  private lazy val merged: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    registries.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    merged.collect { case (k, (_, Some(sql))) => k -> sql }
}
