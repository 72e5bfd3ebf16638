package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented SURVEY §2 operator (plus the
  * training-data extension operators); `oracleSql` the equivalent DuckDB
  * SQL over the same parquet tables. Names, column aliases and row order
  * are deterministic on both sides.
  */
object SparkEntry {
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (SimilarityQueries.queries, SimilarityQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (SamplingQueries.queries, SamplingQueries.oracles),
      (EventQueries.queries, EventQueries.oracles),
      (ScaleQueries.queries, ScaleQueries.oracles),
      (AnalyticalQueries.queries, AnalyticalQueries.oracles),
      (WindowGroupingQueries.queries, WindowGroupingQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_grouped_sum_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = modules.flatMap(_._2).toMap
}
