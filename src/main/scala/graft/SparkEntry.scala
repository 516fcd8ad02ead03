package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a `(SparkSession, sfDir) => DataFrame`
  * pair with a matching DuckDB oracle in [[oracleSql]] where the operator
  * is SQL-expressible. Determinism rules (driver hash-compares values):
  *   - every query ends in an ORDER BY over a unique key (both sides);
  *   - double aggregates are rounded (fp sum order differs between
  *     engines; exact-integer sums are left unrounded);
  *   - Spark `length`/`weekofyear`/`count`-style ints are cast to long to
  *     match DuckDB's BIGINT;
  *   - column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (plus the
    * large-scale training-data operators). Grouped in Queries*.scala. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesPipeline.queries ++ QueriesText.queries ++
      QueriesDedup.queries ++ QueriesSimilarity.queries ++
      QueriesMultimodal.queries ++ QueriesEvents.queries ++
      QueriesCuration.queries ++ QueriesCorpus.queries ++
      QueriesSearch.queries ++ QueriesAnalytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesCore.oracleSql ++ QueriesPipeline.oracleSql ++
      QueriesText.oracleSql ++ QueriesDedup.oracleSql ++
      QueriesSimilarity.oracleSql ++ QueriesMultimodal.oracleSql ++
      QueriesEvents.oracleSql ++ QueriesCuration.oracleSql ++
      QueriesCorpus.oracleSql ++ QueriesSearch.oracleSql ++
      QueriesAnalytics.oracleSql
}
