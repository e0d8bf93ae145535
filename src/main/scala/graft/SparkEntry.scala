package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llm.LlmQueries
import graft.operators.{EngineQueries, EventWindowQueries, RelationalQueries}
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every declared operator's query form;
  * `oracleSql` carries the DuckDB-dialect equivalent for the driver's
  * hash-compare (queries without an oracle get a weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q05_join_multiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventWindowQueries.queries ++
      EngineQueries.queries ++ LlmQueries.queries ++ EventStreams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ EventWindowQueries.oracles ++
      EngineQueries.oracles ++ LlmQueries.oracles ++ EventStreams.oracles
}
