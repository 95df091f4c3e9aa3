package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory and
  * §5 for the oracle conventions. Queries are registered per domain in
  * graft.queries.* and merged here. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_group_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ StatsQueries.queries ++ WindowQueries.queries ++
      FitQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      MiscQueries.queries ++ CurationQueries.queries

  /** DuckDB-runnable oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ StatsQueries.oracle ++ WindowQueries.oracle ++
      FitQueries.oracle ++ TextQueries.oracle ++ DedupQueries.oracle ++
      MiscQueries.oracle ++ CurationQueries.oracle
}
