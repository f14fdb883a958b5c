package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered in graft.queries.* as Q(name, fn, oracle) triples;
  * every SQL-expressible query carries a DuckDB oracle over the same parquet
  * tables with identical column aliases and ORDER BY on both sides.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    CoreQueries.all ++ ScoringQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ DomainQueries.all ++
      StreamingQueries.all ++ ProfilingQueries.all ++ OlapQueries.all ++
      TemporalQueries.all ++ CurationQueries.all ++ CorpusStatsQueries.all ++
      EventAnalyticsQueries.all ++ GraphQueries.all ++ BronzeQueries.all ++
      SqlSurfaceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_regional_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
