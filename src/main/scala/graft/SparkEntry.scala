package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ FilterQueries.queries ++ ListingQueries.queries ++
      VectorQueries.queries ++ TextQueries.queries ++ TemporalQueries.queries ++
      PipelineQueries.queries ++ MutationQueries.queries ++ CorpusQueries.queries ++
      ClusterQueries.queries ++ SearchQueries.queries ++ GraphQueries.queries ++
      EvalQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ FilterQueries.oracles ++ ListingQueries.oracles ++
      VectorQueries.oracles ++ TextQueries.oracles ++ TemporalQueries.oracles ++
      PipelineQueries.oracles ++ MutationQueries.oracles ++ CorpusQueries.oracles ++
      ClusterQueries.oracles ++ SearchQueries.oracles ++ GraphQueries.oracles ++
      EvalQueries.oracles
}
