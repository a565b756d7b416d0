package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's query/oracle maps. Each `queries` entry is
  * one operator from SURVEY.md §2's inventory (or a north-star extension); each
  * `oracleSql` entry is the ANSI-SQL equivalent the driver runs in DuckDB over
  * the same parquet tables.
  */
object SparkEntry {
  /** Flagship query; driver smoke-checks rows>0. The driver contract pins
    * sf0.001, overridable via SPARK_GRAFT_SF_DIR for any other deployment.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q3_revenue_by_nation")(
      spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Events.queries ++ Multimodal.queries ++ Joins.queries ++ Relational2.queries ++
      Connectors.queries ++ Pipeline.queries ++ Skew.queries ++ Maintenance.queries ++
      Changes.queries ++ Quality.queries ++ Retrieval.queries ++ Spatial.queries ++ Analytics.queries ++
      BpeTrainer.queries ++ Learn.queries ++
      graft.sources.Bucketing.queries ++ graft.sources.Versioned.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Events.oracles ++ Multimodal.oracles ++ Joins.oracles ++ Relational2.oracles ++
      Connectors.oracles ++ Pipeline.oracles ++ Skew.oracles ++ Maintenance.oracles ++
      Changes.oracles ++ Quality.oracles ++ Retrieval.oracles ++ Spatial.oracles ++ Analytics.oracles ++
      BpeTrainer.oracles ++ Learn.oracles ++
      graft.sources.Bucketing.oracles ++ graft.sources.Versioned.oracles
}
