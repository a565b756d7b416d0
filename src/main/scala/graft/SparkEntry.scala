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

  /** The module inventory, kept as an explicit (queries, oracles) list so the
    * contract spec can assert there are no cross-module name collisions —
    * `Map ++` silently shadows, which would drop a query from the gate.
    */
  val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (Events.queries, Events.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Joins.queries, Joins.oracles),
      (Relational2.queries, Relational2.oracles),
      (Connectors.queries, Connectors.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (Skew.queries, Skew.oracles),
      (Maintenance.queries, Maintenance.oracles),
      (Changes.queries, Changes.oracles),
      (Quality.queries, Quality.oracles),
      (Retrieval.queries, Retrieval.oracles),
      (Spatial.queries, Spatial.oracles),
      (Analytics.queries, Analytics.oracles),
      (BpeTrainer.queries, BpeTrainer.oracles),
      (Learn.queries, Learn.oracles),
      (graft.sources.Bucketing.queries, graft.sources.Bucketing.oracles),
      (graft.sources.Versioned.queries, graft.sources.Versioned.oracles),
      (graft.streaming.StreamGate.queries, graft.streaming.StreamGate.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
