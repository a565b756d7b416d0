package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cost-based optimization from catalog statistics: ANALYZE column stats
  * change the chosen join strategy for the same query text.
  *
  * Without statistics a filtered dimension is costed at its FILE size, so a
  * selective filter buys nothing at planning time; with column stats the
  * optimizer estimates the filter's output (ndv-based selectivity × stats
  * row width), sees it under the broadcast threshold, and flips the join to
  * broadcast. At 100 TB this is the difference between shuffling a fact
  * table against a "big" dimension that is actually three rows after its
  * filter, and broadcasting those three rows — with no hint in the query.
  */
class CatalogStatsSpec extends SparkSpec {

  private def saveManaged(df: DataFrame, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  test("ANALYZE column stats flip a filtered-dim join to broadcast under CBO") {
    saveManaged(graft.operators.Relational.t(spark, sf(), "part"), "cbo_part")
    saveManaged(graft.operators.Relational.t(spark, sf(), "lineitem"), "cbo_lineitem")
    val cbo0 = spark.conf.get("spark.sql.cbo.enabled")
    val thr0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // Between the dim's size-only estimate (file bytes scaled by column
      // pruning, ~2-3 KB) and its post-filter stats estimate (ndv
      // selectivity x stats row width, a few hundred bytes), so only the
      // stats path broadcasts.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "512")

      def query = spark.table("cbo_lineitem")
        .join(spark.table("cbo_part").filter(col("p_size") === 1),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
      def planStr = query.queryExecution.executedPlan.toString

      assert(!planStr.contains("BroadcastHashJoin"),
        s"without stats the size-only dim estimate must NOT broadcast under a 512B threshold:\n$planStr")

      spark.sql("ANALYZE TABLE cbo_part COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS")
      assert(planStr.contains("BroadcastHashJoin"),
        s"with ndv stats the ~4-row filtered dim must broadcast:\n$planStr")

      // Strategy changed; the answer must not.
      val rows = query.orderBy("p_brand").collect().map(_.toSeq).toSeq
      val expected = graft.operators.Relational.t(spark, sf(), "lineitem")
        .join(broadcast(graft.operators.Relational.t(spark, sf(), "part").filter(col("p_size") === 1)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand").collect().map(_.toSeq).toSeq
      assert(rows == expected)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cbo0)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr0)
      spark.sql("DROP TABLE IF EXISTS cbo_part")
      spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
    }
  }
}
