package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffling fact tables on their join key at
  * write time so later joins and aggregations on that key need no exchange.
  *
  * This is the 100 TB co-location play: a nightly 100 TB lineitem write
  * bucketed by orderkey turns every subsequent orderkey join/agg from a
  * full shuffle into a map-side zip of matching buckets. Verified by
  * BucketingSpec: the physical plan of a bucketed join contains no Exchange
  * on the bucketed side.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets on the
    * same key, enabling sort-merge joins without a sort either).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // A crashed previous run can leave the managed location behind without
    // catalog metadata; Overwrite alone then fails with LOCATION_ALREADY_EXISTS.
    val warehouse = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
