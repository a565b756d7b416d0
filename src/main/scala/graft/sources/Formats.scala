package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format connectors beyond parquet (SURVEY.md §2.2 file-formats row:
  * the reference reads/writes plain text only — `src/worker.h:68`,
  * `src/mr_tasks.h:25`). Thin, explicit wrappers around Spark's CSV/JSON/text
  * sources with the options pinned for deterministic round-trips.
  *
  * Scale: all three formats split by byte ranges with line alignment exactly
  * like the reference's FileShard math (`src/file_shard.h:19-43`), governed by
  * `spark.sql.files.maxPartitionBytes`; compression (any codec Spark ships)
  * comes free on write.
  */
object Formats {

  /** Microsecond-precision formats pinned on BOTH write and read:
    * the default TIMESTAMP_NTZ pattern keeps only milliseconds, which would
    * silently truncate parquet micros through a round-trip.
    */
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  private val TsNtzFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsNtzFormat)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsNtzFormat)
      .schema(schema)
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsNtzFormat)
      .json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsNtzFormat)
      .schema(schema)
      .json(path)

  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  /** Compressed text (the reference's own format + a codec): .gz part files
    * on write, transparently decompressed on read. Note gzip is not
    * splittable — one file = one input partition — so at scale prefer many
    * moderate files (or zstd/bzip2) over few large ones.
    */
  def writeTextGz(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip").text(path)

  /** ORC round-trip: columnar + self-describing, no options needed — types
    * (incl. TIMESTAMP_NTZ since ORC 1.8/Spark 3.4) survive natively.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Hive-style partitioned parquet layout (`path/col=value/...`): queries
    * filtering on the partition column prune whole directories at planning
    * time (PartitionFilters in the scan, no data files touched for excluded
    * partitions) — the table-layout half of predicate pushdown at 100 TB.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
