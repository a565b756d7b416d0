package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators. The one that matters most at 100 TB is
  * small-file compaction: streaming sinks and fine-grained partition writes
  * accumulate thousands of KB-sized files, and scan cost then becomes
  * dominated by file-open/footer overhead and task-scheduling fan-out
  * instead of bytes. Compaction rewrites a directory into ~target-sized
  * files — the routine background job every production lake runs.
  */
object Maintenance {

  /** Default compaction target: 128 MB, parquet's usual sweet spot (one
    * HDFS-block-sized row-group per file).
    */
  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  /** Rewrite the parquet directory at `inPath` into
    * ceil(totalBytes / targetBytes) files at `outPath`, sized from the
    * ACTUAL source listing (a driver-side filesystem metadata call, not a
    * data scan). The repartition is round-robin — compaction balances bytes,
    * it does not promise an ordering; pair with `sortWithinPartitions` /
    * bucketed writes when layout matters ([[graft.sources.Bucketing]]).
    * Returns the target file count.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = DefaultTargetBytes): Int = {
    val path = new org.apache.hadoop.fs.Path(inPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath).repartition(n).write.mode("overwrite").parquet(outPath)
    n
  }

  /** Count the data files of a parquet directory (test/inspection helper). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Fragment `documents` into 40 small files, compact them back to
    // target-sized files, and aggregate the compacted copy — the DuckDB
    // oracle reads the ORIGINAL parquet, so a hash-match proves compaction
    // is content-preserving end-to-end.
    "mt_compact_roundtrip" -> { (s, dir) =>
      val src = Relational.t(s, dir, "documents")
      val frag = Connectors.tmp("documents_frag")
      src.repartition(40).write.mode("overwrite").parquet(frag)
      val compacted = Connectors.tmp("documents_compact")
      compact(s, frag, compacted, 8L * 1024 * 1024)
      s.read.parquet(compacted)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id"))
        .orderBy("lang")
    }
  )

  val oracles: Map[String, String] = Map(
    "mt_compact_roundtrip" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
