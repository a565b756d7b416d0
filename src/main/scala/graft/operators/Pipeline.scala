package graft.operators

import graft.functions.HashFunctions.md5Long
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training-data pipelines: deterministic
  * sampling and split assignment over `documents`.
  *
  * Sampling here is HASH-based, not RNG-based (`TABLESAMPLE` / `df.sample`):
  * membership is a pure function of the row key, so it is reproducible across
  * runs, engines, partitionings, and cluster sizes; a document keeps its
  * split when the corpus is re-processed incrementally; and disjointness of
  * train/val/test is structural (bucket ranges partition [0,100)), not
  * statistical. At 100 TB this is a narrow map with no shuffle, no RNG state
  * per task, and full predicate pushdown past it — the standard way corpus
  * subsets and held-out splits are cut for LLM training runs.
  *
  * The bucket hash is the cross-engine
  * [[graft.functions.HashFunctions.md5Long]] (60-bit md5 prefix), so the
  * DuckDB oracle reproduces membership bit-for-bit.
  */
object Pipeline {

  /** Sampling seed: vary to draw an independent sample family. */
  val SampleSeed = 7

  /** Hash bucket in [0, 100) for a document id — the sampling/split unit. */
  def bucket(docId: Column): Column =
    pmod(md5Long(SampleSeed, docId.cast("string")), lit(100L))

  /** DuckDB twin of [[bucket]]. */
  def bucketSql(col: String): String =
    s"CAST('0x' || substr(md5('$SampleSeed:' || CAST($col AS VARCHAR)), 1, 15) AS BIGINT) % 100"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic 10% corpus sample: membership is a pure function of
    // doc_id. The filter is a narrow map — no shuffle, no RNG.
    "sp_hash_sample" -> { (s, dir) =>
      Relational.t(s, dir, "documents")
        .filter(bucket(col("doc_id")) < 10)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },

    // Train/val/test split assignment (80/10/10 by hash bucket): disjoint and
    // exhaustive by construction. Summarized per split; the per-doc
    // assignment is the same expression un-aggregated.
    "sp_split_assign" -> { (s, dir) =>
      Relational.t(s, dir, "documents")
        .select(
          when(bucket(col("doc_id")) < 80, "train")
            .when(bucket(col("doc_id")) < 90, "val")
            .otherwise("test").as("split"),
          col("n_chars"))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("split")
    }
  )

  val oracles: Map[String, String] = Map(
    "sp_hash_sample" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE ${bucketSql("doc_id")} < 10
         |ORDER BY doc_id""".stripMargin,
    "sp_split_assign" ->
      s"""SELECT CASE WHEN ${bucketSql("doc_id")} < 80 THEN 'train'
         |            WHEN ${bucketSql("doc_id")} < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY split ORDER BY split""".stripMargin
  )
}
